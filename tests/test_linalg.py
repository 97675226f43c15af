"""Linear-algebra kernel tests.

Mirrors the reference oracle strategy (test/HSDEAffine.jl, test/conjugateGradient.jl,
test/affinepluslinear.jl): matrix-free operators vs dense materializations,
CG on a random SPD system, projections vs closed-form KKT solves.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from fos_tpu.linalg import (
    AffinePlusLinearProjector,
    CGState,
    HSDEAffineProjector,
    conjugate_gradient,
    hsde_ops,
)


def _problem(rng, m=17, n=11):
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    c = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b), jnp.asarray(c)


def test_q_mul_vs_dense(rng):
    A, b, c = _problem(rng)
    Qd = np.asarray(hsde_ops.q_dense(A, b, c))
    # skew-symmetry
    np.testing.assert_allclose(Qd.T, -Qd, atol=1e-14)
    z = rng.standard_normal(Qd.shape[0])
    np.testing.assert_allclose(
        np.asarray(hsde_ops.q_mul(A, b, c, jnp.asarray(z))), Qd @ z, atol=1e-12
    )
    # normal operator
    M = np.eye(Qd.shape[0]) + Qd.T @ Qd
    np.testing.assert_allclose(
        np.asarray(hsde_ops.hsde_normal_mul(A, b, c, jnp.asarray(z))), M @ z, atol=1e-11
    )


def test_q_mul_sparse(rng):
    from jax.experimental import sparse as jsparse

    A, b, c = _problem(rng, 29, 13)
    Asp = jsparse.BCOO.fromdense(A)
    z = jnp.asarray(rng.standard_normal(29 + 13 + 1))
    np.testing.assert_allclose(
        np.asarray(hsde_ops.q_mul(Asp, b, c, z)),
        np.asarray(hsde_ops.q_mul(A, b, c, z)),
        atol=1e-12,
    )


def test_cg_spd_1000(rng):
    # Reference: test/conjugateGradient.jl:20-33 — random SPD 1000x1000,
    # residual < 1e-5 within 5000 iterations; warm start stays stable.
    n = 1000
    B = rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.T + n * np.eye(n))
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A @ xstar
    res = conjugate_gradient(lambda v: A @ v, b, jnp.zeros(n), tol=1e-5, max_iters=5000)
    assert float(res.rnorm) < 1e-5
    assert int(res.iters) < 5000
    # warm start from a perturbed solution converges fast
    x0 = xstar + 1e-6 * jnp.asarray(rng.standard_normal(n))
    res2 = conjugate_gradient(lambda v: A @ v, b, x0, tol=1e-5, max_iters=5000)
    assert float(res2.rnorm) < 1e-5
    assert int(res2.iters) <= int(res.iters)


def test_cg_zero_rhs():
    res = conjugate_gradient(lambda v: v, jnp.zeros(5), jnp.zeros(5), tol=1e-10, max_iters=10)
    assert int(res.iters) == 0
    np.testing.assert_allclose(np.asarray(res.x), 0.0)


def test_hsde_projection_oracle(rng):
    # prox! on HSDEMatrix ≡ projection onto {(u,v): Qu=v}
    # (reference oracle: test/HSDEAffine.jl:64-82)
    A, b, c = _problem(rng)
    l = A.shape[0] + A.shape[1] + 1
    proj = HSDEAffineProjector.create(A, b, c, decreasing_accuracy=False)
    z = jnp.asarray(rng.standard_normal(2 * l))
    y, cg = proj.project(z, proj.init_cg_state(z.dtype))
    Qd = np.asarray(hsde_ops.q_dense(A, b, c))
    M = np.eye(l) + Qd.T @ Qd
    u = np.linalg.solve(M, np.asarray(z[:l]) + Qd.T @ np.asarray(z[l:]))
    expect = np.concatenate([u, Qd @ u])
    np.testing.assert_allclose(np.asarray(y), expect, atol=1e-9)
    # constraint satisfied exactly by construction: v = Q u
    np.testing.assert_allclose(
        np.asarray(hsde_ops.q_mul(A, b, c, y[:l])), np.asarray(y[l:]), atol=1e-12
    )
    # warm start: projecting the projection is a fixed point
    y2, _ = proj.project(y, cg)
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-8)


def test_hsde_projection_direct_matches_cg(rng):
    A, b, c = _problem(rng, 8, 5)
    l = 8 + 5 + 1
    z = jnp.asarray(rng.standard_normal(2 * l))
    p_cg = HSDEAffineProjector.create(A, b, c, decreasing_accuracy=False)
    p_dir = HSDEAffineProjector.create(A, b, c, direct=True)
    y1, _ = p_cg.project(z, p_cg.init_cg_state(z.dtype))
    y2, _ = p_dir.project(z, p_dir.init_cg_state(z.dtype))
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-9)


def test_affine_plus_linear_oracle(rng):
    # Reference oracle: test/affinepluslinear.jl:46-68 — prox equals the
    # closed-form KKT solve for beta = ±1.
    m, n = 7, 12
    A = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))
    q = jnp.asarray(rng.standard_normal(n))
    for beta in (1, -1):
        proj = AffinePlusLinearProjector.create(A, b, q, beta)
        x = jnp.asarray(rng.standard_normal(n + m))
        y, _ = proj.project(x, proj.init_cg_state(x.dtype))
        # oracle: minimize ||y1-x1||^2 + ||y2-x2||^2 + 2 q'y1  s.t. A y1 - beta y2 = b
        An = np.asarray(A)
        M = np.eye(m) + An @ An.T
        lam = np.linalg.solve(
            M, An @ (np.asarray(x[:n]) - np.asarray(q)) - beta * np.asarray(x[n:]) - np.asarray(b)
        )
        y1 = np.asarray(x[:n]) - np.asarray(q) - An.T @ lam
        y2 = np.asarray(x[n:]) + beta * lam
        np.testing.assert_allclose(np.asarray(y), np.concatenate([y1, y2]), atol=1e-9)
        # constraint holds
        np.testing.assert_allclose(An @ y1 - beta * y2, np.asarray(b), atol=1e-9)
        # direct mode agrees
        proj_d = AffinePlusLinearProjector.create(A, b, q, beta, direct=True)
        yd, _ = proj_d.project(x, proj_d.init_cg_state(x.dtype))
        np.testing.assert_allclose(np.asarray(yd), np.asarray(y), atol=1e-9)


def test_projector_jit_roundtrip(rng):
    # projectors are pytrees: pass through jit as arguments
    A, b, c = _problem(rng, 6, 4)
    proj = HSDEAffineProjector.create(A, b, c)
    z = jnp.asarray(rng.standard_normal(2 * proj.l))

    @jax.jit
    def go(p, z, cg):
        return p.project(z, cg)

    y, cg = go(proj, z, proj.init_cg_state(z.dtype))
    y2, _ = proj.project(z, proj.init_cg_state(z.dtype))
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), atol=1e-10)
    assert int(cg.call_idx) == 2


def test_pipelined_cg_matches_standard(rng):
    from fos_tpu.linalg.cg import conjugate_gradient_pipelined

    n = 300
    B = rng.standard_normal((n, n))
    A = jnp.asarray(B @ B.T + n * np.eye(n))
    xstar = jnp.asarray(rng.standard_normal(n))
    b = A @ xstar
    r1 = conjugate_gradient(lambda v: A @ v, b, jnp.zeros(n), tol=1e-10,
                            max_iters=5000)
    r2 = conjugate_gradient_pipelined(lambda v: A @ v, b, jnp.zeros(n),
                                      tol=1e-10, max_iters=5000)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(xstar), atol=1e-8)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r2.x), atol=1e-8)
    assert abs(int(r1.iters) - int(r2.iters)) <= 2


def test_pipelined_cg_solver_e2e(rng):
    # full HSDE solve with the communication-reduced CG variant
    from fos_tpu.cones import nonneg as nn
    from fos_tpu.problems.conic import conic_problem
    from fos_tpu.problems.hsde import HSDEForm
    from fos_tpu.solvers import engine
    from fos_tpu.solvers.base import GAP
    from fos_tpu.solvers.status import Status

    m, n = 20, 30
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n))
    b = A @ x0 + np.abs(rng.standard_normal(m))
    c = np.abs(rng.standard_normal(n))
    prob = conic_problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         nn(m), nn(n))
    f_std = HSDEForm.build(prob)
    f_pip = HSDEForm.build(prob, cg_variant="pipelined")
    alg = GAP(0.5, 2.0, 2.0)
    r1 = engine.run(f_std, alg, max_iters=20000, eps=1e-8, checki=100, verbose=0)
    r2 = engine.run(f_pip, alg, max_iters=20000, eps=1e-8, checki=100, verbose=0)
    assert r1.status == r2.status == Status.OPTIMAL
    l = m + n + 1
    x1 = np.asarray(r1.guess[:n] / r1.guess[l - 1])
    x2 = np.asarray(r2.guess[:n] / r2.guess[l - 1])
    obj1, obj2 = float(c @ x1), float(c @ x2)
    assert abs(obj1 - obj2) <= 1e-6 * (1 + abs(obj1))


def test_cdot_accuracy(rng):
    # Compensated f32 dot ~ f64 truth to f32 output rounding, including a
    # catastrophic-cancellation case a plain f32 dot gets 100% wrong.
    import jax.numpy as jnp
    from fos_tpu.linalg.compensated import cdot, cdot_ff, cnorm, ff_add

    x = (rng.standard_normal(4001) * 10.0 ** rng.integers(-3, 4, 4001)).astype(np.float32)
    y = (rng.standard_normal(4001) * 10.0 ** rng.integers(-3, 4, 4001)).astype(np.float32)
    exact = float(np.dot(x.astype(np.float64), y.astype(np.float64)))
    comp = float(cdot(jnp.asarray(x), jnp.asarray(y)))
    assert abs(comp - exact) / abs(exact) < 1e-6
    plain = float(jnp.vdot(jnp.asarray(x), jnp.asarray(y)))
    assert abs(comp - exact) <= abs(plain - exact)

    xc = jnp.asarray([1e8, 1.0, -1e8, 1e-3], jnp.float32)
    yc = jnp.ones(4, jnp.float32)
    assert abs(float(cdot(xc, yc)) - 1.001) < 1e-6

    assert float(cnorm(jnp.asarray(x))) == pytest.approx(
        float(np.linalg.norm(x.astype(np.float64))), rel=1e-6)

    # ff pair difference of two near-equal dots (the HSDE gap pattern)
    a = cdot_ff(jnp.asarray(x), jnp.asarray(y))
    bneg = cdot_ff(-jnp.asarray(x), jnp.asarray(y))
    s = ff_add(a, bneg)
    assert abs(float(s[0] + s[1])) < 1e-3 * abs(exact) * np.finfo(np.float32).eps


def test_cg_compensated_f32_reaches_tighter_tol(rng):
    # f32 CG with compensated dots solves to a tolerance plain-f32 CG cannot
    # reliably certify on an ill-conditioned SPD system.
    import jax.numpy as jnp
    from fos_tpu.linalg.cg import conjugate_gradient

    n = 400
    U, _ = np.linalg.qr(rng.standard_normal((n, n)))
    d = np.logspace(0, 4, n)
    A = (U * d) @ U.T
    A32 = jnp.asarray(A, jnp.float32)
    xstar = rng.standard_normal(n)
    b = jnp.asarray(A @ xstar, jnp.float32)
    mv = lambda v: A32 @ v
    res_c = conjugate_gradient(mv, b, jnp.zeros_like(b), tol=1e-3, max_iters=5000,
                               compensated=True)
    true_res = np.linalg.norm(A @ np.asarray(res_c.x, np.float64) - np.asarray(b, np.float64))
    assert true_res < 5e-3 * np.linalg.norm(np.asarray(b))


def test_direct_mode_ill_conditioned(rng):
    # Cholesky-factored direct mode (vs the old explicit inverse) must agree
    # with the indirect CG path on a badly conditioned A (cond ~ 1e8 ->
    # I + Q'Q conditioning ~ 1e16-capped; the f64 factor keeps the
    # projection accurate where an explicit inverse loses half the digits).
    import jax.numpy as jnp
    from fos_tpu.linalg.affine import HSDEAffineProjector
    from fos_tpu.linalg.cg import CGState

    m, n = 30, 40
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    svals = np.logspace(0, -8, m)  # cond(A) = 1e8
    A = U @ np.diag(svals) @ V[:m, :]
    b = rng.standard_normal(m)
    c = rng.standard_normal(n)

    pd = HSDEAffineProjector.create(jnp.asarray(A), jnp.asarray(b),
                                    jnp.asarray(c), direct=True)
    pi = HSDEAffineProjector.create(jnp.asarray(A), jnp.asarray(b),
                                    jnp.asarray(c), direct=False,
                                    decreasing_accuracy=False)
    z = jnp.asarray(rng.standard_normal(2 * pd.l))
    yd, _ = pd.project(z, pd.init_cg_state(z.dtype))
    yi, _ = pi.project(z, pi.init_cg_state(z.dtype))
    # both land on the affine set {Qu = v} ...
    from fos_tpu.linalg import hsde_ops

    for y in (yd, yi):
        u, v = y[: pd.l], y[pd.l:]
        resid = hsde_ops.q_mul(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c), u) - v
        assert float(jnp.linalg.norm(resid)) < 1e-8
    # ... and agree with each other
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yi), atol=1e-6)


def test_affine_set_direct_ill_conditioned(rng):
    import jax.numpy as jnp
    from fos_tpu.sets import AffineSet

    m, n = 20, 50
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = U @ np.diag(np.logspace(0, -7, m)) @ V[:m, :]
    x_f = rng.standard_normal(n)
    b = A @ x_f
    sd = AffineSet.create(A, b, direct=True)
    si = AffineSet.create(A, b, direct=False)
    x = jnp.asarray(rng.standard_normal(n))
    yd, _ = sd.project(x, sd.init_state(x.dtype))
    yi, _ = si.project(x, si.init_state(x.dtype))
    # the QR-based direct path stays feasible and matches the pinv truth
    # at cond(A) = 1e7 (a Cholesky of AA' squares the conditioning and
    # erred 9e-4 here; QR touches cond(A) once)
    assert np.abs(A @ np.asarray(yd) - b).max() < 1e-7
    ystar = np.asarray(x) - np.linalg.pinv(A, rcond=1e-12) @ (A @ np.asarray(x) - b)
    assert np.linalg.norm(np.asarray(yd) - ystar) < 1e-7
    np.testing.assert_allclose(np.asarray(yd), np.asarray(yi), atol=1e-6)


def test_direct_mode_qr_large_sigma_max(rng):
    """VERDICT r2 item 4: direct mode must touch cond once, not squared.

    With sigma_max(A) = 1e7 (cond 1e7), Cholesky of the normal matrix
    I + Q'Q (cond ~ 1e14) erred ~1.3e-3 relative on u at both sites;
    the QR([I; Q]) / QR([A'; I]) path measures 7e-11 / 1e-9."""
    import jax.numpy as jnp
    from fos_tpu.linalg import hsde_ops
    from fos_tpu.linalg.affine import (AffinePlusLinearProjector,
                                       HSDEAffineProjector)

    m, n = 30, 20
    U, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V, _ = np.linalg.qr(rng.standard_normal((n, n)))
    A = U[:, :n] @ np.diag(np.logspace(7, 0, n)) @ V.T
    b = rng.standard_normal(m)
    c = rng.standard_normal(n)
    l = m + n + 1

    pd = HSDEAffineProjector.create(jnp.asarray(A), jnp.asarray(b),
                                    jnp.asarray(c), direct=True)
    z = rng.standard_normal(2 * l)
    y, _ = pd.project(jnp.asarray(z), pd.init_cg_state(jnp.float64))
    Qd = np.asarray(hsde_ops.q_dense(jnp.asarray(A), jnp.asarray(b),
                                     jnp.asarray(c)))
    u_ref = np.linalg.lstsq(np.vstack([np.eye(l), Qd]), z, rcond=None)[0]
    err = np.linalg.norm(np.asarray(y[:l]) - u_ref) / np.linalg.norm(u_ref)
    assert err < 1e-8

    q = rng.standard_normal(n)
    for beta in (1, -1):
        pp = AffinePlusLinearProjector.create(
            jnp.asarray(A), jnp.asarray(b), jnp.asarray(q), beta, direct=True)
        x = rng.standard_normal(n + m)
        yp, _ = pp.project(jnp.asarray(x), pp.init_cg_state(jnp.float64))
        zls = np.concatenate([x[:n] - q, -(beta * x[n:] + b)])
        lam = np.linalg.lstsq(np.vstack([A.T, np.eye(m)]), zls, rcond=None)[0]
        yref = np.concatenate([x[:n] - q - A.T @ lam, x[n:] + beta * lam])
        err = np.linalg.norm(np.asarray(yp) - yref) / np.linalg.norm(yref)
        assert err < 1e-7


def test_tracked_cg_matches_standard(rng):
    # conjugate_gradient_tracked: identical x/r/p arithmetic to standard CG
    # on M = I + Q'Q, with Qx carried through the alpha*Qp recurrence
    from fos_tpu.linalg.cg import conjugate_gradient_tracked

    A, b, c = _problem(rng)
    l = A.shape[0] + A.shape[1] + 1
    rhs = jnp.asarray(rng.standard_normal(l))
    x0 = jnp.zeros(l)
    r1 = conjugate_gradient(
        lambda v: hsde_ops.hsde_normal_mul(A, b, c, v), rhs, x0,
        tol=1e-10, max_iters=500)
    r2 = conjugate_gradient_tracked(
        lambda v: hsde_ops.q_mul(A, b, c, v), rhs, x0, jnp.zeros(l),
        tol=1e-10, max_iters=500)
    np.testing.assert_allclose(np.asarray(r2.x), np.asarray(r1.x), atol=1e-9)
    assert abs(int(r1.iters) - int(r2.iters)) <= 1
    # the tracked Qx really is Q @ x
    np.testing.assert_allclose(
        np.asarray(r2.Qx), np.asarray(hsde_ops.q_mul(A, b, c, r2.x)),
        atol=1e-9)


def test_tracked_projection_matches_legacy(rng):
    # init_state_from seeds v_warm = Q u0; the tracked one-A-pass residual
    # path must reproduce the legacy rhs-build path along a whole
    # reflect-style trajectory, keep the v_warm invariant, and accumulate
    # the total_iters telemetry that bench.py's traffic model reads
    A, b, c = _problem(rng)
    l = A.shape[0] + A.shape[1] + 1
    proj = HSDEAffineProjector.create(A, b, c, decreasing_accuracy=False)
    z0 = jnp.asarray(rng.standard_normal(2 * l))
    cg_t = proj.init_state_from(z0)
    cg_l = proj.init_cg_state(z0.dtype)
    assert cg_t.v_warm is not None and cg_l.v_warm is None
    np.testing.assert_allclose(
        np.asarray(cg_t.v_warm),
        np.asarray(hsde_ops.q_mul(A, b, c, z0[:l])), atol=1e-12)

    zt = zl = z0
    iters_seen = 0
    for k in range(6):
        yt, cg_t = proj.project(zt, cg_t)
        yl, cg_l = proj.project(zl, cg_l)
        np.testing.assert_allclose(np.asarray(yt), np.asarray(yl),
                                   atol=1e-8)
        iters_seen += int(cg_t.last_iters)
        step = jnp.asarray(rng.standard_normal(2 * l)) * 0.1
        zt = 2 * yt - zt + step
        zl = 2 * yl - zl + step
    assert int(cg_t.total_iters) == iters_seen
    # invariant: v_warm == Q warm (tracked recurrence, then refresh)
    np.testing.assert_allclose(
        np.asarray(cg_t.v_warm),
        np.asarray(hsde_ops.q_mul(A, b, c, cg_t.warm)), atol=1e-8)
    cg_r = proj.refresh_state(cg_t)
    np.testing.assert_allclose(
        np.asarray(cg_r.v_warm),
        np.asarray(hsde_ops.q_mul(A, b, c, cg_t.warm)), atol=1e-14)
