"""PSD and exponential-cone end-to-end solves.

PSD: nearest-PSD-matrix problem mirroring /root/reference/test/testPSD.jl —
the conic solve must agree with the direct eigenvalue-clamp projection to
1e-8 (the reference cross-checks DR vs SCS vs prox!(IndPSD)).

EXP: max sum(log(x)) s.t. sum(x)=1 via ExpPrimal cones — closed-form
optimum x_i = 1/k.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fos_tpu import DR, GAPA, solve
from fos_tpu.cones import free, psd, soc, zero, ConeSpec
from fos_tpu.cones.spec import Cone
from fos_tpu.cones.project import smat, svec


def test_nearest_psd():
    ys = np.array([[-0.0064709, -0.22443], [-0.22443, -1.02411]])
    vs = np.asarray(svec(jnp.asarray(ys)))
    L = 3

    # min t  s.t. (t, v - vs) in SOC(1+L), v in PSD
    # variables (t, v)
    nv = 1 + L
    Ac = np.zeros((1 + L, nv))
    bc = np.zeros(1 + L)
    Ac[0, 0] = -1.0
    Ac[1:, 1:] = -np.eye(L)
    bc[1:] = -vs
    c = np.zeros(nv)
    c[0] = 1.0
    K1 = soc(1 + L)
    K2 = ConeSpec(((Cone.FREE, 1), (Cone.PSD, L)))

    sol = solve(Ac, bc, c, K1, K2, alg=DR(), eps=1e-9, max_iters=20000, verbose=0)
    assert sol.status == "Optimal"
    Y = np.asarray(smat(sol.x[1:]))

    # oracle: eigenvalue clamp (what prox!(IndPSD) computes, testPSD.jl:15-18)
    w, V = np.linalg.eigh(ys)
    Yp = (V * np.maximum(w, 0)) @ V.T
    np.testing.assert_allclose(Y, Yp, atol=1e-7)


def test_nearest_psd_larger(rng):
    d = 6
    L = d * (d + 1) // 2
    B = rng.standard_normal((d, d))
    ys = (B + B.T) / 2
    vs = np.asarray(svec(jnp.asarray(ys)))
    nv = 1 + L
    Ac = np.zeros((1 + L, nv))
    bc = np.zeros(1 + L)
    Ac[0, 0] = -1.0
    Ac[1:, 1:] = -np.eye(L)
    bc[1:] = -vs
    c = np.zeros(nv)
    c[0] = 1.0
    K1 = soc(1 + L)
    K2 = ConeSpec(((Cone.FREE, 1), (Cone.PSD, L)))
    sol = solve(Ac, bc, c, K1, K2, alg=DR(), eps=1e-8, max_iters=20000, verbose=0)
    assert sol.status == "Optimal"
    Y = np.asarray(smat(sol.x[1:]))
    w, V = np.linalg.eigh(ys)
    Yp = (V * np.maximum(w, 0)) @ V.T
    np.testing.assert_allclose(Y, Yp, atol=1e-6)
    # GAPA reaches the loose operating point on the same problem
    solg = solve(Ac, bc, c, K1, K2, alg=GAPA(), eps=1e-6, max_iters=20000, verbose=0)
    assert solg.status == "Optimal"
    np.testing.assert_allclose(np.asarray(smat(solg.x[1:])), Yp, atol=5e-2)


def test_max_entropy_exp_cone():
    # max sum(log x)  s.t. sum(x) = 1   =>  x_i = 1/k
    # conic: min -sum(t_i) s.t. (t_i, u_i, x_i) in Kexp, u_i = 1, sum(x)=1
    # variables (t[k], u[k], x[k]); K1 rows: ExpPrimal triples + Zero(k+1)
    k = 5
    nv = 3 * k
    rows = 3 * k + k + 1
    Ac = np.zeros((rows, nv))
    bc = np.zeros(rows)
    # s_{3i..3i+2} = (t_i, u_i, x_i): A rows = -e
    for i in range(k):
        Ac[3 * i, i] = -1.0            # t_i
        Ac[3 * i + 1, k + i] = -1.0    # u_i
        Ac[3 * i + 2, 2 * k + i] = -1.0  # x_i
    # u_i = 1
    for i in range(k):
        Ac[3 * k + i, k + i] = 1.0
        bc[3 * k + i] = 1.0
    # sum x = 1
    Ac[4 * k, 2 * k :] = 1.0
    bc[4 * k] = 1.0
    c = np.zeros(nv)
    c[:k] = -1.0
    K1 = ConeSpec(((Cone.EXP_PRIMAL, 3 * k), (Cone.ZERO, k + 1)))
    K2 = free(nv)

    sol = solve(Ac, bc, c, K1, K2, alg=DR(), eps=1e-8, max_iters=40000, verbose=0)
    assert sol.status == "Optimal"
    x = np.asarray(sol.x[2 * k :])
    np.testing.assert_allclose(x, 1.0 / k, atol=1e-4)
    t = np.asarray(sol.x[:k])
    np.testing.assert_allclose(t, np.log(1.0 / k), atol=1e-4)


def test_lambda_min_sdp_f32_converges_via_stall_recovery():
    """Round-4 regression: min tr(CX), tr(X)=1, X >> 0 in f32 stalled
    FOREVER at d~1e-3 under the reference's 2l*eps CG floor (an f64
    formula; f64 converges in ~500 iterations).  The plateau-based stall
    recovery must tighten the floor on device and converge to the
    lambda_min(C) optimum with default options."""
    import jax
    from fos_tpu.cones import free as _free
    from fos_tpu.parallel.batched import build_batched_form, solve_batched

    Bs, d = 2, 32
    L = d * (d + 1) // 2
    kc = jax.random.PRNGKey(29)
    Cb = jax.random.normal(kc, (Bs, d, d), jnp.float32) / float(np.sqrt(d))
    Cb = (Cb + jnp.swapaxes(Cb, -1, -2)) / 2
    sC = jax.vmap(lambda Ci: svec(Ci, scaled=True))(Cb)
    sI = svec(jnp.eye(d, dtype=jnp.float32), scaled=True)
    A_base = jnp.concatenate([sI[None, :], -jnp.eye(L, dtype=jnp.float32)], axis=0)
    A_sdp = jnp.broadcast_to(A_base, (Bs, 1 + L, L))
    b_sdp = jnp.zeros((Bs, 1 + L), jnp.float32).at[:, 0].set(1.0)
    K1 = ConeSpec(((Cone.ZERO, 1), (Cone.PSD, L)))
    form = build_batched_form(A_sdp, b_sdp, sC, K1, _free(L))
    r = solve_batched(DR(), form, max_iters=4000, eps=1e-5, checki=100)
    assert (np.asarray(r.status) == 1).all(), np.asarray(r.status)
    lam = np.linalg.eigvalsh(np.asarray(Cb, np.float64))[:, 0]
    lsdp = (1 + L) + L + 1
    obj = (np.asarray(jnp.einsum("bl,bl->b", sC, r.guess[:, :L]))
           / np.asarray(r.guess[:, lsdp - 1]))
    err = np.max(np.abs(obj - lam) / (1 + np.abs(lam)))
    assert err < 5e-4, err
