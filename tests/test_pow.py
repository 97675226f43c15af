"""Power-cone tests (beyond-reference extension; SCS "p" cones).

The reference's cone registry stops at the exponential cone
(/root/reference/src/cones.jl:4-14); these follow the same test strategy as
the rest of the cone layer (SURVEY.md §4): projection KKT properties against
a brute-force SLSQP oracle, fused-pass vs blockwise equivalence, Moreau
identity, and an end-to-end solve with a closed-form optimum.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fos_tpu.cones import (
    Cone,
    ConeSpec,
    nonneg,
    pow_dual,
    pow_primal,
    project,
    project_dual,
)
from fos_tpu.cones.pow import project_pow_dual_single, project_pow_single

_proj = jax.jit(project_pow_single)
_proj_dual = jax.jit(project_pow_dual_single)


def _in_pow(p, a, tol):
    x, y, z = p
    return x >= -tol and y >= -tol and (
        max(x, 0.0) ** a) * (max(y, 0.0) ** (1 - a)) >= abs(z) - tol


def _dual_resid(u, a, bump):
    """Dual-membership residual of u in Kpow*(a), with a rounding bump on
    the nonneg components (an exactly-zero component may be a rounded
    O(eps) positive value; bumping by eps-scale keeps the test honest)."""
    u0 = max(u[0], 0.0) + bump
    u1 = max(u[1], 0.0) + bump
    return (u0 / a) ** a * (u1 / (1 - a)) ** (1 - a) - abs(u[2])


def test_projection_kkt_properties(rng):
    """p = P_K(v) iff p in K, v - p in -K*, <p, v-p> = 0."""
    for _ in range(120):
        a = float(rng.uniform(0.05, 0.95))
        v = rng.standard_normal(3) * (10.0 ** rng.uniform(-2, 2))
        p = np.asarray(_proj(jnp.asarray(v), a))
        scale = max(1.0, np.abs(v).max())
        assert _in_pow(p, a, 1e-7 * scale)
        u = p - v
        assert u[0] >= -1e-7 * scale and u[1] >= -1e-7 * scale
        assert _dual_resid(u, a, 1e-11 * scale) >= -1e-5 * scale
        assert abs(np.dot(u, p)) <= 1e-9 * max(1.0, np.dot(p, p))


def test_projection_vs_slsqp_oracle(rng):
    from scipy.optimize import minimize

    def oracle(v, a):
        cons = [
            {"type": "ineq", "fun": lambda p: p[0]},
            {"type": "ineq", "fun": lambda p: p[1]},
            {"type": "ineq", "fun": lambda p: (max(p[0], 1e-12) ** a)
             * (max(p[1], 1e-12) ** (1 - a)) - abs(p[2])},
        ]
        best = None
        for x0 in [np.maximum(v, 0.01), np.ones(3)]:
            r = minimize(lambda p: 0.5 * np.sum((p - v) ** 2), x0,
                         constraints=cons, method="SLSQP",
                         options={"maxiter": 500, "ftol": 1e-14})
            if best is None or r.fun < best.fun:
                best = r
        return best.x

    for _ in range(15):
        a = float(rng.uniform(0.1, 0.9))
        v = rng.standard_normal(3) * 3
        p = np.asarray(_proj(jnp.asarray(v), a))
        assert np.abs(p - oracle(v, a)).max() < 5e-6


def test_members_and_polar_fixed():
    a = 0.3
    member = jnp.asarray([2.0, 3.0, 2.0 ** 0.3 * 3.0 ** 0.7 - 1e-3])
    assert np.allclose(np.asarray(_proj(member, a)), np.asarray(member))
    # polar points project to exactly 0
    u, v, w = 2.0, 3.0, (2.0 / a) ** a * (3.0 / (1 - a)) ** (1 - a) - 1e-3
    polar = jnp.asarray([-u, -v, w])
    assert np.allclose(np.asarray(_proj(polar, a)), 0.0)
    # deep in neither: cancellation-prone x0 << 0 case (regression for the
    # conjugate-form evaluation of x(r))
    vhard = jnp.asarray([-20.779, 4.665, 2.6805])
    p = np.asarray(_proj(vhard, 0.94731))
    assert _in_pow(p, 0.94731, 1e-7)
    uu = p - np.asarray(vhard)
    assert _dual_resid(uu, 0.94731, 1e-11 * 21) >= -1e-5 * 21


def test_moreau_identity(rng):
    """v = P_K(v) - P_{K*}(-v) for every v (exact cone decomposition)."""
    for _ in range(60):
        a = float(rng.uniform(0.05, 0.95))
        v = rng.standard_normal(3) * (10.0 ** rng.uniform(-2, 2))
        pk = np.asarray(_proj(jnp.asarray(v), a))
        pks = np.asarray(_proj_dual(jnp.asarray(-v), a))
        scale = max(1.0, np.abs(v).max())
        assert np.abs(v - (pk - pks)).max() <= 1e-12 * scale


def test_fused_pass_matches_blockwise(rng):
    spec = nonneg(4) + pow_primal([0.3, 0.7]) + pow_dual(0.5)
    assert spec.dim == 13
    x = rng.standard_normal(13)
    y = np.asarray(project(spec, jnp.asarray(x)))
    expect = np.concatenate([
        np.maximum(x[:4], 0),
        np.asarray(_proj(jnp.asarray(x[4:7]), 0.3)),
        np.asarray(_proj(jnp.asarray(x[7:10]), 0.7)),
        np.asarray(_proj_dual(jnp.asarray(x[10:13]), 0.5)),
    ])
    np.testing.assert_allclose(y, expect, rtol=0, atol=1e-12)
    # batch axis
    xb = rng.standard_normal((5, 13))
    yb = np.asarray(project(spec, jnp.asarray(xb)))
    np.testing.assert_allclose(
        yb[2], np.asarray(project(spec, jnp.asarray(xb[2]))), atol=0)
    # dual-spec projection consistency (params survive .dual())
    yd = np.asarray(project_dual(spec, jnp.asarray(x)))
    yd2 = np.asarray(project(spec.dual(), jnp.asarray(x)))
    np.testing.assert_allclose(yd, yd2, atol=0)


def test_spec_validation():
    with pytest.raises(ValueError, match="exponents"):
        ConeSpec(((Cone.POW_PRIMAL, 3),))  # missing params
    with pytest.raises(ValueError, match="needs 2 exponents"):
        ConeSpec(((Cone.POW_PRIMAL, 6),), ((0.5,),))
    with pytest.raises(ValueError, match="in \\(0,1\\)"):
        pow_primal([1.5])
    with pytest.raises(ValueError, match="no params"):
        ConeSpec(((Cone.NONNEG, 3),), ((0.5,),))
    # concat/add keeps alignment
    s = ConeSpec.concat([nonneg(2), pow_primal(0.25), nonneg(1)])
    assert s.params == ((), (0.25,), ())
    assert s.dual().blocks[1][0] is Cone.POW_DUAL
    assert s.dual().params == s.params


def test_scs_cone_dict_parsing():
    from fos_tpu.interface.conic import scs_cone_spec

    spec = scs_cone_spec({"l": 2, "p": [0.3, 0.4, -0.5]})
    assert spec.blocks == ((Cone.NONNEG, 2), (Cone.POW_PRIMAL, 6),
                           (Cone.POW_DUAL, 3))
    assert spec.params == ((), (0.3, 0.4), (0.5,))
    with pytest.raises(ValueError, match="exponent"):
        scs_cone_spec({"p": [1.2]})


def test_geometric_mean_lp_end_to_end():
    """max sqrt(x1*x2) s.t. x1 + 2*x2 <= 3  via  (x1, x2, z) in Pow(1/2).

    Closed form (AM-GM): x1 = 1.5, x2 = 0.75, z = sqrt(1.125).
    """
    from fos_tpu.interface.conic import solve_scs

    A = np.array([
        [1.0, 2.0, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
    ])
    b = np.array([3.0, 0.0, 0.0, 0.0])
    c = np.array([0.0, 0.0, -1.0])
    sol = solve_scs({"A": A, "b": b, "c": c}, {"l": 1, "p": [0.5]},
                    eps=1e-8, verbose=0, max_iters=40000)
    assert sol.status == "Optimal"
    np.testing.assert_allclose(sol.x, [1.5, 0.75, np.sqrt(1.125)], atol=2e-7)
    np.testing.assert_allclose(sol.objval, -np.sqrt(1.125), atol=2e-7)


def test_weighted_power_maximization_end_to_end():
    """max x1^a * x2^(1-a) s.t. p1*x1 + p2*x2 <= B (Cobb-Douglas demand):
    optimum splits budget a : (1-a), i.e. x1 = a*B/p1, x2 = (1-a)*B/p2."""
    from fos_tpu.interface.conic import solve_scs

    a, p1, p2, B = 0.3, 2.0, 5.0, 7.0
    A = np.array([
        [p1, p2, 0.0],
        [-1.0, 0.0, 0.0],
        [0.0, -1.0, 0.0],
        [0.0, 0.0, -1.0],
    ])
    b = np.array([B, 0.0, 0.0, 0.0])
    c = np.array([0.0, 0.0, -1.0])
    sol = solve_scs({"A": A, "b": b, "c": c}, {"l": 1, "p": [a]},
                    eps=1e-8, verbose=0, max_iters=60000)
    x1, x2 = a * B / p1, (1 - a) * B / p2
    assert sol.status == "Optimal"
    np.testing.assert_allclose(sol.x[:2], [x1, x2], atol=5e-6)
    np.testing.assert_allclose(-sol.objval, x1 ** a * x2 ** (1 - a), atol=5e-6)
