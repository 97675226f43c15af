"""Cross-solver conformance suite.

Role of the reference's (disabled) testconvex.jl: run a battery of conic
problems through the full stack and validate against trusted oracles —
scipy.optimize.linprog for LPs, closed forms / SLSQP elsewhere.
"""

import numpy as np
import pytest
from scipy.optimize import linprog

from fos_tpu import DR, GAPA, solve
from fos_tpu.interface.conic import (
    cone_spec_from_list,
    load_problem,
    solve_lp,
    supported_cones,
)
from fos_tpu.cones.spec import Cone


def test_supported_cones():
    assert set(supported_cones()) == {
        "Free", "Zero", "NonNeg", "NonPos", "SOC", "SOCRotated", "SDP",
        "ExpPrimal", "ExpDual",
    }


def test_cone_spec_validation():
    spec = cone_spec_from_list(5, [("Zero", range(2)), ("NonNeg", range(2, 5))])
    assert spec.blocks == ((Cone.ZERO, 2), (Cone.NONNEG, 3))
    with pytest.raises(ValueError, match="not supported"):
        cone_spec_from_list(2, [("Weird", range(2))])
    with pytest.raises(ValueError, match="Invalid range"):
        cone_spec_from_list(4, [("Zero", [0, 2, 1, 3])])
    with pytest.raises(ValueError, match="tile"):
        cone_spec_from_list(4, [("Zero", range(1, 4))])
    with pytest.raises(ValueError, match="cover"):
        cone_spec_from_list(5, [("Zero", range(4))])


def _random_feasible_lp(rng, m, n):
    """min c'x s.t. A x <= b, x >= 0 with interior point and bounded optimum."""
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b = A @ x0 + np.abs(rng.standard_normal(m)) + 0.1
    c = np.abs(rng.standard_normal(n)) + 0.1  # c > 0 + x >= 0 -> bounded
    return A, b, c


@pytest.mark.parametrize("seed", range(5))
def test_lp_vs_scipy(seed):
    rng = np.random.default_rng(seed)
    A, b, c = _random_feasible_lp(rng, 12, 20)
    ref = linprog(c, A_ub=A, b_ub=b, bounds=(0, None), method="highs")
    assert ref.status == 0
    sol = solve_lp(c, A_ub=A, b_ub=b, alg=DR(), eps=1e-8, max_iters=40000,
                   verbose=0)
    assert sol.status == "Optimal"
    assert abs(sol.objval - ref.fun) <= 1e-5 * (1 + abs(ref.fun))
    x = np.asarray(sol.x)
    assert x.min() > -1e-7
    assert (A @ x - b).max() < 1e-6


def test_lp_mixed_eq_ub():
    rng = np.random.default_rng(42)
    m_eq, m_ub, n = 4, 10, 15
    A_eq = rng.standard_normal((m_eq, n))
    A_ub = rng.standard_normal((m_ub, n))
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b_eq = A_eq @ x0
    b_ub = A_ub @ x0 + np.abs(rng.standard_normal(m_ub)) + 0.1
    c = np.abs(rng.standard_normal(n)) + 0.1
    ref = linprog(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq,
                  bounds=(0, None), method="highs")
    assert ref.status == 0
    sol = solve_lp(c, A_ub=A_ub, b_ub=b_ub, A_eq=A_eq, b_eq=b_eq, alg=DR(),
                   eps=1e-8, max_iters=40000, verbose=0)
    assert sol.status == "Optimal"
    assert abs(sol.objval - ref.fun) <= 1e-5 * (1 + abs(ref.fun))
    x = np.asarray(sol.x)
    assert np.abs(A_eq @ x - b_eq).max() < 1e-6


def test_load_problem_roundtrip():
    rng = np.random.default_rng(0)
    m, n = 6, 8
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)
    c = rng.standard_normal(n)
    prob = load_problem(c, A, b,
                        [("Zero", range(2)), ("NonNeg", range(2, 6))],
                        [("Free", range(3)), ("SOC", range(3, 8))])
    assert prob.K1.blocks == ((Cone.ZERO, 2), (Cone.NONNEG, 4))
    assert prob.K2.blocks == ((Cone.FREE, 3), (Cone.SOC, 5))
    sol = solve(problem=prob, alg=DR(), eps=1e-4, max_iters=500, verbose=0)
    assert sol.status in ("Optimal", "Indeterminate", "Unbounded", "Infeasible")


def test_infeasible_lp_detected():
    # free x with x <= -1 and -x <= 0: infeasible with an A'y = 0 Farkas
    # certificate (y = (1,1)).  NOTE: the reference's infeasibility check
    # ||A'y|| <= eps*(-b'y/||b||) (HSDEStatus.jl:60-61) only detects
    # certificates of this A'y ~ 0 form (SCS's free-variable convention);
    # we reproduce that faithfully.
    c = np.array([0.0])
    A = np.array([[1.0], [-1.0]])
    b = np.array([-1.0, 0.0])
    sol = solve_lp(c, A_ub=A, b_ub=b, nonneg=False, alg=DR(), eps=1e-6,
                   max_iters=20000, verbose=0)
    assert sol.status == "Infeasible"


def test_unbounded_lp_detected():
    # min -x_1, x >= 0, trivial row constraint that never binds x_1
    c = np.array([-1.0, 0.0])
    A = np.array([[0.0, 1.0]])
    b = np.array([1.0])
    sol = solve_lp(c, A_ub=A, b_ub=b, alg=DR(), eps=1e-6, max_iters=20000,
                   verbose=0)
    assert sol.status == "Unbounded"


def test_strict_infeasibility_certificate():
    # x >= 0 with x_1 <= -1: infeasible, but the Farkas certificate has
    # A'y = (y, 0) != 0 — undetectable by the reference's ||A'y|| ~ 0 test
    # (this exact case reports Indeterminate in reference-parity mode, see
    # test_infeasible_lp_detected) — strict mode measures dist(-A'y, K2*).
    c = np.array([1.0, 1.0])
    A = np.array([[1.0, 0.0]])
    b = np.array([-1.0])
    sol_ref = solve_lp(c, A_ub=A, b_ub=b, alg=DR(), eps=1e-6, max_iters=20000,
                       verbose=0)
    assert sol_ref.status == "Indeterminate"  # reference-parity behavior
    sol = solve_lp(c, A_ub=A, b_ub=b, alg=DR(), eps=1e-6, max_iters=20000,
                   verbose=0, strict_certificates=True)
    assert sol.status == "Infeasible"


def test_strict_mode_no_false_positives():
    rng = np.random.default_rng(1)
    A, b, c = _random_feasible_lp(rng, 12, 20)
    sol = solve_lp(c, A_ub=A, b_ub=b, alg=DR(), eps=1e-8, max_iters=40000,
                   verbose=0, strict_certificates=True)
    assert sol.status == "Optimal"


@pytest.mark.parametrize("seed", range(3))
def test_socp_battery(seed):
    # random SOCP: min c'x s.t. ||F_i x + g_i|| <= h_i'x + d_i (2 cones),
    # x in box via nonneg splits — validated against SLSQP
    rng = np.random.default_rng(100 + seed)
    n, k = 8, 4
    F1 = rng.standard_normal((k, n)) * 0.3
    F2 = rng.standard_normal((k, n)) * 0.3
    g1 = rng.standard_normal(k) * 0.1
    g2 = rng.standard_normal(k) * 0.1
    c = rng.standard_normal(n)

    # rows: two SOC blocks (1+k each): s = (d_i + h_i'x, -(F_i x + g_i))
    # with h_i = 0, d_i = 1:  ||F_i x + g_i|| <= 1
    m = 2 * (1 + k)
    A = np.zeros((m, n))
    b = np.zeros(m)
    r = 0
    for F, g in ((F1, g1), (F2, g2)):
        b[r] = 1.0                       # s0 = 1
        A[r + 1 : r + 1 + k, :] = -F     # s_tail = b - Ax = g + Fx
        b[r + 1 : r + 1 + k] = g
        r += 1 + k
    from fos_tpu.cones import free, soc, ConeSpec

    K1 = ConeSpec.concat([soc(1 + k), soc(1 + k)])
    K2 = free(n)
    sol = solve(A, b, c, K1, K2, alg=DR(), eps=1e-8, max_iters=60000, verbose=0)
    assert sol.status == "Optimal"
    x = np.asarray(sol.x)
    assert np.linalg.norm(F1 @ x + g1) <= 1 + 1e-6
    assert np.linalg.norm(F2 @ x + g2) <= 1 + 1e-6

    from scipy.optimize import minimize

    res = minimize(
        lambda w: c @ w, np.zeros(n), method="SLSQP",
        constraints=[
            {"type": "ineq", "fun": lambda w: 1 - np.linalg.norm(F1 @ w + g1)},
            {"type": "ineq", "fun": lambda w: 1 - np.linalg.norm(F2 @ w + g2)},
        ],
        options={"maxiter": 1000, "ftol": 1e-12},
    )
    assert float(c @ x) <= res.fun + 1e-5 * (1 + abs(res.fun))


def test_no_zero_certificate():
    # fuzz-derived regression: a feasible PSD-constrained problem whose DR
    # iterate collapses toward z = 0 must NOT be certified
    # Infeasible/Unbounded via the degenerate zero certificate (the
    # reference's unguarded 0 <= eps*(-0/||b||) test would).
    import jax.numpy as jnp
    from fos_tpu.cones import ConeSpec
    from fos_tpu.cones.project import project

    rng = np.random.default_rng(12345)
    for _ in range(52):  # fast-forward to the failing fuzz trial's stream
        rng.integers(1, 5)
    # deterministic rebuild of an instance of the failing family
    rng = np.random.default_rng(777)
    K1 = ConeSpec(((Cone.PSD, 6),))
    m, n = 6, 8
    A = rng.standard_normal((m, n)) * 0.5
    x0 = rng.standard_normal(n) * 0.3
    s0 = np.asarray(project(K1, jnp.asarray(rng.standard_normal(m))))
    b = A @ x0 + s0
    c = rng.standard_normal(n) * 0.1
    from fos_tpu.cones import free

    sol = solve(A, b, c, K1, free(n), alg=DR(), eps=1e-6, max_iters=8000,
                verbose=0)
    assert sol.status in ("Optimal", "Indeterminate", "Unbounded")
    if sol.status in ("Unbounded",):
        # a genuine unbounded cert must have c'x < 0
        assert float(c @ np.asarray(sol.x)) < 0
