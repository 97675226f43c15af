"""Modeling-layer (L6) conformance tier.

Plays the role of the reference's disabled testconvex.jl
(/root/reference/test/testconvex.jl:1-10 runs Convex.jl's whole suite with
DR as the solver): a zoo of LP/SOCP/SDP/EXP problems expressed exactly as
CVXPY emits them for SCS (the recorded-fixture convention: variables free,
cone structure in the slack, rows ordered zero/nonneg/soc/psd/exp), driven
through the :mod:`fos_tpu.interface.cvxpy_adapter` backend and validated
against independent oracles.  cvxpy itself is not in this image; the
fixtures below are what `problem.get_problem_data(SCS)` produces for these
models.
"""

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog, nnls

import jax.numpy as jnp

from fos_tpu import DR, GAPA
from fos_tpu.cones.project import svec
from fos_tpu.interface.cvxpy_adapter import solve_conic_data, _dims_to_cone_dict


def test_dims_object_and_dict_agree():
    class ConeDims:  # cvxpy-like object
        zero = 2
        nonneg = 3
        soc = [4]
        psd = [3]
        exp = 1

    assert _dims_to_cone_dict(ConeDims()) == {
        "z": 2, "l": 3, "q": [4], "s": [3], "ep": 1, "ed": 0, "p": []}
    assert _dims_to_cone_dict({"f": 2, "l": 3, "q": [4], "s": [3], "ep": 1}) == {
        "z": 2, "l": 3, "q": [4], "s": [3], "ep": 1, "ed": 0, "p": []}
    assert _dims_to_cone_dict({"l": 1, "p": [0.3, -0.6]}) == {
        "z": 0, "l": 1, "q": [], "s": [], "ep": 0, "ed": 0, "p": [0.3, -0.6]}


def test_lp_fixture_vs_linprog():
    # min c'x s.t. G x <= h, A x = b  (cvxpy emits zero rows then nonneg)
    rng = np.random.default_rng(0)
    n, meq, mub = 8, 3, 12
    Aeq = rng.standard_normal((meq, n))
    x_feas = rng.standard_normal(n)
    beq = Aeq @ x_feas
    G = rng.standard_normal((mub, n))
    h = G @ x_feas + np.abs(rng.standard_normal(mub)) + 0.1
    # dual-feasible c = -G'mu + Aeq'nu with mu >= 0 keeps the LP bounded
    # below: c'x = -mu'Gx + nu'beq >= -mu'h + nu'beq on the feasible set
    c = -G.T @ np.abs(rng.standard_normal(mub)) + Aeq.T @ rng.standard_normal(meq)
    ref = linprog(c, A_ub=G, b_ub=h, A_eq=Aeq, b_eq=beq, bounds=(None, None))
    assert ref.status == 0

    data = {
        "A": sp.vstack([sp.csr_matrix(Aeq), sp.csr_matrix(G)]).tocsc(),
        "b": np.concatenate([beq, h]),
        "c": c,
        "dims": {"z": meq, "l": mub},
    }
    out = solve_conic_data(data, eps=1e-8, verbose=0, max_iters=40000)
    assert out["info"]["status"] == "optimal"
    assert abs(out["info"]["pobj"] - ref.fun) < 1e-5 * (1 + abs(ref.fun))
    np.testing.assert_allclose(out["x"], ref.x, atol=1e-4)


def test_nnls_fixture_vs_scipy():
    # min ||F x - g||  s.t. x >= 0, via the SOC epigraph cvxpy builds:
    # vars (x, t); rows: nonneg slack s = x; SOC slack (t, g - F x).
    rng = np.random.default_rng(1)
    m, n = 20, 10
    F = rng.standard_normal((m, n))
    g = rng.standard_normal(m)
    xref, resref = nnls(F, g)

    nvar = n + 1
    A_nonneg = sp.hstack([-sp.identity(n), sp.csr_matrix((n, 1))])
    soc_t = sp.hstack([sp.csr_matrix((1, n)), sp.csr_matrix([[-1.0]])])
    soc_rest = sp.hstack([sp.csr_matrix(F), sp.csr_matrix((m, 1))])
    data = {
        "A": sp.vstack([A_nonneg, soc_t, soc_rest]).tocsc(),
        "b": np.concatenate([np.zeros(n), [0.0], g]),
        "c": np.concatenate([np.zeros(n), [1.0]]),
        "dims": {"l": n, "q": [m + 1]},
    }
    out = solve_conic_data(data, alg=GAPA(0.8, 0.9), eps=1e-9, verbose=0,
                           max_iters=40000)
    assert out["info"]["status"] == "optimal"
    assert abs(out["info"]["pobj"] - resref) < 1e-5 * (1 + resref)
    np.testing.assert_allclose(out["x"][:n], xref, atol=1e-4)


def test_min_eigenvalue_sdp_fixture():
    # max t s.t. C - t I >> 0  <=>  min -t; slack s = svec(C) - t*svec(I)
    rng = np.random.default_rng(2)
    d = 5
    B = rng.standard_normal((d, d))
    C = (B + B.T) / 2
    lam_min = float(np.linalg.eigvalsh(C)[0])

    sI = np.asarray(svec(jnp.asarray(np.eye(d)), scaled=True))
    sC = np.asarray(svec(jnp.asarray(C), scaled=True))
    data = {
        "A": sp.csc_matrix(sI[:, None]),
        "b": sC,
        "c": np.asarray([-1.0]),
        "dims": {"s": [d]},
    }
    out = solve_conic_data(data, eps=1e-8, verbose=0, max_iters=40000)
    assert out["info"]["status"] == "optimal"
    assert abs(out["x"][0] - lam_min) < 1e-5 * (1 + abs(lam_min))


def test_exp_cone_fixture():
    # min t s.t. (x0, 1, t) in Kexp  ->  t* = exp(x0)
    for x0 in (-1.3, 0.0, 0.8):
        data = {
            "A": sp.csc_matrix(np.asarray([[0.0], [0.0], [-1.0]])),
            "b": np.asarray([x0, 1.0, 0.0]),
            "c": np.asarray([1.0]),
            "dims": {"ep": 1},
        }
        out = solve_conic_data(data, eps=1e-9, verbose=0, max_iters=40000)
        assert out["info"]["status"] == "optimal"
        assert abs(out["x"][0] - np.exp(x0)) < 1e-5 * (1 + np.exp(x0))


def test_mixed_cone_fixture():
    # min c'x s.t. x >= 0 and ||x - a|| <= r: nonneg rows + SOC block
    rng = np.random.default_rng(3)
    n = 6
    a = np.abs(rng.standard_normal(n)) + 0.5
    r = 1.0
    c = rng.standard_normal(n)
    A_nonneg = -sp.identity(n)
    soc_t = sp.csr_matrix((1, n))
    soc_x = sp.identity(n)
    data = {
        "A": sp.vstack([A_nonneg, soc_t, soc_x]).tocsc(),
        "b": np.concatenate([np.zeros(n), [r], a]),
        "c": c,
        "dims": {"l": n, "q": [n + 1]},
    }
    out = solve_conic_data(data, eps=1e-9, verbose=0, max_iters=40000)
    assert out["info"]["status"] == "optimal"
    # oracle via projected-gradient-free scipy SLSQP
    from scipy.optimize import minimize

    ref = minimize(lambda x: c @ x, np.maximum(a, 0), method="SLSQP",
                   jac=lambda x: c,
                   bounds=[(0, None)] * n,
                   constraints=[{"type": "ineq",
                                 "fun": lambda x: r**2 - np.sum((x - a) ** 2)}])
    assert ref.success
    assert abs(out["info"]["pobj"] - ref.fun) < 1e-4 * (1 + abs(ref.fun))


def test_infeasible_fixture_status():
    # x >= 1 and x <= 0 -> infeasible (nonneg rows)
    data = {
        "A": sp.csc_matrix(np.asarray([[-1.0], [1.0]])),
        "b": np.asarray([-1.0, 0.0]),
        "c": np.asarray([1.0]),
        "dims": {"l": 2},
    }
    out = solve_conic_data(data, eps=1e-6, verbose=0, max_iters=40000,
                           strict_certificates=True)
    assert out["info"]["status"] == "infeasible"


def test_register_with_cvxpy_requires_cvxpy():
    pytest.importorskip("cvxpy")  # not in this image: exercised when present
    from fos_tpu.interface.cvxpy_adapter import register_with_cvxpy

    name = register_with_cvxpy()
    import cvxpy as cp

    x = cp.Variable(3, nonneg=True)
    prob = cp.Problem(cp.Minimize(cp.sum_squares(x - np.array([1.0, -2.0, 3.0]))))
    prob.solve(solver=name)
    assert prob.status == "optimal"


def test_solve_conic_data_missing_dims_is_loud():
    """No dims anywhere -> TypeError naming the missing argument, not an
    opaque zero-cone failure downstream (ADVICE r2)."""
    data = {"A": sp.csc_matrix(np.ones((1, 1))), "b": np.ones(1),
            "c": np.ones(1)}
    with pytest.raises(TypeError, match="dims"):
        solve_conic_data(data)
