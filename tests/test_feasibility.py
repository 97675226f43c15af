"""Feasibility-form tests mirroring /root/reference/test/testfeasibility.jl.

Affine(50x100) ∩ nonneg orthant, consistent by construction: DR at eps=1e-8
reaches machine-level feasibility; AP/GAP/FISTA stay :Indeterminate at
default iteration budgets; GAPP and GAPA reach :Optimal with 1e-6 residual.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fos_tpu import AP, DR, FISTA, GAP, GAPA, GAPP
from fos_tpu.interface.api import solve_feasibility
from fos_tpu.problems.feasibility import Feasibility
from fos_tpu.sets import AffineSet, Box, NonNeg


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(2)
    # b = A @ |xsol| guarantees a strictly feasible point (the reference's
    # b = A*randn(100) happens to be feasible only for its Julia seed)
    xsol = np.abs(rng.standard_normal(100))
    A = rng.standard_normal((50, 100))
    b = A @ xsol
    S1 = AffineSet.create(A, b)
    S2 = NonNeg()
    return Feasibility(S1, S2, 100), np.asarray(A), np.asarray(b)


def test_dr_feasibility(problem):
    prob, A, b = problem
    sol = solve_feasibility(prob, DR(eps=1e-8, verbose=0), checki=10)
    assert sol.status == "Optimal"
    x = np.asarray(sol.x)
    assert x.min() > -1e-12
    assert np.max(np.abs(A @ x - b)) < 1e-12


def test_ap_converges(problem):
    prob, A, b = problem
    sol = solve_feasibility(prob, AP(eps=1e-8, verbose=0), checki=1)
    assert sol.status in ("Optimal", "Indeterminate")


@pytest.mark.parametrize("alg", [
    AP(eps=1e-14, verbose=0),
    GAP(options=(("eps", 1e-14), ("verbose", 0))),
    FISTA(options=(("eps", 1e-14), ("verbose", 0))),
])
def test_unconverged_is_indeterminate(problem, alg):
    # :Continue -> :Indeterminate at populate time (reference expectation for
    # AP/GAP/FISTA on this problem, testfeasibility.jl:21-31)
    prob, A, b = problem
    sol = solve_feasibility(prob, alg, max_iters=20, checki=10)
    assert sol.status == "Indeterminate"


@pytest.mark.parametrize("alg", [
    GAPP(options=(("eps", 1e-8), ("verbose", 0))),
    GAPA(options=(("eps", 1e-8), ("verbose", 0))),
])
def test_fast_algs_optimal(problem, alg):
    prob, A, b = problem
    sol = solve_feasibility(prob, alg)
    assert sol.status == "Optimal"
    x = np.asarray(sol.x)
    assert x.min() > -1e-12
    assert np.max(np.abs(A @ x - b)) < 1e-6


def test_solve_kwargs_override(problem):
    # solve kwargs override alg options (Feasibility.jl:33-36)
    prob, A, b = problem
    sol = solve_feasibility(prob, DR(eps=1e-1, verbose=0), eps=1e-8, checki=10)
    x = np.asarray(sol.x)
    assert np.max(np.abs(A @ x - b)) < 1e-12


def test_sets_library(rng):
    from fos_tpu.sets import Ball, Halfspace, Point

    x = jnp.asarray(rng.standard_normal(10))
    y, _ = Point(np.zeros(10)).project(x, ())
    np.testing.assert_allclose(np.asarray(y), 0.0)
    a = rng.standard_normal(10)
    hs = Halfspace(a, 1.0)
    y, _ = hs.project(x, ())
    assert float(jnp.vdot(jnp.asarray(a), y)) <= 1.0 + 1e-12
    ball = Ball(0.5)
    y, _ = ball.project(x, ())
    assert float(jnp.linalg.norm(y)) <= 0.5 + 1e-12
    box = Box(-0.1, 0.2)
    y, _ = box.project(x, ())
    assert float(y.min()) >= -0.1 and float(y.max()) <= 0.2


def test_fused_feasibility(problem):
    # the fused on-device engine is form-generic: feasibility works too
    from fos_tpu.problems.feasibility import FeasibilityForm
    from fos_tpu.solvers.engine import fused_solve
    from fos_tpu.solvers.status import Status

    prob, A, b = problem
    form = FeasibilityForm.build(prob)
    res = fused_solve(DR(), form, form.initial_value(form.dtype),
                      max_iters=10000, eps=1e-8, checki=100)
    assert int(res.status) == Status.OPTIMAL
    x = np.asarray(res.guess)
    assert x.min() > -1e-10
    assert np.max(np.abs(A @ x - b)) < 1e-6


def test_logextra_snapshots():
    # logextra parity (FeasibilityStatus.jl:19-25 + gap.jl:44-49): at every
    # check iteration, history's "extra" holds the S1-stage triple
    # (x, P_S1 x, relaxed) of that iteration; the relaxed entry must equal
    # a1*P_S1(x) + (1-a1)*x.
    rng = np.random.default_rng(7)
    xsol = np.abs(rng.standard_normal(40))
    A = rng.standard_normal((20, 40))
    b = A @ xsol
    S1 = AffineSet.create(A, b)
    prob = Feasibility(S1, NonNeg(), 40)
    alg = GAP(0.8, 1.8, 1.8)
    sol = solve_feasibility(prob, alg, eps=1e-12, verbose=0, max_iters=500,
                            checki=100, debug=1)
    iters, extras = sol.history.get("extra")
    assert len(extras) >= 1
    x, y, relaxed = extras[0]
    # y is the affine projection of x; relaxed = 1.8*y - 0.8*x
    np.testing.assert_allclose(A @ y, b, atol=1e-8)
    np.testing.assert_allclose(relaxed, 1.8 * y - 0.8 * x, atol=1e-10)
