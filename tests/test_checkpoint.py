"""Checkpoint/resume, warm start, NaN guard, plotting tests."""

import numpy as np
import pytest
import jax.numpy as jnp

from fos_tpu import DR, GAPA, solve
from fos_tpu.cones import nonneg
from fos_tpu.problems.conic import conic_problem
from fos_tpu.problems.hsde import HSDEForm, populate_solution
from fos_tpu.solvers import engine
from fos_tpu.solvers.base import init_solver_state
from fos_tpu.solvers.status import Status
from fos_tpu.utils.checkpoint import load_state, save_state


def _lp(rng, m=20, n=30):
    A = rng.standard_normal((m, n))
    xmask = rng.random(n) < 0.5
    x0 = np.abs(rng.standard_normal(n)) * xmask
    r0 = np.abs(rng.standard_normal(n)) * (~xmask)
    ymask = rng.random(m) < 0.5
    y0 = np.abs(rng.standard_normal(m)) * ymask
    s0 = np.abs(rng.standard_normal(m)) * (~ymask)
    return A, A @ x0 + s0, r0 - A.T @ y0


def test_checkpoint_resume(rng, tmp_path):
    A, b, c = _lp(rng)
    m, n = A.shape
    prob = conic_problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         nonneg(m), nonneg(n))
    form = HSDEForm.build(prob)
    alg = GAPA()

    # run 300 iterations, checkpoint, resume, finish
    r1 = engine.run(form, alg, max_iters=300, eps=1e-9, checki=100, verbose=0)
    assert r1.status == Status.CONTINUE
    path = str(tmp_path / "ckpt.npz")
    save_state(path, r1.state)

    template = init_solver_state(alg, form.sets, form.initial_value(form.dtype))
    restored = load_state(path, template)
    np.testing.assert_array_equal(np.asarray(restored.x), np.asarray(r1.state.x))
    assert int(restored.i) == int(r1.state.i)
    # GAPA's adaptive a12 carry survives
    assert float(restored.aux) == float(r1.state.aux)

    r2 = engine.run(form, alg, resume_state=restored, max_iters=20000, eps=1e-8,
                    checki=100, verbose=0)
    assert r2.status == Status.OPTIMAL
    # resumed solve agrees with a straight-through solve
    r3 = engine.run(form, alg, max_iters=20000, eps=1e-8, checki=100, verbose=0)
    sol2 = populate_solution(form, r2.guess, r2.status, r2.iters)
    sol3 = populate_solution(form, r3.guess, r3.status, r3.iters)
    assert abs(sol2.objval - sol3.objval) <= 1e-5 * (1 + abs(sol3.objval))


def test_checkpoint_shape_mismatch(rng, tmp_path):
    A, b, c = _lp(rng)
    m, n = A.shape
    prob = conic_problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         nonneg(m), nonneg(n))
    form = HSDEForm.build(prob)
    alg = DR()
    st = init_solver_state(alg, form.sets, form.initial_value(form.dtype))
    path = str(tmp_path / "ckpt.npz")
    save_state(path, st)
    # wrong-size template
    A2, b2, c2 = _lp(rng, 10, 15)
    prob2 = conic_problem(jnp.asarray(A2), jnp.asarray(b2), jnp.asarray(c2),
                          nonneg(10), nonneg(15))
    form2 = HSDEForm.build(prob2)
    st2 = init_solver_state(alg, form2.sets, form2.initial_value(form2.dtype))
    with pytest.raises(ValueError, match="shape"):
        load_state(path, st2)


def test_initx_warm_start(rng):
    A, b, c = _lp(rng)
    m, n = A.shape
    sol1 = solve(A, b, c, nonneg(m), nonneg(n), alg=DR(), eps=1e-8,
                 max_iters=20000, verbose=0)
    assert sol1.status == "Optimal"
    # warm start from the final raw iterate: converges at the first check
    prob = conic_problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         nonneg(m), nonneg(n))
    form = HSDEForm.build(prob)
    r = engine.run(form, DR(), max_iters=20000, eps=1e-8, checki=100, verbose=0)
    r2 = engine.run(form, DR(), initx=r.state.x, max_iters=20000, eps=1e-8,
                    checki=100, verbose=0)
    assert r2.status == Status.OPTIMAL
    # NOTE: not instant — the decreasing-accuracy CG schedule restarts loose
    # (tol 0.2 at call 1, matching the reference's fresh S.i=1), so the
    # iterate drifts before re-converging.  Still faster than cold start.
    assert r2.iters <= r.iters


def test_check_finite_guard(rng):
    A, b, c = _lp(rng)
    m, n = A.shape
    # poison b with NaN -> residuals go NaN -> guard raises
    b = b.copy()
    b[0] = np.nan
    prob = conic_problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         nonneg(m), nonneg(n))
    form = HSDEForm.build(prob)
    with pytest.raises(FloatingPointError, match="non-finite"):
        engine.run(form, DR(), max_iters=300, eps=1e-8, checki=100, verbose=0,
                   check_finite=True)


def test_plothistory(rng):
    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")
    A, b, c = _lp(rng)
    m, n = A.shape
    sol = solve(A, b, c, nonneg(m), nonneg(n), alg=DR(), eps=1e-6,
                max_iters=2000, verbose=0)
    from fos_tpu.utils.plotting import plothistory

    ax = plothistory(sol.history, "p")
    assert ax.get_ylabel() == "p"
