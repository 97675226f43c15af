"""Ruiz equilibration tests: badly scaled problems converge with
equilibrate=True and recover the ORIGINAL problem's solution."""

import numpy as np
import pytest
from scipy.optimize import linprog

from fos_tpu import DR, solve
from fos_tpu.cones import nonneg, soc, zero, ConeSpec
from fos_tpu.cones.spec import Cone
from fos_tpu.problems.scaling import ruiz_equilibrate


def _badly_scaled_lp(rng, m=15, n=25):
    A = rng.standard_normal((m, n))
    # wreck the scaling: rows/cols spanning 1e-3 .. 1e3
    rs = 10.0 ** rng.uniform(-3, 3, m)
    cs = 10.0 ** rng.uniform(-3, 3, n)
    A = A * rs[:, None] * cs[None, :]
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b = A @ x0 + np.abs(rng.standard_normal(m)) * rs + 0.1 * rs
    c = (np.abs(rng.standard_normal(n)) + 0.1) * cs
    return A, b, c


def test_ruiz_normalizes(rng):
    A, b, c = _badly_scaled_lp(rng)
    As, bs, cs, d, e = ruiz_equilibrate(A, b, c, nonneg(15), nonneg(25))
    row = np.abs(As).max(axis=1)
    col = np.abs(As).max(axis=0)
    assert row.max() / row.min() < 10
    assert col.max() / col.min() < 10
    np.testing.assert_allclose(As, (A * d[:, None]) * e[None, :], rtol=1e-12)


def test_ruiz_block_constant_soc(rng):
    m = 12
    K1 = ConeSpec(((Cone.ZERO, 4), (Cone.SOC, 8)))
    A, b, c = _badly_scaled_lp(rng, m, 10)
    As, bs, cs, d, e = ruiz_equilibrate(A, b, c, K1, nonneg(10))
    # SOC rows share one scale
    assert np.allclose(d[4:], d[4])


@pytest.mark.parametrize("seed", range(3))
def test_equilibrated_solve_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    A, b, c = _badly_scaled_lp(rng)
    ref = linprog(c, A_ub=A, b_ub=b, bounds=(0, None), method="highs")
    assert ref.status == 0
    sol = solve(A, b, c, nonneg(15), nonneg(25), alg=DR(), eps=1e-7,
                max_iters=40000, verbose=0, equilibrate=True)
    assert sol.status == "Optimal"
    x = np.asarray(sol.x)
    # solution is for the ORIGINAL problem
    assert abs(float(c @ x) - ref.fun) <= 1e-4 * (1 + abs(ref.fun))
    assert x.min() > -1e-6
    assert ((A @ x - b) / (1 + np.abs(b))).max() < 1e-4


def test_refine_with_equilibrate_seeds_scaled_coordinates():
    """refine= continues from the f32 iterate, which lives in the
    Ruiz-SCALED space; the f64 rebuild must re-equilibrate so the warm
    start lands in the same coordinates (ADVICE r2: previously the f64
    form was built unscaled and the sweep could stall/regress)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    A, b, c = _badly_scaled_lp(rng)
    ref = linprog(c, A_ub=A, b_ub=b, bounds=(0, None), method="highs")
    assert ref.status == 0
    base = solve(A, b, c, nonneg(15), nonneg(25), alg=DR(), eps=1e-6,
                 max_iters=60000, verbose=0, equilibrate=True,
                 dtype=jnp.float32)
    assert base.status == "Optimal"
    sol = solve(A, b, c, nonneg(15), nonneg(25), alg=DR(), eps=1e-6,
                max_iters=60000, verbose=0, equilibrate=True,
                dtype=jnp.float32, refine=30000,
                refine_kwargs={"eps": 1e-9})
    assert sol.status == "Optimal"
    err_base = abs(float(np.asarray(base.x) @ c) - ref.fun)
    err_ref = abs(float(np.asarray(sol.x) @ c) - ref.fun)
    # a correctly seeded f64 sweep tightens the objective, never regresses
    # (measured: 1.6e-5 -> 1.6e-6 relative; wrong-coordinate seeding stalls)
    assert err_ref <= err_base * 0.5
    assert err_ref <= 5e-6 * (1 + abs(ref.fun))


def test_equilibrate_iters_forwarded(rng):
    """equilibrate_iters= must reach the Ruiz loop (was silently dropped)."""
    A, b, c = _badly_scaled_lp(rng)
    sol = solve(A, b, c, nonneg(15), nonneg(25), alg=DR(), eps=1e-6,
                max_iters=20000, verbose=0, equilibrate=True,
                equilibrate_iters=2)
    assert sol.status == "Optimal"


def test_equilibration_helps(rng):
    # same budget, equilibrated run reaches a (much) better residual
    A, b, c = _badly_scaled_lp(rng)
    plain = solve(A, b, c, nonneg(15), nonneg(25), alg=DR(), eps=1e-9,
                  max_iters=3000, verbose=0)
    equil = solve(A, b, c, nonneg(15), nonneg(25), alg=DR(), eps=1e-9,
                  max_iters=3000, verbose=0, equilibrate=True)
    _, p_plain = plain.history.get("p")
    _, p_eq = equil.history.get("p")
    assert p_eq[-1] <= p_plain[-1]
