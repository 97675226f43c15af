"""BlockSet, SCS-style interface, dtype option."""

import numpy as np
import pytest
import jax.numpy as jnp

from fos_tpu import DR, Feasibility, solve, solve_feasibility
from fos_tpu.cones import nonneg
from fos_tpu.interface.conic import solve_scs
from fos_tpu.sets import AffineSet, Ball, BlockSet, Box, NonNeg, Point


def test_blockset_projection(rng):
    s = BlockSet([(NonNeg(), 4), (Ball(1.0), 3), (Point(np.zeros(2)), 2)])
    assert s.dim == 9
    x = jnp.asarray(rng.standard_normal(9) * 2)
    y, st = s.project(x, s.init_state(x.dtype))
    y = np.asarray(y)
    np.testing.assert_allclose(y[:4], np.maximum(np.asarray(x[:4]), 0))
    assert np.linalg.norm(y[4:7]) <= 1 + 1e-12
    np.testing.assert_allclose(y[7:], 0)


def test_blockset_feasibility(rng):
    # find z = (x, y) with A x = b, x >= 0, ||y|| <= 0.5  (y coupled via rows)
    m, n = 10, 20
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n))
    b = A @ x0
    Afull = np.concatenate([A, np.zeros((m, 5))], axis=1)
    S1 = AffineSet.create(Afull, b)
    S2 = BlockSet([(NonNeg(), n), (Ball(0.5), 5)])
    sol = solve_feasibility(Feasibility(S1, S2, n + 5), DR(), eps=1e-10,
                            verbose=0)
    assert sol.status == "Optimal"
    z = np.asarray(sol.x)
    assert np.abs(A @ z[:n] - b).max() < 1e-8
    assert z[:n].min() > -1e-10
    assert np.linalg.norm(z[n:]) <= 0.5 + 1e-10


def test_solve_scs_lp():
    # min -x1 - x2 s.t. x1 + x2 <= 1, x >= 0 (as SCS data: all rows in cones)
    # rows: [zero: none][l: 1 + x >= 0 rows]
    A = np.array([
        [1.0, 1.0],    # 1 - (x1+x2) >= 0
        [-1.0, 0.0],   # x1 >= 0
        [0.0, -1.0],   # x2 >= 0
    ])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([-1.0, -1.0])
    sol = solve_scs(dict(A=A, b=b, c=c), dict(l=3), alg=DR(), eps=1e-9,
                    max_iters=20000, verbose=0)
    assert sol.status == "Optimal"
    assert abs(sol.objval - (-1.0)) < 1e-6


def test_solve_scs_soc():
    # min x1 s.t. ||(x1, x2)|| <= 1... rows: (1, x1, x2)... simplest:
    # min c'x with (b - Ax) in SOC(3): s = (1, x1, x2) -> ||x|| <= 1
    A = np.array([
        [0.0, 0.0],
        [-1.0, 0.0],
        [0.0, -1.0],
    ])
    b = np.array([1.0, 0.0, 0.0])
    c = np.array([1.0, 0.0])
    sol = solve_scs(dict(A=A, b=b, c=c), dict(q=[3]), alg=DR(), eps=1e-9,
                    max_iters=20000, verbose=0)
    assert sol.status == "Optimal"
    assert abs(float(sol.x[0]) - (-1.0)) < 1e-6


def test_solve_scs_validation():
    A = np.zeros((4, 2))
    with pytest.raises(ValueError, match="cover"):
        solve_scs(dict(A=A, b=np.zeros(4), c=np.zeros(2)), dict(l=3))


def test_dtype_option(rng):
    m, n = 10, 16
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n)) + 0.1
    b = A @ x0 + np.abs(rng.standard_normal(m)) + 0.1
    c = np.abs(rng.standard_normal(n)) + 0.1
    sol = solve(A, b, c, nonneg(m), nonneg(n), alg=DR(), dtype=jnp.float32,
                eps=1e-4, max_iters=10000, verbose=0)
    assert sol.x.dtype == jnp.float32
    assert sol.status == "Optimal"


def test_warm_start_across_solves(rng):
    # Solution.raw_z seeds a perturbed re-solve (parametric sweeps): the
    # warm-started run must converge in strictly fewer iterations.
    import jax.numpy as jnp
    from fos_tpu import DR, solve
    from fos_tpu.cones import nonneg

    m, n = 30, 45
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n))
    b = A @ x0 + np.abs(rng.standard_normal(m))
    c = np.abs(rng.standard_normal(n))
    sol1 = solve(A, b, c, nonneg(m), nonneg(n), alg=DR(), eps=1e-8, verbose=0,
                 max_iters=60000)
    assert sol1.status == "Optimal" and sol1.raw_z is not None
    b2 = b * (1 + 1e-3)
    cold = solve(A, b2, c, nonneg(m), nonneg(n), alg=DR(), eps=1e-8, verbose=0,
                 max_iters=60000)
    warm = solve(A, b2, c, nonneg(m), nonneg(n), alg=DR(), eps=1e-8, verbose=0,
                 max_iters=60000, initx=sol1.raw_z)
    assert warm.status == "Optimal"
    assert warm.iters < cold.iters
    assert abs(warm.objval - cold.objval) < 1e-5 * (1 + abs(cold.objval))

    # warm_start= sugar is exactly initx=prev.raw_z
    warm2 = solve(A, b2, c, nonneg(m), nonneg(n), alg=DR(), eps=1e-8, verbose=0,
                  max_iters=60000, warm_start=sol1)
    assert warm2.status == "Optimal" and warm2.iters == warm.iters

    import pytest
    with pytest.raises(ValueError, match="not both"):
        solve(A, b2, c, nonneg(m), nonneg(n), alg=DR(), verbose=0,
              warm_start=sol1, initx=sol1.raw_z)
    with pytest.raises(ValueError, match="raw_z"):
        solve(A, b2, c, nonneg(m), nonneg(n), alg=DR(), verbose=0,
              warm_start=sol1._replace(raw_z=None))
