"""Parametric sweep with warm starts.

Tracing a family of related problems (here: an LP whose right-hand side
drifts along a path) is the bread-and-butter workload for first-order
solvers: each solution seeds the next solve via ``Solution.raw_z`` (the
reference's ``initx`` hook, solverwrapper.jl:10, composed across solves),
cutting iterations ~5x along the path (GAPA; plain DR gains much less
because its slow linear rate, not the initial distance, dominates).
"""


import numpy as np

from fos_tpu import GAPA, solve
from fos_tpu.cones import nonneg


def main(steps=5):
    rng = np.random.default_rng(0)
    m, n = 30, 45
    A = rng.standard_normal((m, n))
    x0 = np.abs(rng.standard_normal(n))
    b0 = A @ x0 + np.abs(rng.standard_normal(m))
    c = np.abs(rng.standard_normal(n))
    drift = np.abs(rng.standard_normal(m)) * 0.001

    cold_total = warm_total = 0
    z = None
    for k in range(steps):
        b = b0 + k * drift
        cold = solve(A, b, c, nonneg(m), nonneg(n), alg=GAPA(), eps=1e-7,
                     verbose=0, max_iters=60000)
        warm = solve(A, b, c, nonneg(m), nonneg(n), alg=GAPA(), eps=1e-7,
                     verbose=0, max_iters=60000, initx=z)
        z = warm.raw_z
        cold_total += cold.iters
        warm_total += warm.iters
        print(f"step {k}: cold {cold.iters:>5} iters, "
              f"warm {warm.iters:>5} iters, obj {warm.objval:+.5f} "
              f"({warm.status})")
    print(f"total: cold {cold_total}, warm {warm_total} "
          f"({cold_total / max(warm_total, 1):.1f}x fewer with warm starts)")


if __name__ == "__main__":
    main()
