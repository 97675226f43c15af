"""Nonnegative least squares — the reference README problem.

min ||Ax - b||^2  s.t.  x >= 0, solved two ways (the reference solves its
Youla example three ways in the same spirit, examples/youla.jl):

1. as a conic program through the HSDE (`fos_tpu.solve`);
2. as a feasibility problem over the KKT conditions.
"""

import os

import jax

# examples demonstrate f64 operating points -> CPU by default (the axon TPU
# plugin ignores JAX_PLATFORMS env; see .claude/skills/verify/SKILL.md)
jax.config.update("jax_platforms", os.environ.get("FOS_TPU_EXAMPLE_PLATFORM", "cpu"))

import numpy as np
import jax.numpy as jnp

from fos_tpu import DR, GAPA, solve, solve_feasibility, Feasibility
from fos_tpu.cones import zero, ConeSpec
from fos_tpu.cones.spec import Cone
from fos_tpu.sets import AffineSet, NonNeg


def conic_form(A, b):
    """min t s.t. (t, 1/2 slot, Ax - b) in rotated SOC, x >= 0."""
    m, n = A.shape
    nv = n + 2 + m
    Ac = np.zeros((m + 1, nv))
    bc = np.zeros(m + 1)
    Ac[:m, :n] = A
    Ac[:m, n + 2 :] = -np.eye(m)
    bc[:m] = b
    Ac[m, n + 1] = 1.0
    bc[m] = 0.5
    c = np.zeros(nv)
    c[n] = 1.0
    K1 = zero(m + 1)
    K2 = ConeSpec(((Cone.NONNEG, n), (Cone.SOC_ROTATED, 2 + m)))
    return Ac, bc, c, K1, K2


def main():
    rng = np.random.default_rng(2)
    m, n = 40, 50
    A = rng.standard_normal((m, n))
    b = rng.standard_normal(m)

    # way 1: conic / HSDE
    Ac, bc, c, K1, K2 = conic_form(A, b)
    sol = solve(Ac, bc, c, K1, K2, alg=DR(), eps=1e-8, max_iters=20000, verbose=1)
    x1 = np.asarray(sol.x[:n])
    obj1 = np.sum((A @ x1 - b) ** 2)
    print(f"conic/HSDE: status={sol.status} obj={obj1:.12f} iters={sol.iters}")

    # way 2: KKT feasibility — x >= 0, g = A'(Ax-b), g >= 0, x.g = 0
    # relaxed here to the variational characterization: find x in
    # {x : A'A x - A'b = g - proj...}; use the simpler projection splitting
    # on the KKT affine set {(x, g): A'Ax - g = A'b} ∩ {(x, g) >= 0, x'g=0}.
    # For demonstration use the polyhedral part only (complementarity via DR
    # iterations of the two convex sets):
    AtA = A.T @ A
    Atb = A.T @ b
    kkt = np.concatenate([AtA, -np.eye(n)], axis=1)  # A'A x - g = A'b
    S1 = AffineSet.create(kkt, Atb)
    S2 = NonNeg()
    sol2 = solve_feasibility(Feasibility(S1, S2, 2 * n), GAPA(), eps=1e-10,
                             max_iters=20000, verbose=0)
    xg = np.asarray(sol2.x)
    x2, g2 = xg[:n], xg[n:]
    print(f"KKT feasibility: status={sol2.status} "
          f"||A'Ax-g-A'b||={np.abs(AtA @ x2 - g2 - Atb).max():.2e} "
          f"min(x)={x2.min():.2e}")

    from scipy.optimize import nnls

    xs, rn = nnls(A, b)
    print(f"scipy nnls objective: {rn**2:.12f}")
    assert abs(obj1 - rn**2) / rn**2 < 1e-6
    return sol


if __name__ == "__main__":
    main()
