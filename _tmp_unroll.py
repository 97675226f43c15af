import os
os.environ["FOS_TPU_X64"] = "1"
import numpy as np, time
import jax, jax.numpy as jnp
import bench as B
from fos_tpu import DR, solve
from fos_tpu.cones import nonneg

A, b, c, opt = B.make_problem(np.float64)
for u in (1, 4):
    t0 = time.time()
    sol = solve(A, b, c, nonneg(B.M), nonneg(B.N), alg=DR(), eps=1e-5, verbose=0,
                dtype=jnp.float32, unroll=u)
    t1 = time.time() - t0
    # second run: jit cached
    t0 = time.time()
    sol = solve(A, b, c, nonneg(B.M), nonneg(B.N), alg=DR(), eps=1e-5, verbose=0,
                dtype=jnp.float32, unroll=u)
    print("unroll", u, sol.status, sol.iters, f"warm {time.time()-t0:.2f}s (cold {t1:.2f}s)", flush=True)
