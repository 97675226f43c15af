import os
os.environ["FOS_TPU_X64"] = "1"
import numpy as np, time
import jax, jax.numpy as jnp
from fos_tpu import DR
from fos_tpu.cones import nonneg
from fos_tpu.problems.conic import conic_problem
from fos_tpu.problems.hsde import HSDEForm
from fos_tpu.solvers.engine import fused_solve

for mn in (1000, 4000):
    key = jax.random.PRNGKey(11)
    k1, k2, k3, _ = jax.random.split(key, 4)
    A = jax.random.normal(k1, (mn, mn), jnp.float32) / float(np.sqrt(mn))
    b = A @ jnp.abs(jax.random.normal(k2, (mn,), jnp.float32))
    c = jnp.abs(jax.random.normal(k3, (mn,), jnp.float32))
    for name, Ax in (("f32", A), ("bf16", A.astype(jnp.bfloat16))):
        prob = conic_problem(Ax, b, c, nonneg(mn), nonneg(mn))
        form = HSDEForm.build(prob)
        iters = 1000 if mn == 1000 else 300
        run = jax.jit(lambda f, x: fused_solve(DR(), f, x, max_iters=iters, eps=0.0,
                                               checki=100, unroll=8 if mn==1000 else 4))
        x0 = form.initial_value(jnp.float32)
        r = run(form, x0); float(jnp.sum(r.guess))
        t0 = time.perf_counter()
        r = run(form, x0); float(jnp.sum(r.guess))
        print(mn, name, "iters/s", round(iters/(time.perf_counter()-t0), 1), flush=True)
