import os
os.environ["FOS_TPU_X64"] = "1"
import numpy as np, time
import jax, jax.numpy as jnp
import bench as B
from fos_tpu import DR, GAPA, AndersonWrapper
from fos_tpu.problems.conic import ConicProblem
from fos_tpu.problems.hsde import HSDEForm
from fos_tpu.solvers.engine import fused_solve
from fos_tpu.cones import nonneg

op, b, c, opt, nnz = B._banded_bell_problem()
prob = ConicProblem(op, b, c, nonneg(op.m), nonneg(op.n))
form = HSDEForm.build(prob, densify=False)
x0 = form.initial_value(form.dtype)
l = op.m + op.n + 1
for name, alg in (("DR", DR()), ("GAPA", GAPA(0.8, 0.9)), ("DR+AA", AndersonWrapper(alg=DR()))):
    run = jax.jit(lambda f, x, a=alg: fused_solve(a, f, x, max_iters=30000, eps=1e-5, checki=100, unroll=4))
    t0 = time.perf_counter()
    r = run(form, x0)
    obj = float(jnp.vdot(c, r.guess[:op.n] / r.guess[l-1]))
    print(name, "status", int(r.status), "iters", int(r.iters),
          "obj", round(obj, 4), "cert", round(opt, 4), f"{time.perf_counter()-t0:.0f}s", flush=True)
