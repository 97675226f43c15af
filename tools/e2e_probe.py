#!/usr/bin/env python
"""Differential e2e throughput of the 1e7-nnz LP (band vs ELL, unroll
sweep) on real TPU — the VERDICT r2/r3 >=2.5k iters/s target, now measured
with the tunnel RTT cancelled ((T(2N)-T(N))/N)."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["FOS_TPU_X64"] = "1"

import jax
import jax.numpy as jnp

from bench import _banded_bell_problem
from fos_tpu import DR
from fos_tpu.cones import nonneg
from fos_tpu.problems.conic import ConicProblem
from fos_tpu.problems.hsde import HSDEForm
from fos_tpu.solvers.engine import fused_solve


def diff_time(run, form, x0, iters=300):
    float(jnp.sum(run(form, x0, iters).guess))       # compile + warm
    float(jnp.sum(run(form, x0, 2 * iters).guess))
    t0 = time.perf_counter()
    float(jnp.sum(run(form, x0, iters).guess))
    t1 = time.perf_counter()
    float(jnp.sum(run(form, x0, 2 * iters).guess))
    t2 = time.perf_counter()
    per = ((t2 - t1) - (t1 - t0)) / iters
    return 1.0 / per


def main():
    alg = DR()
    op, op_band, bsp, csp, opt_sp, nnz = _banded_bell_problem()
    print(f"nnz={nnz:,}; device {jax.devices()[0]}", flush=True)
    for name, o in (("ell ", op), ("band", op_band)):
        prob = ConicProblem(o, bsp, csp, nonneg(o.m), nonneg(o.n))
        for cg_unroll in (2, 4):
            form = HSDEForm.build(prob, densify=False, cg_unroll=cg_unroll)
            x0 = form.initial_value(form.dtype)
            for unroll in (8, 16):
                @functools.partial(jax.jit, static_argnames=("n",))
                def run(f, x, n, unroll=unroll):
                    return fused_solve(alg, f, x, max_iters=n, eps=0.0,
                                       checki=100, unroll=unroll)

                ips = diff_time(run, form, x0)
                # 2 mv+rmv table passes per iteration (~4 A-passes)
                gbps = ips * 2 * 2 * nnz * 4 / 1e9
                print(f"  {name} cgu={cg_unroll} unroll={unroll}: "
                      f"{ips:8.1f} iters/s (~{gbps:5.0f} GB/s tile traffic)",
                      flush=True)


if __name__ == "__main__":
    main()
