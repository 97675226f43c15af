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

from bench import _banded_bell_problem, diff_iters_per_s
from fos_tpu import DR
from fos_tpu.cones import nonneg
from fos_tpu.problems.conic import ConicProblem
from fos_tpu.problems.hsde import HSDEForm
from fos_tpu.solvers.engine import fused_solve


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
                def make_run(n, unroll=unroll):
                    return jax.jit(lambda f, x, eps: fused_solve(
                        alg, f, x, max_iters=n, eps=eps, checki=100,
                        unroll=unroll))

                ips = diff_iters_per_s(make_run, 300, form, x0, 0.0)
                # 2 mv+rmv table passes per iteration (~4 A-passes)
                gbps = ips * 2 * 2 * nnz * 4 / 1e9
                print(f"  {name} cgu={cg_unroll} unroll={unroll}: "
                      f"{ips:8.1f} iters/s (~{gbps:5.0f} GB/s tile traffic)",
                      flush=True)


if __name__ == "__main__":
    main()
