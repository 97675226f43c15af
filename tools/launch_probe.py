#!/usr/bin/env python
"""Differential-timing probe: per-iteration cost of pallas / XLA ops on the
axon TPU with the tunnel RTT cancelled out.

Round-4 findings this probe exists to pin down:
* the tunnel RTT grew to ~28 ms (round 2: 0.5-1.4 ms), so any total/reps
  timing with reps<=400 inflates per-op cost by RTT/reps — this probe
  times chains at R and 2R reps and reports (T(2R)-T(R))/R, cancelling
  every fixed cost exactly;
* big operands must be passed as jit ARGUMENTS: closures embed them as
  HLO constants and the axon remote-compile endpoint rejects the request
  body (HTTP 413).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def time_chain_diff(fn, operand, x0, reps=200):
    """fn(operand, x) -> x'.  Returns (per-iter s, implied fixed s)."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(op, x, n):
        return jax.lax.fori_loop(0, n, lambda _, x: fn(op, x), x)

    float(jnp.sum(loop(operand, x0, reps)))     # compile + warm
    float(jnp.sum(loop(operand, x0, 2 * reps)))
    t1 = time.perf_counter()
    float(jnp.sum(loop(operand, x0, reps)))
    t2 = time.perf_counter()
    float(jnp.sum(loop(operand, x0, 2 * reps)))
    t3 = time.perf_counter()
    T1, T2 = t2 - t1, t3 - t2
    per_iter = (T2 - T1) / reps
    fixed = T1 - reps * per_iter
    return max(per_iter, 1e-12), fixed


def main():
    x = jnp.ones((8, 128), jnp.float32)

    dt, rtt = time_chain_diff(lambda _, x: x * 1.0000001, (), x)
    print(f"XLA tiny mul:              {dt*1e6:8.2f} us/iter (fixed {rtt*1e3:.1f} ms)",
          flush=True)

    def k(x_ref, y_ref):
        y_ref[...] = x_ref[...] * 1.0000001

    def tiny(_, x):
        return pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)

    dt, rtt = time_chain_diff(tiny, (), x)
    print(f"pallas tiny (grid=1):      {dt*1e6:8.2f} us/iter (fixed {rtt*1e3:.1f} ms)",
          flush=True)

    def k3(s_ref, x_ref, y_ref):
        y_ref[...] = x_ref[...] * 1.0000001

    sp = jnp.zeros((8,), jnp.int32)

    def pref(sp, x):
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(1,),
            in_specs=[pl.BlockSpec((8, 128), lambda i, s: (i * 0, i * 0))],
            out_specs=pl.BlockSpec((8, 128), lambda i, s: (i * 0, i * 0)))
        return pl.pallas_call(
            k3, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(sp, x)

    dt, rtt = time_chain_diff(pref, sp, x)
    print(f"pallas tiny (prefetch):    {dt*1e6:8.2f} us/iter (fixed {rtt*1e3:.1f} ms)",
          flush=True)

    for m in (4096, 8192):
        A = jax.random.normal(jax.random.PRNGKey(0), (m, m), jnp.float32)
        dt, rtt = time_chain_diff(lambda A, x: (A @ x) * 1e-3 + 1.0,
                                  A, jnp.ones(m), reps=100)
        print(f"XLA {m}^2 matvec:        {dt*1e6:8.2f} us/iter "
              f"({4*m*m/dt/1e9:6.1f} GB/s, fixed {rtt*1e3:.1f} ms)", flush=True)

    from fos_tpu.linalg.sparse_ell import BandedBlockOp, BlockedEllOp
    for nrb in (64, 256):
        key = jax.random.PRNGKey(1)
        blocks = jax.random.normal(key, (nrb, 3, 128, 128), jnp.float32) * 1e-2
        cs = jnp.asarray(np.clip(np.arange(nrb) - 1, 0, nrb - 3), jnp.int32)
        op = BandedBlockOp(blocks, cs, blocks, cs, nrb * 128, nrb * 128,
                           interpret=False)
        x0 = jnp.ones((nrb * 128,), jnp.float32)
        dt, rtt = time_chain_diff(lambda op, x: op.mv(x) * 1e-30 + 1.0, op, x0)
        mb = blocks.size * 4 / 2**20
        print(f"band mv nrb={nrb:4d} ({mb:6.1f} MiB): {dt*1e6:8.2f} us/iter "
              f"({blocks.size*4/dt/1e9:6.1f} GB/s, fixed {rtt*1e3:.1f} ms)",
              flush=True)

        i = np.arange(nrb)
        cols = jnp.asarray(
            np.stack([np.maximum(i - 1, 0), i, np.minimum(i + 1, nrb - 1)], 1),
            jnp.int32)
        ell = BlockedEllOp(blocks, cols, blocks, cols, nrb * 128, nrb * 128,
                           interpret=False)
        dt, rtt = time_chain_diff(lambda op, x: op.mv(x) * 1e-30 + 1.0, ell, x0)
        print(f"ell  mv nrb={nrb:4d} ({mb:6.1f} MiB): {dt*1e6:8.2f} us/iter "
              f"({blocks.size*4/dt/1e9:6.1f} GB/s, fixed {rtt*1e3:.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
