#!/usr/bin/env python
"""SpMV kernel probe: blocked-ELL vs banded-block layouts on real TPU.

Run when the TPU tunnel is up to localize the SpMV bandwidth limiter
(VERDICT r2 item 1: 248 GB/s vs ~800 GB/s HBM peak, diagnosed as the
per-tile x gather).  Prints effective GB/s (stored tile bytes / matvec
time) for:

* ``ell``  — BlockedEllOp (per-tile x row gather),
* ``band`` — BandedBlockOp (one contiguous (S, bn) x slice per row block),
* ``dense``— XLA dense matvec on the same shape (bandwidth reference),

on block-tridiagonal matrices at several sizes.  Timing rule for the axon
tunnel: run the matvec inside ONE jit'd fori_loop (per-op dispatch costs
0.5-1.4 ms RTT) and synchronize by fetching a scalar.

Usage:  python tools/spmv_probe.py [nrb ...]      (default 64 128 256)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


@jax.tree_util.register_pytree_node_class
class _DenseOp:
    """Dense bandwidth reference, pytree so it passes as a jit argument."""

    def __init__(self, A):
        self.A = A

    def tree_flatten(self):
        return (self.A,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0])

    def mv(self, x):
        return self.A @ x


def _tridiag_ops(nrb, bs=128, seed=7):
    from fos_tpu.config import is_tpu_backend
    from fos_tpu.linalg.sparse_ell import (BandedBlockOp, BlockedEllOp,
                                           tridiag_band_layout)

    interp = not is_tpu_backend()
    key = jax.random.PRNGKey(seed)
    kl, kd, ku = jax.random.split(key, 3)
    scale = float(1.0 / np.sqrt(3 * bs))
    low = jax.random.normal(kl, (nrb, bs, bs), jnp.float32) * scale
    diag = jax.random.normal(kd, (nrb, bs, bs), jnp.float32) * scale
    up = jax.random.normal(ku, (nrb, bs, bs), jnp.float32) * scale
    low = low.at[0].set(0.0)
    up = up.at[-1].set(0.0)
    blocks = jnp.stack([low, diag, up], axis=1)
    i = np.arange(nrb)
    cols = np.stack([np.maximum(i - 1, 0), i, np.minimum(i + 1, nrb - 1)], 1)
    m = n = nrb * bs
    ell = BlockedEllOp(blocks, jnp.asarray(cols, jnp.int32),
                       blocks, jnp.asarray(cols, jnp.int32), m, n,
                       interpret=interp)  # symmetric-shape probe: reuse tiles

    blocks_band, cs = tridiag_band_layout(blocks)
    band = BandedBlockOp(blocks_band, cs, blocks_band, cs, m, n,
                         interpret=interp)
    tile_bytes = int(blocks.size) * 4
    return ell, band, tile_bytes, m, n


def _time_mv(op, n, iters=200):
    # op is passed as a jit ARGUMENT (ops are pytrees): closing over the
    # tile arrays embeds them as HLO constants, and the axon remote-compile
    # endpoint rejects large request bodies (HTTP 413).
    # DIFFERENTIAL timing: the tunnel's fetch cost reached ~28 ms round 4,
    # so total/iters inflates per-op cost by RTT/iters; timing the chain at
    # N and 2N reps and differencing cancels every fixed cost exactly.
    import functools

    x0 = jnp.ones((n,), jnp.float32)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def loop(op, x, reps):
        def body(_, x):
            y = op.mv(x)
            return y / (jnp.linalg.norm(y) + 1.0)  # data dependence

        return jax.lax.fori_loop(0, reps, body, x)

    float(jnp.sum(loop(op, x0, iters)))  # compile + warm
    float(jnp.sum(loop(op, x0, 2 * iters)))
    t0 = time.perf_counter()
    float(jnp.sum(loop(op, x0, iters)))
    t1 = time.perf_counter()
    float(jnp.sum(loop(op, x0, 2 * iters)))
    t2 = time.perf_counter()
    return max(((t2 - t1) - (t1 - t0)) / iters, 1e-12)


def main(sizes):
    print(f"backend: {jax.devices()[0]}")
    for nrb in sizes:
        ell, band, tile_bytes, m, n = _tridiag_ops(nrb)
        dt_e = _time_mv(ell, n)
        dt_b = _time_mv(band, n)
        A = jax.random.normal(jax.random.PRNGKey(1), (m, n), jnp.float32) \
            if m <= 16384 else None
        line = (f"nrb={nrb:4d} ({m}x{n}, {tile_bytes/2**20:.0f} MiB tiles): "
                f"ell {tile_bytes/dt_e/1e9:7.1f} GB/s  "
                f"band {tile_bytes/dt_b/1e9:7.1f} GB/s")
        if A is not None:
            dt_d = _time_mv(_DenseOp(A), n)
            line += f"  dense({4*m*n/2**20:.0f} MiB) {4*m*n/dt_d/1e9:7.1f} GB/s"
        print(line)


if __name__ == "__main__":
    main([int(a) for a in sys.argv[1:]] or [64, 128, 256])
