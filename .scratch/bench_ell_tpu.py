import sys; sys.path.insert(0, "/root/repo")
import os, sys, time
os.environ["FOS_TPU_X64"] = "1"
import numpy as np
import jax, jax.numpy as jnp
print("devices:", jax.devices(), file=sys.stderr)
import scipy.sparse as sp
from fos_tpu.linalg.sparse_ell import BlockedEllOp

# block-banded like the bench: 3 occupied 128-tiles per block row
bs = 128
nrb = 256            # m = n = 32768, nnz ~ 3*256*128*128 = 12.6M stored
m = n = nrb * bs
rng = np.random.default_rng(0)
rows_l, cols_l, vals_l = [], [], []
for i in range(nrb):
    for dj in (-1, 0, 1):
        j = i + dj
        if 0 <= j < nrb:
            r, c = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
            rows_l.append((i*bs + r).ravel()); cols_l.append((j*bs + c).ravel())
            vals_l.append(rng.standard_normal(bs*bs) / np.sqrt(3*bs))
rows = np.concatenate(rows_l); cols = np.concatenate(cols_l)
vals = np.concatenate(vals_l).astype(np.float32)
S = sp.coo_matrix((vals, (rows, cols)), shape=(m, n)).tocsr()
op = BlockedEllOp.create(S, interpret=False)
print("blocks shape:", op.blocks.shape, "occupancy:", op.occupancy(), file=sys.stderr)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

@jax.jit
def loop_mv(x, iters):
    def body(k, v):
        y = op.mv(v)
        return y / (jnp.linalg.norm(y) + 1.0)
    return jax.lax.fori_loop(0, iters, body, x)

y1 = op.mv(x)
err = np.abs(np.asarray(y1) - S @ np.asarray(x)).max()
print("correctness max err:", err)
assert err < 1e-4 * (1 + np.abs(S @ np.asarray(x)).max()), err

ITERS = 200
r = loop_mv(x, ITERS); float(jnp.sum(r))  # compile+warm
t0 = time.perf_counter(); r = loop_mv(x, ITERS); s = float(jnp.sum(r))
dt = time.perf_counter() - t0
bytes_per_mv = op.blocks.size * 4 + (m + n) * 4
gbs = bytes_per_mv * ITERS / dt / 1e9
print(f"mv: {dt/ITERS*1e6:.1f} us/iter, effective {gbs:.1f} GB/s (tile bytes {bytes_per_mv/1e6:.1f} MB)")
