import sys; sys.path.insert(0, "/root/repo")
import os, time
os.environ["FOS_TPU_X64"] = "1"
import numpy as np
import jax, jax.numpy as jnp
import fos_tpu.linalg.sparse_ell as se
se._m_block = lambda nrb: 16 if nrb % 16 == 0 and nrb > 16 else (8 if nrb % 8 == 0 and nrb > 8 else nrb)
import scipy.sparse as sp

bs = 128; nrb = 256; m = n = nrb * bs
rng = np.random.default_rng(0)
rows_l, cols_l, vals_l = [], [], []
for i in range(nrb):
    for dj in (-1, 0, 1):
        j = i + dj
        if 0 <= j < nrb:
            r, c = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
            rows_l.append((i*bs + r).ravel()); cols_l.append((j*bs + c).ravel())
            vals_l.append(rng.standard_normal(bs*bs) / np.sqrt(3*bs))
S = sp.coo_matrix((np.concatenate(vals_l).astype(np.float32),
                   (np.concatenate(rows_l), np.concatenate(cols_l))), shape=(m, n)).tocsr()
op = se.BlockedEllOp.create(S, interpret=False)
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))

@jax.jit
def loop_mv(x, iters):
    def body(k, v):
        y = op.mv(v)
        return y / (jnp.linalg.norm(y) + 1.0)
    return jax.lax.fori_loop(0, iters, body, x)

y1 = op.mv(x)
err = np.abs(np.asarray(y1) - S @ np.asarray(x)).max()
print("mt16 correctness err:", err)
ITERS = 200
r = loop_mv(x, ITERS); float(jnp.sum(r))
t0 = time.perf_counter(); r = loop_mv(x, ITERS); s = float(jnp.sum(r))
dt = time.perf_counter() - t0
bpm = op.blocks.size * 4 + (m + n) * 4
print(f"mt=16 mv: {dt/ITERS*1e6:.1f} us/iter, effective {bpm*ITERS/dt/1e9:.1f} GB/s")
