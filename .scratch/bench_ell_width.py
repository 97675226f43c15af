"""TPU experiment: ELL tile-width sweep (bn in {128, 256, 512}).

Hypothesis (PERF.md round 2): the remaining gap to HBM peak (248 vs ~800
GB/s) is the per-x-row gather overhead — mt*kt VPU dynamic slices per grid
step.  Wider tiles move the same bytes in fewer, larger gathers.
Run on the real TPU (axon default backend).
"""
import sys, os, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("FOS_TPU_X64", "1")
import numpy as np
import jax, jax.numpy as jnp
import scipy.sparse as sp
import fos_tpu.linalg.sparse_ell as se

assert jax.default_backend() != "cpu", "run on the TPU"

bs = 128
nrb = 256
m = n = nrb * bs  # 32768^2 block-tridiagonal, 1.2e7 nnz
rng = np.random.default_rng(0)
rows_l, cols_l, vals_l = [], [], []
for i in range(nrb):
    for dj in (-1, 0, 1):
        j = i + dj
        if 0 <= j < nrb:
            r, c = np.meshgrid(np.arange(bs), np.arange(bs), indexing="ij")
            rows_l.append((i * bs + r).ravel())
            cols_l.append((j * bs + c).ravel())
            vals_l.append(rng.standard_normal(bs * bs) / np.sqrt(3 * bs))
S = sp.coo_matrix((np.concatenate(vals_l).astype(np.float32),
                   (np.concatenate(rows_l), np.concatenate(cols_l))),
                  shape=(m, n)).tocsr()
x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
ITERS = 200

for bn in (128, 256, 512):
    op = se.BlockedEllOp.create(S, bm=128, bn=bn, interpret=False)

    @jax.jit
    def loop_mv(x, iters):
        def body(k, v):
            y = op.mv(v)
            return y / (jnp.linalg.norm(y) + 1.0)
        return jax.lax.fori_loop(0, iters, body, x)

    y1 = op.mv(x)
    err = float(np.abs(np.asarray(y1) - S @ np.asarray(x)).max())
    r = loop_mv(x, ITERS); float(jnp.sum(r))  # compile + sync
    t0 = time.perf_counter()
    r = loop_mv(x, ITERS); s = float(jnp.sum(r))
    dt = time.perf_counter() - t0
    bpm = op.blocks.size * 4 + (m + n) * 4
    print(f"bn={bn}: err={err:.2e} {dt/ITERS*1e6:.1f} us/mv, "
          f"effective {bpm*ITERS/dt/1e9:.1f} GB/s "
          f"(tile bytes {op.blocks.size*4/1e6:.1f} MB, "
          f"kmax={op.cols.shape[1]})")
