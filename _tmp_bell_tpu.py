# Validate the ELL kernel on real TPU hardware (Mosaic compile + accuracy)
import os
os.environ["FOS_TPU_X64"] = "1"
import numpy as np, scipy.sparse as sp, time
import jax, jax.numpy as jnp
from fos_tpu.linalg.sparse_ell import BlockedEllOp

A = sp.random(2000, 1300, density=0.02, random_state=np.random.RandomState(5), format="csr")
op = BlockedEllOp.create(A, interpret=False)
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal(1300).astype(np.float32))
y = jnp.asarray(rng.standard_normal(2000).astype(np.float32))
mv = np.asarray(op.mv(x)); rmv = np.asarray(op.rmv(y))
print("mv err", np.abs(mv - A @ np.asarray(x)).max(), flush=True)
print("rmv err", np.abs(rmv - A.T @ np.asarray(y)).max(), flush=True)

# banded perf: ELL vs dense matvec at 4.7% occupancy
import bench as B
op2, b2, c2, _, nnz = B._banded_bell_problem(nrb=128)  # 16384^2, dense 1GB
xq = jnp.asarray(rng.standard_normal(op2.n).astype(np.float32))
f = jax.jit(lambda v: op2.mv(op2.rmv(v)))
r = f(xq); float(jnp.sum(r))
t0 = time.perf_counter()
for _ in range(20): r = f(r)
s = float(jnp.sum(r))
dt = (time.perf_counter()-t0)/20
bytes_ell = op2.blocks.nbytes + op2.blocks_t.nbytes
print(f"bell mv+rmv 16k^2 band: {dt*1e3:.2f} ms/pair, eff BW {bytes_ell/dt/1e9:.0f} GB/s, stored {bytes_ell>>20} MB vs dense {16384*16384*4>>20} MB", flush=True)
