#!/bin/bash
# One-shot TPU hardware session (run when the axon tunnel is up):
#   1. 90s probe;  2. SpMV layout sweep (ELL vs band GB/s);
#   3. banded-kernel hardware validation at small scale;
#   4. full bench.py  ->  /tmp/bench_tpu.json
# Usage: bash tools/tpu_session.sh [outdir]
set -u
OUT=${1:-/tmp/tpu_session_$(date +%H%M)}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

echo "== probe =="
timeout 90 python -c "
import jax, jax.numpy as jnp
print('devices:', jax.devices())
print('probe ok:', float(jnp.ones(8).sum()))" || { echo "TUNNEL DOWN"; exit 1; }

echo "== band kernel hardware validation (small) =="
timeout 600 python - <<'EOF' 2>&1 | tee "$OUT/band_validation.log"
import numpy as np, scipy.sparse as sp
import jax.numpy as jnp
from fos_tpu.linalg.sparse_ell import BandedBlockOp, BlockedEllOp
A = sp.diags([np.ones(2048-130), 2*np.ones(2048), np.ones(2048-130)],
             offsets=[-130, 0, 130], format="csr").astype(np.float32)
x = np.random.default_rng(0).standard_normal(2048).astype(np.float32)
y = np.random.default_rng(1).standard_normal(2048).astype(np.float32)
for cls in (BlockedEllOp, BandedBlockOp):
    op = cls.create(A)   # interpret=False on TPU (is_tpu_backend)
    e1 = np.abs(np.asarray(op.mv(jnp.asarray(x))) - A @ x).max()
    e2 = np.abs(np.asarray(op.rmv(jnp.asarray(y))) - A.T @ y).max()
    print(f"{cls.__name__}: mv err {e1:.2e} rmv err {e2:.2e}")
    assert e1 < 1e-3 and e2 < 1e-3
print("band kernel compiles and is correct on hardware")
EOF
[ ${PIPESTATUS[0]} -eq 0 ] || echo "BAND KERNEL FAILED ON HARDWARE (auto selection stays ELL)"

echo "== SpMV layout sweep =="
timeout 900 python tools/spmv_probe.py 64 128 256 2>&1 | tee "$OUT/spmv_sweep.log"

echo "== full bench =="
timeout 3000 python bench.py 2> "$OUT/bench_stderr.log" | tee "$OUT/bench_tpu.json"

echo "== done: results in $OUT =="
