import os
os.environ["FOS_TPU_X64"] = "1"
import numpy as np, time
import jax, jax.numpy as jnp
from fos_tpu.cones.psd_poly import psd_project_poly

for d in (1024, 2048, 4096):
    rng = np.random.default_rng(0)
    B = rng.standard_normal((d, d)).astype(np.float32)
    X = jnp.asarray((B + B.T) / 2)
    f = jax.jit(psd_project_poly)
    t0 = time.perf_counter()
    Y = f(X); float(jnp.sum(Y))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    Y = f(X); float(jnp.sum(Y))
    dt = time.perf_counter() - t0
    # accuracy vs f64 eigh on a slice-checkable property: Y ~ PSD and Y-X ~ -neg part
    w = np.linalg.eigvalsh(np.asarray(Y, np.float64))
    print(f"d={d}: {dt*1e3:.1f} ms/proj (compile {tc:.1f}s), min eig {w[0]:.2e}, VMEM need {3*d*d*4>>20} MB", flush=True)
