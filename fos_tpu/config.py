"""Global configuration for fos_tpu.

First-order conic solvers need f64 to reach the reference operating points
(eps down to 1e-9, see /root/reference/test/testDRandGAPA.jl:45); TPUs
emulate f64, so the per-solve ``dtype`` option offers an f32 fast path for
loose tolerances.  x64 is enabled at import unless ``FOS_TPU_X64=0``.
"""

import os

import jax
import jax.numpy as jnp

if os.environ.get("FOS_TPU_X64", "1") != "0":
    jax.config.update("jax_enable_x64", True)


def is_tpu_backend() -> bool:
    """True when the default device is a TPU — where Mosaic (Pallas TPU)
    kernels compile.  Matches both the upstream ``tpu`` platform and
    tunnel plugins whose platform name differs (e.g. ``axon``) but whose
    device kind is a TPU."""
    try:
        d = jax.devices()[0]
    except Exception:  # backend init failure -> definitely not a TPU path
        return False
    return ("tpu" in (getattr(d, "platform", "") or "").lower()
            or "tpu" in (getattr(d, "device_kind", "") or "").lower())


def default_dtype():
    """Solver default dtype: f64 when x64 is enabled, else f32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32


def eps_of(dtype) -> float:
    return float(jnp.finfo(dtype).eps)
