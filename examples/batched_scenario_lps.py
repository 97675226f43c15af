"""Batched scenario LPs across the device mesh.

BASELINE.json config "batched 1024-instance scenario LPs across a pod
slice": solve B independent LP instances as one vmapped fused solve with the
batch axis sharded over the devices.  On CPU this runs on the virtual
8-device mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", os.environ.get("FOS_TPU_EXAMPLE_PLATFORM", "cpu"))

import time

import numpy as np

from fos_tpu import DR
from fos_tpu.cones import nonneg
from fos_tpu.parallel import build_batched_form, make_mesh, shard_batched_form
from fos_tpu.parallel.batched import solve_batched
from fos_tpu.solvers.status import Status


def main(B=64, m=24, n=40):
    rng = np.random.default_rng(0)
    A = rng.standard_normal((B, m, n))
    xmask = rng.random((B, n)) < 0.5
    x0 = np.abs(rng.standard_normal((B, n))) * xmask
    r0 = np.abs(rng.standard_normal((B, n))) * (~xmask)
    ymask = rng.random((B, m)) < 0.5
    y0 = np.abs(rng.standard_normal((B, m))) * ymask
    s0 = np.abs(rng.standard_normal((B, m))) * (~ymask)
    b = np.einsum("bmn,bn->bm", A, x0) + s0
    c = r0 - np.einsum("bmn,bm->bn", A, y0)

    form = build_batched_form(A, b, c, nonneg(m), nonneg(n))
    ndev = len(jax.devices())
    if B % ndev == 0 and ndev > 1:
        mesh = make_mesh((ndev, 1), ("batch", "model"))
        form = shard_batched_form(form, mesh)
        print(f"batch axis sharded over {ndev} devices")

    t0 = time.time()
    res = solve_batched(DR(), form, max_iters=20000, eps=1e-6, checki=100)
    statuses = np.asarray(res.status)
    n_opt = int(np.sum(statuses == Status.OPTIMAL))
    print(f"B={B}: {n_opt}/{B} optimal in {time.time() - t0:.2f}s (incl. compile)")
    # a couple of random instances are near-degenerate and need more than the
    # budget at eps=1e-6 — per-instance statuses are the point of the demo
    assert n_opt >= 0.9 * B
    return res


if __name__ == "__main__":
    main()
