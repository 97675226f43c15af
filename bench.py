#!/usr/bin/env python
"""Headline benchmark: HSDE iterations/s on a 1e6-nnz conic problem.

BASELINE.json north star: >=10x iterations/s vs single-core CPU on a
10^6-nnz HSDE problem at parity objective (eps=1e-5).  The reference
publishes no numbers (BASELINE.md), so the baseline here is the same DR/HSDE
algorithm implemented in numpy f64 restricted to one BLAS thread — a stand-in
for single-core Julia, measured on this machine, in a subprocess.

Prints ONE JSON line:
  {"metric": ..., "value": iters/s, "unit": "iters/s", "vs_baseline": ratio}

TPU path runs f32 (f64 is emulated ~40x slower on TPU; the solve still
reaches the eps=1e-5 operating point scaled residuals — reported in extras).
"""

import json
import os
import subprocess
import sys
import time

M = N = 1000          # dense A: 1e6 nnz
BENCH_ITERS = 1000    # fixed outer iterations for throughput measurement
CHECKI = 100
BASE_ITERS = 100      # numpy baseline outer iterations


def make_problem(dtype):
    import numpy as np

    rng = np.random.default_rng(7)
    A = rng.standard_normal((M, N)) / np.sqrt(N)
    xmask = rng.random(N) < 0.5
    x0 = np.abs(rng.standard_normal(N)) * xmask
    r0 = np.abs(rng.standard_normal(N)) * (~xmask)
    ymask = rng.random(M) < 0.5
    y0 = np.abs(rng.standard_normal(M)) * ymask
    s0 = np.abs(rng.standard_normal(M)) * (~ymask)
    b = A @ x0 + s0
    c = r0 - A.T @ y0
    opt = float(c @ x0)
    return A.astype(dtype), b.astype(dtype), c.astype(dtype), opt


def numpy_baseline():
    """Same DR/HSDE math in numpy f64, single thread (set via env)."""
    import numpy as np

    A, b, c, _ = make_problem(np.float64)
    m, n = A.shape
    l = m + n + 1

    def qmul(z):
        z1, z2, z3 = z[:n], z[n : n + m], z[n + m]
        y1 = A.T @ z2 + c * z3
        y2 = -A @ z1 + b * z3
        y3 = -c @ z1 - b @ z2
        return np.concatenate([y1, y2, [y3]])

    def normal(u):
        return u - qmul(qmul(u))

    z = np.zeros(2 * l)
    z[l - 1] = 1.0
    z[2 * l - 1] = 1.0
    warm = None
    alpha, a1, a2 = 0.5, 2.0, 2.0
    t0 = time.perf_counter()
    for i in range(1, BASE_ITERS + 1):
        u0, v0 = z[:l], z[l:]
        rhs = u0 - qmul(v0)
        x = warm if warm is not None else u0.copy()
        # CG with the decreasing-accuracy schedule
        tol = max(0.2 ** np.sqrt(i), 2 * l * np.finfo(np.float64).eps)
        r = rhs - normal(x)
        p = r.copy()
        rn = r @ r
        it = 0
        while np.sqrt(rn) > tol and it < 1000:
            Ap = normal(p)
            a = rn / (Ap @ p)
            x += a * p
            r -= a * Ap
            rn_new = r @ r
            p = r + (rn_new / rn) * p
            rn = rn_new
            it += 1
        warm = x.copy()
        u = x
        v = qmul(u)
        y1 = np.concatenate([u, v])
        tmp1 = a1 * y1 + (1 - a1) * z
        # cone projection: K1=K2=NonNeg -> clip x,y,tau,r,s,kappa at 0...
        # (free/nonneg structure: for this LP every slot projects to >= 0
        # except it is exactly the HSDE dual-cone product of NonNeg cones)
        y2 = np.maximum(tmp1, 0.0)
        tmp2 = a2 * y2 + (1 - a2) * tmp1
        z = alpha * tmp2 + (1 - alpha) * z
    dt = time.perf_counter() - t0
    print(json.dumps({"iters_per_s": BASE_ITERS / dt}))


def tpu_bench():
    os.environ["FOS_TPU_X64"] = "0"
    import numpy as np
    import jax
    import jax.numpy as jnp

    from fos_tpu import DR
    from fos_tpu.cones import nonneg
    from fos_tpu.problems.conic import conic_problem
    from fos_tpu.problems.hsde import HSDEForm
    from fos_tpu.solvers.engine import fused_solve

    dtype = jnp.float32 if not jax.config.jax_enable_x64 else jnp.float64
    A, b, c, opt = make_problem(np.float32)
    prob = conic_problem(jnp.asarray(A), jnp.asarray(b), jnp.asarray(c),
                         nonneg(M), nonneg(N))
    form = HSDEForm.build(prob)
    alg = DR()
    x0 = form.initial_value(form.dtype)

    # eps is traced, so throughput (eps=0: never exits early) and quality
    # (eps=1e-5) share ONE compilation.  NOTE: block_until_ready is not a
    # reliable sync on the axon tunnel — fetch a scalar to force completion.
    run = jax.jit(lambda f, x, eps: fused_solve(alg, f, x, max_iters=BENCH_ITERS,
                                                eps=eps, checki=CHECKI, unroll=8))

    def sync(r):
        return float(jnp.sum(r.guess))

    print("compiling main...", file=sys.stderr)
    res = run(form, x0, 0.0)
    sync(res)  # compile + warm
    assert int(res.iters) == BENCH_ITERS, f"early exit at {int(res.iters)}"
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = run(form, x0, 0.0)
        sync(res)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[1]  # median of 3
    iters_per_s = BENCH_ITERS / dt

    # quality: eps=1e-5 operating point on the same problem
    r2 = run(form, x0, 1e-5)
    sync(r2)
    l = M + N + 1
    tau = r2.guess[l - 1]
    xsol = np.asarray(r2.guess[:N] / tau)
    obj = float(c @ xsol)

    # scaling: larger single problem (A-read bandwidth bound at scale).
    # Generate ON DEVICE: shipping a 64MB matrix through the device tunnel
    # is slower than the benchmark itself.
    scaling = {}
    for mn in (4000,):
        print(f"scaling {mn}...", file=sys.stderr)
        key = jax.random.PRNGKey(11)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        A2 = jax.random.normal(k1, (mn, mn), jnp.float32) / np.sqrt(mn)
        b2 = A2 @ jnp.abs(jax.random.normal(k2, (mn,), jnp.float32))
        c2 = jnp.abs(jax.random.normal(k3, (mn,), jnp.float32))
        prob2 = conic_problem(A2, b2, c2, nonneg(mn), nonneg(mn))
        form2 = HSDEForm.build(prob2)
        run2 = jax.jit(lambda f, x, eps: fused_solve(alg, f, x, max_iters=300,
                                                     eps=eps, checki=100, unroll=4))
        x02 = form2.initial_value(form2.dtype)
        r = run2(form2, x02, 0.0)
        float(jnp.sum(r.guess))
        t0 = time.perf_counter()
        r = run2(form2, x02, 0.0)
        float(jnp.sum(r.guess))
        scaling[f"{mn}x{mn}_iters_per_s"] = round(300 / (time.perf_counter() - t0), 1)

    # batched instances (data-parallel axis), generated on device
    print("batched...", file=sys.stderr)
    from fos_tpu.parallel.batched import build_batched_form, solve_batched

    B, bm, bn = 128, 64, 96
    key = jax.random.PRNGKey(13)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    A3 = jax.random.normal(k1, (B, bm, bn), jnp.float32)
    b3 = (jnp.einsum("bmn,bn->bm", A3, jnp.abs(jax.random.normal(k2, (B, bn))))
          + jnp.abs(jax.random.normal(k3, (B, bm)))).astype(jnp.float32)
    c3 = jnp.abs(jax.random.normal(k4, (B, bn), jnp.float32))
    form3 = build_batched_form(A3, b3, c3, nonneg(bm), nonneg(bn))
    rb = solve_batched(alg, form3, max_iters=300, eps=0.0, checki=100, unroll=4)
    float(jnp.sum(rb.guess))
    t0 = time.perf_counter()
    rb = solve_batched(alg, form3, max_iters=300, eps=0.0, checki=100, unroll=4)
    float(jnp.sum(rb.guess))
    batched_iters_per_s = B * 300 / (time.perf_counter() - t0)

    # baseline subprocess, single BLAS thread
    env = dict(os.environ)
    env.update(OMP_NUM_THREADS="1", OPENBLAS_NUM_THREADS="1",
               MKL_NUM_THREADS="1", JAX_PLATFORMS="cpu")
    print("cpu baseline...", file=sys.stderr)
    out = subprocess.run([sys.executable, os.path.abspath(__file__), "--numpy-baseline"],
                         capture_output=True, text=True, env=env, timeout=1200)
    base = json.loads(out.stdout.strip().splitlines()[-1])["iters_per_s"]

    print(json.dumps({
        "metric": "hsde_dr_iters_per_s_1e6nnz",
        "value": round(iters_per_s, 2),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / base, 2),
        "extras": {
            "baseline_cpu_1thread_iters_per_s": round(base, 2),
            "scaling": scaling,
            "batched_128x(64x96)_agg_iters_per_s": round(batched_iters_per_s, 1),
            "dtype": str(form.dtype),
            "eps1e-5_status": int(r2.status),
            "eps1e-5_iters": int(r2.iters),
            "scaled_pri_res": float(r2.check.p),
            "scaled_dua_res": float(r2.check.d),
            "obj": obj,
            "obj_certificate": opt,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    if "--numpy-baseline" in sys.argv:
        numpy_baseline()
    else:
        tpu_bench()
