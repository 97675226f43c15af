"""Pallas fused-matvec kernel tests (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from fos_tpu.linalg.pallas_kernels import PaddedDenseOp, fused_matvec
from fos_tpu.linalg import hsde_ops


def test_fused_matvec_exact_blocks(rng):
    M, N = 512, 1024
    A = jnp.asarray(rng.standard_normal((M, N)), jnp.float32)
    x1 = jnp.asarray(rng.standard_normal(N), jnp.float32)
    x2 = jnp.asarray(rng.standard_normal(M), jnp.float32)
    y, z = fused_matvec(A, x1, x2, bm=256, bn=256, interpret=True)
    np.testing.assert_allclose(np.asarray(y), np.asarray(A @ x1), rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(A.T @ x2), rtol=2e-5, atol=1e-3)


def test_padded_dense_op(rng):
    m, n = 300, 471  # non-multiples
    A = rng.standard_normal((m, n)).astype(np.float32)
    op = PaddedDenseOp.create(A, bm=256, bn=256, interpret=True)
    assert op.A_pad.shape == (512, 512)
    x1 = rng.standard_normal(n).astype(np.float32)
    x2 = rng.standard_normal(m).astype(np.float32)
    y, z = op.mv_pair(jnp.asarray(x1), jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(y), A @ x1, rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), A.T @ x2, rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(op.mv(jnp.asarray(x1))), A @ x1,
                               rtol=2e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(op.rmv(jnp.asarray(x2))), A.T @ x2,
                               rtol=2e-5, atol=1e-3)


def test_q_mul_with_padded_op(rng):
    m, n = 70, 90
    A = rng.standard_normal((m, n)).astype(np.float32)
    b = jnp.asarray(rng.standard_normal(m), jnp.float32)
    c = jnp.asarray(rng.standard_normal(n), jnp.float32)
    op = PaddedDenseOp.create(A, bm=64, bn=128, interpret=True)
    z = jnp.asarray(rng.standard_normal(m + n + 1), jnp.float32)
    got = np.asarray(hsde_ops.q_mul(op, b, c, z))
    want = np.asarray(hsde_ops.q_mul(jnp.asarray(A), b, c, z))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-3)
