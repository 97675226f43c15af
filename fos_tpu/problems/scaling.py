"""Ruiz equilibration of conic problem data.

The reference has no data scaling; badly scaled (A, b, c) can slow
first-order methods by orders of magnitude.  This is the SCS-style
preprocessing: diagonal scalings ``Ahat = D A E`` driving row/column
infinity-norms toward 1, with the diagonal held constant inside every
non-elementwise cone block (SOC/PSD/EXP slacks must be scaled uniformly to
preserve cone membership).

Scaled problem: ``min (Ec)'xh  s.t.  (DAE) xh + sh = Db``, with recovery
``x = E xh, y = D yh, s = D^{-1} sh``; the objective values are preserved
exactly (``(Ec)'xh = c'x``, ``(Db)'yh = b'y``).  Convergence checks unscale
the residual vectors (weights D^{-1}, E^{-1}) so termination measures the
ORIGINAL problem's residuals.
"""

from __future__ import annotations

import numpy as np

from fos_tpu.cones.spec import ConeSpec, is_elementwise


def _block_average(scale, spec: ConeSpec):
    """Hold the scaling constant (mean) within non-elementwise cone blocks."""
    out = np.asarray(scale).copy()
    off = 0
    for cone, d in spec.blocks:
        if not is_elementwise(cone):
            out[off : off + d] = out[off : off + d].mean()
        off += d
    return out


def ruiz_equilibrate(A, b, c, K1: ConeSpec, K2: ConeSpec, *, iters: int = 10,
                     min_scale: float = 1e-4, max_scale: float = 1e4):
    """Returns (A_s, b_s, c_s, d, e): A_s = diag(d) A diag(e), b_s = d*b,
    c_s = e*c."""
    A = np.asarray(A, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    m, n = A.shape
    d = np.ones(m)
    e = np.ones(n)
    As = A.copy()
    for _ in range(iters):
        row = np.max(np.abs(As), axis=1)
        col = np.max(np.abs(As), axis=0)
        dr = 1.0 / np.sqrt(np.where(row > 0, row, 1.0))
        dc = 1.0 / np.sqrt(np.where(col > 0, col, 1.0))
        dr = _block_average(dr, K1)
        dc = _block_average(dc, K2)
        d *= dr
        e *= dc
        d = np.clip(d, min_scale, max_scale)
        e = np.clip(e, min_scale, max_scale)
        As = (A * d[:, None]) * e[None, :]
    return As, d * b, e * c, d, e


def ruiz_equilibrate_sparse(A, b, c, K1: ConeSpec, K2: ConeSpec, *,
                            iters: int = 10, min_scale: float = 1e-4,
                            max_scale: float = 1e4):
    """Sparse-A Ruiz equilibration (same math as :func:`ruiz_equilibrate`)
    without ever materializing the dense matrix.

    ``A`` is a scipy.sparse matrix; returns the scaled matrix as CSR.
    Row/col abs-max sweeps run on the nonzeros only — equilibration is a
    one-time host-side setup pass (the reference has no scaling at all, so
    there is no parity constraint on where it runs).
    """
    import scipy.sparse as sp

    A = sp.csr_matrix(A, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    c = np.asarray(c, dtype=np.float64)
    m, n = A.shape
    d = np.ones(m)
    e = np.ones(n)
    As = A.copy()
    for _ in range(iters):
        absA = abs(As)
        row = absA.max(axis=1).toarray().ravel()
        col = absA.max(axis=0).toarray().ravel()
        dr = 1.0 / np.sqrt(np.where(row > 0, row, 1.0))
        dc = 1.0 / np.sqrt(np.where(col > 0, col, 1.0))
        dr = _block_average(dr, K1)
        dc = _block_average(dc, K2)
        d = np.clip(d * dr, min_scale, max_scale)
        e = np.clip(e * dc, min_scale, max_scale)
        As = sp.diags(d) @ A @ sp.diags(e)
        As = sp.csr_matrix(As)
    return As, d * b, e * c, d, e
