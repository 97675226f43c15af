"""Pallas TPU kernels for the hot matvec path.

The HSDE operator Q applies both ``A @ z1`` and ``A' @ z2`` every time
(HSDEAffine.jl:41-59 in the reference); done naively that reads A from HBM
twice per Q application.  Since the solver is HBM-bandwidth-bound (the MXU
work per byte is tiny for matvecs), :func:`fused_matvec` computes BOTH
products in ONE pass over A — a ~2x reduction in HBM traffic for the
dominant cost of every CG iteration.

Kernel layout: 2D grid over (row tiles, col tiles) of A; both outputs live
as full VMEM windows that accumulate across grid steps:

    y[i_block] (+)= A_block @ x1[j_block]      (init at j == 0)
    z[j_block] (+)= A_block' @ x2[i_block]     (init at i == 0)

Shapes must be multiples of the block size — pad once at build time with
:class:`PaddedDenseOp` (zero padding is exact for the HSDE semantics: the
pad region contributes nothing and is sliced off).

f32 only (f64 is emulated on TPU and unsupported by Mosaic); interpret=True
runs the same kernel on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(x1_ref, x2_ref, a_ref, y_ref, z_ref, *, bm, bn):
    i = pl.program_id(0)
    j = pl.program_id(1)

    a = a_ref[:]  # (bm, bn)
    x1 = x1_ref[:]  # (1, bn)
    x2 = x2_ref[:]  # (1, bm)

    yi = jax.lax.dot_general(
        a, x1, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]  # (bm,)
    zj = jax.lax.dot_general(
        a, x2, (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0]  # (bn,)

    row = pl.ds(i * bm, bm)
    col = pl.ds(j * bn, bn)

    @pl.when(j == 0)
    def _():
        y_ref[0, row] = yi

    @pl.when(j != 0)
    def _():
        y_ref[0, row] += yi

    @pl.when(i == 0)
    def _():
        z_ref[0, col] = zj

    @pl.when(i != 0)
    def _():
        z_ref[0, col] += zj


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def fused_matvec(A, x1, x2, *, bm: int = 512, bn: int = 512,
                 interpret: bool = False):
    """(A @ x1, A' @ x2) in one pass over A.

    A: (M, N) with M % bm == 0, N % bn == 0 (pad first); f32.
    """
    M, N = A.shape
    assert M % bm == 0 and N % bn == 0, (M, N, bm, bn)
    grid = (M // bm, N // bn)
    y, z = pl.pallas_call(
        functools.partial(_fused_kernel, bm=bm, bn=bn),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, M), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, M), A.dtype),
            jax.ShapeDtypeStruct((1, N), A.dtype),
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * M * N, bytes_accessed=M * N * 4 + 2 * (M + N) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x1[None, :], x2[None, :], A)
    return y[0], z[0]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@jax.tree_util.register_pytree_node_class
class PaddedDenseOp:
    """Dense A padded to block multiples, serving single and fused matvecs
    through the Pallas kernel.  Duck-typed drop-in for the raw array in
    :mod:`fos_tpu.linalg.hsde_ops`."""

    def __init__(self, A_pad, m: int, n: int, bm: int = 512, bn: int = 512,
                 interpret: bool = False):
        self.A_pad = A_pad
        self.m = m
        self.n = n
        self.bm = bm
        self.bn = bn
        self.interpret = interpret

    def tree_flatten(self):
        return (self.A_pad,), (self.m, self.n, self.bm, self.bn, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def create(cls, A, bm: int = 512, bn: int = 512, interpret: bool = None):
        if interpret is None:
            # Mosaic compiles only on TPU; fall back to interpret on every
            # other backend (CPU tests, XLA:GPU, ...)
            from fos_tpu.config import is_tpu_backend

            interpret = not is_tpu_backend()
        if hasattr(A, "todense"):  # BCOO reaches here via solve(pallas=True)
            A = A.todense()
        A = jnp.asarray(A, jnp.float32)
        m, n = A.shape
        mp, np_ = _round_up(m, bm), _round_up(n, bn)
        A_pad = jnp.zeros((mp, np_), jnp.float32).at[:m, :n].set(A)
        return cls(A_pad, m, n, bm, bn, interpret)

    @property
    def shape(self):
        return (self.m, self.n)

    @property
    def dtype(self):
        return self.A_pad.dtype

    def _pad1(self, x):
        return jnp.zeros(self.A_pad.shape[1], x.dtype).at[: self.n].set(x)

    def _pad2(self, x):
        return jnp.zeros(self.A_pad.shape[0], x.dtype).at[: self.m].set(x)

    def mv_pair(self, x1, x2):
        """(A @ x1, A' @ x2) — one HBM pass."""
        y, z = fused_matvec(self.A_pad, self._pad1(x1), self._pad2(x2),
                            bm=self.bm, bn=self.bn, interpret=self.interpret)
        return y[: self.m], z[: self.n]

    def mv(self, x):
        return (self.A_pad @ self._pad1(x))[: self.m]

    def rmv(self, y):
        return (self.A_pad.T @ self._pad2(y))[: self.n]
