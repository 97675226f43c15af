"""Blocked-ELL sparse matrix operator with a Pallas TPU SpMV kernel.

The reference treats sparse A as a first-class citizen via Julia's
``SparseMatrixCSC`` matvecs (HSDEAffine.jl:41-59, tested at 0.001 density in
test/HSDEAffine.jl:84-90).  On TPU, unstructured gather/scatter SpMV (what
BCOO lowers to) is ~12.5x slower than a dense matvec even at 5% density
(PERF.md), and auto-densifying dies at the HBM cliff for very large A
(VERDICT round 1, missing item 2).  This module is the TPU-native middle
path:

* A is tiled into (bm, bn) = (128, 128) MXU-native dense tiles; only tiles
  containing nonzeros are stored, in ELL layout — ``blocks[i, k]`` is the
  k-th occupied tile of block-row i and ``cols[i, k]`` its block-column.
* ``mv`` runs one Pallas kernel over the (block-rows, kmax) grid: the
  scalar-prefetched ``cols`` table drives the x-block index map, so each
  grid step streams exactly one stored tile plus the x slice it needs —
  HBM traffic is proportional to the number of OCCUPIED tiles, not to the
  dense size.
* ``rmv`` uses a second ELL built from A' (sparse tiles of A and A' differ;
  storing both costs 2x occupied tiles, still far below dense).

Cost model: speed and storage are ``occupancy``x dense, where occupancy is
the fraction of 128x128 tiles containing any nonzero.  Block-structured /
banded problems (the realistic conic case) win proportionally; a uniformly
random matrix at density >= ~1e-3 fills every tile and degenerates to the
dense path (use BCOO or densify there — ``occupancy()`` reports the ratio
so the build layer can choose).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bell_mv_kernel(cols_ref, blocks_ref, x_ref, y_ref, *, mt, kt):
    """One grid step: y[i*mt+r] (+)= sum_kk blocks[i*mt+r, kb*kt+kk] @ x[cols[...]].

    Grid is (nrb // mt, kmax // kt) with the k-blocks fastest.  Each step
    streams ``mt x kt`` stored tiles in one pipelined DMA (a single 64 KB
    tile per step measured only ~35 GB/s — the ~2 us fixed grid-step cost
    dominates; batching tiles amortizes it along BOTH the k axis and the
    row-block axis, which matters for banded problems where kmax is small).
    x lives whole in VMEM — it is O(n) next to the tile data — with x rows
    picked by dynamic slices driven by the scalar-prefetched ``cols`` table
    (Mosaic rejects sub-(8, 128) blocks, so row-blocking x is not an
    option; y's (mt, bm) block is legal because the builder pads nrb so
    mt is 8 or the full row count).  Padding tiles are stored as zeros —
    correctness does not depend on masking them.
    """
    i = pl.program_id(0)
    kb = pl.program_id(1)
    # Gather the mt*kt x-rows, then ONE dot_general batched over both tile
    # axes and contracting bn: sum_k blocks[r, k] @ xs[r, k].  (A per-tile
    # dot chain `acc + dot(...)` fails Mosaic with "only constant
    # accumulators supported".)  MXU truncates f32 inputs to bf16 by
    # default: precision=HIGHEST is required for f32-accurate products
    # (PERF.md "MXU default input precision").
    xs = jnp.stack([x_ref[cols_ref[i * mt + r, kb * kt + kk], :]
                    for r in range(mt) for kk in range(kt)])  # (mt*kt, bn)
    a = blocks_ref[...]           # (mt, kt, bm, bn) tiles
    bm, bn = a.shape[2], a.shape[3]
    # ONE single-batch-axis dot_general (Mosaic's tpu.matmul supports at
    # most 1 batch dim): batch over the flattened (row-block, tile) axis
    parts = jax.lax.dot_general(
        a.reshape(mt * kt, bm, bn), xs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                             # (mt*kt, bm)
    contrib = jnp.sum(parts.reshape(mt, kt, bm), axis=1)  # (mt, bm)

    @pl.when(kb == 0)
    def _():
        y_ref[...] = contrib

    @pl.when(kb != 0)
    def _():
        y_ref[...] += contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bell_mv(cols, blocks, xb, *, interpret=False):
    """cols: (nrb, kmax) int32; blocks: (nrb, kmax, bm, bn) f32 with nrb a
    multiple of the row-block batch and kmax a multiple of the k-block
    (builder guarantees both); xb: (ncb, bn) f32 -> y: (nrb, bm) f32."""
    nrb, kmax, bm, bn = blocks.shape
    ncb = xb.shape[0]
    kt = _k_block(kmax)
    mt = _m_block(nrb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // mt, kmax // kt),
        in_specs=[
            # i*0 (not literal 0): under jax_enable_x64 a literal promotes
            # to i64 and Mosaic fails to legalize the index-map function —
            # same reason x gets an explicit full-shape block + map instead
            # of relying on pallas-synthesized (i64-constant) maps
            pl.BlockSpec((mt, kt, bm, bn),
                         lambda i, k, cols: (i, k, i * 0, i * 0)),
            pl.BlockSpec((ncb, bn), lambda i, k, cols: (i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((mt, bm), lambda i, k, cols: (i, i * 0)),
    )
    return pl.pallas_call(
        functools.partial(_bell_mv_kernel, mt=mt, kt=kt),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * kmax * bm * bn,
            bytes_accessed=nrb * kmax * bm * bn * 4 + (nrb * bm + ncb * bn) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cols, blocks, xb)


def _band_mv_kernel(cs_ref, blocks_ref, x_ref, y_ref, *, mt, st):
    """Banded variant: row-block i's occupied tiles live at contiguous
    block-columns [cs[i], cs[i] + S), so the per-x-row gather of the ELL
    kernel (mt*kt separate (1, bn) dynamic slices) becomes mt CONTIGUOUS
    (st, bn) slices.  Wide bands stream in ``st``-tile slabs along a
    second grid axis with y accumulation — one (mt, S) block at S=16
    needs 8.4 MB/step and VMEM-OOMs at the 16 MB scoped limit (found on
    hardware, round 4)."""
    i = pl.program_id(0)
    kb = pl.program_id(1)
    xs = jnp.concatenate(
        [x_ref[pl.ds(cs_ref[i * mt + r] + kb * st, st), :]
         for r in range(mt)])
    a = blocks_ref[...]                      # (mt, st, bm, bn)
    bm, bn = a.shape[2], a.shape[3]
    parts = jax.lax.dot_general(
        a.reshape(mt * st, bm, bn), xs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                        # (mt*st, bm)
    contrib = jnp.sum(parts.reshape(mt, st, bm), axis=1)

    @pl.when(kb == 0)
    def _():
        y_ref[...] = contrib

    @pl.when(kb != 0)
    def _():
        y_ref[...] += contrib


@functools.partial(jax.jit, static_argnames=("interpret",))
def _band_mv(cs, blocks, xb, *, interpret=False):
    """cs: (nrb,) int32 first occupied block-column per row block;
    blocks: (nrb, S, bm, bn) f32; xb: (ncb + S, bn) f32 padded so the
    trailing slice stays in range -> y: (nrb, bm) f32."""
    nrb, S, bm, bn = blocks.shape
    ncb_pad = xb.shape[0]
    mt = _m_block(nrb)
    st = _k_block(S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // mt, S // st),
        in_specs=[
            pl.BlockSpec((mt, st, bm, bn),
                         lambda i, k, cs: (i, k, i * 0, i * 0)),
            pl.BlockSpec((ncb_pad, bn), lambda i, k, cs: (i * 0, i * 0)),
        ],
        out_specs=pl.BlockSpec((mt, bm), lambda i, k, cs: (i, i * 0)),
    )
    return pl.pallas_call(
        functools.partial(_band_mv_kernel, mt=mt, st=st),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrb * S * bm * bn,
            bytes_accessed=nrb * S * bm * bn * 4 + (nrb * bm + ncb_pad * bn) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cs, blocks, xb)


def _band_mv_pair_kernel(cs_ref, blocks_ref, x_ref, z_ref, y1_ref, y2_ref,
                         *, mt, st):
    """Fused pair: ONE stream of the A tile table produces BOTH ``A @ x``
    and ``A' @ z``.  The HSDE ``q_mul`` needs exactly this pair per
    application (hsde_ops.q_mul), and tile-table reads are the entire HBM
    cost of the sparse solve — the fused kernel halves them (and removes
    the need to even store the A' table for the solve path).

    Forward: same one batched dot as :func:`_band_mv_kernel` (y1
    accumulates over the st-slab grid axis, see there for the VMEM
    budget).  Transpose: y2[cs_r + kb*st + s] += a[r, s]' @ z_r, computed
    as the row-vector product z_r' @ a[r, s] (natural tile layout, no
    transposes) with z repeated st times along the batch axis;
    accumulated into the VMEM-resident y2 output block (constant index
    map -> lives in VMEM across all grid steps, flushed once at the
    end)."""
    i = pl.program_id(0)
    kb = pl.program_id(1)
    a = blocks_ref[...]                      # (mt, st, bm, bn)
    bm, bn = a.shape[2], a.shape[3]
    af = a.reshape(mt * st, bm, bn)

    xs = jnp.concatenate(
        [x_ref[pl.ds(cs_ref[i * mt + r] + kb * st, st), :]
         for r in range(mt)])
    parts = jax.lax.dot_general(
        af, xs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                        # (mt*st, bm)
    contrib = jnp.sum(parts.reshape(mt, st, bm), axis=1)

    @pl.when(kb == 0)
    def _():
        y1_ref[...] = contrib

    @pl.when(kb != 0)
    def _():
        y1_ref[...] += contrib

    z = z_ref[...]                           # (mt, bm)
    zs = jnp.repeat(z, st, axis=0)           # (mt*st, bm), r-major
    # z_r' @ a[r,s] as [B,1,K] x [B,K,N] -> [B,1,N]: Mosaic's batched-dot
    # rule needs the lhs contraction on the LAST dim and the rhs
    # non-contracting dims as a suffix — this row-vector form satisfies
    # both without transposing the tiles in VMEM
    pt = jax.lax.dot_general(
        zs[:, None, :], af, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]                               # (mt*st, bn) = a[r,s]' z_r

    @pl.when((i == 0) & (kb == 0))
    def _():
        y2_ref[...] = jnp.zeros_like(y2_ref)

    for r in range(mt):
        w = pl.ds(cs_ref[i * mt + r] + kb * st, st)
        y2_ref[w, :] += pt[r * st:(r + 1) * st]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _band_mv_pair(cs, blocks, xb, zb, *, interpret=False):
    """cs: (nrb,) int32; blocks: (nrb, S, bm, bn); xb: (ncb + S, bn) padded;
    zb: (nrb, bm) -> (y1: (nrb, bm) = A x, y2: (ncb + S, bn) = A' z)."""
    nrb, S, bm, bn = blocks.shape
    ncb_pad = xb.shape[0]
    mt = _m_block(nrb)
    st = _k_block(S)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // mt, S // st),
        in_specs=[
            pl.BlockSpec((mt, st, bm, bn),
                         lambda i, k, cs: (i, k, i * 0, i * 0)),
            pl.BlockSpec((ncb_pad, bn), lambda i, k, cs: (i * 0, i * 0)),
            pl.BlockSpec((mt, bm), lambda i, k, cs: (i, i * 0)),
        ],
        out_specs=[
            pl.BlockSpec((mt, bm), lambda i, k, cs: (i, i * 0)),
            pl.BlockSpec((ncb_pad, bn), lambda i, k, cs: (i * 0, i * 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_band_mv_pair_kernel, mt=mt, st=st),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
                   jax.ShapeDtypeStruct((ncb_pad, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * nrb * S * bm * bn,
            bytes_accessed=nrb * S * bm * bn * 4
            + (2 * nrb * bm + 2 * ncb_pad * bn) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cs, blocks, xb, zb)


def _bell_mv_pair_kernel(cols_ref, blocks_ref, x_ref, z_ref, y1_ref, y2_ref,
                         *, mt, kt):
    """Blocked-ELL fused pair (see :func:`_band_mv_pair_kernel`): one
    stream of the A tile table yields ``A @ x`` (per-tile x gather, as
    :func:`_bell_mv_kernel`) and ``A' @ z`` (per-tile scatter-accumulate
    into the VMEM-resident y2 block)."""
    i = pl.program_id(0)
    kb = pl.program_id(1)
    a = blocks_ref[...]                      # (mt, kt, bm, bn)
    bm, bn = a.shape[2], a.shape[3]
    af = a.reshape(mt * kt, bm, bn)

    xs = jnp.stack([x_ref[cols_ref[i * mt + r, kb * kt + kk], :]
                    for r in range(mt) for kk in range(kt)])  # (mt*kt, bn)
    parts = jax.lax.dot_general(
        af, xs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                        # (mt*kt, bm)
    contrib = jnp.sum(parts.reshape(mt, kt, bm), axis=1)

    @pl.when(kb == 0)
    def _():
        y1_ref[...] = contrib

    @pl.when(kb != 0)
    def _():
        y1_ref[...] += contrib

    z = z_ref[...]                           # (mt, bm)
    zs = jnp.repeat(z, kt, axis=0)           # (mt*kt, bm), r-major
    pt = jax.lax.dot_general(
        zs[:, None, :], af, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )[:, 0, :]                               # (mt*kt, bn) = a[r,k]' z_r

    @pl.when((i == 0) & (kb == 0))
    def _():
        y2_ref[...] = jnp.zeros_like(y2_ref)

    for r in range(mt):
        for kk in range(kt):
            w = pl.ds(cols_ref[i * mt + r, kb * kt + kk], 1)
            y2_ref[w, :] += pt[r * kt + kk][None, :]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bell_mv_pair(cols, blocks, xb, zb, *, interpret=False):
    """cols: (nrb, kmax) int32; blocks: (nrb, kmax, bm, bn); xb: (ncb, bn);
    zb: (nrb, bm) -> (y1: (nrb, bm) = A x, y2: (ncb, bn) = A' z).

    NOTE: zero-padding tile slots alias block-column 0, so the transpose
    scatter requires padding tiles to be stored as ZEROS (the builders
    guarantee this; the forward path has the same requirement)."""
    nrb, kmax, bm, bn = blocks.shape
    ncb = xb.shape[0]
    kt = _k_block(kmax)
    mt = _m_block(nrb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nrb // mt, kmax // kt),
        in_specs=[
            pl.BlockSpec((mt, kt, bm, bn),
                         lambda i, k, cols: (i, k, i * 0, i * 0)),
            pl.BlockSpec((ncb, bn), lambda i, k, cols: (i * 0, i * 0)),
            pl.BlockSpec((mt, bm), lambda i, k, cols: (i, i * 0)),
        ],
        out_specs=[
            pl.BlockSpec((mt, bm), lambda i, k, cols: (i, i * 0)),
            pl.BlockSpec((ncb, bn), lambda i, k, cols: (i * 0, i * 0)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bell_mv_pair_kernel, mt=mt, kt=kt),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((nrb, bm), jnp.float32),
                   jax.ShapeDtypeStruct((ncb, bn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=4 * nrb * kmax * bm * bn,
            bytes_accessed=nrb * kmax * bm * bn * 4
            + (2 * nrb * bm + 2 * ncb * bn) * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(cols, blocks, xb, zb)


def _k_block(kmax: int) -> int:
    """Tiles streamed per grid step along k: whole k-range when small, else
    the largest divisor of kmax that is <= 8 (builder pads kmax to keep
    this >= 4 when kmax > 8)."""
    if kmax <= 8:
        return kmax
    for kt in (8, 7, 6, 5, 4):
        if kmax % kt == 0:
            return kt
    return 1


def _m_block(nrb: int) -> int:
    """Row blocks batched per grid step: 8 when the builder padded nrb to a
    multiple of 8, else the whole (small) row count.  8 is the smallest
    Mosaic-legal sub-block height for y's (mt, bm) output block, and at
    kt*mt >= 8 tiles/step the per-step DMA (>= 2 MB) runs at full HBM
    bandwidth instead of being grid-step-latency-bound."""
    return 8 if nrb % 8 == 0 and nrb > 8 else nrb


def _pad8(nb: int) -> int:
    """Block-grid rows padded to a multiple of 8 (the kernel's row-block
    batch, _m_block) when there are more than 8; small grids stay exact
    (full-array output block is always Mosaic-legal)."""
    return ((nb + 7) // 8) * 8 if nb > 8 else nb


def _ell_kmax(max_count: int) -> int:
    """Tile-slot count per block row: at least 1; padded to a multiple of 8
    past 8 so the kernel streams 8 tiles per grid step (_k_block).  Shared
    by the numpy and native packers (passed as ``kmax_of``) so the padding
    policy cannot drift between them."""
    return _pad8(max(max_count, 1))


def _build_ell_arrays(m, n, rows, cols, vals, bm, bn):
    """Pack COO triplets into blocked-ELL numpy arrays (host, build-time).

    Tries the native C++ packer (fos_tpu/native/packer.cpp — fused
    counting-sort + dedup + scatter, threaded; ~6x end-to-end at 1e7 nnz,
    the rest is zeroing/touching the tile tables — PERF.md) and falls back
    to the numpy implementation below; both produce bit-identical tables
    (tests/test_native.py)."""
    nrb = _pad8(math.ceil(m / bm))
    ncb = math.ceil(n / bn)
    from fos_tpu import native

    nat = native.ell_pack(rows, cols, vals, nrb, ncb, bm, bn, _ell_kmax)
    if nat is not None:
        return nat
    ti = rows // bm
    tj = cols // bn
    pair = ti.astype(np.int64) * ncb + tj
    upair, inv = np.unique(pair, return_inverse=True)
    uti = (upair // ncb).astype(np.int64)
    utj = (upair % ncb).astype(np.int64)
    # slot index of each occupied tile within its block-row (tiles arrive
    # sorted by (ti, tj) from np.unique)
    counts = np.bincount(uti, minlength=nrb)
    # kmax padded to a multiple of 8 past 8 so the kernel streams 8 tiles
    # per grid step (_k_block); <= 7 extra zero tiles per block-row
    kmax = _ell_kmax(int(counts.max()) if counts.size else 0)
    row_start = np.zeros(nrb + 1, np.int64)
    np.cumsum(counts, out=row_start[1:])
    slot = np.arange(upair.size) - row_start[uti]

    blocks = np.zeros((nrb, kmax, bm, bn), np.float32)
    cols_tab = np.zeros((nrb, kmax), np.int32)
    cols_tab[uti, slot] = utj.astype(np.int32)
    # np.add.at: duplicate COO indices SUM (BCOO semantics; fancy
    # assignment would silently keep only the last duplicate)
    np.add.at(blocks, (uti[inv], slot[inv], rows - ti * bm, cols - tj * bn),
              vals)
    return blocks, cols_tab, counts


def _build_band_arrays(m, n, rows, cols, vals, bm, bn):
    """Pack COO triplets into banded-block numpy arrays: per row block a
    contiguous column window [cs_i, cs_i + S) holds all its tiles (S = max
    window over row blocks; sparse-within-window slots stay zero).

    Tries the native C++ packer first (see _build_ell_arrays)."""
    nrb = _pad8(math.ceil(m / bm))
    from fos_tpu import native

    nat = native.band_pack(rows, cols, vals, nrb, math.ceil(n / bn), bm, bn)
    if nat is not None:
        return nat
    ti = rows // bm
    tj = cols // bn
    lo = np.full(nrb, np.iinfo(np.int64).max, np.int64)
    hi = np.full(nrb, -1, np.int64)
    if rows.size:
        np.minimum.at(lo, ti, tj)
        np.maximum.at(hi, ti, tj)
    lo = np.where(hi >= 0, lo, 0)
    S = max(int((hi - lo + 1).max()) if rows.size else 1, 1)
    blocks = np.zeros((nrb, S, bm, bn), np.float32)
    if rows.size:
        # duplicates SUM (BCOO semantics), as in _build_ell_arrays
        np.add.at(blocks, (ti, tj - lo[ti], rows - ti * bm, cols - tj * bn),
                  vals)
    return blocks, lo.astype(np.int32), S


def tridiag_band_layout(blocks):
    """Convert block-tridiagonal ELL slots ``[low, diag, up]`` (cols
    ``clip(i-1..i+1)``, edge tiles zeroed) to the banded layout: slots
    line up with windows ``cs_i = clip(i - 1, 0, nrb - 3)`` — the first
    row shifts left, the last shifts right.  Shared by bench.py and
    tools/spmv_probe.py (device-side builders)."""
    blk = blocks.at[0].set(jnp.roll(blocks[0], -1, axis=0).at[2].set(0.0))
    blk = blk.at[-1].set(jnp.roll(blocks[-1], 1, axis=0).at[0].set(0.0))
    nrb = blocks.shape[0]
    cs = np.clip(np.arange(nrb) - 1, 0, nrb - 3).astype(np.int32)
    return blk, jnp.asarray(cs)


def band_span_ratio(A, bm=128, bn=128) -> float:
    """Banded-block storage (both layouts) relative to blocked-ELL storage
    — 1.0 when every row/col block's occupied tiles are contiguous (banded
    matrices), large when columns are scattered across the row."""
    rows, cols, _, m, n = _coo_parts(A)
    if rows.size == 0:
        return 1.0

    def one(r, c, mm, br, bc):
        nrb = _pad8(math.ceil(mm / br))
        ti = r // br
        tj = c // bc
        lo = np.full(nrb, np.iinfo(np.int64).max, np.int64)
        hi = np.full(nrb, -1, np.int64)
        np.minimum.at(lo, ti, tj)
        np.maximum.at(hi, ti, tj)
        span = int(np.where(hi >= 0, hi - lo + 1, 0).max())
        ncb_tiles = int(tj.max()) + 1
        upair = np.unique(ti.astype(np.int64) * ncb_tiles + tj)
        cnt = int(np.bincount(upair // ncb_tiles, minlength=nrb).max())
        return span / max(cnt, 1)

    # the transpose layout blocks rows by bn and columns by bm
    return max(one(rows, cols, m, bm, bn), one(cols, rows, n, bn, bm))


@jax.tree_util.register_pytree_node_class
class BandedBlockOp:
    """Banded-block sparse operator: same mv/rmv/shape/todense protocol as
    :class:`BlockedEllOp`, but each row block's tiles occupy a contiguous
    block-column window, so the SpMV kernel slices x contiguously instead
    of gathering per-tile rows (the ELL kernel's bandwidth limiter)."""

    def __init__(self, blocks, cs, blocks_t, cs_t, m, n,
                 bm=128, bn=128, interpret=False):
        self.blocks = blocks        # (nrb, S, bm, bn)
        self.cs = cs                # (nrb,) int32 window start (block cols)
        self.blocks_t = blocks_t    # A' tiles: (ncb, S_t, bn, bm)
        self.cs_t = cs_t
        self.m = m
        self.n = n
        self.bm = bm
        self.bn = bn
        self.interpret = interpret

    def tree_flatten(self):
        return (self.blocks, self.cs, self.blocks_t, self.cs_t), (
            self.m, self.n, self.bm, self.bn, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @classmethod
    def create(cls, A, *, bm=128, bn=128, interpret=None,
               transpose_table=True):
        """``transpose_table=False`` skips packing the A' tile table:
        ``mv_pair`` (the whole HSDE solve path) computes A'z from the A
        table, so the transpose table only serves standalone ``rmv`` —
        skipping it halves tile memory (and skips one of the two packs;
        wall-clock pack savings are allocator-noise-dominated at 1e7
        nnz)."""
        if interpret is None:
            from fos_tpu.config import is_tpu_backend

            interpret = not is_tpu_backend()
        rows, cols, vals, m, n = _coo_parts(A)
        blocks, cs, _ = _build_band_arrays(
            m, n, rows, cols, vals.astype(np.float32), bm, bn)

        def pad_s(blk):
            # S > 8 streams in 8-tile slabs along the second grid axis
            # (the kernels need S % st == 0); zero tiles contribute 0
            S = blk.shape[1]
            r = (-S) % 8 if S > 8 else 0
            if r:
                blk = np.concatenate(
                    [blk, np.zeros((blk.shape[0], r) + blk.shape[2:],
                                   blk.dtype)], axis=1)
            return blk

        blocks_t = cs_t = None
        if transpose_table:
            blocks_t, cs_t, _ = _build_band_arrays(
                n, m, cols, rows, vals.astype(np.float32), bn, bm)
            blocks_t = jnp.asarray(pad_s(blocks_t))
            cs_t = jnp.asarray(cs_t)
        return cls(jnp.asarray(pad_s(blocks)), jnp.asarray(cs),
                   blocks_t, cs_t, m, n, bm, bn, interpret)

    @property
    def shape(self):
        return (self.m, self.n)

    @property
    def dtype(self):
        return self.blocks.dtype

    def _ncb(self) -> int:
        """Column-block count: the A' table's row count when stored, else
        the SAME _pad8 formula the table builder uses — both storage modes
        must compile identical x/y2 block shapes and report identical
        occupancy for the same matrix."""
        if self.blocks_t is not None:
            return self.blocks_t.shape[0]
        return _pad8(math.ceil(self.n / self.bn))

    def occupancy(self) -> float:
        nrb, S = self.blocks.shape[:2]
        return (nrb * S) / float(nrb * self._ncb())

    def _pad_x(self, x, nblocks, width, S):
        # pad to nblocks*width, then S extra zero blocks so the trailing
        # window slice [cs, cs + S) never leaves the array
        pad = nblocks * width - x.shape[0] + S * width
        xb = jnp.pad(x, (0, pad)) if pad else x
        return xb.reshape(nblocks + S, width)

    _kernel = staticmethod(_band_mv)
    _pair_kernel = staticmethod(_band_mv_pair)

    def _mv_args(self, x):
        """(index table, tile table, padded input) for the mv kernel —
        shared by the local path and RowShardedOp."""
        S = self.blocks.shape[1]
        return self.cs, self.blocks, self._pad_x(x, self._ncb(), self.bn, S)

    def _rmv_args(self, y):
        if self.blocks_t is None:
            raise TypeError(
                "this BandedBlockOp was built with transpose_table=False "
                "(no A' tile table): use mv_pair for A'z, or rebuild with "
                "BandedBlockOp.create(A, transpose_table=True) for "
                "standalone rmv")
        nrb = self.blocks.shape[0]
        S_t = self.blocks_t.shape[1]
        return self.cs_t, self.blocks_t, self._pad_x(y, nrb, self.bm, S_t)

    def mv(self, x):
        idx, blocks, xb = self._mv_args(x)
        y = _band_mv(idx, blocks, xb, interpret=self.interpret)
        return y.reshape(-1)[: self.m]

    def rmv(self, y):
        idx, blocks, yb = self._rmv_args(y)
        z = _band_mv(idx, blocks, yb, interpret=self.interpret)
        return z.reshape(-1)[: self.n]

    def mv_pair(self, x, z):
        """(A @ x, A' @ z) from ONE stream of the A tile table — half the
        HBM traffic of mv + rmv (the A' table isn't touched).  This is the
        shape hsde_ops.q_mul consumes; measured on TPU v5e it takes the
        1e7-nnz LP from 2.36k to ~4k iters/s."""
        nrb, S = self.blocks.shape[:2]
        pad = nrb * self.bm - z.shape[0]
        zb = (jnp.pad(z, (0, pad)) if pad else z).reshape(nrb, self.bm)
        xb = self._pad_x(x, self._ncb(), self.bn, S)
        y1, y2 = _band_mv_pair(self.cs, self.blocks, xb, zb,
                               interpret=self.interpret)
        return y1.reshape(-1)[: self.m], y2.reshape(-1)[: self.n]

    def todense(self):
        nrb, S, bm, bn = self.blocks.shape
        ncb = self._ncb()
        dense = jnp.zeros((nrb * bm, (ncb + S) * bn), jnp.float32)
        for i in range(nrb):
            for k in range(S):
                ri = jnp.asarray(i * bm, jnp.int32)
                cj = (self.cs[i].astype(jnp.int32) + k) * bn
                dense = jax.lax.dynamic_update_slice(
                    dense,
                    jax.lax.dynamic_slice(dense, (ri, cj), (bm, bn))
                    + self.blocks[i, k],
                    (ri, cj))
        return dense[: self.m, : self.n]

    def astype(self, dtype):
        if jnp.dtype(dtype) == jnp.float32:
            return self
        raise TypeError("BandedBlockOp is f32-only (TPU kernel dtype)")


@jax.tree_util.register_pytree_node_class
class BlockedEllOp:
    """Duck-typed sparse drop-in for A in :mod:`fos_tpu.linalg.hsde_ops`
    (``mv``/``rmv``/``shape``/``todense`` protocol)."""

    def __init__(self, blocks, cols, blocks_t, cols_t, m, n,
                 bm=128, bn=128, interpret=False):
        self.blocks = blocks        # (nrb, kmax, bm, bn)
        self.cols = cols            # (nrb, kmax) int32
        self.blocks_t = blocks_t    # A' tiles: (ncb, kmax_t, bn, bm)
        self.cols_t = cols_t
        self.m = m
        self.n = n
        self.bm = bm
        self.bn = bn
        self.interpret = interpret

    def tree_flatten(self):
        return (self.blocks, self.cols, self.blocks_t, self.cols_t), (
            self.m, self.n, self.bm, self.bn, self.interpret)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    # ------------------------------------------------------------------
    @classmethod
    def create(cls, A, *, bm=128, bn=128, interpret=None,
               transpose_table=True):
        """Build from a scipy.sparse matrix or a jax BCOO.

        ``transpose_table=False`` skips packing the A' tile table (see
        BandedBlockOp.create): ``mv_pair`` serves A'z from the A table;
        only standalone ``rmv`` needs the transpose table."""
        if interpret is None:
            # Mosaic compiles only on TPU: interpret everywhere else
            from fos_tpu.config import is_tpu_backend

            interpret = not is_tpu_backend()
        rows, cols, vals, m, n = _coo_parts(A)
        blocks, cols_tab, _ = _build_ell_arrays(
            m, n, rows, cols, vals.astype(np.float32), bm, bn)
        blocks_t = cols_t_tab = None
        if transpose_table:
            blocks_t, cols_t_tab, _ = _build_ell_arrays(
                n, m, cols, rows, vals.astype(np.float32), bn, bm)
            blocks_t = jnp.asarray(blocks_t)
            cols_t_tab = jnp.asarray(cols_t_tab)
        return cls(jnp.asarray(blocks), jnp.asarray(cols_tab),
                   blocks_t, cols_t_tab, m, n, bm, bn, interpret)

    @property
    def shape(self):
        return (self.m, self.n)

    @property
    def dtype(self):
        return self.blocks.dtype

    def _ncb(self) -> int:
        # same _pad8 formula as the builder: both storage modes must agree
        # (see BandedBlockOp._ncb)
        if self.blocks_t is not None:
            return self.blocks_t.shape[0]
        return _pad8(math.ceil(self.n / self.bn))

    def occupancy(self) -> float:
        """Stored-tile fraction of the dense tile grid (storage and HBM
        traffic relative to a dense matvec; padding slots included)."""
        nrb, kmax = self.cols.shape
        return (nrb * kmax) / float(nrb * self._ncb())

    def _pad(self, x, blocks_of, width):
        nb = blocks_of
        pad = nb * width - x.shape[0]
        xb = jnp.pad(x, (0, pad)) if pad else x
        return xb.reshape(nb, width)

    _kernel = staticmethod(_bell_mv)
    _pair_kernel = staticmethod(_bell_mv_pair)

    def _mv_args(self, x):
        """(index table, tile table, padded input) for the mv kernel —
        shared by the local path and RowShardedOp."""
        return self.cols, self.blocks, self._pad(x, self._ncb(), self.bn)

    def _rmv_args(self, y):
        if self.blocks_t is None:
            raise TypeError(
                "this BlockedEllOp was built with transpose_table=False "
                "(no A' tile table): use mv_pair for A'z, or rebuild with "
                "BlockedEllOp.create(A, transpose_table=True) for "
                "standalone rmv")
        nrb = self.blocks.shape[0]
        return self.cols_t, self.blocks_t, self._pad(y, nrb, self.bm)

    def mv(self, x):
        idx, blocks, xb = self._mv_args(x)
        y = _bell_mv(idx, blocks, xb, interpret=self.interpret)
        return y.reshape(-1)[: self.m]

    def rmv(self, y):
        idx, blocks, yb = self._rmv_args(y)
        z = _bell_mv(idx, blocks, yb, interpret=self.interpret)
        return z.reshape(-1)[: self.n]

    def mv_pair(self, x, z):
        """(A @ x, A' @ z) from ONE stream of the A tile table — half the
        HBM traffic of mv + rmv (see BandedBlockOp.mv_pair)."""
        nrb = self.blocks.shape[0]
        idx, blocks, xb = self._mv_args(x)
        zb = self._pad(z, nrb, self.bm)
        y1, y2 = _bell_mv_pair(idx, blocks, xb, zb, interpret=self.interpret)
        return y1.reshape(-1)[: self.m], y2.reshape(-1)[: self.n]

    def todense(self):
        nrb, kmax, bm, bn = self.blocks.shape
        ncb = self._ncb()
        dense = jnp.zeros((nrb * bm, ncb * bn), jnp.float32)
        # scatter tiles (build-time utility; not a hot path)
        for i in range(nrb):
            for k in range(kmax):
                ri = jnp.asarray(i * bm, jnp.int32)
                cj = self.cols[i, k].astype(jnp.int32) * bn
                dense = jax.lax.dynamic_update_slice(
                    dense,
                    jax.lax.dynamic_slice(dense, (ri, cj), (bm, bn))
                    + self.blocks[i, k],
                    (ri, cj))
        return dense[: self.m, : self.n]

    def astype(self, dtype):
        if jnp.dtype(dtype) == jnp.float32:
            return self
        raise TypeError("BlockedEllOp is f32-only (TPU kernel dtype)")


def bell_storage_ratio(A, bm=128, bn=128) -> float:
    """Padded blocked-ELL storage (both A and A' layouts) relative to one
    dense copy — the build layer's profitability estimate.  Computed from
    the index pattern only (no tile data materialized)."""
    rows, cols, _, m, n = _coo_parts(A)
    nrb = _pad8(math.ceil(m / bm))
    ncb = _pad8(math.ceil(n / bn))
    ti = rows // bm
    tj = cols // bn
    pair = ti.astype(np.int64) * ncb + tj
    upair = np.unique(pair)
    kmax = int(np.bincount(upair // ncb, minlength=nrb).max()) if upair.size else 1
    kmax_t = int(np.bincount(upair % ncb, minlength=ncb).max()) if upair.size else 1
    return ((nrb * kmax + ncb * kmax_t) * bm * bn) / float(m * n)


@jax.tree_util.register_pytree_node_class
class RowShardedOp:
    """Multi-chip wrapper for a :class:`BandedBlockOp` / :class:`BlockedEllOp`:
    tile arrays (the big data) are sharded by block-row over a mesh axis,
    ``mv``/``rmv`` run the LOCAL Pallas kernel per device under
    ``shard_map`` and all-gather the (small, O(m)+O(n)) result vectors.
    x/y stay replicated — the communication pattern of SURVEY.md §5 with
    the matvec itself kept out of GSPMD's hands (a ``pallas_call`` is
    opaque to the partitioner; ``shard_map`` makes the split explicit).

    Both the A and A' tile tables are sharded along their OWN row axes, so
    neither direction needs a reduction — one tiled all-gather each.

    ``axis`` may be a single mesh-axis name or a TUPLE of names for
    hierarchical multi-host meshes (e.g. ``("dcn", "ici")``): block rows
    are split over the axis product (outer axis major, matching
    ``PartitionSpec`` order) and the result all-gather runs over the same
    product group — XLA decomposes it into the per-network phases, so the
    big tile tables never move and only the O(m)+O(n) vectors cross DCN.
    """

    def __init__(self, inner, mesh, axis="model"):
        self.inner = inner
        self.mesh = mesh
        self.axis = (axis,) if isinstance(axis, str) else tuple(axis)

    def tree_flatten(self):
        return (self.inner,), (self.mesh, self.axis)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def create(cls, op, mesh, axis="model"):
        """Shard ``op``'s tile leaves P(axis, ...).  Block-row counts are
        zero-padded to a multiple of the axis-product size first (zero
        tiles with index 0 contribute nothing), so any matrix works on any
        mesh."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        ndev = 1
        for a in axes:
            ndev *= mesh.shape[a]

        def pad0(x):
            r = (-x.shape[0]) % ndev
            if r:
                x = jnp.concatenate(
                    [x, jnp.zeros((r,) + x.shape[1:], x.dtype)], axis=0)
            return x

        ch, aux = op.tree_flatten()   # (blocks, idx, blocks_t, idx_t)
        placed = tuple(
            jax.device_put(pad0(x),
                           NamedSharding(mesh, P(axes,
                                                 *([None] * (x.ndim - 1)))))
            if x is not None else None   # transpose_table=False ops
            for x in ch)
        return cls(type(op).tree_unflatten(aux, placed), mesh, axes)

    # -- protocol ----------------------------------------------------
    @property
    def shape(self):
        return self.inner.shape

    @property
    def m(self):
        return self.inner.m

    @property
    def n(self):
        return self.inner.n

    @property
    def dtype(self):
        return self.inner.dtype

    def _sharded_kernel(self, idx, blocks, xb):
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        interpret = self.inner.interpret
        kernel = type(self.inner)._kernel

        axes = self.axis

        def local(idx_l, blocks_l, xb_l):
            y = kernel(idx_l, blocks_l, xb_l, interpret=interpret)
            # multi-axis: MUST gather the INNER (minor) axis first — shard
            # order over P(("dcn","ici")) is outer-major (device (d,i)
            # holds shard d*n_ici + i), and only inner-first gathering
            # reassembles that order (outer-first would interleave:
            # [s0,s4,s1,s5,...] on a 2x4 mesh).  A bonus, not the reason:
            # the later DCN phase then moves one contiguous per-host block.
            for a in reversed(axes):
                y = jax.lax.all_gather(y, a, axis=0, tiled=True)
            return y

        nd1 = blocks.ndim - 1
        return shard_map(
            local, mesh=self.mesh,
            in_specs=(P(axes, *([None] * (idx.ndim - 1))),
                      P(axes, *([None] * nd1)), P(None, None)),
            out_specs=P(None, None), check_vma=False,
        )(idx, blocks, xb)

    def mv(self, x):
        idx, blocks, xb = self.inner._mv_args(x)
        y = self._sharded_kernel(idx, blocks, xb)
        return y.reshape(-1)[: self.inner.m]

    def rmv(self, y):
        idx, blocks, yb = self.inner._rmv_args(y)
        z = self._sharded_kernel(idx, blocks, yb)
        return z.reshape(-1)[: self.inner.n]

    def mv_pair(self, x, z):
        """Fused (A @ x, A' @ z) from ONE stream of the sharded A table:
        each device runs the local fused-pair kernel on its block rows,
        then y1 = tiled all-gather over the row axis (as mv) and y2 = psum
        of the per-device partial A'z (a device's rows contribute only to
        its own column windows, zero elsewhere).  Halves per-device HBM
        tile traffic exactly like the local mv_pair."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        inner = self.inner
        idx, blocks, xb = inner._mv_args(x)
        nrb = blocks.shape[0]
        bm = blocks.shape[-2]
        pad = nrb * bm - z.shape[0]
        zb = (jnp.pad(z, (0, pad)) if pad else z).reshape(nrb, bm)
        interpret = inner.interpret
        kernel = type(inner)._pair_kernel
        axes = self.axis

        def local(idx_l, blocks_l, xb_l, zb_l):
            y1, y2 = kernel(idx_l, blocks_l, xb_l, zb_l, interpret=interpret)
            for a in reversed(axes):  # inner-first (see _sharded_kernel)
                y1 = jax.lax.all_gather(y1, a, axis=0, tiled=True)
            y2 = jax.lax.psum(y2, axes)
            return y1, y2

        nd1 = blocks.ndim - 1
        y1, y2 = shard_map(
            local, mesh=self.mesh,
            in_specs=(P(axes, *([None] * (idx.ndim - 1))),
                      P(axes, *([None] * nd1)), P(None, None), P(axes, None)),
            out_specs=(P(None, None), P(None, None)), check_vma=False,
        )(idx, blocks, xb, zb)
        return (y1.reshape(-1)[: inner.m], y2.reshape(-1)[: inner.n])

    def todense(self):
        return self.inner.todense()

    def astype(self, dtype):
        if jnp.dtype(dtype) == jnp.float32:
            return self
        raise TypeError("RowShardedOp is f32-only (TPU kernel dtype)")


def _coo_parts(A):
    """Extract (rows, cols, vals, m, n) from scipy.sparse or BCOO."""
    if hasattr(A, "tocoo"):  # scipy.sparse
        coo = A.tocoo()
        return (np.asarray(coo.row), np.asarray(coo.col),
                np.asarray(coo.data), *A.shape)
    if hasattr(A, "indices"):  # jax BCOO
        idx = np.asarray(A.indices)
        return (idx[:, 0], idx[:, 1], np.asarray(A.data), *A.shape)
    raise TypeError(f"cannot build BlockedEllOp from {type(A)}")
