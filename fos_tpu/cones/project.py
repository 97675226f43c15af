"""Fused cone-product projection.

The reference projects a product of cones with a sequential per-block Julia
loop (/root/reference/src/cones.jl:89-94, with a ``#TODO Paralell
implementation`` note).  The TPU-native design compiles a :class:`ConeSpec`
once into a *single fused projection pass* over the whole vector:

* all elementwise cones (Free/Zero/NonNeg/NonPos) become one masked clip
  with precomputed lower/upper-bound vectors;
* all SOC blocks (any sizes, any count) are projected together with one
  segment-reduction (`segment_sum`) pass — no per-block loop;
* rotated-SOC blocks are folded into the SOC pass through the orthogonal
  rotation H = [[1,1],[1,-1]]/sqrt(2) applied to their first two entries;
* PSD blocks are bucketed by matrix side and projected with batched ``eigh``
  in the scaled svec layout (matching ProximalOperators ``IndPSD(scaling=
  true)``, see /root/reference/src/cones.jl:11);
* exponential-cone blocks are gathered to an ``(k, 3)`` batch and projected
  with the vmapped root-finder in :mod:`fos_tpu.cones.exp`.

Dual-cone projection is pure spec algebra: ``project_dual(spec, x) ==
project(spec.dual(), x)`` because every cone type has a closed-form dual in
the registry (src/cones.jl:97-102); only ExpDual falls back to the Moreau
identity internally.
"""

from __future__ import annotations

import functools
from typing import Callable, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from fos_tpu.cones.spec import Cone, ConeSpec, psd_side_from_len
from fos_tpu.cones import exp as exp_cone
from fos_tpu.cones import pow as pow_cone

_SQRT2 = float(np.sqrt(2.0))  # Python float: weak-typed so f32 inputs stay f32


@jax.custom_jvp
def psd_project_eigh(X):
    """Eigh-based projection of symmetric ``X`` onto the PSD cone, with a
    degeneracy-safe derivative.

    JAX's stock ``eigh`` JVP divides by eigenvalue gaps ``li - lj`` and
    returns NaN on (numerically) repeated eigenvalues — which REAL SDP
    solutions hit constantly (a rank-r optimum has ``side - r`` repeated
    zeros; symmetric data repeats nonzeros).  The projection itself is
    perfectly differentiable there: its directional derivative is the
    classic Daleckii–Krein divided-difference form

        ``DP(X)[E] = V (K o (V' E V)) V'``,
        ``K_ij = (f(li) - f(lj)) / (li - lj)`` with ``f = max(., 0)``,

    whose diagonal/degenerate limit is ``f'(l) = step(l)`` — finite for
    every pair.  Where ``li = lj = 0`` exactly (a genuinely nonsmooth
    point) the symmetric subgradient ``(step(li) + step(lj)) / 2`` is used.
    The JVP is linear in the tangent, so JAX transposes it automatically —
    reverse mode (``jax.grad`` through :func:`fos_tpu.diff.diff_solve` on
    SDPs) works too.
    """
    w, V = jnp.linalg.eigh(X)
    return jnp.einsum("...ik,...k,...jk->...ij", V, jnp.maximum(w, 0.0), V,
                      precision=jax.lax.Precision.HIGHEST)


@psd_project_eigh.defjvp
def _psd_project_eigh_jvp(primals, tangents):
    (X,) = primals
    (E,) = tangents
    w, V = jnp.linalg.eigh(X)
    f = jnp.maximum(w, 0.0)
    Y = jnp.einsum("...ik,...k,...jk->...ij", V, f, V,
                   precision=jax.lax.Precision.HIGHEST)

    wi = w[..., :, None]
    wj = w[..., None, :]
    den = wi - wj
    scale = jnp.max(jnp.abs(w), axis=-1, keepdims=True)[..., None]
    tiny = 100.0 * jnp.finfo(w.dtype).eps
    same = jnp.abs(den) <= tiny * jnp.maximum(scale, 1.0)
    step = (w > 0.0).astype(w.dtype)
    avg = 0.5 * (step[..., :, None] + step[..., None, :])
    num = f[..., :, None] - f[..., None, :]
    K = jnp.where(same, avg, num / jnp.where(same, 1.0, den))

    _hi = jax.lax.Precision.HIGHEST
    Et = jnp.einsum("...ki,...kl,...lj->...ij", V, E, V, precision=_hi)
    dY = jnp.einsum("...ik,...kl,...jl->...ij", V, K * Et, V, precision=_hi)
    return Y, dY


def _build_plan(blocks: Tuple[Tuple[Cone, int], ...],
                params: Tuple[Tuple[float, ...], ...] = ()):
    """Precompute (as numpy constants) the index arrays for the fused pass."""
    dim = sum(d for _, d in blocks)
    lo = np.full(dim, -np.inf)
    hi = np.full(dim, np.inf)

    soc_idx = []       # element indices of all SOC elements, in block order
    soc_seg = []       # segment id per element
    soc_head = []      # head mask per element
    rot_pq = []        # (p_idx, q_idx) pairs needing the rotation transform
    psd_groups = {}    # side -> list of block start offsets
    exp_idx = []       # starts of primal exp 3-blocks
    exp_dual_idx = []  # starts of dual exp 3-blocks
    pow_idx = []       # (start, alpha) of primal power 3-blocks
    pow_dual_idx = []  # (start, alpha) of dual power 3-blocks

    if params == ():
        if any(cone in (Cone.POW_PRIMAL, Cone.POW_DUAL) for cone, _ in blocks):
            raise ValueError(
                "power-cone blocks need per-block alpha params; an empty "
                "params tuple would silently project POW slices as FREE "
                "(mirror of the ConeSpec.__post_init__ guard)")
        params = tuple(() for _ in blocks)
    off = 0
    seg = 0
    for (cone, d), par in zip(blocks, params):
        sl = np.arange(off, off + d)
        if cone is Cone.FREE:
            pass
        elif cone is Cone.ZERO:
            lo[sl] = 0.0
            hi[sl] = 0.0
        elif cone is Cone.NONNEG:
            lo[sl] = 0.0
        elif cone is Cone.NONPOS:
            hi[sl] = 0.0
        elif cone in (Cone.SOC, Cone.SOC_ROTATED):
            if cone is Cone.SOC_ROTATED:
                rot_pq.append((off, off + 1))
            soc_idx.append(sl)
            soc_seg.append(np.full(d, seg))
            head = np.zeros(d, dtype=bool)
            head[0] = True
            soc_head.append(head)
            seg += 1
        elif cone is Cone.PSD:
            side = psd_side_from_len(d)
            psd_groups.setdefault(side, []).append(off)
        elif cone is Cone.EXP_PRIMAL:
            exp_idx.extend(range(off, off + d, 3))
        elif cone is Cone.EXP_DUAL:
            exp_dual_idx.extend(range(off, off + d, 3))
        elif cone is Cone.POW_PRIMAL:
            pow_idx.extend(zip(range(off, off + d, 3), par))
        elif cone is Cone.POW_DUAL:
            pow_dual_idx.extend(zip(range(off, off + d, 3), par))
        else:  # pragma: no cover
            raise NotImplementedError(cone)
        off += d

    plan = {
        "dim": dim,
        "lo": lo,
        "hi": hi,
        "elementwise_only": not (soc_idx or psd_groups or exp_idx
                                 or exp_dual_idx or pow_idx or pow_dual_idx),
        "soc": None,
        "psd": [],
        "exp": None,
        "exp_dual": None,
        "pow": None,
        "pow_dual": None,
    }
    if soc_idx:
        plan["soc"] = {
            "idx": np.concatenate(soc_idx),
            "seg": np.concatenate(soc_seg).astype(np.int32),
            "head": np.concatenate(soc_head),
            "nseg": seg,
            "rot_p": np.array([p for p, _ in rot_pq], dtype=np.int64),
            "rot_q": np.array([q for _, q in rot_pq], dtype=np.int64),
        }
    # Heterogeneous-side bucketing: a spec with many distinct PSD sides
    # (common in SDP relaxations) would otherwise compile one eigh/poly
    # pass PER side.  Sides sharing a power-of-2 ceiling are padded into
    # one batch (PSD projection commutes with zero-padding: eigendecompose
    # blockdiag(X, 0)), trading <= (S/s)^2 ~ 4x flops on the smaller
    # blocks for a single fused pass per bucket.
    if len(psd_groups) > 2:
        buckets = {}
        for side, offs in sorted(psd_groups.items()):
            key = 1 << (side - 1).bit_length()
            buckets.setdefault(key, []).append((side, offs))
        grouped = [(max(s for s, _ in entries), entries)
                   for _, entries in sorted(buckets.items())]
    else:
        grouped = [(side, [(side, offs)])
                   for side, offs in sorted(psd_groups.items())]
    for S, entries in grouped:
        LS = S * (S + 1) // 2
        gather, rows, cols, mask = [], [], [], []
        for side, offs in entries:
            L = side * (side + 1) // 2
            # svec order: lower triangle stacked by columns.
            r = np.array([i for j in range(side) for i in range(j, side)])
            c = np.array([j for j in range(side) for i in range(j, side)])
            pad = LS - L
            for o in offs:
                gather.append(np.concatenate(
                    [np.arange(o, o + L), np.zeros(pad, np.int64)]))
                rows.append(np.concatenate([r, np.zeros(pad, np.int64)]))
                cols.append(np.concatenate([c, np.zeros(pad, np.int64)]))
                mask.append(np.concatenate(
                    [np.ones(L, bool), np.zeros(pad, bool)]))
        rows = np.stack(rows)
        cols = np.stack(cols)
        mask = np.stack(mask)
        # padding slots target the first PADDED diagonal position (side,
        # side) — never a real entry, so scatters can't clobber data
        for k in range(rows.shape[0]):
            if not mask[k].all():
                s_k = int(mask[k].sum())
                d_k = psd_side_from_len(s_k)
                rows[k, ~mask[k]] = d_k
                cols[k, ~mask[k]] = d_k
        entry = {
            "side": S,
            "gather": np.stack(gather),      # (nb, LS)
            "rows": rows,                    # (nb, LS)
            "cols": cols,
            "mask": mask,                    # False on padding slots
            "uniform": bool(mask.all()),
            "offdiag": (rows != cols) & mask,
        }
        # Column-runs fast path for LARGE unpadded blocks: element
        # gather/scatter of the triangle costs ~18 ms at side 1024 on TPU
        # (no fast unstructured gather); the svec layout is column-stacked
        # CONTIGUOUS runs, so the matrix builds from S fixed-length
        # dynamic slices (gather-of-slices, ~1 ms) and packs back with a
        # reverse-order run-write loop (~1.5 ms) — measured 6.7x on the
        # wrap at d=1024 (PERF.md r5).  Small/padded buckets keep the
        # batched gather path (hardware-validated r4).
        if entry["uniform"] and S >= 256 and len(gather) <= 8:
            col = np.arange(S)
            entry["run_starts"] = (col * S - (col * (col - 1)) // 2
                                   - col).astype(np.int32)
            entry["bases"] = tuple(
                int(o) for _, offs in entries for o in offs)
        plan["psd"].append(entry)
    if exp_idx:
        starts = np.array(exp_idx)
        plan["exp"] = starts[:, None] + np.arange(3)[None, :]  # (k, 3)
    if exp_dual_idx:
        starts = np.array(exp_dual_idx)
        plan["exp_dual"] = starts[:, None] + np.arange(3)[None, :]
    for key, entries in (("pow", pow_idx), ("pow_dual", pow_dual_idx)):
        if entries:
            starts = np.array([s for s, _ in entries])
            plan[key] = {
                "idx": starts[:, None] + np.arange(3)[None, :],  # (k, 3)
                "alpha": np.array([a for _, a in entries]),      # (k,)
            }
    return plan


def _soc_project_flat(vals, seg, head, nseg):
    """Project concatenated SOC blocks described by segment ids.

    SOC(t, x): if ||x|| <= t identity; if ||x|| <= -t zero; else
    ((t+||x||)/2) * (1, x/||x||).
    """
    v = jnp.moveaxis(vals, -1, 0)  # (N, ...batch)
    head_b = head.reshape((head.shape[0],) + (1,) * (v.ndim - 1))
    t_per_elem = jnp.where(head_b, v, 0.0)
    tail = jnp.where(head_b, 0.0, v)
    t = jax.ops.segment_sum(t_per_elem, seg, num_segments=nseg, indices_are_sorted=True)
    nx2 = jax.ops.segment_sum(tail * tail, seg, num_segments=nseg, indices_are_sorted=True)
    nx = jnp.sqrt(nx2)

    ident = nx <= t
    zero = nx <= -t
    c = 0.5 * (t + nx)
    nx_safe = jnp.where(nx > 0, nx, 1.0)
    scale_tail = jnp.where(ident, 1.0, jnp.where(zero, 0.0, c / nx_safe))
    t_out = jnp.where(ident, t, jnp.where(zero, 0.0, c))

    out = jnp.where(head_b, t_out[seg], tail * scale_tail[seg])
    return jnp.moveaxis(out, 0, -1)


def make_projector(blocks: Tuple[Tuple[Cone, int], ...],
                   psd_method: str = "eigh",
                   params: Tuple[Tuple[float, ...], ...] = ()) -> Callable:
    """Compile a fused projection function for a product of cones.

    ``psd_method``: "eigh" (default) or "poly" — the factorization-free
    matmul-only Newton-Schulz filter (cones/psd_poly.py), the MXU-native
    fast path for large/batched PSD blocks.  ``params`` carries per-block
    cone parameters (POW exponents), aligned as in :class:`ConeSpec`.
    """
    plan = _build_plan(tuple(blocks), tuple(params))
    lo = plan["lo"]
    hi = plan["hi"]
    finite_lo = np.isfinite(lo).any() or np.isfinite(hi).any()

    def project_fn(x):
        if x.shape[-1] != plan["dim"]:
            raise ValueError(f"expected trailing dim {plan['dim']}, got {x.shape}")
        y = x
        if finite_lo:
            y = jnp.clip(
                x, jnp.asarray(lo, dtype=x.dtype), jnp.asarray(hi, dtype=x.dtype)
            )
        soc = plan["soc"]
        if soc is not None:
            vals = x[..., soc["idx"]]
            if soc["rot_p"].size:
                p = x[..., soc["rot_p"]]
                q = x[..., soc["rot_q"]]
                # rotate (p, q) -> ((p+q)/sqrt2, (p-q)/sqrt2); H is involutive.
                vals = vals.at[..., _rot_positions(soc)].set(
                    jnp.stack([(p + q) / _SQRT2, (p - q) / _SQRT2], axis=-1).reshape(
                        *p.shape[:-1], -1
                    )
                )
            out = _soc_project_flat(vals, soc["seg"], soc["head"], soc["nseg"])
            if soc["rot_p"].size:
                pos = _rot_positions(soc)
                pr = out[..., pos[0::2]]
                qr = out[..., pos[1::2]]
                out = out.at[..., pos].set(
                    jnp.stack([(pr + qr) / _SQRT2, (pr - qr) / _SQRT2], axis=-1).reshape(
                        *pr.shape[:-1], -1
                    )
                )
            y = y.at[..., soc["idx"]].set(out)
        for grp in plan["psd"]:
            y = _psd_project_group(x, y, grp, psd_method)
        if plan["exp"] is not None:
            v = x[..., plan["exp"]]  # (..., k, 3)
            out = _apply_exp(v, exp_cone.project_exp_single)
            y = y.at[..., plan["exp"]].set(out)
        if plan["exp_dual"] is not None:
            v = x[..., plan["exp_dual"]]
            out = _apply_exp(v, exp_cone.project_exp_dual_single)
            y = y.at[..., plan["exp_dual"]].set(out)
        for key, single_fn in (("pow", pow_cone.project_pow_single),
                               ("pow_dual", pow_cone.project_pow_dual_single)):
            if plan[key] is not None:
                v = x[..., plan[key]["idx"]]  # (..., k, 3)
                alpha = jnp.asarray(plan[key]["alpha"], dtype=x.dtype)
                out = _apply_pow(v, alpha, single_fn)
                y = y.at[..., plan[key]["idx"]].set(out)
        return y

    return project_fn


def _apply_exp(v, single_fn):
    """vmap an exp projection over the block axis (and any batch axes)."""
    fn = single_fn
    for _ in range(v.ndim - 1):
        fn = jax.vmap(fn)
    return fn(v)


def _apply_pow(v, alpha, single_fn):
    """vmap a power projection over the block axis (alpha paired per block)
    and over any leading batch axes (alpha broadcast)."""
    fn = jax.vmap(single_fn, in_axes=(0, 0))
    for _ in range(v.ndim - 2):
        fn = jax.vmap(fn, in_axes=(0, None))
    return fn(v, alpha)


@functools.lru_cache(maxsize=None)
def _rot_positions_cached(idx_key, rot_p_key):
    idx, rot_p = np.array(idx_key), np.array(rot_p_key)
    lookup = {e: i for i, e in enumerate(idx)}
    pos = []
    for p in rot_p:
        pos.append(lookup[p])
        pos.append(lookup[p + 1])
    return np.array(pos)


def _rot_positions(soc):
    return _rot_positions_cached(tuple(soc["idx"]), tuple(soc["rot_p"]))


def _psd_project_group_runs(x, y, grp, psd_method: str = "eigh"):
    """Column-runs variant of :func:`_psd_project_group` for large unpadded
    blocks (see the plan builder comment).  svec column ``j`` of a block at
    base ``b`` occupies the contiguous run ``x[b+off_j : b+off_j+(S-j)]``
    with ``off_j = j*S - j(j-1)/2``; with ``start_j = off_j - j`` the
    fixed-length window ``x[b+start_j : b+start_j+S]`` holds ``X[i, j]``
    at offset ``i`` for every ``i >= j``, and by symmetry the ``i < j``
    entries come from the transposed window — so the full matrix is
    ``where(i >= j, C^T, C)`` of the S-window stack C (one gather-of-
    slices, no element scatter).  The pack back writes the S windows in
    REVERSE column order: window ``j-1`` ends exactly at ``off_j``, so
    each write's invalid prefix lands in territory a later (smaller-j)
    write owns (measured bit-exact vs the gather path)."""
    S = grp["side"]
    starts = jnp.asarray(grp["run_starts"])          # (S,) int32
    LS = S * (S + 1) // 2
    ii = jnp.arange(S)[:, None]
    jj = jnp.arange(S)[None, :]
    offd = (ii != jj)
    unscale = jnp.where(offd, 1.0 / _SQRT2, 1.0).astype(x.dtype)
    rescale = jnp.where(offd, _SQRT2, 1.0).astype(x.dtype)

    blocks = []
    for base in grp["bases"]:
        blk = x[..., base:base + LS]
        C = jax.vmap(
            lambda s: jax.lax.dynamic_slice_in_dim(blk, s, S, axis=-1)
        )(starts)                                    # (S_j, ..., S_i)
        C = jnp.moveaxis(C, 0, -2)                   # (..., S_j, S_i)
        CT = jnp.swapaxes(C, -1, -2)                 # (..., i, j)
        blocks.append(jnp.where(ii >= jj, CT, jnp.swapaxes(CT, -1, -2)))
    X = jnp.stack(blocks, axis=-3) * unscale         # (..., nb, S, S)

    if psd_method == "poly":
        from fos_tpu.cones.psd_poly import psd_project_poly

        Xp = psd_project_poly(X)
    else:
        Xp = psd_project_eigh(X)
    Xp = Xp * rescale

    for k, base in enumerate(grp["bases"]):
        Yt = jnp.swapaxes(Xp[..., k, :, :], -1, -2)  # (..., j, i)

        def body(t, out):
            j = S - 1 - t
            row = jax.lax.dynamic_index_in_dim(Yt, j, axis=-2,
                                               keepdims=False)
            return jax.lax.dynamic_update_slice_in_dim(
                out, row, starts[j], axis=-1)

        blk_out = jax.lax.fori_loop(
            0, S, body, jnp.zeros(Yt.shape[:-2] + (LS,), x.dtype),
            unroll=16)
        y = y.at[..., base:base + LS].set(blk_out)
    return y


def _psd_project_group(x, y, grp, psd_method: str = "eigh"):
    """Batched PSD projection for all blocks of one bucket (same padded
    side; heterogeneous real sides zero-padded — projection commutes with
    zero-padding since eigendecomposition respects block-diagonal zeros).

    Matches ProximalOperators ``IndPSD(scaling=true)``: the svec vector holds
    the lower triangle column-stacked with off-diagonals scaled by sqrt(2),
    so ||svec(X)|| = ||X||_F and projection commutes with the layout.
    """
    if "run_starts" in grp:
        return _psd_project_group_runs(x, y, grp, psd_method)
    side = grp["side"]
    rows, cols = grp["rows"], grp["cols"]  # (nb, L)
    nb = rows.shape[0]
    mask = jnp.asarray(grp["mask"])
    vals = x[..., grp["gather"]]  # (..., nb, L)
    if not grp["uniform"]:
        vals = jnp.where(mask, vals, 0.0)
    unscale = jnp.where(jnp.asarray(grp["offdiag"]), 1.0 / _SQRT2, 1.0).astype(x.dtype)
    tri = vals * unscale
    batch_shape = vals.shape[:-1]
    bidx = np.arange(nb)[:, None]
    X = jnp.zeros((*batch_shape[:-1], nb, side, side), dtype=x.dtype)
    X = X.at[..., bidx, rows, cols].set(tri)
    X = X.at[..., bidx, cols, rows].set(tri)
    if psd_method == "poly":
        from fos_tpu.cones.psd_poly import psd_project_poly

        Xp = psd_project_poly(X)
    else:
        Xp = psd_project_eigh(X)
    out = Xp[..., bidx, rows, cols] * (1.0 / unscale)
    if grp["uniform"]:
        return y.at[..., grp["gather"]].set(out)
    # masked scatter via add-of-delta: padded slots contribute exactly 0,
    # so their duplicate target indices cannot corrupt y
    delta = jnp.where(mask, out - y[..., grp["gather"]], 0.0)
    return y.at[..., grp["gather"]].add(delta)


@functools.lru_cache(maxsize=None)
def _projector_for(blocks, psd_method="eigh", params=()):
    return make_projector(blocks, psd_method, params)


def resolve_psd_method(psd_method: str) -> str:
    """"auto" -> "poly" on accelerators, "eigh" on CPU.

    Measured on TPU v5e (f32, batched 64x64): the matmul-only filter is both
    ~9x faster AND ~5000x more accurate than XLA's f32 eigh (3.7e-7 vs
    2.1e-3 max error against f64 ground truth).
    """
    if psd_method == "auto":
        import jax as _jax

        return "poly" if _jax.default_backend() != "cpu" else "eigh"
    return psd_method


def project(spec: ConeSpec, x, psd_method: str = "auto"):
    """Project ``x`` onto the cone product described by ``spec``."""
    return _projector_for(spec.blocks, resolve_psd_method(psd_method),
                          spec.params)(x)


def project_dual(spec: ConeSpec, x, psd_method: str = "auto"):
    """Project ``x`` onto the dual cone product.

    Reference semantics: ``proxDual!(y, C, x) = x + prox(C, -x)`` with
    closed-form shortcuts (src/cones.jl:80-102); here duality is resolved at
    the spec level instead.
    """
    dual = spec.dual()
    return _projector_for(dual.blocks, resolve_psd_method(psd_method),
                          dual.params)(x)


def svec(X, scaled: bool = True):
    """Vectorize a symmetric matrix into the svec layout used by Cone.PSD."""
    d = X.shape[-1]
    rows, cols = [], []
    for j in range(d):
        for i in range(j, d):
            rows.append(i)
            cols.append(j)
    v = X[..., np.array(rows), np.array(cols)]
    if scaled:
        off = np.array(rows) != np.array(cols)
        v = v * jnp.where(jnp.asarray(off), _SQRT2, 1.0).astype(X.dtype)
    return v


def smat(v, scaled: bool = True):
    """Inverse of :func:`svec`."""
    L = v.shape[-1]
    d = psd_side_from_len(L)
    rows, cols = [], []
    for j in range(d):
        for i in range(j, d):
            rows.append(i)
            cols.append(j)
    rows = np.array(rows)
    cols = np.array(cols)
    tri = v
    if scaled:
        off = rows != cols
        tri = v * jnp.where(jnp.asarray(off), 1.0 / _SQRT2, 1.0).astype(v.dtype)
    X = jnp.zeros((*v.shape[:-1], d, d), dtype=v.dtype)
    X = X.at[..., rows, cols].set(tri)
    X = X.at[..., cols, rows].set(tri)
    return X
