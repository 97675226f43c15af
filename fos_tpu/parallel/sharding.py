"""Device-mesh sharding for large problems and instance batches.

The reference has no distribution story at all (SURVEY.md §2c); the
TPU-native scale-out follows the GSPMD recipe: build a
``jax.sharding.Mesh``, annotate the data layout with ``NamedSharding``, jit
the *same* solver code, and let XLA insert the collectives.  The only
communication points are the ones identified in SURVEY.md §5: the two dot
products per CG iteration, the matvec reductions when A is sharded, and the
residual norms in the convergence check — all become ``psum``-style
collectives over ICI automatically.

Two axes:

* ``batch`` — independent problem instances (data parallel);
* ``model`` — row-block sharding of A for one large problem (tensor
  parallel): ``A: P('model', None)``, ``b: P('model')``, c replicated; the
  HSDE iterate z is kept replicated (it is ~m+n, small next to A).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Sequence[int] = None, names: Sequence[str] = ("batch", "model"),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if shape is None:
        shape = (len(devices), 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, names)


def make_hybrid_mesh(outer: int, inner: int,
                     names: Sequence[str] = ("batch", "model")) -> Mesh:
    """Hierarchical mesh for multi-host topologies: the ``outer`` axis is
    meant to ride DCN (one group per host/slice — put the data-parallel
    batch axis there, it only communicates at termination voting), the
    ``inner`` axis to ride ICI (model/row sharding — it carries the psum
    per CG dot).  On a real multi-host runtime the assignment uses
    ``mesh_utils.create_hybrid_device_mesh`` so inner-axis neighbours share
    a host; on one host (or the virtual CPU mesh) it reduces to a reshape,
    which keeps the layout semantics testable anywhere.
    """
    devices = jax.devices()
    if outer * inner != len(devices):
        raise ValueError(f"mesh {outer}x{inner} != {len(devices)} devices")
    if jax.process_count() > 1:
        from jax.experimental import mesh_utils

        mesh_devices = mesh_utils.create_hybrid_device_mesh(
            (inner,), (outer,), devices=devices)
        # hybrid util returns (dcn, ici)-ordered axes already
        return Mesh(mesh_devices.reshape(outer, inner), names)
    return Mesh(np.asarray(devices).reshape(outer, inner), names)


def shard_batched_form(form, mesh: Mesh, axis: str = "batch"):
    """Place a batched HSDEForm so the instance axis is split over ``axis``."""
    def put(x):
        if x is None or not hasattr(x, "ndim"):
            return x
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, form)


def shard_problem_rows(form, mesh: Mesh, axis: str = "model"):
    """Row-block shard one large problem: A by rows, b alongside; c and the
    iterate stay replicated.  A'y then contracts over the sharded row axis
    (XLA inserts the psum); A x is local per row block."""
    s_rows2d = NamedSharding(mesh, P(axis, None))
    s_rows1d = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    def put(x):
        if x is None or not hasattr(x, "ndim"):
            return x
        # Shard by shape: A is the only (m, ·) 2-D leaf, b the only m-vector
        # (m != n is validated below so an (n,)-leaf can't mis-shard).
        if x.ndim == 2 and x.shape[0] == form.m:
            return jax.device_put(x, s_rows2d)
        if x.ndim == 1 and x.shape[0] == form.m:
            return jax.device_put(x, s_rows1d)
        return jax.device_put(x, repl)

    if form.m == form.n:
        raise ValueError(
            "shard_problem_rows dispatches on leaf shapes and requires "
            "m != n (square problems would mis-shard c); pad A with a "
            "redundant row or use shard_problem_2d")
    return jax.tree_util.tree_map(put, form)


def shard_batched_form_rows(form, mesh: Mesh, batch_axis: str = "batch",
                            model_axis: str = "model"):
    """Combined data x model parallelism for a batched HSDEForm: instances
    split over ``batch_axis`` (DCN-friendly: no per-iteration traffic) AND
    each instance's A row-sharded over ``model_axis`` (ICI: psum per CG
    dot).  This is the two-level layout for a pod — e.g. a (hosts, 4) mesh
    from :func:`make_hybrid_mesh`.

    Layouts: A (B,m,n): P(batch, model, None); b (B,m): P(batch, model);
    c (B,n) and everything else (B, ...): P(batch, None, ...).
    """
    if form.m == form.n:
        raise ValueError(
            "shard_batched_form_rows dispatches on leaf shapes and requires "
            "m != n (square problems would mis-shard c)")
    s_A = NamedSharding(mesh, P(batch_axis, model_axis, None))
    s_b = NamedSharding(mesh, P(batch_axis, model_axis))

    def put(x):
        if x is None or not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.ndim == 3 and x.shape[1] == form.m:
            return jax.device_put(x, s_A)
        if x.ndim == 2 and x.shape[1] == form.m:
            return jax.device_put(x, s_b)
        spec = P(batch_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, form)


def shard_problem_2d(A, b, c, mesh: Mesh, axes=("model_r", "model_c")):
    """2D block-shard one large problem's data BEFORE building the form:
    ``A: P(r, c)``, ``b: P(r)``, ``c: P(c)``; everything derived inside
    ``HSDEForm.build`` (norms, projector state) and the solver iterate then
    inherit layouts from GSPMD propagation — the CG matvec becomes local
    GEMM blocks + an all-reduce over the contracted axis on ICI, exactly
    the communication points of SURVEY.md §5.

    Returns device_put (A, b, c); pass them to ``conic_problem`` /
    ``HSDEForm.build`` as usual.  Sharding the raw data (rather than the
    built form pytree) keeps b/c unambiguous when m == n.
    """
    r, cx = axes
    A = jax.device_put(A, NamedSharding(mesh, P(r, cx)))
    b = jax.device_put(b, NamedSharding(mesh, P(r)))
    c = jax.device_put(c, NamedSharding(mesh, P(cx)))
    return A, b, c
