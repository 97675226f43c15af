"""Solver-state checkpoint / resume.

The reference has no serialization, only warm-start hooks (``initx`` and CG
``xinit``, SURVEY.md §5).  Here the full solver state — iterate, CG warm
start + call counter, algorithm carry (GAPA's a12, FISTA's momentum,
Dykstra's corrections), iteration counter — is one pytree, so preemption
recovery is: snapshot leaves to an .npz, resume by unflattening against a
template state of the same (problem, algorithm).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def save_state(path: str, state) -> None:
    leaves = jax.tree_util.tree_leaves(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})


def load_state(path: str, template):
    """Rebuild a state pytree from ``path`` using ``template``'s structure.

    ``template`` must come from the same problem/algorithm configuration
    (e.g. ``init_solver_state(alg, form.sets, x0)``).
    """
    data = np.load(path)
    leaves_t, treedef = jax.tree_util.tree_flatten(template)
    if len(data.files) != len(leaves_t):
        raise ValueError(
            f"checkpoint has {len(data.files)} leaves, template has {len(leaves_t)}")
    leaves = []
    for i, t in enumerate(leaves_t):
        arr = data[f"leaf_{i}"]
        want_shape = getattr(t, "shape", np.shape(t))
        if tuple(arr.shape) != tuple(want_shape):
            raise ValueError(
                f"leaf {i} shape {arr.shape} != template {want_shape}")
        leaves.append(jnp.asarray(arr, dtype=getattr(t, "dtype", None)))
    return jax.tree_util.tree_unflatten(treedef, leaves)
