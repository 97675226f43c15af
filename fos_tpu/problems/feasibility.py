"""Set-feasibility problem form: find x in S1 ∩ S2.

Reference: /root/reference/src/problemforms/Feasibility/Feasibility.jl and
FeasibilityStatus.jl.  The sets pass straight through to the algorithm
(``get_sets_and_status`` pass-through, Feasibility.jl:75-81); convergence is
``||z_k - z_{k-1}|| <= eps`` between consecutive post-S2 points
(FeasibilityStatus.jl:32-72 — ``stat.prev`` is updated every iteration, so
the residual compares *consecutive* iterates, not check-interval-apart
ones).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from fos_tpu.solvers.base import TwoSets
from fos_tpu.solvers.status import Status


class Feasibility(NamedTuple):
    """Problem container (Feasibility.jl:2-6)."""

    S1: object
    S2: object
    n: int


class FeasibilityCheck(NamedTuple):
    status: jnp.ndarray
    err: jnp.ndarray


class FeasibilitySolution(NamedTuple):
    x: jnp.ndarray
    status: str
    iters: int
    history: object = None

    @property
    def optimal(self) -> bool:
        return self.status == "Optimal"


@jax.tree_util.register_pytree_node_class
class FeasibilityForm:
    def __init__(self, sets: TwoSets, n: int, dtype_name: str = "float64"):
        self.sets = sets
        self.n = n
        self.dtype_name = dtype_name

    def tree_flatten(self):
        return (self.sets,), (self.n, self.dtype_name)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)

    @classmethod
    def build(cls, problem: Feasibility, dtype=None) -> "FeasibilityForm":
        from fos_tpu.config import default_dtype

        dtype = dtype or default_dtype()
        return cls(TwoSets(problem.S1, problem.S2), problem.n, jnp.dtype(dtype).name)

    @property
    def dtype(self):
        return jnp.dtype(self.dtype_name)

    @property
    def direct(self) -> bool:
        # The reference's feasibility status always prints the direct
        # (no-cg-column) table (Feasibility.jl:76).
        return True

    def initial_value(self, dtype):
        return jnp.zeros(self.n, dtype=dtype)  # Feasibility.jl:57-58

    def check(self, z, eps: float, prev=None) -> FeasibilityCheck:
        err = jnp.linalg.norm(prev - z)
        status = jnp.where(err <= eps, Status.OPTIMAL, Status.CONTINUE).astype(jnp.int32)
        return FeasibilityCheck(status, err)

    # --- engine observability hooks --------------------------------------
    def header(self, init_duration_s: float) -> str:
        from fos_tpu.utils import printing

        return printing.feasibility_header(init_duration_s, self.direct)

    def row(self, st, chk: FeasibilityCheck, i: int, t_s: float) -> str:
        from fos_tpu.utils import printing

        return printing.feasibility_row(i, float(chk.err), t_s)

    @property
    def wants_extra(self) -> bool:
        """Feasibility runs record logextra snapshots (the reference's HSDE
        logextra is a no-op, HSDEStatus.jl:18-20; FeasibilityStatus saves,
        FeasibilityStatus.jl:19-25)."""
        return True

    def record(self, hist, st, chk: FeasibilityCheck, i: int, t_s: float,
               debug: int, extra=None):
        if hist is None or debug <= 0:
            return
        hist.push("err", i, float(chk.err))
        hist.push("t", i, t_s)
        if extra is not None:
            import numpy as np

            # logextra parity (FeasibilityStatus.jl:19-25 via gap.jl:44-49):
            # the check iteration's S1-stage triple (x, P_S1 x, relaxed).
            hist.push("extra", i, [np.asarray(v) for v in extra])
        if debug > 1:
            import numpy as np

            hist.push("z", i, np.asarray(st.z_check))


def populate_feasibility_solution(form, guess, status_code: int, iters: int,
                                  history=None) -> FeasibilitySolution:
    status = Status.name(status_code)
    if status == "Continue":
        status = "Indeterminate"
    return FeasibilitySolution(x=guess, status=status, iters=iters, history=history)
