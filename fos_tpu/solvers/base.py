"""Solver core: state pytree, set protocol, and the GAP algorithm family.

Architecture (deliberately NOT the reference's mutating-decorator OO design,
see SURVEY.md §7): an algorithm is a frozen config dataclass whose ``step``
is a pure function ``SolverState -> SolverState`` suitable for
``lax.fori_loop`` / ``lax.while_loop`` compilation.  All mutable reference
state — iterates, CG warm starts, GAPA's adaptive alpha, FISTA's momentum,
Dykstra's correction vectors (reference: src/solvers/*.jl ``*Data`` structs)
— lives in the explicit :class:`SolverState` pytree.

Every algorithm sees only two projectable sets S1, S2 — the same
problem-form-agnostic contract as ``get_sets_and_status`` in the reference
(src/FOSSolverInterface.jl:76-79, src/problemforms/Feasibility/
Feasibility.jl:75-81): the same step code runs conic (HSDE) and feasibility
problems.

Set protocol: an object with ``init_state(dtype)`` and
``project(x, state) -> (y, state)`` that is a registered pytree.  The
post-S2-*projection* point of each step is carried as ``z_check`` — it is
the point the reference runs its convergence check on (``checkstatus`` is
called inside ``S2!`` right after ``prox!``, src/solvers/gap.jl:53-59).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from fos_tpu.cones.spec import ConeSpec
from fos_tpu.cones.project import project as cone_project


class SolverState(NamedTuple):
    x: jnp.ndarray
    i: jnp.ndarray            # int32 iteration counter (1-based after first step)
    z_check: jnp.ndarray      # post-S2-prox point of the latest step
    z_check_prev: jnp.ndarray # same, one step earlier (feasibility residual)
    s1_state: Any
    s2_state: Any
    aux: Any                  # per-algorithm carry


class PlaneBuf(NamedTuple):
    """Supporting-hyperplane capture buffer for the longstep wrapper.

    Rows [0 .. nsave] hold equality planes (from S1 projections), rows
    [nsave+1 .. 2*nsave+1] inequality planes (from S2 projections) — the
    *intended* layout of the reference's ``SavedPlanes``
    (src/wrappers/longstep.jl:68-101, saveplanes.jl:13-60; the reference
    interleaves rows on write but slices them contiguously on solve — a
    reference bug we do not reproduce).  ``slot`` is the 0-based window
    position; negative means capture inactive.
    """

    A: jnp.ndarray      # (rows, dim)
    b: jnp.ndarray      # (rows,)
    slot: jnp.ndarray   # int32
    nsave: int = 0      # static in practice (carried via wrapper config)


def _plane_row(planes: PlaneBuf, row, x, y):
    """Write plane {w : <x-y, w> = <x-y, y>} into ``row`` when active."""
    a = x - y
    bval = jnp.vdot(a, y)
    write = planes.slot >= 0
    row = jnp.clip(row, 0, planes.A.shape[0] - 1)
    A = planes.A.at[row].set(jnp.where(write, a, planes.A[row]))
    b = planes.b.at[row].set(jnp.where(write, bval, planes.b[row]))
    return planes._replace(A=A, b=b)


def capture_eq(planes, x, y):
    """Record an S1 (equality) supporting plane (longstep.jl:71-84)."""
    if planes is None:
        return None
    return _plane_row(planes, planes.slot, x, y)


def capture_ineq(planes, x, y):
    """Record an S2 (inequality) supporting plane (longstep.jl:87-101)."""
    if planes is None:
        return None
    nrows = planes.A.shape[0]
    return _plane_row(planes, nrows // 2 + planes.slot, x, y)


@jax.tree_util.register_pytree_node_class
class ConeSet:
    """Stateless projectable set backed by a compiled cone projector."""

    def __init__(self, spec: ConeSpec, psd_method: str = "auto"):
        self.spec = spec
        self.psd_method = psd_method

    def tree_flatten(self):
        return (), (self.spec, self.psd_method)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*aux)

    def init_state(self, dtype):
        return ()

    def project(self, x, state):
        return cone_project(self.spec, x, self.psd_method), state


@jax.tree_util.register_pytree_node_class
class TwoSets:
    """The (S1, S2) pair handed to every algorithm."""

    def __init__(self, s1, s2):
        self.s1 = s1
        self.s2 = s2

    def tree_flatten(self):
        return (self.s1, self.s2), ()

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def init_solver_state(alg, sets: TwoSets, x0) -> SolverState:
    # a set may seed its state from the initial iterate (init_state_from):
    # the HSDE S1 projector uses it to pre-pay Q @ u0 once so every
    # projection in the hot loop costs one fused A-pass (CGState.v_warm)
    def init(s):
        if hasattr(s, "init_state_from"):
            return s.init_state_from(x0)
        return s.init_state(x0.dtype)

    return SolverState(
        x=x0,
        i=jnp.asarray(0, jnp.int32),
        z_check=x0,
        z_check_prev=x0,
        s1_state=init(sets.s1),
        s2_state=init(sets.s2),
        aux=alg.init_aux(x0),
    )


@dataclass(frozen=True)
class Algorithm:
    """Base config; subclasses are hashable and usable as jit-static args."""

    def init_aux(self, x0):
        return ()

    # --- relaxation coefficients (hook so GAPA can make them adaptive) ----
    def coeffs(self, aux) -> Tuple[Any, Any]:
        raise NotImplementedError

    # --- S1!/S2! split used by GAP-family steps and the wrappers ----------
    # (mirrors the reference's Fast line-search protocol, defaults.jl:8-21)
    def relaxed_s1(self, sets: TwoSets, x, s1_state, aux):
        a1, _ = self.coeffs(aux)
        y, s1_state = sets.s1.project(x, s1_state)
        return a1 * y + (1.0 - a1) * x, s1_state

    def relaxed_s2(self, sets: TwoSets, x, s2_state, aux):
        """Returns (prox_point, relaxed_point, state) — the prox point is the
        convergence-check point (gap.jl:53-59)."""
        _, a2 = self.coeffs(aux)
        y, s2_state = sets.s2.project(x, s2_state)
        return y, a2 * y + (1.0 - a2) * x, s2_state

    def step(self, sets: TwoSets, st: SolverState) -> SolverState:
        raise NotImplementedError

    def step_logged(self, sets: TwoSets, st: SolverState):
        """Step plus ``logextra`` snapshots — the (x, P_S1 x, relaxed)
        triple the reference records at check iterations for feasibility
        problems (FeasibilityStatus.jl:19-25 gated on i % checki == 0;
        only GAP/GAPA's S1! call logextra, gap.jl:44-49, gapa.jl:63-68).
        Algorithms without reference logextra calls return ``None``."""
        return self.step(sets, st), None

    def getsol(self, sets: TwoSets, st: SolverState):
        """Final solution guess ``P_S2(P_S1(x))`` (gap.jl:82-87)."""
        y1, s1_state = sets.s1.project(st.x, st.s1_state)
        y2, s2_state = sets.s2.project(y1, st.s2_state)
        return y2, st._replace(s1_state=s1_state, s2_state=s2_state)

    # --- capability traits (defaults.jl:2-30) -----------------------------
    @property
    def support_linesearch(self) -> bool:
        return False

    @property
    def support_longstep(self) -> bool:
        return False

    # Subclasses declare an ``options`` field (kept last so positional
    # construction matches the reference signatures).
    def merge_options(self, **kwargs):
        merged = dict(self.options)
        merged.update(kwargs)
        return merged


def _gap_like_step(alg, sets, st, planes=None, snap=False):
    """The shared two-relaxed-projections step (gap.jl:61-80), with optional
    supporting-plane capture for the longstep wrapper and optional S1-stage
    snapshots (``logextra`` parity, see :meth:`Algorithm.step_logged`)."""
    alpha = alg.alpha
    a1, a2 = alg.coeffs(st.aux)
    y1, s1_state = sets.s1.project(st.x, st.s1_state)
    planes = capture_eq(planes, st.x, y1)
    tmp1 = a1 * y1 + (1.0 - a1) * st.x
    z, s2_state = sets.s2.project(tmp1, st.s2_state)
    planes = capture_ineq(planes, tmp1, z)
    tmp2 = a2 * z + (1.0 - a2) * tmp1
    x_new = alpha * tmp2 + (1.0 - alpha) * st.x
    snaps = jnp.stack([st.x, y1, tmp1]) if snap else None
    return st._replace(
        x=x_new,
        i=st.i + 1,
        z_check=z,
        z_check_prev=st.z_check,
        s1_state=s1_state,
        s2_state=s2_state,
    ), tmp1, tmp2, planes, snaps


@dataclass(frozen=True)
class GAP(Algorithm):
    """Generalized Alternating Projections (gap.jl:6-92).

    ``x+ = (1-alpha) x + alpha * relax_{a2}(P_S2( relax_{a1}(P_S1(x)) ))``.
    """

    alpha: float = 0.8
    alpha1: float = 1.8
    alpha2: float = 1.8
    direct: bool = False
    options: Tuple[Tuple[str, Any], ...] = ()

    def coeffs(self, aux):
        return self.alpha1, self.alpha2

    def step(self, sets, st):
        st, _, _, _, _ = _gap_like_step(self, sets, st)
        return st

    def step_logged(self, sets, st):
        st, _, _, _, snaps = _gap_like_step(self, sets, st, snap=True)
        return st, snaps

    def step_capture(self, sets, st, planes):
        st, _, _, planes, _ = _gap_like_step(self, sets, st, planes)
        return st, planes

    @property
    def support_linesearch(self):
        return True

    @property
    def support_longstep(self):
        return True


def DR(alpha: float = 0.5, *, direct: bool = False, **kwargs) -> GAP:
    """Douglas-Rachford = GAP(alpha, 2, 2) (solvers.jl:10)."""
    return GAP(alpha, 2.0, 2.0, direct, tuple(kwargs.items()))


def AP(alpha: float = 1.0, *, direct: bool = False, **kwargs) -> GAP:
    """Alternating Projections = GAP(alpha, 1, 1) (solvers.jl:11)."""
    return GAP(alpha, 1.0, 1.0, direct, tuple(kwargs.items()))


@dataclass(frozen=True)
class GAPA(Algorithm):
    """Adaptive GAP (gapa.jl): alpha1 = alpha2 = a12 adapted from an estimate
    of the Friedrichs angle between the sets.

    a12 state is carried in ``aux``; update rule (gapa.jl:80-105):
    ``scl = |<tmp2-tmp1, tmp1-x>| / (||tmp2-tmp1|| ||tmp1-x||)`` (NaN -> 0,
    clamped to [0,1]), ``aopt = 2/(1+sqrt(1-scl^2))``,
    ``a12 = (1-beta)*aopt + 2*beta``.
    """

    alpha: float = 1.0
    beta: float = 0.0
    direct: bool = False
    options: Tuple[Tuple[str, Any], ...] = ()

    def init_aux(self, x0):
        return jnp.asarray(2.0, x0.dtype)

    def coeffs(self, aux):
        return aux, aux

    def step(self, sets, st):
        st2, _ = self.step_capture(sets, st, None)
        return st2

    def step_logged(self, sets, st):
        st2, _, snaps = self._step_inner(sets, st, None, snap=True)
        return st2, snaps

    def step_capture(self, sets, st, planes):
        st2, planes, _ = self._step_inner(sets, st, planes)
        return st2, planes

    def _step_inner(self, sets, st, planes, snap=False):
        st2, tmp1, tmp2, planes, snaps = _gap_like_step(self, sets, st, planes,
                                                        snap=snap)
        # Friedrichs angle estimate from (x, tmp1, tmp2) (gapa.jl:36-47)
        d1 = tmp2 - tmp1
        d2 = tmp1 - st.x
        num = jnp.abs(jnp.vdot(d1, d2))
        den = jnp.sqrt(jnp.vdot(d1, d1) * jnp.vdot(d2, d2))
        scl = num / den
        scl = jnp.where(jnp.isnan(scl), 0.0, jnp.clip(scl, 0.0, 1.0))
        s = jnp.sqrt(1.0 - scl**2)
        aopt = 2.0 / (1.0 + s)
        a12 = (1.0 - self.beta) * aopt + 2.0 * self.beta
        return st2._replace(aux=a12.astype(st.x.dtype)), planes, snaps

    @property
    def support_linesearch(self):
        return True

    @property
    def support_longstep(self):
        return True


@dataclass(frozen=True)
class GAPP(Algorithm):
    """Projected GAP (Fält & Giselsson 2016; gapproj.jl).

    Every ``iproj`` iterations: compute the residual direction
    ``res = P_S1(P_S2(P_S1 x)) - P_S1(x)`` and take the step
    ``tmp1 + a* res`` with ``a*`` minimizing the S2 fixed-point residual over
    the grid ``a = 2^k, k=0..20`` (evaluated as one batched projection
    instead of the reference's sequential println loop, gapproj.jl:44-57).
    """

    alpha: float = 0.8
    alpha1: float = 1.8
    alpha2: float = 1.8
    iproj: int = 100
    direct: bool = True
    options: Tuple[Tuple[str, Any], ...] = ()

    def coeffs(self, aux):
        return self.alpha1, self.alpha2

    def step(self, sets, st):
        def normal_branch(st):
            st2, _, _, _, _ = _gap_like_step(self, sets, st)
            return st2

        def proj_branch(st):
            a2 = self.alpha2
            tmp1, s1_state = sets.s1.project(st.x, st.s1_state)
            tmp2, s2_state = sets.s2.project(tmp1, st.s2_state)
            p1, s1_state = sets.s1.project(tmp2, s1_state)
            res = p1 - tmp1
            alphas = 2.0 ** jnp.arange(21, dtype=st.x.dtype)
            cands = tmp1[None, :] + alphas[:, None] * res[None, :]
            projs, _ = sets.s2.project(cands, s2_state)
            norms = jnp.linalg.norm(projs - cands, axis=-1)
            abest = alphas[jnp.argmin(norms)]
            t1 = tmp1 + abest * res
            z, s2_state = sets.s2.project(t1, s2_state)
            tmp2 = a2 * z + (1.0 - a2) * t1
            return st._replace(
                x=tmp2, i=st.i + 1, z_check=z, z_check_prev=st.z_check,
                s1_state=s1_state, s2_state=s2_state,
            )

        do_proj = (st.i + 1) % self.iproj == 0
        return jax.lax.cond(do_proj, proj_branch, normal_branch, st)


@dataclass(frozen=True)
class FISTA(Algorithm):
    """FISTA-accelerated alternating projections (fista.jl).

    aux = (t, y, x_old); ``t+ = (1+sqrt(1+4 t^2))/2``,
    ``y = x + ((t-1)/t+) (x - x_old)``.
    """

    alpha: float = 1.0
    direct: bool = False
    options: Tuple[Tuple[str, Any], ...] = ()

    def init_aux(self, x0):
        # y initialized to x0 replaces the reference's i==1 hack (fista.jl:35-37)
        return (jnp.asarray(1.0, x0.dtype), x0, jnp.zeros_like(x0))

    def coeffs(self, aux):
        return self.alpha, 1.0

    def step(self, sets, st):
        st2, _ = self.step_capture(sets, st, None)
        return st2

    def step_capture(self, sets, st, planes):
        t, y, _ = st.aux
        y1, s1_state = sets.s1.project(y, st.s1_state)
        planes = capture_eq(planes, y, y1)
        tmp1 = self.alpha * y1 + (1.0 - self.alpha) * y
        x_new, s2_state = sets.s2.project(tmp1, st.s2_state)
        planes = capture_ineq(planes, tmp1, x_new)
        t_new = (1.0 + jnp.sqrt(1.0 + 4.0 * t**2)) / 2.0
        y_new = x_new + ((t - 1.0) / t_new) * (x_new - st.x)
        return st._replace(
            x=x_new, i=st.i + 1, z_check=x_new, z_check_prev=st.z_check,
            s1_state=s1_state, s2_state=s2_state,
            aux=(t_new, y_new, st.x),
        ), planes

    @property
    def support_longstep(self):
        return True


@dataclass(frozen=True)
class Dykstra(Algorithm):
    """Boyle–Dykstra alternating projections with correction vectors
    (dykstra.jl:26-37): ``y = P_S1(x+p); p += x-y; x = P_S2(y+q); q += y-x``.
    """

    direct: bool = False
    options: Tuple[Tuple[str, Any], ...] = ()

    def init_aux(self, x0):
        return (jnp.zeros_like(x0), jnp.zeros_like(x0))

    def coeffs(self, aux):
        return 1.0, 1.0

    def step(self, sets, st):
        st2, _ = self.step_capture(sets, st, None)
        return st2

    def step_capture(self, sets, st, planes):
        p, q = st.aux
        y, s1_state = sets.s1.project(st.x + p, st.s1_state)
        planes = capture_eq(planes, st.x + p, y)
        p_new = st.x + p - y
        x_new, s2_state = sets.s2.project(y + q, st.s2_state)
        planes = capture_ineq(planes, y + q, x_new)
        q_new = y + q - x_new
        return st._replace(
            x=x_new, i=st.i + 1, z_check=x_new, z_check_prev=st.z_check,
            s1_state=s1_state, s2_state=s2_state, aux=(p_new, q_new),
        ), planes

    @property
    def support_longstep(self):
        return True
