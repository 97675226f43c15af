"""Conic-model front end.

Replaces the reference's MathProgBase adapter
(/root/reference/src/FOSSolverInterface.jl:27-69): problems arrive as
``(c, A, b, constr_cones, var_cones)`` where the cone lists are
``(cone, indices)`` pairs exactly like MPB's, are validated for contiguous
full coverage (same checks as the reference ``ConeProduct`` constructor,
src/cones.jl:60-77), and map through a registry equivalent to ``conemap``
(src/cones.jl:4-14).  Also provides the ``LinearQuadraticModel`` equivalent:
an LP bridge (``solve_lp``).
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple, Union

import numpy as np

from fos_tpu.cones.spec import Cone, ConeSpec

# conemap equivalent (src/cones.jl:4-14)
CONE_MAP = {
    "Free": Cone.FREE,
    "Zero": Cone.ZERO,
    "NonNeg": Cone.NONNEG,
    "NonPos": Cone.NONPOS,
    "SOC": Cone.SOC,
    "SOCRotated": Cone.SOC_ROTATED,
    "SDP": Cone.PSD,
    "ExpPrimal": Cone.EXP_PRIMAL,
    "ExpDual": Cone.EXP_DUAL,
}


def supported_cones() -> Tuple[str, ...]:
    """``supportedcones`` equivalent (FOSSolverInterface.jl:69)."""
    return tuple(CONE_MAP)


def _to_cone(cone: Union[str, Cone]) -> Cone:
    if isinstance(cone, Cone):
        return cone
    if cone not in CONE_MAP:
        raise ValueError(
            f"Cone type {cone!r} not supported; supported: {supported_cones()}")
    return CONE_MAP[cone]


def cone_spec_from_list(dim: int,
                        cones: Iterable[Tuple[Union[str, Cone], Sequence[int]]]
                        ) -> ConeSpec:
    """Build a ConeSpec from MPB-style ``(cone, indices)`` pairs.

    Validation mirrors the reference (cones.jl:43-77): each index list must
    be a contiguous run, runs must tile ``range(dim)`` in order.
    """
    blocks = []
    expected_start = 0
    for cone, idx in cones:
        cone = _to_cone(cone)
        idx = np.asarray(list(idx))
        if idx.size == 0:
            raise ValueError("empty index range")
        if not np.array_equal(idx, np.arange(idx[0], idx[-1] + 1)):
            raise ValueError(f"Invalid range in input: {idx}")
        if idx[0] != expected_start:
            raise ValueError(
                f"ranges must tile 0..{dim - 1} in order; got start {idx[0]}, "
                f"expected {expected_start}")
        expected_start = int(idx[-1]) + 1
        blocks.append((cone, int(idx.size)))
    if expected_start != dim:
        raise ValueError(f"ranges cover 0..{expected_start - 1}, need 0..{dim - 1}")
    return ConeSpec(tuple(blocks))


def load_problem(c, A, b, constr_cones, var_cones):
    """``loadproblem!`` equivalent: returns a ConicProblem."""
    from fos_tpu.problems.conic import conic_problem

    A = np.asarray(A) if not hasattr(A, "todense") else A
    m, n = A.shape
    K1 = cone_spec_from_list(m, constr_cones)
    K2 = cone_spec_from_list(n, var_cones)
    return conic_problem(A, b, c, K1, K2)


def solve_scs(data: dict, cone: dict, alg=None, **options):
    """SCS-convention front end: ``data = {"A": ..., "b": ..., "c": ...}``,
    ``cone = {"z": n_zero, "l": n_nonneg, "q": [soc sizes], "s": [psd sides],
    "ep": n_exp_primal, "ed": n_exp_dual, "p": [pow exponents]}`` with all
    variables free (SCS's convention — cone structure lives in the slack s).
    Power-cone exponents follow SCS: ``a > 0`` is a primal 3D power cone
    with exponent ``a``; ``a < 0`` is the dual power cone with ``|a|``.

    This is the practical replacement for the reference's Convex.jl entry
    point: any modeling layer that can target SCS can target this.
    """
    from fos_tpu.cones import free
    from fos_tpu.interface.api import solve

    A = data["A"]
    b = data["b"]
    c = data["c"]
    m = A.shape[0]
    K1 = scs_cone_spec(cone)
    if K1.dim != m:
        raise ValueError(f"cone dims cover {K1.dim} rows, A has {m}")
    K2 = free(A.shape[1])
    return solve(A, b, c, K1, K2, alg=alg, **options)


def scs_cone_spec(cone: dict) -> ConeSpec:
    """Build the constraint ConeSpec from an SCS-style cone dict
    (row order: z, l, q, s, ep, ed, p — SCS's convention)."""
    blocks = []
    if cone.get("z"):
        blocks.append((Cone.ZERO, int(cone["z"])))
    if cone.get("l"):
        blocks.append((Cone.NONNEG, int(cone["l"])))
    for q in cone.get("q", []) or []:
        blocks.append((Cone.SOC, int(q)))
    for s in cone.get("s", []) or []:
        blocks.append((Cone.PSD, int(s) * (int(s) + 1) // 2))
    if cone.get("ep"):
        blocks.append((Cone.EXP_PRIMAL, 3 * int(cone["ep"])))
    if cone.get("ed"):
        blocks.append((Cone.EXP_DUAL, 3 * int(cone["ed"])))
    params = tuple(() for _ in blocks)
    for a in cone.get("p", []) or []:
        a = float(a)
        if not 0.0 < abs(a) < 1.0:
            raise ValueError(f"power-cone exponent must have 0<|a|<1, got {a}")
        kind = Cone.POW_PRIMAL if a > 0 else Cone.POW_DUAL
        if blocks and blocks[-1][0] is kind:  # extend the run
            blocks[-1] = (kind, blocks[-1][1] + 3)
            params = params[:-1] + (params[-1] + (abs(a),),)
        else:
            blocks.append((kind, 3))
            params = params + ((abs(a),),)
    if any(params):
        return ConeSpec(tuple(blocks), params)
    return ConeSpec(tuple(blocks))


def solve_lp(c, A_ub=None, b_ub=None, A_eq=None, b_eq=None, *,
             nonneg: bool = True, alg=None, **options):
    """LP bridge (the ``ConicToLPQPBridge`` role, FOSSolverInterface.jl:6).

    min c'x  s.t.  A_ub x <= b_ub,  A_eq x = b_eq,  x >= 0 (nonneg=True).
    """
    from fos_tpu.cones import free, nonneg as nonneg_cone, zero
    from fos_tpu.interface.api import solve

    c = np.asarray(c, dtype=float)
    n = c.shape[0]
    rows = []
    rhs = []
    k1 = []
    if A_eq is not None:
        A_eq = np.asarray(A_eq, dtype=float)
        rows.append(A_eq)
        rhs.append(np.asarray(b_eq, dtype=float))
        k1.append(zero(A_eq.shape[0]))
    if A_ub is not None:
        A_ub = np.asarray(A_ub, dtype=float)
        rows.append(A_ub)
        rhs.append(np.asarray(b_ub, dtype=float))
        k1.append(nonneg_cone(A_ub.shape[0]))
    if not rows:
        raise ValueError("need at least one of A_ub / A_eq")
    A = np.vstack(rows)
    b = np.concatenate(rhs)
    K1 = ConeSpec.concat(k1)
    K2 = nonneg_cone(n) if nonneg else free(n)
    return solve(A, b, c, K1, K2, alg=alg, **options)
