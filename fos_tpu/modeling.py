"""Native modeling front end — the Convex.jl role, self-contained.

The reference's primary entry point is a modeling layer: users write
``minimize(sumsquares(A*x - b), x >= 0)`` in Convex.jl and
``Convex.solve!`` lowers it through MathProgBase into the solver
(/root/reference/src/FOSSolverInterface.jl:5-64, examples in README.md).
The CVXPY adapter (:mod:`fos_tpu.interface.cvxpy_adapter`) covers the
"any SCS-targeting modeling layer" route, but it needs cvxpy installed;
this module is the standalone equivalent: a small affine-expression DSL
that lowers directly to the SCS-form conic data :func:`solve_scs`
consumes.

Scope (deliberately the reference's working set, not a CVXPY clone):

* ``Variable(shape, symmetric=...)`` — scalars, vectors, matrices;
* affine algebra — ``+ - * / @ sum trace transpose`` and 1-D indexing
  with numpy constants;
* constraints — ``==``, ``>=``, ``<=`` (elementwise), ``norm2(e) <= t``
  (SOC), ``X >> 0`` (PSD, scaled-svec rows), ``ExpCone(x, y, z)``,
  ``PowCone(x, y, z, alpha)``;
* objective atoms — ``norm2`` and ``sum_squares`` epigraphs, plus any
  affine expression; ``minimize`` / ``maximize`` (affine only).

Lowering puts every variable in the free cone and all structure in the
constraint rows ``s = b - Ax`` in SCS row order (z, l, q, s, ep, p) —
exactly what :func:`fos_tpu.interface.conic.solve_scs` expects.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

_SQRT2 = math.sqrt(2.0)


def _size(shape: Tuple[int, ...]) -> int:
    out = 1
    for d in shape:
        out *= int(d)
    return out


def _as_const(value, shape: Tuple[int, ...]) -> np.ndarray:
    arr = np.asarray(value, dtype=float)
    if arr.shape == shape:
        return arr.reshape(-1)
    if arr.ndim == 0:
        return np.full(_size(shape), float(arr))
    raise ValueError(f"constant shape {arr.shape} incompatible with {shape}")


class AffineExpr:
    """Affine function of the problem variables: ``vec(expr) = sum_v
    terms[v] @ free(v) + const`` (row-major ``vec``)."""

    __array_priority__ = 100  # numpy defers to our __rmatmul__ etc.

    def __init__(self, shape: Tuple[int, ...],
                 terms: Dict["Variable", np.ndarray], const: np.ndarray):
        self.shape = tuple(int(d) for d in shape)
        self.terms = terms
        self.const = const

    # -- helpers ------------------------------------------------------
    @property
    def size(self) -> int:
        return _size(self.shape)

    @staticmethod
    def constant(value, shape=None) -> "AffineExpr":
        arr = np.asarray(value, dtype=float)
        shape = arr.shape if shape is None else shape
        return AffineExpr(shape, {}, _as_const(arr, tuple(shape)))

    def _coerce(self, other) -> "AffineExpr":
        if isinstance(other, AffineExpr):
            return other
        arr = np.asarray(other, dtype=float)
        if arr.ndim == 0:
            return AffineExpr(self.shape, {}, np.full(self.size, float(arr)))
        return AffineExpr.constant(arr)

    def _binary_shapes(self, other: "AffineExpr"):
        if self.shape != other.shape:
            raise ValueError(f"shape mismatch: {self.shape} vs {other.shape}")

    # -- affine algebra ----------------------------------------------
    def __add__(self, other):
        if isinstance(other, (Atom, ObjSum)):
            return ObjSum._wrap(self) + other
        other = self._coerce(other)
        self._binary_shapes(other)
        terms = dict(self.terms)
        for v, F in other.terms.items():
            terms[v] = terms.get(v, 0) + F
        return AffineExpr(self.shape, terms, self.const + other.const)

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, (Atom, ObjSum)):
            raise TypeError("cannot subtract an atom (nonconvex)")
        return self.__add__(self._coerce(other).__neg__())

    def __rsub__(self, other):
        return self.__neg__().__add__(other)

    def __neg__(self):
        return AffineExpr(self.shape, {v: -F for v, F in self.terms.items()},
                          -self.const)

    def __mul__(self, scalar):
        s = float(scalar)
        return AffineExpr(self.shape, {v: s * F for v, F in self.terms.items()},
                          s * self.const)

    __rmul__ = __mul__

    def __truediv__(self, scalar):
        return self.__mul__(1.0 / float(scalar))

    def __matmul__(self, other):
        # expr @ constant: (a, b) @ (b, c) -> via transpose identity
        C = np.asarray(other, dtype=float)
        if len(self.shape) != 2 or C.ndim not in (1, 2):
            raise ValueError("matmul needs a 2-D expression")
        a, b = self.shape
        if C.shape[0] != b:
            raise ValueError(f"matmul shapes {self.shape} @ {C.shape}")
        # row-major vec(E C) = (I_a (x) C') vec(E); for a 1-D C the block
        # is the (1, b) row C itself
        M = np.kron(np.eye(a), C.T if C.ndim == 2 else C[None, :])
        out_shape = (a, C.shape[1]) if C.ndim == 2 else (a,)
        return AffineExpr(out_shape,
                          {v: M @ F for v, F in self.terms.items()},
                          M @ self.const)

    def __rmatmul__(self, other):
        # constant @ expr
        C = np.asarray(other, dtype=float)
        if len(self.shape) == 1:
            if C.ndim == 1 and C.shape[0] == self.shape[0]:  # c @ x -> scalar
                Cr = C[None, :]
                return AffineExpr((), {v: Cr @ F for v, F in self.terms.items()},
                                  Cr @ self.const)
            if C.ndim != 2 or C.shape[1] != self.shape[0]:
                raise ValueError(f"matmul shapes {C.shape} @ {self.shape}")
            return AffineExpr((C.shape[0],),
                              {v: C @ F for v, F in self.terms.items()},
                              C @ self.const)
        if len(self.shape) == 2:
            a, b = self.shape
            if C.ndim != 2 or C.shape[1] != a:
                raise ValueError(f"matmul shapes {C.shape} @ {self.shape}")
            # vec(C E) = (C (x) I_b) vec(E)
            M = np.kron(C, np.eye(b))
            return AffineExpr((C.shape[0], b),
                              {v: M @ F for v, F in self.terms.items()},
                              M @ self.const)
        raise ValueError("matmul needs a 1-D or 2-D expression")

    @property
    def T(self) -> "AffineExpr":
        if len(self.shape) != 2:
            raise ValueError("transpose needs a 2-D expression")
        a, b = self.shape
        perm = np.arange(a * b).reshape(a, b).T.reshape(-1)
        return AffineExpr((b, a),
                          {v: F[perm] for v, F in self.terms.items()},
                          self.const[perm])

    def __getitem__(self, key) -> "AffineExpr":
        idx = np.arange(self.size).reshape(self.shape)[key]
        rows = np.atleast_1d(idx).reshape(-1)
        shape = idx.shape if hasattr(idx, "shape") else ()
        return AffineExpr(tuple(shape),
                          {v: F[rows] for v, F in self.terms.items()},
                          self.const[rows])

    def sum(self) -> "AffineExpr":
        one = np.ones((1, self.size))
        return AffineExpr((), {v: one @ F for v, F in self.terms.items()},
                          one @ self.const)

    # -- constraints --------------------------------------------------
    def __eq__(self, other):  # noqa: A003 - DSL operator
        other = self._coerce(other)
        self._binary_shapes(other)
        return Constraint("zero", self.__sub__(other))

    def __ne__(self, other):  # pragma: no cover
        raise TypeError("!= is not a convex constraint")

    __hash__ = object.__hash__  # __eq__ is the DSL operator, not equality

    def __ge__(self, other):
        if isinstance(other, Atom):
            return other <= self
        other = self._coerce(other)
        return Constraint("nonneg", self.__sub__(other))

    def __le__(self, other):
        if isinstance(other, Atom):
            raise TypeError("expr <= atom is nonconvex")
        other = self._coerce(other)
        return Constraint("nonneg", other.__sub__(self))

    def __rshift__(self, other):
        if not (np.isscalar(other) and float(other) == 0.0):
            raise ValueError("PSD constraint must be written  X >> 0")
        if len(self.shape) != 2 or self.shape[0] != self.shape[1]:
            raise ValueError("X >> 0 needs a square matrix expression")
        return Constraint("psd", self)

    # promoted into objectives
    def __repr__(self):
        return f"AffineExpr(shape={self.shape}, nvars={len(self.terms)})"


class Variable(AffineExpr):
    """Optimization variable.  ``symmetric=True`` (square matrices only)
    stores the lower triangle as the free entries, so symmetry is
    structural rather than enforced by constraints."""

    _counter = 0

    def __init__(self, shape: Union[int, Tuple[int, ...]] = (),
                 name: Optional[str] = None, *, symmetric: bool = False):
        if isinstance(shape, int):
            shape = (shape,)
        shape = tuple(int(d) for d in shape)
        if symmetric:
            if len(shape) != 2 or shape[0] != shape[1]:
                raise ValueError("symmetric needs a square (n, n) shape")
            n = shape[0]
            L = n * (n + 1) // 2
            expand = np.zeros((n * n, L))
            k = 0
            for j in range(n):
                for i in range(j, n):
                    expand[i * n + j, k] = 1.0
                    expand[j * n + i, k] = 1.0
                    k += 1
            self.nfree = L
        else:
            expand = np.eye(_size(shape))
            self.nfree = _size(shape)
        Variable._counter += 1
        self.name = name or f"var{Variable._counter}"
        self.symmetric = symmetric
        self.value: Optional[np.ndarray] = None
        super().__init__(shape, {self: expand}, np.zeros(_size(shape)))

    def __repr__(self):
        return f"Variable({self.shape}, name={self.name!r})"


class Constraint:
    """kind: zero | nonneg (elementwise on ``expr``), soc (expr = stacked
    (t, x)), psd (expr = square matrix), exp / pow (expr = stacked
    (x, y, z) triple; pow carries ``alpha``)."""

    def __init__(self, kind: str, expr: AffineExpr, alpha: float = None):
        self.kind = kind
        self.expr = expr
        self.alpha = alpha
        #: dual multiplier rows after ``Problem.solve`` (the Convex.jl
        #: ``constraint.dual`` role): the slice of the conic dual ``y``
        #: for this constraint's rows — for ``zero``/``nonneg`` the
        #: Lagrange multipliers of ``expr = 0`` / ``expr >= 0``; for
        #: ``psd`` reconstructed to the dual matrix via ``smat``.
        self.dual_value = None

    def __repr__(self):
        return f"Constraint({self.kind}, {self.expr.shape})"


def _stack(exprs: Sequence[AffineExpr]) -> AffineExpr:
    sizes = [e.size for e in exprs]
    total = sum(sizes)
    terms: Dict[Variable, np.ndarray] = {}
    const = np.zeros(total)
    off = 0
    for e, sz in zip(exprs, sizes):
        const[off:off + sz] = e.const
        for v, F in e.terms.items():
            tgt = terms.setdefault(v, np.zeros((total, v.nfree)))
            tgt[off:off + sz] += F
        off += sz
    return AffineExpr((total,), terms, const)


def _scalar(e, what: str) -> AffineExpr:
    if not isinstance(e, AffineExpr):
        e = AffineExpr.constant(e, ())
    if e.size != 1:
        raise ValueError(f"{what} must be scalar, got shape {e.shape}")
    return AffineExpr((1,), {v: F.reshape(1, -1) for v, F in e.terms.items()},
                      e.const.reshape(1))


def ExpCone(x, y, z) -> Constraint:
    """(x, y, z) in Kexp: y > 0, y * exp(x / y) <= z."""
    return Constraint("exp", _stack([_scalar(x, "ExpCone x"),
                                     _scalar(y, "ExpCone y"),
                                     _scalar(z, "ExpCone z")]))


def PowCone(x, y, z, alpha: float) -> Constraint:
    """(x, y, z) in the 3-D power cone: x^a * y^(1-a) >= |z|, x, y >= 0."""
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"need 0 < alpha < 1, got {alpha}")
    return Constraint("pow", _stack([_scalar(x, "PowCone x"),
                                     _scalar(y, "PowCone y"),
                                     _scalar(z, "PowCone z")]), alpha)


def trace(expr: AffineExpr) -> AffineExpr:
    if len(expr.shape) != 2 or expr.shape[0] != expr.shape[1]:
        raise ValueError("trace needs a square matrix expression")
    n = expr.shape[0]
    sel = np.zeros((1, n * n))
    sel[0, np.arange(n) * n + np.arange(n)] = 1.0
    return AffineExpr((), {v: sel @ F for v, F in expr.terms.items()},
                      sel @ expr.const)


# -- objective atoms (epigraph lowering at compile time) ---------------
class Atom:
    """Convex atom usable in a minimized objective; lowered to an
    auxiliary epigraph variable + an SOC constraint."""

    def __init__(self, expr: AffineExpr, weight: float = 1.0):
        self.expr = expr
        self.weight = float(weight)

    def scaled(self, s: float) -> "Atom":
        if s < 0:
            raise ValueError("atoms must enter the objective with weight >= 0"
                             " (convexity)")
        return type(self)(self.expr, self.weight * s)

    def __mul__(self, s):
        return self.scaled(float(s))

    __rmul__ = __mul__

    def __add__(self, other):
        return ObjSum._wrap(self) + other

    __radd__ = __add__

    def lower(self) -> Tuple[Variable, Constraint]:  # pragma: no cover
        raise NotImplementedError

    def __le__(self, other) -> Constraint:  # pragma: no cover
        raise NotImplementedError

    def __ge__(self, other):
        raise TypeError("atom >= bound is nonconvex")


class Norm2Atom(Atom):
    def lower(self):
        # the weight scales the epigraph variable in the objective; the
        # SOC constraint itself is unweighted
        t = Variable((), name="_epi_norm2")
        return t, (Norm2Atom(self.expr) <= t)

    def __le__(self, other) -> Constraint:
        if self.weight != 1.0:
            raise ValueError("use norm2(e) <= t unweighted in constraints")
        vec = self.expr if len(self.expr.shape) == 1 else _flatten(self.expr)
        return Constraint("soc", _stack([_scalar(other, "SOC bound"), vec]))


class SumSquaresAtom(Atom):
    def lower(self):
        t = Variable((), name="_epi_sumsq")
        return t, (SumSquaresAtom(self.expr) <= t)

    def __le__(self, other) -> Constraint:
        # ||e||^2 <= t  <=>  ||(1 - t, 2 e)|| <= 1 + t
        if self.weight != 1.0:
            raise ValueError("use sum_squares(e) <= t unweighted in "
                             "constraints")
        vec = self.expr if len(self.expr.shape) == 1 else _flatten(self.expr)
        ts = _scalar(other, "sum_squares bound")
        head = AffineExpr((1,), {v: -F for v, F in ts.terms.items()},
                          1.0 - ts.const)                        # 1 - t
        top = AffineExpr((1,), dict(ts.terms), 1.0 + ts.const)   # 1 + t
        return Constraint("soc", _stack([top, head, vec * 2.0]))


def _flatten(expr: AffineExpr) -> AffineExpr:
    return AffineExpr((expr.size,), expr.terms, expr.const)


def norm2(expr: AffineExpr) -> Norm2Atom:
    return Norm2Atom(expr)


def sum_squares(expr: AffineExpr) -> SumSquaresAtom:
    return SumSquaresAtom(expr)


class ObjSum:
    """Affine part + weighted atoms (the minimized objective)."""

    def __init__(self, affine: AffineExpr, atoms: List[Atom]):
        self.affine = affine
        self.atoms = atoms

    @staticmethod
    def _wrap(item) -> "ObjSum":
        if isinstance(item, ObjSum):
            return item
        if isinstance(item, Atom):
            return ObjSum(AffineExpr.constant(0.0, ()), [item])
        if isinstance(item, AffineExpr):
            return ObjSum(_scalar(item, "objective"), [])
        return ObjSum(AffineExpr.constant(np.asarray(item, float), ()), [])

    def __add__(self, other):
        other = ObjSum._wrap(other)
        return ObjSum(_scalar(self.affine, "objective").__add__(
            _scalar(other.affine, "objective")),
            self.atoms + other.atoms)

    __radd__ = __add__


class minimize:  # noqa: N801 - DSL keyword style, as in Convex.jl
    def __init__(self, objective):
        self.obj = ObjSum._wrap(objective)
        self.sign = 1.0


class maximize:  # noqa: N801
    def __init__(self, objective):
        if isinstance(objective, (Atom, ObjSum)):
            raise ValueError("maximize supports affine objectives only "
                             "(maximizing a convex atom is nonconvex)")
        self.obj = ObjSum._wrap(-objective if isinstance(objective, AffineExpr)
                                else -np.asarray(objective, float))
        self.sign = -1.0


class Problem:
    """``Problem(minimize(...), [constraints]).solve()`` — the
    ``Convex.solve!`` role (FOSSolverInterface.jl:5-64)."""

    def __init__(self, objective: Union[minimize, maximize],
                 constraints: Sequence[Constraint] = ()):
        if not isinstance(objective, (minimize, maximize)):
            raise TypeError("objective must be minimize(...) or maximize(...)")
        self.objective = objective
        self.constraints = list(constraints)
        for con in self.constraints:
            if not isinstance(con, Constraint):
                raise TypeError(f"not a constraint: {con!r} (a bare bool "
                                "means == was used on equal objects)")
        self.status: Optional[str] = None
        self.value: Optional[float] = None
        self.solution = None

    # ------------------------------------------------------------------
    def compile(self):
        """Lower to SCS-form ``(data, cone_dict)`` + bookkeeping."""
        obj = self.objective.obj
        constraints = list(self.constraints)
        affine = _scalar(obj.affine, "objective")
        for atom in obj.atoms:
            t, con = atom.lower()
            constraints.append(con)
            affine = affine.__add__(_scalar(t, "epi") * atom.weight)

        # deterministic variable order: objective first, then constraints
        variables: List[Variable] = []
        seen = set()

        def visit(e: AffineExpr):
            for v in e.terms:
                if id(v) not in seen:
                    seen.add(id(v))
                    variables.append(v)

        visit(affine)
        for con in constraints:
            visit(con.expr)

        offsets = {}
        n = 0
        for v in variables:
            offsets[id(v)] = n
            n += v.nfree

        def rows_of(e: AffineExpr) -> Tuple[np.ndarray, np.ndarray]:
            F = np.zeros((e.size, n))
            for v, coef in e.terms.items():
                F[:, offsets[id(v)]:offsets[id(v)] + v.nfree] = coef
            return F, e.const

        # group rows in SCS order: z, l, q, s, ep, p
        groups = {"zero": [], "nonneg": [], "soc": [], "psd": [],
                  "exp": [], "pow": []}
        for con in constraints:
            groups[con.kind].append(con)

        A_rows, b_rows = [], []
        row_map: List[Tuple[Constraint, int, int]] = []
        row = 0
        cone = {"z": 0, "l": 0, "q": [], "s": [], "ep": 0, "p": []}

        def emit(con, F, g):
            nonlocal row
            A_rows.append(F)
            b_rows.append(g)
            row_map.append((con, row, F.shape[0]))
            row += F.shape[0]

        for con in groups["zero"]:
            F, g = rows_of(con.expr)   # F x + g = 0: s = b - Ax in Zero
            emit(con, F, -g)           # with A = F, b = -g
            cone["z"] += con.expr.size
        for con in groups["nonneg"]:
            F, g = rows_of(con.expr)   # F x + g >= 0 -> s = g - (-F) x >= 0
            emit(con, -F, g)
            cone["l"] += con.expr.size
        for con in groups["soc"]:
            F, g = rows_of(con.expr)
            emit(con, -F, g)
            cone["q"].append(con.expr.size)
        for con in groups["psd"]:
            nn = con.expr.shape[0]
            sym = _symmetrize_svec(con.expr)   # scaled svec rows
            F, g = rows_of(sym)
            emit(con, -F, g)
            cone["s"].append(nn)
        for con in groups["exp"]:
            F, g = rows_of(con.expr)
            emit(con, -F, g)
            cone["ep"] += 1
        for con in groups["pow"]:
            F, g = rows_of(con.expr)
            emit(con, -F, g)
            cone["p"].append(con.alpha)

        if not A_rows:
            raise ValueError("problem has no constraints")
        A = np.vstack(A_rows)
        b = np.concatenate(b_rows)
        cF, cg = rows_of(affine)
        data = {"A": A, "b": b, "c": cF.reshape(-1)}
        return data, cone, variables, offsets, float(cg[0]), row_map

    def solve(self, alg=None, **options):
        from fos_tpu.interface.conic import solve_scs

        data, cone, variables, offsets, const, row_map = self.compile()
        sol = solve_scs(data, cone, alg=alg, **options)
        self.solution = sol
        self.status = sol.status
        x = np.asarray(sol.x)
        y = np.asarray(sol.y)
        for con, start, sz in row_map:
            dual = y[start:start + sz]
            if con.kind == "psd":
                from fos_tpu.cones.project import smat

                dual = np.asarray(smat(dual))
            con.dual_value = dual
        for v in variables:
            raw = x[offsets[id(v)]:offsets[id(v)] + v.nfree]
            if v.symmetric:
                nn = v.shape[0]
                M = np.zeros((nn, nn))
                k = 0
                for j in range(nn):
                    for i in range(j, nn):
                        M[i, j] = M[j, i] = raw[k]
                        k += 1
                v.value = M
            else:
                v.value = raw.reshape(v.shape) if v.shape else float(raw[0])
        self.value = self.objective.sign * (float(np.dot(data["c"], x)) + const)
        return sol


def _symmetrize_svec(expr: AffineExpr) -> AffineExpr:
    """Scaled-svec rows of a square matrix expression (symmetrized):
    row (i >= j) is ``X_ii`` on the diagonal, ``sqrt2 * (X_ij + X_ji)/2``
    off it — matching the solver's Cone.PSD layout
    (cones/project.py:svec)."""
    nn = expr.shape[0]
    L = nn * (nn + 1) // 2
    sel = np.zeros((L, nn * nn))
    k = 0
    for j in range(nn):
        for i in range(j, nn):
            if i == j:
                sel[k, i * nn + j] = 1.0
            else:
                sel[k, i * nn + j] = _SQRT2 / 2.0
                sel[k, j * nn + i] = _SQRT2 / 2.0
            k += 1
    return AffineExpr((L,), {v: sel @ F for v, F in expr.terms.items()},
                      sel @ expr.const)
