"""Extended L6 conformance battery (VERDICT r2 item 2).

cvxpy is NOT installable in this image (zero egress — ``pip install cvxpy``
fails with DNS resolution errors against pypi.org; attempt recorded in
PARITY.md).  Per the round-2 verdict, this tier instead proves the adapter
seam two ways:

1. **Fixture battery** (20+ problems incl. `test_modeling.py`): conic data
   in CVXPY's exact SCS emission format — CSC ``A``, slack rows ordered
   z / l / q / s / ep / ed / p, scaled-svec PSD rows, ``ConeDims``-style
   *objects* (attribute access: zero/nonneg/soc/psd/exp/p3d) rather than
   dicts — each validated against an independent oracle (scipy / closed
   form), several with full SCS dual recovery: ``A'y + c = 0``, zero
   duality gap, and ``y ∈ K*`` via the solver's own ``project_dual``.

2. **Seam drive**: a minimal structural stand-in of the four cvxpy modules
   the adapter touches lets ``make_cvxpy_solver_class`` /
   ``register_with_cvxpy`` actually run: the ``FOS_TPU`` backend class is
   constructed, registered, and driven through ``solve_via_data`` +
   ``invert`` on optimal and infeasible problems.  This executes every
   adapter line; only cvxpy's own problem stuffing remains untested until
   a cvxpy-bearing environment runs ``test_register_with_cvxpy_requires_cvxpy``.

Reference role: /root/reference/test/testconvex.jl:1-10 (Convex.jl's whole
suite against DR) — the L6 conformance tier.
"""

import sys
import types

import numpy as np
import pytest
import scipy.sparse as sp
from scipy.optimize import linprog

import jax.numpy as jnp

from fos_tpu import GAPA
from fos_tpu.cones.project import project_dual, svec
from fos_tpu.interface.conic import scs_cone_spec
from fos_tpu.interface.cvxpy_adapter import (_dims_to_cone_dict,
                                             make_cvxpy_solver_class,
                                             register_with_cvxpy,
                                             solve_conic_data)


class ConeDims:
    """cvxpy.reductions.solvers.conic_solvers ConeDims-shaped object."""

    def __init__(self, zero=0, nonneg=0, soc=(), psd=(), exp=0, p3d=()):
        self.zero = zero
        self.nonneg = nonneg
        self.soc = list(soc)
        self.psd = list(psd)
        self.exp = exp
        self.p3d = list(p3d)


def _solve(data, dims, **opts):
    opts.setdefault("eps", 1e-8)
    opts.setdefault("verbose", 0)
    opts.setdefault("max_iters", 60000)
    return solve_conic_data(dict(data, dims=dims), **opts)


def check_scs_duality(data, dims, out, atol=1e-4):
    """SCS optimality system: A'y + c = 0, c'x + b'y = 0, y in K*."""
    A = sp.csc_matrix(data["A"])
    b = np.asarray(data["b"], float)
    c = np.asarray(data["c"], float)
    x, y = out["x"], out["y"]
    assert np.abs(A.T @ y + c).max() < atol * (1 + np.abs(c).max())
    gap = abs(float(c @ x + b @ y))
    assert gap < atol * (1 + abs(c @ x) + abs(b @ y))
    spec = scs_cone_spec(_dims_to_cone_dict(dims))
    yproj = np.asarray(project_dual(spec, jnp.asarray(y)))
    assert np.abs(yproj - y).max() < atol * (1 + np.abs(y).max())


# ---------------------------------------------------------------- LP tier
def test_least_norm_closed_form():
    # min ||x|| s.t. F x = g  ->  x* = pinv(F) g
    rng = np.random.default_rng(10)
    m, n = 6, 14
    F = rng.standard_normal((m, n))
    g = rng.standard_normal(m)
    xstar = np.linalg.pinv(F) @ g
    A = sp.vstack([
        sp.hstack([sp.csr_matrix(F), sp.csr_matrix((m, 1))]),        # zero
        sp.hstack([sp.csr_matrix((1, n)), sp.csr_matrix([[-1.0]])]),  # t
        sp.hstack([-sp.identity(n), sp.csr_matrix((n, 1))]),          # x
    ]).tocsc()
    data = {"A": A, "b": np.concatenate([g, [0.0], np.zeros(n)]),
            "c": np.concatenate([np.zeros(n), [1.0]])}
    dims = ConeDims(zero=m, soc=[n + 1])
    out = _solve(data, dims)
    assert out["info"]["status"] == "optimal"
    np.testing.assert_allclose(out["x"][:n], xstar, atol=1e-4)
    check_scs_duality(data, dims, out)


def test_chebyshev_center_vs_linprog():
    # max r s.t. a_i'x + r||a_i|| <= b_i (ball in a polytope)
    rng = np.random.default_rng(11)
    m, d = 10, 2
    Am = rng.standard_normal((m, d))
    bm = Am @ rng.standard_normal(d) + np.abs(rng.standard_normal(m)) + 0.5
    norms = np.linalg.norm(Am, axis=1)
    ref = linprog(np.array([0.0, 0.0, -1.0]),
                  A_ub=np.hstack([Am, norms[:, None]]), b_ub=bm,
                  bounds=(None, None))
    assert ref.status == 0
    data = {"A": sp.csc_matrix(np.hstack([Am, norms[:, None]])), "b": bm,
            "c": np.array([0.0, 0.0, -1.0])}
    dims = ConeDims(nonneg=m)
    out = _solve(data, dims)
    assert out["info"]["status"] == "optimal"
    assert abs(out["info"]["pobj"] - ref.fun) < 1e-5 * (1 + abs(ref.fun))
    check_scs_duality(data, dims, out)


def test_lp_dual_recovery_vs_linprog_marginals():
    # y of the nonneg rows must equal -marginals (HiGHS sign convention)
    rng = np.random.default_rng(12)
    m, n = 14, 7
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + np.abs(rng.standard_normal(m)) + 0.2
    c = -G.T @ (np.abs(rng.standard_normal(m)) + 0.05)
    ref = linprog(c, A_ub=G, b_ub=h, bounds=(None, None))
    assert ref.status == 0
    data = {"A": sp.csc_matrix(G), "b": h, "c": c}
    dims = ConeDims(nonneg=m)
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    np.testing.assert_allclose(out["y"], -ref.ineqlin.marginals, atol=1e-4)
    check_scs_duality(data, dims, out)


def test_redundant_equality_rows():
    # duplicated zero rows (cvxpy emits these from chained reformulations)
    rng = np.random.default_rng(13)
    n = 5
    a = rng.standard_normal(n)
    Az = sp.vstack([sp.csr_matrix(a), sp.csr_matrix(a)])  # same row twice
    A = sp.vstack([Az, -sp.identity(n)]).tocsc()
    data = {"A": A, "b": np.array([1.0, 1.0] + [0.0] * n),
            "c": np.ones(n)}
    dims = ConeDims(zero=2, nonneg=n)
    out = _solve(data, dims)
    assert out["info"]["status"] == "optimal"
    assert abs(float(a @ out["x"]) - 1.0) < 1e-4
    assert out["x"].min() > -1e-5


def test_unbounded_fixture_status():
    data = {"A": sp.csc_matrix(np.array([[-1.0]])), "b": np.zeros(1),
            "c": np.array([-1.0])}
    out = _solve(data, ConeDims(nonneg=1), strict_certificates=True,
                 eps=1e-6)
    assert out["info"]["status"] == "unbounded"


# -------------------------------------------------------------- SOCP tier
def test_lasso_soft_threshold_oracle():
    # min ||Qx - g||^2 + lam ||x||_1 with Q orthonormal:
    # x* = soft(Q'g, lam/2)
    rng = np.random.default_rng(14)
    n, lam = 8, 0.7
    Q, _ = np.linalg.qr(rng.standard_normal((n, n)))
    g = rng.standard_normal(n)
    z = Q.T @ g
    xstar = np.sign(z) * np.maximum(np.abs(z) - lam / 2, 0.0)

    Zn = sp.csr_matrix((n, n))
    z1 = sp.csr_matrix((n, 1))
    I = sp.identity(n)
    rows = [
        sp.hstack([I, -I, z1]),            # u - x >= 0
        sp.hstack([-I, -I, z1]),           # u + x >= 0
        sp.hstack([Zn[:1, :], Zn[:1, :], sp.csr_matrix([[-1.0]])]),  # 1+t
        sp.hstack([Zn[:1, :], Zn[:1, :], sp.csr_matrix([[1.0]])]),   # 1-t
        sp.hstack([sp.csr_matrix(-2 * Q), Zn, z1]),                  # 2(Qx-g)
    ]
    data = {"A": sp.vstack(rows).tocsc(),
            "b": np.concatenate([np.zeros(2 * n), [1.0, 1.0], -2 * g]),
            "c": np.concatenate([np.zeros(n), lam * np.ones(n), [1.0]])}
    dims = ConeDims(nonneg=2 * n, soc=[n + 2])
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    np.testing.assert_allclose(out["x"][:n], xstar, atol=2e-4)
    check_scs_duality(data, dims, out)


# --------------------------------------------------------------- SDP tier
def test_nearest_psd_closed_form():
    # min ||X - C||_F s.t. X >> 0  ->  eigenvalue clip (testPSD.jl role)
    rng = np.random.default_rng(15)
    d = 4
    L = d * (d + 1) // 2
    B = rng.standard_normal((d, d))
    C = (B + B.T) / 2
    w, V = np.linalg.eigh(C)
    Xstar = (V * np.maximum(w, 0)) @ V.T
    sC = np.asarray(svec(jnp.asarray(C), scaled=True))
    IL = sp.identity(L)
    zc = sp.csr_matrix((1, L))
    rows = [
        sp.hstack([zc, sp.csr_matrix([[-1.0]])]),                  # t
        sp.hstack([-IL, sp.csr_matrix((L, 1))]),                   # xs - sC
        sp.hstack([-IL, sp.csr_matrix((L, 1))]),                   # PSD: xs
    ]
    data = {"A": sp.vstack(rows).tocsc(),
            "b": np.concatenate([[0.0], -sC, np.zeros(L)]),
            "c": np.concatenate([np.zeros(L), [1.0]])}
    dims = ConeDims(soc=[L + 1], psd=[d])
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    from fos_tpu.cones.project import smat

    Xs = np.asarray(smat(out["x"][:L]))
    np.testing.assert_allclose(Xs, Xstar, atol=2e-4)
    assert abs(out["info"]["pobj"]
               - np.linalg.norm(Xstar - C)) < 1e-4


def test_sdp_dual_recovery_lambda_min():
    # min tr(CX) s.t. tr(X) = 1, X >> 0: pobj = lam_min, dual of the
    # trace row y0 = -lam_min (A'y + c = 0 with C + y0 I >> 0)
    rng = np.random.default_rng(16)
    d = 5
    L = d * (d + 1) // 2
    B = rng.standard_normal((d, d))
    C = (B + B.T) / 2
    lam_min = float(np.linalg.eigvalsh(C)[0])
    sI = np.asarray(svec(jnp.asarray(np.eye(d)), scaled=True))
    sC = np.asarray(svec(jnp.asarray(C), scaled=True))
    rows = [sp.csr_matrix(sI), -sp.identity(L)]
    data = {"A": sp.vstack(rows).tocsc(),
            "b": np.concatenate([[1.0], np.zeros(L)]), "c": sC}
    dims = ConeDims(zero=1, psd=[d])
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    assert abs(out["info"]["pobj"] - lam_min) < 1e-5 * (1 + abs(lam_min))
    assert abs(out["y"][0] - (-lam_min)) < 1e-4 * (1 + abs(lam_min))
    check_scs_duality(data, dims, out)


# --------------------------------------------------------------- EXP tier
def test_entropy_maximization_uniform():
    # max sum -x log x s.t. sum x = 1  ->  x = 1/n, obj = log n
    n = 6
    nv = 2 * n  # (x, t)
    rows = [sp.hstack([sp.csr_matrix(np.ones((1, n))),
                       sp.csr_matrix((1, n))])]      # zero: sum x = 1
    b = [np.ones(1)]
    for i in range(n):  # Kexp triples (t_i, x_i, 1)
        r = np.zeros((3, nv))
        r[0, n + i] = -1.0
        r[1, i] = -1.0
        rows.append(sp.csr_matrix(r))
        b.append(np.array([0.0, 0.0, 1.0]))
    c = np.concatenate([np.zeros(n), -np.ones(n)])
    data = {"A": sp.vstack(rows).tocsc(), "b": np.concatenate(b), "c": c}
    dims = ConeDims(zero=1, exp=n)
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    np.testing.assert_allclose(out["x"][:n], np.full(n, 1 / n), atol=1e-4)
    assert abs(out["info"]["pobj"] - (-np.log(n))) < 1e-4
    check_scs_duality(data, dims, out)


def test_kl_divergence_to_target():
    # min sum x log(x/q) s.t. sum x = 1  ->  x = q, obj = 0
    rng = np.random.default_rng(17)
    n = 5
    q = np.abs(rng.standard_normal(n)) + 0.2
    q /= q.sum()
    nv = 2 * n  # (x, u)
    rows = [sp.hstack([sp.csr_matrix(np.ones((1, n))),
                       sp.csr_matrix((1, n))])]
    b = [np.ones(1)]
    for i in range(n):  # (-u_i, x_i, q_i) in Kexp
        r = np.zeros((3, nv))
        r[0, n + i] = 1.0
        r[1, i] = -1.0
        rows.append(sp.csr_matrix(r))
        b.append(np.array([0.0, 0.0, q[i]]))
    c = np.concatenate([np.zeros(n), np.ones(n)])
    data = {"A": sp.vstack(rows).tocsc(), "b": np.concatenate(b), "c": c}
    dims = ConeDims(zero=1, exp=n)
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    np.testing.assert_allclose(out["x"][:n], q, atol=2e-4)
    assert abs(out["info"]["pobj"]) < 2e-4


def test_exp_dual_cone_fixture():
    # min w s.t. (u0, v0, w) in Kexp*  ->  w* = -u0 exp(v0/u0) / e
    for u0, v0 in ((-1.0, 0.5), (-2.0, -1.0)):
        wstar = -u0 * np.exp(v0 / u0) / np.e
        data = {"A": sp.csc_matrix(np.array([[0.0], [0.0], [-1.0]])),
                "b": np.array([u0, v0, 0.0]), "c": np.array([1.0])}
        out = solve_conic_data(dict(data, dims={"ed": 1}), eps=1e-9,
                               verbose=0, max_iters=60000)
        assert out["info"]["status"] == "optimal"
        assert abs(out["x"][0] - wstar) < 1e-5 * (1 + wstar)


# --------------------------------------------------------------- POW tier
def test_pow_primal_geometric_mean():
    # max z s.t. (x0, y0, z) in Pow_a  ->  z* = x0^a y0^(1-a)
    for x0, y0, a in ((2.0, 3.0, 0.3), (0.5, 4.0, 0.75)):
        zstar = x0 ** a * y0 ** (1 - a)
        data = {"A": sp.csc_matrix(np.array([[0.0], [0.0], [-1.0]])),
                "b": np.array([x0, y0, 0.0]), "c": np.array([-1.0])}
        dims = ConeDims(p3d=[a])
        out = _solve(data, dims, eps=1e-9)
        assert out["info"]["status"] == "optimal"
        assert abs(out["x"][0] - zstar) < 1e-5 * (1 + zstar)


def test_pow_two_blocks_distinct_alphas():
    # two independent power-cone triples in one problem
    x1, y1, a1 = 2.0, 3.0, 0.3
    x2, y2, a2 = 1.5, 0.8, 0.6
    zs = x1 ** a1 * y1 ** (1 - a1) + x2 ** a2 * y2 ** (1 - a2)
    A = np.zeros((6, 2))
    A[2, 0] = -1.0
    A[5, 1] = -1.0
    data = {"A": sp.csc_matrix(A),
            "b": np.array([x1, y1, 0.0, x2, y2, 0.0]),
            "c": np.array([-1.0, -1.0])}
    dims = ConeDims(p3d=[a1, a2])
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    assert abs(-out["info"]["pobj"] - zs) < 1e-5 * (1 + zs)
    check_scs_duality(data, dims, out)


def test_pow_dual_cone_negative_alpha():
    # SCS convention: a < 0 in p means the DUAL power cone with |a|:
    # max w s.t. (u0, v0, w) in Pow_a* -> w* = (u0/a)^a (v0/(1-a))^(1-a)
    u0, v0, a = 1.2, 2.5, 0.4
    wstar = (u0 / a) ** a * (v0 / (1 - a)) ** (1 - a)
    data = {"A": sp.csc_matrix(np.array([[0.0], [0.0], [-1.0]])),
            "b": np.array([u0, v0, 0.0]), "c": np.array([-1.0])}
    dims = ConeDims(p3d=[-a])
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    assert abs(out["x"][0] - wstar) < 1e-5 * (1 + wstar)


# ------------------------------------------------------------- mixed tier
def test_all_cone_families_in_one_problem():
    # separable blocks: z + l + q + ep + p rows in one emission, optimum
    # is the sum of the per-block closed forms
    # vars: (a1, a2, a3, a4, a5)
    nv = 5
    rows, b = [], []

    def add(rowvals, bval):
        r = np.zeros((1, nv))
        for j, vv in rowvals:
            r[0, j] = vv
        rows.append(sp.csr_matrix(r))
        b.append(bval)

    add([(0, 1.0)], 1.5)             # zero: a1 = 1.5
    add([(1, -1.0)], 2.0)            # l: a2 + 2 >= 0
    add([], 2.0)                     # q head: 2
    add([(2, -1.0)], -1.0)           # q tail: a3 - 1
    add([], 0.5)                     # ep: (0.5, 1, a4)
    add([], 1.0)
    add([(3, -1.0)], 0.0)
    add([], 1.2)                     # p: (1.2, 0.8, a5) in Pow_0.4
    add([], 0.8)
    add([(4, -1.0)], 0.0)
    c = np.array([1.0, 1.0, 1.0, 1.0, -1.0])
    data = {"A": sp.vstack(rows).tocsc(), "b": np.asarray(b), "c": c}
    dims = ConeDims(zero=1, nonneg=1, soc=[2], exp=1, p3d=[0.4])
    out = _solve(data, dims, eps=1e-9)
    assert out["info"]["status"] == "optimal"
    expect = 1.5 - 2.0 + (-1.0) + np.exp(0.5) - 1.2 ** 0.4 * 0.8 ** 0.6
    assert abs(out["info"]["pobj"] - expect) < 1e-5 * (1 + abs(expect))
    check_scs_duality(data, dims, out)


def test_alg_override_gapa():
    # solver_opts-style alg selection reaches the engine
    rng = np.random.default_rng(18)
    m, n = 10, 6
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + np.abs(rng.standard_normal(m)) + 0.3
    c = -G.T @ (np.abs(rng.standard_normal(m)) + 0.1)
    ref = linprog(c, A_ub=G, b_ub=h, bounds=(None, None))
    data = {"A": sp.csc_matrix(G), "b": h, "c": c}
    out = _solve(data, ConeDims(nonneg=m), alg=GAPA(0.8, 0.9), eps=1e-9)
    assert out["info"]["status"] == "optimal"
    assert abs(out["info"]["pobj"] - ref.fun) < 1e-5 * (1 + abs(ref.fun))


# ----------------------------------------------------- cvxpy seam stand-in
class _StubSolution:
    def __init__(self, status, opt_val, primal_vars, dual_vars, attr):
        self.status = status
        self.opt_val = opt_val
        self.primal_vars = primal_vars
        self.dual_vars = dual_vars
        self.attr = attr


def _install_cvxpy_standin(monkeypatch):
    """Structural stand-in for the four cvxpy modules the adapter imports.

    NOT cvxpy: it emulates only the attribute surface
    ``make_cvxpy_solver_class`` / ``register_with_cvxpy`` touch, so the
    adapter's own code paths (class construction, solve_via_data, invert
    status mapping, registration) actually execute in this image."""
    cvxpy = types.ModuleType("cvxpy")
    settings = types.ModuleType("cvxpy.settings")
    settings.NUM_ITERS = "num_iters"
    settings.UNBOUNDED = "unbounded"
    settings.INFEASIBLE = "infeasible"
    settings.SOLVER_ERROR = "solver_error"
    solution = types.ModuleType("cvxpy.reductions.solution")
    solution.Solution = _StubSolution

    def failure_solution(status, attr=None):
        return _StubSolution(status, None, {}, {}, attr or {})

    solution.failure_solution = failure_solution

    scs_conif = types.ModuleType(
        "cvxpy.reductions.solvers.conic_solvers.scs_conif")

    class SCS:
        def name(self):
            return "SCS"

        def invert(self, sol, inverse_data):
            # the real SCS.invert maps x/y/s back through inverse_data;
            # the stand-in just surfaces what the adapter passed down
            info = sol["info"]
            status = ("optimal" if info["status"] == "solved"
                      else info["status"])
            return _StubSolution(status, info["pobj"],
                                 {"x": np.asarray(sol["x"])},
                                 {"y": np.asarray(sol["y"])},
                                 {"num_iters": info["iter"]})

    scs_conif.SCS = SCS
    defines = types.ModuleType("cvxpy.reductions.solvers.defines")
    defines.SOLVER_MAP_CONIC = {}
    defines.INSTALLED_SOLVERS = []

    reductions = types.ModuleType("cvxpy.reductions")
    solvers_mod = types.ModuleType("cvxpy.reductions.solvers")
    conic_solvers = types.ModuleType(
        "cvxpy.reductions.solvers.conic_solvers")
    for name, mod in [
        ("cvxpy", cvxpy), ("cvxpy.settings", settings),
        ("cvxpy.reductions", reductions),
        ("cvxpy.reductions.solution", solution),
        ("cvxpy.reductions.solvers", solvers_mod),
        ("cvxpy.reductions.solvers.defines", defines),
        ("cvxpy.reductions.solvers.conic_solvers", conic_solvers),
        ("cvxpy.reductions.solvers.conic_solvers.scs_conif", scs_conif),
    ]:
        monkeypatch.setitem(sys.modules, name, mod)
    cvxpy.settings = settings
    cvxpy.reductions = reductions
    reductions.solution = solution
    reductions.solvers = solvers_mod
    solvers_mod.defines = defines
    solvers_mod.conic_solvers = conic_solvers
    conic_solvers.scs_conif = scs_conif
    return defines


def test_cvxpy_backend_class_drives_solves(monkeypatch):
    defines = _install_cvxpy_standin(monkeypatch)
    cls = make_cvxpy_solver_class()
    backend = cls()
    assert backend.name() == "FOS_TPU"
    backend.import_solver()

    # optimal LP through solve_via_data -> invert
    rng = np.random.default_rng(19)
    m, n = 8, 5
    G = rng.standard_normal((m, n))
    h = G @ rng.standard_normal(n) + np.abs(rng.standard_normal(m)) + 0.3
    c = -G.T @ (np.abs(rng.standard_normal(m)) + 0.1)
    ref = linprog(c, A_ub=G, b_ub=h, bounds=(None, None))
    raw = backend.solve_via_data(
        {"A": sp.csc_matrix(G), "b": h, "c": c, "dims": ConeDims(nonneg=m)},
        warm_start=False, verbose=False,
        solver_opts={"eps": 1e-9, "max_iters": 60000})
    sol = backend.invert(raw, inverse_data=None)
    assert sol.status == "optimal"
    assert abs(sol.opt_val - ref.fun) < 1e-5 * (1 + abs(ref.fun))
    np.testing.assert_allclose(sol.primal_vars["x"], ref.x, atol=1e-4)

    # infeasible -> failure_solution path
    raw = backend.solve_via_data(
        {"A": sp.csc_matrix(np.array([[-1.0], [1.0]])),
         "b": np.array([-1.0, 0.0]), "c": np.array([1.0]),
         "dims": ConeDims(nonneg=2)},
        warm_start=False, verbose=False,
        solver_opts={"eps": 1e-6, "strict_certificates": True,
                     "max_iters": 40000})
    sol = backend.invert(raw, inverse_data=None)
    assert sol.status == "infeasible"

    # registration populates cvxpy's solver tables
    name = register_with_cvxpy()
    assert name == "FOS_TPU"
    assert "FOS_TPU" in defines.SOLVER_MAP_CONIC
    assert "FOS_TPU" in defines.INSTALLED_SOLVERS
