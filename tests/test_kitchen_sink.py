"""Kitchen-sink solve: every cone type in one problem.

Stresses the fused projector composition (elementwise + SOC + rotated SOC +
PSD + exp + power) through a full HSDE solve, validated against SLSQP.

Problem: min c'x - 0.2 v over x in R^5 subject to
  sum(x) = 1                       (Zero row)
  x <= 2 elementwise               (NonNeg rows)
  ||x - p0|| <= 1.5                (SOC rows)
  ||x||^2 <= 2 t q with t = q = 1  (rotated SOC rows + Zero rows)
  X = x1 I + M(x) is PSD (2x2)     (PSD rows, affine in x)
  (x5, 1, u) in Kexp, u <= 3       (exp rows: u >= e^{x5})
  (x1+2, x2+2, v) in Pow(0.4)      (power rows: v <= (x1+2)^.4 (x2+2)^.6)
"""

import numpy as np
import pytest
import jax.numpy as jnp

from fos_tpu import DR, solve
from fos_tpu.cones import ConeSpec
from fos_tpu.cones.spec import Cone
from fos_tpu.cones.project import svec


def build_problem():
    rng = np.random.default_rng(5)
    n = 5
    c = rng.standard_normal(n)
    p0 = rng.standard_normal(n) * 0.2

    rows = []
    bs = []
    blocks = []
    params = []

    def add(Arows, brows, cone, dim, par=()):
        rows.append(np.atleast_2d(Arows))
        bs.append(np.atleast_1d(brows))
        blocks.append((cone, dim))
        params.append(par)

    # variables: (x[5], t, q, u, v)  -> nv = 9
    nv = n + 4
    it, iq, iu, iv = n, n + 1, n + 2, n + 3

    # sum(x) = 1
    r = np.zeros((1, nv)); r[0, :n] = 1.0
    add(r, [1.0], Cone.ZERO, 1)
    # t = 1, q = 1
    r = np.zeros((2, nv)); r[0, it] = 1.0; r[1, iq] = 1.0
    add(r, [1.0, 1.0], Cone.ZERO, 2)
    # x <= 2  (s = 2 - x >= 0)
    r = np.zeros((n, nv)); r[:, :n] = np.eye(n)
    add(r, np.full(n, 2.0), Cone.NONNEG, n)
    # u <= 3
    r = np.zeros((1, nv)); r[0, iu] = 1.0
    add(r, [3.0], Cone.NONNEG, 1)
    # SOC: (1.5, x - p0)
    r = np.zeros((1 + n, nv)); r[1:, :n] = -np.eye(n)
    add(r, np.concatenate([[1.5], -p0]), Cone.SOC, 1 + n)
    # rotated SOC: (t, q, x)  => ||x||^2 <= 2 t q = 2
    r = np.zeros((2 + n, nv))
    r[0, it] = -1.0; r[1, iq] = -1.0; r[2:, :n] = -np.eye(n)
    add(r, np.zeros(2 + n), Cone.SOC_ROTATED, 2 + n)
    # PSD 2x2: [[1 + x1, x2], [x2, 1 + x3]] >= 0  (svec rows)
    # svec = (X11, sqrt2*X21, X22)
    L = 3
    r = np.zeros((L, nv))
    r[0, 0] = -1.0
    r[1, 1] = -np.sqrt(2.0)
    r[2, 2] = -1.0
    add(r, np.array([1.0, 0.0, 1.0]), Cone.PSD, L)
    # exp: (x5, 1, u) in Kexp  => u >= exp(x5)
    r = np.zeros((3, nv))
    r[0, 4] = -1.0
    r[2, iu] = -1.0
    add(r, np.array([0.0, 1.0, 0.0]), Cone.EXP_PRIMAL, 3)
    # power: (x1+2, x2+2, v) in Pow(0.4)  => v <= (x1+2)^0.4 (x2+2)^0.6
    # (x1+2, x2+2 > 0 is implied by ||x||^2 <= 2); objective pushes v up.
    r = np.zeros((3, nv))
    r[0, 0] = -1.0
    r[1, 1] = -1.0
    r[2, iv] = -1.0
    add(r, np.array([2.0, 2.0, 0.0]), Cone.POW_PRIMAL, 3, (0.4,))

    A = np.vstack(rows)
    b = np.concatenate(bs)
    K1 = ConeSpec(tuple(blocks), tuple(params))
    K2 = ConeSpec(((Cone.FREE, nv),))
    cc = np.zeros(nv)
    cc[:n] = c
    cc[iv] = -0.2
    return A, b, cc, K1, K2, c, p0, n


def _oracle(c, p0, n):
    from scipy.optimize import minimize

    cons = [
        {"type": "eq", "fun": lambda w: w.sum() - 1.0},
        {"type": "ineq", "fun": lambda w: 2.0 - w},
        {"type": "ineq", "fun": lambda w: 1.5 - np.linalg.norm(w - p0)},
        {"type": "ineq", "fun": lambda w: 2.0 - w @ w},
        {"type": "ineq", "fun": lambda w: np.linalg.eigvalsh(
            np.array([[1 + w[0], w[1]], [w[1], 1 + w[2]]])).min()},
        {"type": "ineq", "fun": lambda w: 3.0 - np.exp(w[4])},
    ]

    # v is free up to its power-cone bound and carries weight -0.2, so it
    # sits AT the bound: fold it into the objective.
    def obj(w):
        return c @ w - 0.2 * (w[0] + 2.0) ** 0.4 * (w[1] + 2.0) ** 0.6

    best = None
    for seed in range(5):
        x0 = np.random.default_rng(seed).standard_normal(n) * 0.1
        res = minimize(obj, x0, constraints=cons, method="SLSQP",
                       options={"maxiter": 2000, "ftol": 1e-14})
        if res.success and (best is None or res.fun < best.fun):
            best = res
    return best


def test_kitchen_sink():
    A, b, cc, K1, K2, c, p0, n = build_problem()
    sol = solve(A, b, cc, K1, K2, alg=DR(), eps=1e-8, max_iters=60000, verbose=0)
    assert sol.status == "Optimal"
    x = np.asarray(sol.x[:n])
    # feasibility of every constraint family
    assert abs(x.sum() - 1.0) < 1e-6
    assert x.max() <= 2.0 + 1e-6
    assert np.linalg.norm(x - p0) <= 1.5 + 1e-6
    assert x @ x <= 2.0 + 1e-6
    X = np.array([[1 + x[0], x[1]], [x[1], 1 + x[2]]])
    assert np.linalg.eigvalsh(X).min() >= -1e-6
    u = float(sol.x[n + 2])
    assert u >= np.exp(x[4]) - 1e-5 and u <= 3.0 + 1e-6
    v = float(sol.x[n + 3])
    assert v <= (x[0] + 2.0) ** 0.4 * (x[1] + 2.0) ** 0.6 + 1e-5
    # optimality vs SLSQP (objective includes the -0.2 v term)
    best = _oracle(c, p0, n)
    assert best is not None
    assert float(c @ x) - 0.2 * v <= best.fun + 1e-5 * (1 + abs(best.fun))


def test_heterogeneous_psd_sdp_e2e(rng):
    # Four PSD blocks of DIFFERENT sides in one solve exercises the bucketed
    # projection through the full HSDE stack: find t minimizing such that
    # C_k - t I >> 0 for all k simultaneously => t* = min_k lambda_min(C_k).
    import scipy

    sides = [2, 3, 5, 8]
    Cs = []
    for i, d in enumerate(sides):
        B = rng.standard_normal((d, d))
        Cs.append((B + B.T) / 2)
    tstar = min(float(np.linalg.eigvalsh(C)[0]) for C in Cs)

    rows = []
    bvec = []
    blocks = []
    for C, d in zip(Cs, sides):
        sI = np.asarray(svec(jnp.asarray(np.eye(d))))
        sC = np.asarray(svec(jnp.asarray(C)))
        rows.append(sI[:, None])
        bvec.append(sC)
        blocks.append((Cone.PSD, d * (d + 1) // 2))
    A = np.vstack(rows)
    b = np.concatenate(bvec)
    c = np.asarray([-1.0])  # max t
    K1 = ConeSpec(tuple(blocks))
    from fos_tpu.cones import free

    sol = solve(A, b, c, K1, free(1), alg=DR(), eps=1e-8, verbose=0,
                max_iters=40000)
    assert sol.status == "Optimal"
    assert abs(float(sol.x[0]) - tstar) < 1e-6 * (1 + abs(tstar))
