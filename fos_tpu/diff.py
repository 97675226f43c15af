"""Differentiable conic solves — implicit differentiation through the
DR/GAP fixed point.

No reference counterpart (Julia/FirstOrderSolvers.jl has no AD story); this
is the JAX-native capability that makes the solver usable inside learned
pipelines (the role diffcp plays for SCS): gradients of any scalar function
of the solution with respect to the problem data (A, b, c).

Method (standard implicit-function-theorem treatment of an averaged
operator, cf. jaxopt/diffcp):

* forward: run the ordinary fused solve to the fixed point ``z* = T(z*)``
  of the one-iteration map T (two relaxed projections);
* backward: the cotangent of ``z*`` w.r.t. a loss L solves
  ``(I - (dT/dz)') w = zbar``, computed by the Neumann iteration
  ``w <- zbar + (dT/dz)' w`` (T is an averaged — hence nonexpansive —
  operator, so the iteration converges wherever the fixed point is
  nondegenerate); each application of ``(dT/dz)'`` is one ``jax.vjp`` of a
  DIFFERENTIABLE re-expression of the step in which the inner SPD solve
  uses ``jax.scipy.sparse.linalg.cg`` (reverse-differentiable via
  ``lax.custom_linear_solve``);
* data gradients: ``(Abar, bbar, cbar) = vjp_theta(T)(w)``.

Supported algorithms: the GAP family (GAP / DR / AP) and GAPA, plain or
under any wrapper (LineSearch / Longstep / Anderson).  Gradients depend
only on the fixed-point MAP, not on the path the solver took to reach it
(the diffcp principle), so GAPA is differentiated through the
frozen-coefficient map ``T_{a12}`` with ``a12`` = the converged adaptive
relaxation read from the final solver state — by then the Friedrichs-angle
estimate has stabilized and ``z*`` is a fixed point of that frozen map.
Wrappers preserve the inner map's fixed-point set (at ``T(x) = x`` the
line search finds zero residual, the Anderson mixer returns the point
itself, and the longstep planes contain the point), so a wrapped solve is
differentiated through the INNER algorithm's frozen map.

``A`` may be dense or ``BCOO`` sparse: every data-touching op in the
frozen map (``q_mul`` / ``hsde_normal_mul``) is BCOO-differentiable, and
the returned ``Abar`` cotangent is a BCOO on the same sparsity pattern
(gradients w.r.t. stored nonzeros — the diffcp convention).
The recovered solution ``(x, y, s) = (u_x, u_y, v_s)/tau`` and any
downstream scalar are ordinary differentiable jnp ops of ``z*``.

Both differentiation modes are available: reverse (``jax.grad`` /
``jax.jacrev``, the default) via a custom VJP, and forward
(``jax.jacfwd`` / ``jax.jvp``, ``mode="jvp"``) via a custom JVP solving
the tangent system ``(I - dS/dz) dz = (dS/dθ) dθ`` with the same
ray-deflated least-squares treatment.

Sanity oracles used by the tests (LP duality / envelope theorem):
``d(c'x*)/dc = x*`` and ``d(c'x*)/db = y*`` at a nondegenerate optimum.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from fos_tpu.cones.project import project as cone_project
from fos_tpu.cones.spec import ConeSpec
from fos_tpu.linalg import hsde_ops
from fos_tpu.problems.hsde import hsde_cone_spec
from fos_tpu.solvers.base import GAP, GAPA


def _unwrap(alg):
    """Innermost algorithm of a wrapper chain (wrappers carry ``.alg``)."""
    while getattr(alg, "alg", None) is not None:
        alg = alg.alg
    return alg


def _diff_step(coeffs, spec: ConeSpec, psd_method: str, cg_tol: float,
               cg_maxiter: int):
    """A differentiable re-expression of the GAP step (coefficients frozen
    at their converged values): the inner SPD solve goes through jax.scipy
    CG (implicitly differentiated, both modes), the cone projection through
    the fused projector (piecewise smooth)."""
    alpha, a1, a2 = coeffs

    def T(z, A, b, c):
        l = (z.shape[0]) // 2
        u0, v0 = z[:l], z[l:]
        rhs = u0 - hsde_ops.q_mul(A, b, c, v0)
        u, _ = jax.scipy.sparse.linalg.cg(
            lambda t: hsde_ops.hsde_normal_mul(A, b, c, t), rhs,
            tol=cg_tol, maxiter=cg_maxiter)
        y1 = jnp.concatenate([u, hsde_ops.q_mul(A, b, c, u)])
        tmp1 = a1 * y1 + (1.0 - a1) * z
        zc = cone_project(spec, tmp1, psd_method)
        tmp2 = a2 * zc + (1.0 - a2) * tmp1
        return alpha * tmp2 + (1.0 - alpha) * z

    return T


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _fixed_point(A, b, c, alg, static, opts):
    """Raw DR/GAP/GAPA fixed point z* of the HSDE iteration (custom VJP)."""
    return _forward(A, b, c, alg, static, opts)[0]


def _forward(A, b, c, alg, static, opts):
    """Run the fused solve; returns (z*, (alpha, a1, a2)) with the
    relaxation coefficients frozen at their final values (a jnp scalar for
    GAPA's adaptive a12, Python floats for GAP)."""
    from fos_tpu.problems.conic import ConicProblem
    from fos_tpu.problems.hsde import HSDEForm
    from fos_tpu.solvers.engine import fused_solve

    K1, K2, psd_method = static
    prob = ConicProblem(A, b, c, K1, K2)
    form = HSDEForm.build(prob, psd_method=psd_method,
                          cg_tol_floor=opts.get("cg_tol_floor"),
                          compensated=False)
    res = fused_solve(alg, form, form.initial_value(b.dtype),
                      max_iters=opts.get("max_iters", 10000),
                      eps=opts.get("eps", 1e-8),
                      checki=opts.get("checki", 100))
    a1, a2 = alg.coeffs(res.state.aux)  # wrappers delegate to the inner alg
    # the converged coefficients are CONSTANTS of the frozen map: cut any
    # data dependence the adaptive carry picked up along the solve path
    a1 = jax.lax.stop_gradient(a1)
    a2 = jax.lax.stop_gradient(a2)
    return res.state.x, (_unwrap(alg).alpha, a1, a2)


def _fixed_point_fwd(A, b, c, alg, static, opts):
    zstar, coeffs = _forward(A, b, c, alg, static, opts)
    return zstar, (A, b, c, zstar, coeffs)


def _fixed_point_bwd(alg, static, opts, residuals, zbar):
    A, b, c, zstar, coeffs = residuals
    K1, K2, psd_method = static
    spec = hsde_cone_spec(K1, K2)
    T = _diff_step(coeffs, spec, psd_method,
                   opts.get("diff_cg_tol", 1e-10),
                   opts.get("diff_cg_maxiter", 500))

    # The HSDE step is positively homogeneous (cones and the linear
    # subspace are scale-invariant), so dT/dz has eigenvalue EXACTLY 1
    # along the solution ray and the plain Neumann series stalls.  The
    # solution map (x,y,s) = guess/tau is ray-invariant, so we may
    # differentiate the ray-NORMALIZED map S(z) = T(z) * ||z*||/||T(z)||
    # instead: same fixed point, same gradients, ray eigenvalue deflated
    # to 0 (dS/dz = (I - zhat zhat') dT/dz at z*).
    nrm_star = jnp.linalg.norm(zstar)

    def S(z, A_, b_, c_):
        t = T(z, A_, b_, c_)
        return t * (nrm_star / jnp.linalg.norm(t))

    _, vjp_z = jax.vjp(lambda z: S(z, A, b, c), zstar)

    # Adjoint system (I - dS/dz') w = zbar solved in the LEAST-SQUARES
    # sense by CG on the normal equations (CGLS): even after ray deflation
    # the DR Jacobian can be singular along fixed-point-set directions the
    # solution map is insensitive to — least squares projects those out
    # (GMRES NaN'd / stalled on such instances; CGLS converges in ~10
    # iterations, measured).
    def op_t(w):  # (I - J') w
        (Jt_w,) = vjp_z(w)
        return w - Jt_w

    def op_f(w):  # (I - J) w
        _, Jw = jax.jvp(lambda z: S(z, A, b, c), (zstar,), (w,))
        return w - Jw

    from fos_tpu.linalg.cg import conjugate_gradient

    # Tikhonov damping: the deflated normal-equations operator still has an
    # EXACT zero eigenvalue along the ray; on some instances CG's recurrence
    # drifts into that null space on rounding noise and |w| grows without
    # bound (observed: ||w|| ~ 1e13, garbage gradients, while lam = 1e-10
    # converges in ~35 iterations to the correct gradient — the smallest
    # nonzero singular value is O(1e-2), so the bias is negligible).
    lam = opts.get("adjoint_damping", 1e-10)
    res = conjugate_gradient(
        lambda w: op_f(op_t(w)) + lam * w, op_f(zbar), jnp.zeros_like(zbar),
        tol=opts.get("adjoint_tol", 1e-10),
        max_iters=opts.get("adjoint_iters", 1000))
    w = res.x

    _, vjp_theta = jax.vjp(lambda A_, b_, c_: S(zstar, A_, b_, c_), A, b, c)
    Abar, bbar, cbar = vjp_theta(w)
    return Abar, bbar, cbar


_fixed_point.defvjp(_fixed_point_fwd, _fixed_point_bwd)


@functools.partial(jax.custom_jvp, nondiff_argnums=(3, 4, 5))
def _fixed_point_j(A, b, c, alg, static, opts):
    """Forward-mode twin of :func:`_fixed_point` (custom JVP) — JAX allows
    only one custom rule per callable, so the mode picks the wrapper."""
    return _forward(A, b, c, alg, static, opts)[0]


@_fixed_point_j.defjvp
def _fixed_point_j_jvp(alg, static, opts, primals, tangents):
    A, b, c = primals
    dA, db, dc = tangents
    K1, K2, psd_method = static
    zstar, coeffs = _forward(A, b, c, alg, static, opts)
    spec = hsde_cone_spec(K1, K2)
    T = _diff_step(coeffs, spec, psd_method,
                   opts.get("diff_cg_tol", 1e-10),
                   opts.get("diff_cg_maxiter", 500))

    # Same ray-normalized map S as the VJP (see _fixed_point_bwd): the
    # HSDE step's exact eigenvalue 1 along the solution ray is deflated so
    # the tangent system becomes solvable in the least-squares sense.
    nrm_star = jnp.linalg.norm(zstar)

    def S(z, A_, b_, c_):
        t = T(z, A_, b_, c_)
        return t * (nrm_star / jnp.linalg.norm(t))

    # rhs = (dS/dθ) dθ at (z*, θ)
    _, rhs = jax.jvp(lambda A_, b_, c_: S(zstar, A_, b_, c_),
                     (A, b, c), (dA, db, dc))

    _, vjp_z = jax.vjp(lambda z: S(z, A, b, c), zstar)

    def op_t(w):  # (I - J') w
        (Jt_w,) = vjp_z(w)
        return w - Jt_w

    def op_f(w):  # (I - J) w
        _, Jw = jax.jvp(lambda z: S(z, A, b, c), (zstar,), (w,))
        return w - Jw

    from fos_tpu.linalg.cg import conjugate_gradient

    # tangent system (I - J) dz = rhs, least squares via CGLS on the
    # normal equations (I-J)'(I-J) dz = (I-J)' rhs (mirror of the adjoint
    # solve: directions the solution map is insensitive to are projected
    # out); same Tikhonov damping as the VJP — see _fixed_point_bwd
    lam = opts.get("adjoint_damping", 1e-10)
    res = conjugate_gradient(
        lambda w: op_t(op_f(w)) + lam * w, op_t(rhs), jnp.zeros_like(rhs),
        tol=opts.get("adjoint_tol", 1e-10),
        max_iters=opts.get("adjoint_iters", 1000))
    return zstar, res.x


def diff_solve(A, b, c, K1: ConeSpec, K2: ConeSpec, alg: GAP = None,
               psd_method: str = "eigh", mode: str = "vjp",
               **opts) -> Tuple[jnp.ndarray, ...]:
    """Differentiable solve: returns ``(x, y, s)`` as functions of
    ``(A, b, c)``.  ``mode="vjp"`` (default) supports ``jax.grad`` /
    ``jax.jacrev``; ``mode="jvp"`` supports ``jax.jvp`` / ``jax.jacfwd``
    (parameter sensitivities — many outputs, few inputs).

    ``A`` may be dense or BCOO sparse (gradients w.r.t. the stored
    nonzeros).  The algorithm may be GAP-family (GAP/DR/AP) or GAPA, plain
    or wrapped (LineSearch/Longstep/Anderson — all preserve the inner
    fixed-point set, so the frozen inner map is differentiated).
    Restriction: the solve must actually reach its fixed point (gradients
    of an unconverged iterate are not meaningful).
    """
    alg = alg if alg is not None else GAP(0.5, 2.0, 2.0)  # DR
    if not isinstance(_unwrap(alg), (GAP, GAPA)):
        raise ValueError(
            "diff_solve supports GAP/DR/AP and GAPA (optionally under "
            "LineSearch/Longstep/Anderson wrappers); got "
            f"{type(_unwrap(alg)).__name__}")
    if mode not in ("vjp", "jvp"):
        raise ValueError(f"mode must be 'vjp' or 'jvp', got {mode!r}")
    fp = _fixed_point if mode == "vjp" else _fixed_point_j
    static = (K1, K2, psd_method)
    zstar = fp(A, b, c, alg, static, _HashableOpts(opts))
    # solution recovery (differentiable): one more projection pass then /tau
    spec = hsde_cone_spec(K1, K2)
    l = K1.dim + K2.dim + 1
    n = K2.dim

    def proj_affine(z):
        u0, v0 = z[:l], z[l:]
        rhs = u0 - hsde_ops.q_mul(A, b, c, v0)
        u, _ = jax.scipy.sparse.linalg.cg(
            lambda t: hsde_ops.hsde_normal_mul(A, b, c, t), rhs,
            tol=1e-10, maxiter=500)
        return jnp.concatenate([u, hsde_ops.q_mul(A, b, c, u)])

    guess = cone_project(spec, proj_affine(zstar), psd_method)
    tau = guess[l - 1]
    x = guess[:n] / tau
    y = guess[n : l - 1] / tau
    s = guess[l + n : 2 * l - 1] / tau
    return x, y, s


class _HashableOpts(dict):
    """opts travel through custom_vjp nondiff args: must be hashable."""

    def __hash__(self):
        return hash(tuple(sorted(self.items())))
