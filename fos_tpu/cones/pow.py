"""Projection onto the 3D power cone.

The reference's cone registry stops at the exponential cone
(/root/reference/src/cones.jl:4-14); power cones are a beyond-parity
extension matching SCS's ``p`` cones, so any modeling layer that can emit
SCS power-cone data can target this solver.  Definitions (SCS ordering
``(x, y, z)``, exponent ``a`` in (0, 1)):

    Kpow(a)  = { (x,y,z) : x >= 0, y >= 0, x^a * y^(1-a) >= |z| }
    Kpow*(a) = { (u,v,w) : u >= 0, v >= 0, (u/a)^a * (v/(1-a))^(1-a) >= |w| }

Method (same shape as SCS's ``proj_power_cone``): for a point in neither
``Kpow`` nor the polar ``-Kpow*``, the projection ``(x, y, sign(z)*r)``
satisfies the stationarity system

    x(r) = (x0 + sqrt(x0^2 + 4*a*r*(|z0|-r))) / 2
    y(r) = (y0 + sqrt(y0^2 + 4*(1-a)*r*(|z0|-r))) / 2
    f(r) = x(r)^a * y(r)^(1-a) - r = 0,     r in (0, |z0|),

with ``f > 0`` left of the (unique) root and ``f < 0`` right of it.  A
fixed-iteration bisection (jit-friendly, no data-dependent trip counts)
brackets the root, followed by clamped Newton polish — mirroring the
exponential-cone root-finder in :mod:`fos_tpu.cones.exp`.  The sign test
runs in log space so extreme magnitudes classify exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BISECTION_ITERS = 96
_NEWTON_ITERS = 6


def _log_member(x, y, az, wx, wy, a):
    """log-space membership  (x/wx)^a * (y/wy)^(1-a) >= az  with x,y >= 0.

    ``wx = wy = 1`` tests Kpow(a); ``wx = a, wy = 1-a`` tests Kpow*(a).
    """
    x_safe = jnp.where(x > 0, x, 1.0)
    y_safe = jnp.where(y > 0, y, 1.0)
    az_safe = jnp.where(az > 0, az, 1.0)
    lhs = a * (jnp.log(x_safe) - jnp.log(wx)) \
        + (1.0 - a) * (jnp.log(y_safe) - jnp.log(wy))
    strict = (x > 0) & (y > 0) & (lhs >= jnp.log(az_safe))
    return (x >= 0) & (y >= 0) & ((az <= 0) | strict)


def _stable_root(x0, s):
    """(x0 + sqrt(x0^2 + 4*s))/2, stable for x0 < 0 (conjugate form avoids
    the catastrophic cancellation when 4*s << x0^2)."""
    disc = jnp.sqrt(x0 * x0 + 4.0 * s)
    direct = 0.5 * (x0 + disc)
    denom = disc - x0  # = disc + |x0| when x0 <= 0
    conj = jnp.where(denom > 0, 2.0 * s / jnp.where(denom > 0, denom, 1.0), 0.0)
    return jnp.where(x0 > 0, direct, conj)


def _xy_of_r(x0, y0, az, a, r):
    q = r * (az - r)
    return _stable_root(x0, a * q), _stable_root(y0, (1.0 - a) * q)


def _f_log(x0, y0, az, a, r):
    """sign(f(r)) via  a*log x(r) + (1-a)*log y(r) - log r  (overflow-safe)."""
    x, y = _xy_of_r(x0, y0, az, a, r)
    x = jnp.where(x > 0, x, 1e-30)
    y = jnp.where(y > 0, y, 1e-30)
    r_safe = jnp.where(r > 0, r, 1e-30)
    return a * jnp.log(x) + (1.0 - a) * jnp.log(y) - jnp.log(r_safe)


def _f_log_grad(x0, y0, az, a, r):
    q = x0 * x0 + 4.0 * a * r * (az - r)
    p = y0 * y0 + 4.0 * (1.0 - a) * r * (az - r)
    sq = jnp.sqrt(jnp.where(q > 0, q, 1.0))
    sp = jnp.sqrt(jnp.where(p > 0, p, 1.0))
    x, y = _xy_of_r(x0, y0, az, a, r)
    dx = a * (az - 2.0 * r) / sq
    dy = (1.0 - a) * (az - 2.0 * r) / sp
    x = jnp.where(x > 0, x, 1e-30)
    y = jnp.where(y > 0, y, 1e-30)
    r_safe = jnp.where(r > 0, r, 1e-30)
    return a * dx / x + (1.0 - a) * dy / y - 1.0 / r_safe


def _hard_case_r(x0, y0, az, a):
    """Root of f on (0, az) by bisection + clamped Newton polish."""
    lo = jnp.zeros_like(az)
    hi = az

    def bisect(carry, _):
        lo, hi = carry
        mid = 0.5 * (lo + hi)
        pos = _f_log(x0, y0, az, a, mid) > 0
        return (jnp.where(pos, mid, lo), jnp.where(pos, hi, mid)), None

    (lo, hi), _ = jax.lax.scan(bisect, (lo, hi), None, length=_BISECTION_ITERS)
    r = 0.5 * (lo + hi)

    def newton(r, _):
        g = _f_log_grad(x0, y0, az, a, r)
        step = _f_log(x0, y0, az, a, r) / jnp.where(g != 0, g, 1.0)
        new = jnp.clip(r - step, lo, hi)
        return jnp.where(jnp.isfinite(new), new, r), None

    r, _ = jax.lax.scan(newton, r, None, length=_NEWTON_ITERS)
    return r


def project_pow_single(v, a):
    """Project one 3-vector ``v = (x, y, z)`` onto Kpow(a)."""
    x0, y0, z0 = v[0], v[1], v[2]
    az = jnp.abs(z0)
    one = jnp.ones_like(a)
    in_primal = _log_member(x0, y0, az, one, one, a)
    # polar(Kpow(a)) = -Kpow*(a):  (-x0,-y0) scaled member test.
    in_polar = _log_member(-x0, -y0, az, a, 1.0 - a, a)
    degenerate = az <= 0  # z = 0: projection is the orthant clip

    hard = ~(in_primal | in_polar | degenerate)
    # safe dummies keep the root-finder NaN-free where it doesn't apply
    xh = jnp.where(hard, x0, -1.0)
    yh = jnp.where(hard, y0, -1.0)
    azh = jnp.where(hard, az, 1.0)
    r = _hard_case_r(xh, yh, azh, a)
    xr, yr = _xy_of_r(xh, yh, azh, a, r)
    p_hard = jnp.stack([xr, yr, jnp.sign(z0) * r])

    p_clip = jnp.stack(
        [jnp.maximum(x0, 0.0), jnp.maximum(y0, 0.0), jnp.zeros_like(z0)])
    zero3 = jnp.zeros_like(v)

    return jnp.where(in_primal, v,
                     jnp.where(in_polar, zero3,
                               jnp.where(degenerate, p_clip, p_hard)))


def project_pow_dual_single(v, a):
    """Project onto Kpow*(a) via Moreau: P_{K*}(v) = v + P_K(-v)
    (the reference's generic dual prox, src/cones.jl:80-85)."""
    return v + project_pow_single(-v, a)


project_pow = jax.vmap(project_pow_single)        # (k, 3), (k,) -> (k, 3)
project_pow_dual = jax.vmap(project_pow_dual_single)
