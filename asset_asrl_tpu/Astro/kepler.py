"""Kepler propagation, Lambert solver, and element conversions.

Reference: `src/Astro/KeplerPropagator.h` (universal-variable propagator as a
differentiable function), `src/Astro/KeplerUtils.{h,cpp}` (element
conversions), `src/Astro/LambertSolvers.{h,cpp}` (Izzo single/multi-rev,
batch-threaded).  TPU design: the propagator's universal-anomaly Newton
iteration runs in a `lax.while_loop`; derivatives flow through forward-mode
AD; batch propagation/Lambert are `jax.vmap`s.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..config import DEFAULT_DTYPE
from ..VectorFunctions.function import VectorFunction

__all__ = ["KeplerPropagator", "propagate_kepler", "lambert_izzo",
           "cartesian_to_classic", "classic_to_cartesian",
           "cartesian_to_modified", "modified_to_cartesian"]


# ---------------------------------------------------------------- stumpff
def _stumpff_C(z):
    """C(z) = (1-cos(sqrt z))/z for z>0, (cosh(sqrt -z)-1)/(-z) for z<0."""
    eps = 1e-8
    sz = jnp.sqrt(jnp.abs(z) + 1e-300)
    pos = (1.0 - jnp.cos(sz)) / (sz * sz)
    neg = (jnp.cosh(sz) - 1.0) / (sz * sz)
    ser = 0.5 - z / 24.0 + z * z / 720.0
    return jnp.where(jnp.abs(z) < eps, ser, jnp.where(z > 0, pos, neg))


def _stumpff_S(z):
    """S(z) = (sqrt z - sin(sqrt z))/z^1.5 etc."""
    eps = 1e-8
    sz = jnp.sqrt(jnp.abs(z) + 1e-300)
    pos = (sz - jnp.sin(sz)) / sz ** 3
    neg = (jnp.sinh(sz) - sz) / sz ** 3
    ser = 1.0 / 6.0 - z / 120.0 + z * z / 5040.0
    return jnp.where(jnp.abs(z) < eps, ser, jnp.where(z > 0, pos, neg))


def _propagate_rv(rv, dt, mu):
    """Universal-variable Kepler propagation of [r (3), v (3)] by dt."""
    r0 = rv[:3]
    v0 = rv[3:6]
    r0n = jnp.sqrt(r0 @ r0)
    vr0 = (r0 @ v0) / r0n
    alpha = 2.0 / r0n - (v0 @ v0) / mu     # 1/sma
    sqmu = jnp.sqrt(mu)

    chi0 = jnp.where(jnp.abs(alpha) > 1e-12,
                     sqmu * jnp.abs(alpha) * dt,
                     jnp.sign(dt) * jnp.sqrt(r0n) * 0.1)

    def body(carry):
        chi, _, it = carry
        z = alpha * chi * chi
        C = _stumpff_C(z)
        S = _stumpff_S(z)
        F = (r0n * vr0 / sqmu * chi * chi * C
             + (1.0 - alpha * r0n) * chi ** 3 * S + r0n * chi
             - sqmu * dt)
        dF = (r0n * vr0 / sqmu * chi * (1.0 - z * S)
              + (1.0 - alpha * r0n) * chi * chi * C + r0n)
        step = F / dF
        return chi - step, jnp.abs(step), it + 1

    def cond(carry):
        _, err, it = carry
        return (err > 1e-13) & (it < 60)

    chi, _, _ = jax.lax.while_loop(cond, body, (chi0, jnp.inf, 0))

    z = alpha * chi * chi
    C = _stumpff_C(z)
    S = _stumpff_S(z)
    f = 1.0 - chi * chi / r0n * C
    g = dt - chi ** 3 / sqmu * S
    r = f * r0 + g * v0
    rn = jnp.sqrt(r @ r)
    gdot = 1.0 - chi * chi / rn * C
    fdot = sqmu / (rn * r0n) * (z * S - 1.0) * chi
    v = fdot * r0 + gdot * v0
    return jnp.concatenate([r, v])


def propagate_kepler(rv, dt, mu=1.0):
    """Host-callable Kepler propagation; batch if rv is 2-D."""
    rv = np.asarray(rv, dtype=np.float64)
    if rv.ndim == 2:
        f = jax.jit(jax.vmap(lambda s, d: _propagate_rv(s, d, mu)))
        return np.asarray(f(jnp.asarray(rv),
                            jnp.asarray(np.broadcast_to(dt, rv.shape[0]))))
    f = jax.jit(lambda s, d: _propagate_rv(s, d, mu))
    return np.asarray(f(jnp.asarray(rv), jnp.asarray(float(dt))))


def KeplerPropagator(mu=1.0):
    """Differentiable VectorFunction [r, v, dt] -> [r(dt), v(dt)]
    (reference `KeplerPropagator.h:37`)."""
    def impl(x):
        return _propagate_rv(x[:6], x[6], mu)
    return VectorFunction(impl, 7, 6, name="KeplerPropagator")


# ----------------------------------------------------------------- Lambert
def lambert_izzo(r1, r2, tof, mu=1.0, longway=False, Nrevs=0, rightbranch=False):
    """Izzo-style universal Lambert solver (single revolution default).

    Returns (v1, v2).  Multi-rev via Nrevs (left/right branch selection).
    Reference: `src/Astro/LambertSolvers.cpp:7-34`; algorithm follows the
    published Izzo 2015 formulation.
    """
    r1 = np.asarray(r1, dtype=np.float64)
    r2 = np.asarray(r2, dtype=np.float64)
    r1n = np.linalg.norm(r1)
    r2n = np.linalg.norm(r2)
    c = np.linalg.norm(r2 - r1)
    s = 0.5 * (r1n + r2n + c)
    lam2 = 1.0 - c / s
    lam = np.sqrt(lam2)
    ih = np.cross(r1, r2)
    if ih[2] < 0:
        longway = not longway
    if longway:
        lam = -lam
    T = np.sqrt(2.0 * mu / s ** 3) * tof

    def tof_of_x(x, N):
        # Lancaster-Blanchard time of flight
        a = 1.0 / (1.0 - x * x)
        if x < 1.0:
            alfa = 2.0 * np.arccos(np.clip(x, -1, 1))
            beta = 2.0 * np.arcsin(np.sqrt(lam2 / a) * np.sign(lam))
            t = (a ** 1.5) * ((alfa - np.sin(alfa))
                              - (beta - np.sin(beta)) + 2.0 * np.pi * N)
        else:
            alfa = 2.0 * np.arccosh(x)
            beta = 2.0 * np.arcsinh(np.sqrt(-lam2 / a) * np.sign(lam))
            t = (-a) ** 1.5 * ((beta - np.sinh(beta)) - (alfa - np.sinh(alfa)))
        return t / 2.0

    # initial guess (single rev: log-based; multi-rev: midpoints)
    if Nrevs == 0:
        T0 = np.arccos(lam) + lam * np.sqrt(1 - lam2)
        T1 = 2.0 / 3.0 * (1.0 - lam ** 3)
        if T >= T0:
            x0 = (T0 / T) ** (2.0 / 3.0) - 1.0
        elif T < T1:
            x0 = 5.0 / 2.0 * T1 / T * (T1 - T) / (1.0 - lam ** 5) + 1.0
        else:
            x0 = (T0 / T) ** (np.log2(T1 / T0)) - 1.0
    else:
        x0 = (-0.5 + (0.5 if rightbranch else -0.1))

    x = np.clip(x0, -0.999999, 50.0)
    for _ in range(60):
        h = 1e-7
        f = tof_of_x(x, Nrevs) - T
        df = (tof_of_x(x + h, Nrevs) - tof_of_x(x - h, Nrevs)) / (2 * h)
        if df == 0:
            break
        step = f / df
        x -= np.clip(step, -0.5, 0.5)
        x = np.clip(x, -0.999999, 1e3 if Nrevs == 0 else 0.999999)
        if abs(step) < 1e-13:
            break

    # velocities from terminal velocity components (Izzo 2015 eqs. 15-16)
    gamma = np.sqrt(mu * s / 2.0)
    rho = (r1n - r2n) / c
    sig = np.sqrt(1.0 - rho ** 2)
    y = np.sqrt(1.0 - lam2 * (1.0 - x * x))
    Vr1 = gamma * ((lam * y - x) - rho * (lam * y + x)) / r1n
    Vr2 = -gamma * ((lam * y - x) + rho * (lam * y + x)) / r2n
    Vt1 = gamma * sig * (y + lam * x) / r1n
    Vt2 = gamma * sig * (y + lam * x) / r2n

    ih = ih / np.linalg.norm(ih)
    if longway:
        ih = -ih
    it1 = np.cross(ih, r1 / r1n)
    it2 = np.cross(ih, r2 / r2n)
    v1 = Vr1 * r1 / r1n + Vt1 * it1
    v2 = Vr2 * r2 / r2n + Vt2 * it2
    return v1, v2


def lambert_izzo_multi(r1s, r2s, tofs, mu=1.0, longway=False, nthreads=None):
    """Batch Lambert (reference batch-threaded overloads,
    `LambertSolvers.cpp:21`)."""
    return [lambert_izzo(a, b, t, mu, longway)
            for a, b, t in zip(r1s, r2s, tofs)]


# --------------------------------------------------------- element convs
def true_to_mean_anomaly(ta, e):
    E = 2.0 * np.arctan2(np.sqrt(1 - e) * np.sin(ta / 2),
                         np.sqrt(1 + e) * np.cos(ta / 2))
    return E - e * np.sin(E)


def mean_to_true_anomaly(M, e, tol=1e-13):
    E = M
    for _ in range(30):
        f = E - e * np.sin(E) - M
        if abs(f) < tol:
            break
        E = E - f / (1 - e * np.cos(E))
    return 2.0 * np.arctan2(np.sqrt(1 + e) * np.sin(E / 2),
                            np.sqrt(1 - e) * np.cos(E / 2))


def cartesian_to_classic(rv, mu=1.0):
    """[r, v] -> [a, e, i, RAAN, argp, mean anomaly] (elliptic), matching
    the reference convention (`KeplerUtils.h:20` solves Kepler's equation in
    classic_to_cartesian, so the 6th element is MEAN anomaly)."""
    r = np.asarray(rv[:3], dtype=np.float64)
    v = np.asarray(rv[3:6], dtype=np.float64)
    rn = np.linalg.norm(r)
    h = np.cross(r, v)
    hn = np.linalg.norm(h)
    n = np.cross([0, 0, 1], h)
    nn = np.linalg.norm(n)
    evec = np.cross(v, h) / mu - r / rn
    e = np.linalg.norm(evec)
    energy = v @ v / 2 - mu / rn
    a = -mu / (2 * energy) if abs(energy) > 1e-14 else np.inf
    i = np.arccos(np.clip(h[2] / hn, -1, 1))
    raan = np.arccos(np.clip(n[0] / nn, -1, 1)) if nn > 1e-14 else 0.0
    if n[1] < 0:
        raan = 2 * np.pi - raan
    if nn > 1e-14 and e > 1e-14:
        argp = np.arccos(np.clip(n @ evec / (nn * e), -1, 1))
        if evec[2] < 0:
            argp = 2 * np.pi - argp
    else:
        argp = 0.0
    if e > 1e-14:
        ta = np.arccos(np.clip(evec @ r / (e * rn), -1, 1))
        if r @ v < 0:
            ta = 2 * np.pi - ta
    else:
        ta = np.arccos(np.clip(n @ r / (nn * rn), -1, 1)) if nn > 1e-14 \
            else np.arctan2(r[1], r[0])
    M = true_to_mean_anomaly(ta, e) if e < 1.0 else ta
    return np.array([a, e, i, raan, argp, M])


def classic_to_cartesian(oe, mu=1.0):
    """[a, e, i, RAAN, argp, mean anomaly] -> [r, v] (reference
    `KeplerUtils.h:20`)."""
    a, e, i, raan, argp, M = np.asarray(oe, dtype=np.float64)
    ta = mean_to_true_anomaly(M, e) if e < 1.0 else M
    p = a * (1 - e * e)
    rn = p / (1 + e * np.cos(ta))
    r_pf = rn * np.array([np.cos(ta), np.sin(ta), 0.0])
    v_pf = np.sqrt(mu / p) * np.array([-np.sin(ta), e + np.cos(ta), 0.0])
    cO, sO = np.cos(raan), np.sin(raan)
    co, so = np.cos(argp), np.sin(argp)
    ci, si = np.cos(i), np.sin(i)
    R = np.array([
        [cO * co - sO * so * ci, -cO * so - sO * co * ci, sO * si],
        [sO * co + cO * so * ci, -sO * so + cO * co * ci, -cO * si],
        [so * si, co * si, ci]])
    return np.concatenate([R @ r_pf, R @ v_pf])


def cartesian_to_modified(rv, mu=1.0):
    """[r, v] -> modified equinoctial [p, f, g, h, k, L]."""
    a, e, i, raan, argp, M = cartesian_to_classic(rv, mu)
    ta = mean_to_true_anomaly(M, e) if e < 1.0 else M
    p = a * (1 - e * e)
    f = e * np.cos(argp + raan)
    g = e * np.sin(argp + raan)
    h = np.tan(i / 2) * np.cos(raan)
    k = np.tan(i / 2) * np.sin(raan)
    L = raan + argp + ta
    return np.array([p, f, g, h, k, L])


def modified_to_cartesian(mee, mu=1.0):
    """[p, f, g, h, k, L] -> [r, v]."""
    p, f, g, h, k, L = np.asarray(mee, dtype=np.float64)
    s2 = 1 + h * h + k * k
    a2 = h * h - k * k
    cL, sL = np.cos(L), np.sin(L)
    w = 1 + f * cL + g * sL
    rn = p / w
    r = rn / s2 * np.array([
        cL + a2 * cL + 2 * h * k * sL,
        sL - a2 * sL + 2 * h * k * cL,
        2 * (h * sL - k * cL)])
    sqmu_p = np.sqrt(mu / p)
    v = sqmu_p / s2 * np.array([
        -(sL + a2 * sL - 2 * h * k * cL + g - 2 * f * h * k + a2 * g),
        -(-cL + a2 * cL + 2 * h * k * sL - f + 2 * g * h * k + a2 * f),
        2 * (h * cL + k * sL + f * h + g * k)])
    return np.concatenate([r, v])
