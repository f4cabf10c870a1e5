"""Bessel functions J0 / J1 as pure jnp element-wise code.

Neither XLA:TPU nor Pallas exposes a bessel_j0 primitive (the reference
leans on TF's C++ kernel, reference: signals.py:170). The qBOLD forward
model only ever evaluates J0 on |x| = 1.5*tau*delta_omega*u which for the
physiological parameter ranges is |x| <~ 40, so the classic Abramowitz &
Stegun 9.4.1/9.4.3 (J0) and 9.4.4/9.4.6 (J1) rational approximations give
|error| < ~1e-7 -- comfortably inside the 1e-5 parity budget and exact
enough for fp32 where round-off dominates anyway.

These run identically under jit, vmap, grad, and inside Pallas kernels
(pure jnp element-wise ops on the VPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["bessel_j0", "bessel_j1", "one_minus_j0"]

# Abramowitz & Stegun 9.4.1: J0 on |x| <= 3, polynomial in (x/3)^2.
_J0_SMALL = (
    1.0000000,
    -2.2499997,
    1.2656208,
    -0.3163866,
    0.0444479,
    -0.0039444,
    0.0002100,
)
# A&S 9.4.3: J0(x) = x^-1/2 * f0(x) * cos(theta0(x)) for x >= 3, in (3/x).
_J0_F = (
    0.79788456,
    -0.00000077,
    -0.00552740,
    -0.00009512,
    0.00137237,
    -0.00072805,
    0.00014476,
)
_J0_THETA = (
    -0.78539816,
    -0.04166397,
    -0.00003954,
    0.00262573,
    -0.00054125,
    -0.00029333,
    0.00013558,
)
# A&S 9.4.4: J1(x)/x on |x| <= 3, polynomial in (x/3)^2.
_J1_SMALL = (
    0.50000000,
    -0.56249985,
    0.21093573,
    -0.03954289,
    0.00443319,
    -0.00031761,
    0.00001109,
)
# A&S 9.4.6: J1(x) = x^-1/2 * f1(x) * cos(theta1(x)) for x >= 3.
_J1_F = (
    0.79788456,
    0.00000156,
    0.01659667,
    0.00017105,
    -0.00249511,
    0.00113653,
    -0.00020033,
)
_J1_THETA = (
    -2.35619449,
    0.12499612,
    0.00005650,
    -0.00637879,
    0.00074348,
    0.00079824,
    -0.00029166,
)


def _poly(coeffs, t):
    """Horner evaluation of sum_i coeffs[i] * t^i."""
    acc = jnp.full_like(t, coeffs[-1])
    for c in reversed(coeffs[:-1]):
        acc = acc * t + c
    return acc


def bessel_j1(x: jax.Array) -> jax.Array:
    """Bessel function of the first kind, order 1 (odd: J1(-x) = -J1(x)).

    Also the analytic derivative kernel for J0: d/dx J0(x) = -J1(x),
    d/dx [1 - J0(x)] = J1(x).
    """
    ax = jnp.abs(x)
    t_small = jnp.square(jnp.minimum(ax, 3.0) / 3.0)
    small = _poly(_J1_SMALL, t_small) * ax
    z = 3.0 / jnp.maximum(ax, 3.0)
    f = _poly(_J1_F, z)
    theta = ax + _poly(_J1_THETA, z)
    large = f * jnp.cos(theta) * jax.lax.rsqrt(jnp.maximum(ax, 3.0))
    mag = jnp.where(ax <= 3.0, small, large)
    return jnp.sign(x) * mag


@jax.custom_jvp
def bessel_j0(x: jax.Array) -> jax.Array:
    """Bessel function of the first kind, order 0.

    Valid to ~1e-7 absolute error for |x| in [0, ~60]; intended argument
    range here is [0, ~40] (signals.py:170 evaluates J0(1.5*tau*dw*u)).
    Differentiation uses the analytic identity J0' = -J1 (custom_jvp)
    instead of AD through the piecewise polynomials -- cheaper on the
    backward pass of the quadrature and exact at the branch seam.
    """
    ax = jnp.abs(x)
    # Small branch: polynomial in (x/3)^2. Clamp so the unused lane is finite.
    t_small = jnp.square(jnp.minimum(ax, 3.0) / 3.0)
    small = _poly(_J0_SMALL, t_small)
    # Large branch: amplitude * cos(phase) / sqrt(x).
    z = 3.0 / jnp.maximum(ax, 3.0)
    f = _poly(_J0_F, z)
    theta = ax + _poly(_J0_THETA, z)
    large = f * jnp.cos(theta) * jax.lax.rsqrt(jnp.maximum(ax, 3.0))
    return jnp.where(ax <= 3.0, small, large)


@bessel_j0.defjvp
def _bessel_j0_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return bessel_j0(x), -bessel_j1(x) * t


@jax.custom_jvp
def one_minus_j0(x: jax.Array) -> jax.Array:
    """1 - J0(x), computed without cancellation for small |x|.

    The SDR tissue integrand is g(u) * (1 - J0(1.5 tau dw u)) with
    g(u) ~ 1/u^2 near the lower integration limit u=1e-5
    (signals.py:164-171): there 1-J0 ~ x^2/4 ~ 1e-8, far below fp32
    round-off of a direct ``1 - j0(x)`` subtraction (which the fp32
    reference silently truncates to zero). For |x| <= 1 we use the exact
    power series 1-J0(x) = sum_{k>=1} (-1)^{k+1} (x^2/4)^k / (k!)^2,
    which keeps full relative accuracy; elsewhere the subtraction is safe.
    Derivative via the identity (1-J0)' = J1 (custom_jvp).
    """
    ax = jnp.abs(x)
    q = jnp.square(jnp.minimum(ax, 1.0)) * 0.25
    # q - q^2/4 + q^3/36 - q^4/576 + q^5/14400 (trunc err < 3e-10 at q=0.25)
    series = q * (1.0 + q * (-0.25 + q * (1.0 / 36.0 + q * (-1.0 / 576.0 + q / 14400.0))))
    return jnp.where(ax <= 1.0, series, 1.0 - bessel_j0(x))


@one_minus_j0.defjvp
def _one_minus_j0_jvp(primals, tangents):
    (x,), (t,) = primals, tangents
    return one_minus_j0(x), bessel_j1(x) * t
