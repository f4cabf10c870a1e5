"""Golden-value tests of the J0/J1 approximations against scipy.

The full tissue model (and hence the 1e-5 posterior-mean parity target,
BASELINE.md) hinges on J0 accuracy over the physiological argument range
|x| = 1.5*tau*dw*u <= ~40 (SURVEY.md "hard parts").
"""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from qbold_vi_tpu.ops.bessel import bessel_j0, bessel_j1


def test_j0_matches_scipy_dense_grid():
    x = np.linspace(0.0, 40.0, 20011, dtype=np.float64)
    ours = np.asarray(jax.jit(bessel_j0)(jnp.asarray(x, jnp.float32)), np.float64)
    ref = sps.j0(x)
    # fp32 evaluation: budget ~2e-6 absolute from round-off + A&S truncation
    assert np.max(np.abs(ours - ref)) < 5e-6


def test_j0_even_symmetry():
    x = np.linspace(-30, 30, 997, dtype=np.float32)
    ours = np.asarray(bessel_j0(jnp.asarray(x)))
    flipped = np.asarray(bessel_j0(jnp.asarray(-x)))
    np.testing.assert_allclose(ours, flipped, rtol=0, atol=0)


def test_j1_matches_scipy_dense_grid():
    x = np.linspace(-40.0, 40.0, 20011, dtype=np.float64)
    ours = np.asarray(bessel_j1(jnp.asarray(x, jnp.float32)), np.float64)
    ref = sps.j1(x)
    assert np.max(np.abs(ours - ref)) < 5e-6


def test_j0_at_zero_and_small_args():
    # J0(0)=1 exactly; derivative of (1-J0) near 0 -> integrand regularity
    assert float(bessel_j0(jnp.float32(0.0))) == 1.0
    x = np.array([1e-8, 1e-6, 1e-4, 1e-2], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(bessel_j0(jnp.asarray(x))),
                               sps.j0(x.astype(np.float64)), atol=1e-6)


def test_j1_is_j0_derivative():
    # custom_jvp: d/dx J0(x) = -J1(x) analytically -- gate against scipy's
    # true derivative, not our own J1 (which would be circular now).
    x = np.linspace(0.1, 35.0, 501, dtype=np.float64)
    dj0 = jax.vmap(jax.grad(lambda v: bessel_j0(v)))(jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(dj0, np.float64), -sps.j1(x),
                               atol=5e-6)


def test_one_minus_j0_value_and_grad():
    from qbold_vi_tpu.ops.bessel import one_minus_j0

    x = np.concatenate([np.logspace(-6, 0, 31), np.linspace(1.01, 35, 200)])
    ours = np.asarray(one_minus_j0(jnp.asarray(x, jnp.float32)), np.float64)
    ref = 1.0 - sps.j0(x)
    # relative accuracy even at tiny x (where direct fp32 subtraction dies)
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=5e-6)

    g = jax.vmap(jax.grad(lambda v: one_minus_j0(v)))(
        jnp.asarray(x, jnp.float32))
    np.testing.assert_allclose(np.asarray(g, np.float64), sps.j1(x),
                               atol=5e-6)
