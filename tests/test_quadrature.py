"""Gate the deterministic quadrature posterior summaries.

Four-way gating (SURVEY.md §4's strategy applied to the new estimator):
the jnp quadrature path against an fp64 dense-integration oracle, the
quadrature against the reference's MC estimator within MC error, the
Pallas kernel against the jnp path exactly (both PRNG-free; interpreter
on CPU, real Mosaic compile via the tpu_only test), and the
posterior_maps integration (method="quadrature" vs "mc").
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import special

from qbold_vi_tpu.config import ScanParams
from qbold_vi_tpu.dist.logit_mvn import LogitMVN
from qbold_vi_tpu.ops.quadrature import (posterior_summaries_quadrature,
                                         quad_posterior_summaries)

SCAN = ScanParams(simulate_noise=False)
DIST = LogitMVN()
DWC = float(SCAN.dw_coeff * SCAN.hct)

interpreter_mode = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="Mosaic interpreter mode unavailable on remote TPU backends")
tpu_only = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real Mosaic compile")


def _oracle(p, dw_coeff=DWC):
    """fp64 dense-trapezoid oracle of the posterior summaries for one
    raw (5,) param vector. Exploits the conditional structure: the z1
    integral is done per z0-gridpoint, all in float64."""
    sig = special.expit
    mu0, ls0 = p[0], np.tanh(p[1]) * 3 - 1
    mu1, ls1 = p[2], np.tanh(p[3]) * 3 - 1
    od = np.tanh(p[4]) * math.exp(-2.0)
    s0, s1 = np.exp(ls0), np.exp(ls1)
    z = np.linspace(-12.0, 12.0, 4001)
    w = np.exp(-0.5 * z * z)
    w /= w.sum()
    f = sig(mu0 + s0 * z)                       # (Z,)
    g = sig(mu1 + od * z[:, None] + s1 * z[None, :])   # (Z0, Z1)
    G1 = g @ w
    G2 = (g * g) @ w
    E = lambda a: float((w * a).sum())
    oef = 0.04 + 0.8 * f
    # conditional dbv moments per z0 gridpoint
    d1 = 0.001 + 0.2 * G1
    d2 = 0.001 ** 2 + 2 * 0.001 * 0.2 * G1 + 0.2 ** 2 * G2
    mo, mo2 = E(oef), E(oef * oef)
    md, md2 = E(d1), E(d2)
    mr = dw_coeff * E(oef * d1)
    mr2 = dw_coeff ** 2 * E(oef * oef * d2)
    means = np.array([mo, md, mr])
    variances = np.array([mo2 - mo * mo, md2 - md * md, mr2 - mr * mr])
    return means, variances


def test_matches_fp64_oracle_moderate(rng):
    """Trained-posterior regime (log-stds below the split threshold):
    quadrature is accurate to ~float32 resolution -- 4-5 orders beyond
    the 200-sample MC estimator's ~3.5e-2 standard error."""
    raw = rng.normal(size=(24, 5)).astype(np.float32) * 0.4
    m, v = jax.jit(lambda p: posterior_summaries_quadrature(
        p, mvg=True, dw_coeff=DWC))(jnp.asarray(raw))
    for i in range(raw.shape[0]):
        om, ov = _oracle(raw[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(m)[i], om, rtol=2e-5,
                                   atol=2e-6)
        np.testing.assert_allclose(np.asarray(v)[i], ov, rtol=2e-4,
                                   atol=2e-6)


def test_matches_fp64_oracle_saturated(rng):
    """Full squashed envelope incl. saturated log-stds (std up to e^2).
    OEF/DBV stay oracle-exact via the step+Laguerre split branch; the
    R2' cross moments (third-order od-Taylor covariance expansion,
    worst case 3.2e-6 at dwc=1 over the full envelope) keep a generous
    range-scaled gate -- orders below the MC-200 estimator's own
    standard error at the same voxels.

    The OEF/DBV gate is a few fp32 ulps wider on the real chip: the
    TPU's exp/tanh/erf implementations differ from the host libm by
    ~2 ulp, which the saturated step+Laguerre branch amplifies to
    ~1.3e-5 absolute (vs <=5e-6 with host transcendentals) -- still
    ~3.5 orders below MC-200's standard error."""
    atol = 2e-5 if jax.default_backend() in ("tpu", "axon") else 5e-6
    raw = np.stack(np.meshgrid(
        np.float32([-4.0, -0.5, 3.0]), np.float32([-3.0, 0.5, 3.0]),
        np.float32([-2.0, 4.0]), np.float32([-3.0, 3.0]),
        np.float32([-2.0, 2.0]), indexing="ij"), -1).reshape(-1, 5)
    m, v = jax.jit(lambda p: posterior_summaries_quadrature(
        p, mvg=True, dw_coeff=DWC))(jnp.asarray(raw))
    for i in range(raw.shape[0]):
        om, ov = _oracle(raw[i].astype(np.float64))
        np.testing.assert_allclose(np.asarray(m)[i][:2], om[:2], atol=atol)
        np.testing.assert_allclose(np.asarray(v)[i][:2], ov[:2], atol=atol)
        # r2p: grid-corner tolerance, scaled to the r2p range
        r_scale = DWC * 0.84 * 0.201
        assert abs(np.asarray(m)[i][2] - om[2]) < 2e-3 * r_scale + 1e-5
        assert abs(np.asarray(v)[i][2] - ov[2]) < 2e-3 * r_scale ** 2 + 1e-5


@pytest.mark.parametrize("mvg", [True, False])
def test_matches_mc_within_mc_error(rng, mvg):
    """The quadrature summaries are the exact expectations the MC
    estimator converges to: a 4096-sample MC run must agree within its
    own standard error."""
    k = 5 if mvg else 4
    params = jnp.asarray(rng.normal(size=(512, k)).astype(np.float32) * 0.5)
    s = 4096
    m_q, v_q = posterior_summaries_quadrature(params, mvg=mvg, dw_coeff=DWC)
    m_mc, v_mc = DIST.posterior_means_streamed(
        jax.random.PRNGKey(1), params, mvg, no_samples=s,
        r2p_fn=lambda o, d: DWC * o * d)
    std = np.sqrt(np.asarray(v_q))
    tol = 8.0 * std / np.sqrt(s) + 1e-4
    np.testing.assert_array_less(
        np.abs(np.asarray(m_q) - np.asarray(m_mc)), tol)
    np.testing.assert_allclose(np.asarray(v_q), np.asarray(v_mc),
                               rtol=0.4, atol=1e-5)


def test_diag_factorizes(rng):
    """mvg=False: OEF and DBV are independent, so E[r2p] must equal
    dwc * E[oef] * E[dbv] (every od-Taylor term vanishes at od = 0)."""
    params = jnp.asarray(rng.normal(size=(256, 4)).astype(np.float32) * 0.5)
    m, _ = posterior_summaries_quadrature(params, mvg=False, dw_coeff=DWC)
    m = np.asarray(m)
    np.testing.assert_allclose(m[:, 2], DWC * m[:, 0] * m[:, 1],
                               rtol=1e-4, atol=1e-6)


def test_deterministic():
    params = jnp.asarray(np.linspace(-2, 2, 5 * 64,
                                     dtype=np.float32).reshape(64, 5))
    a = posterior_summaries_quadrature(params, mvg=True, dw_coeff=DWC)
    b = posterior_summaries_quadrature(params, mvg=True, dw_coeff=DWC)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@interpreter_mode
@pytest.mark.parametrize("mvg", [True, False])
def test_pallas_matches_jnp_interpret(rng, mvg):
    """The kernel is PRNG-free: interpreter-mode output must match the
    jnp path to float32 tolerance (same math, same node order)."""
    k = 5 if mvg else 4
    params = jnp.asarray(rng.normal(size=(64, k)).astype(np.float32) * 1.5)
    m_j, v_j = posterior_summaries_quadrature(params, mvg=mvg, dw_coeff=DWC)
    m_p, v_p = quad_posterior_summaries(params, mvg=mvg, dw_coeff=DWC,
                                        interpret=True, lanes=8)
    # same math, different accumulation order (fori_loop vs unrolled):
    # float32 reassociation jitter only, far inside MC noise (the
    # variance atol absorbs the E[x^2]-E[x]^2 cancellation on near-zero
    # variances under reordered sums)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_j),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_j),
                               rtol=2e-3, atol=2e-4)


@tpu_only
def test_pallas_matches_jnp_on_chip(rng):
    """Chip-exactness: the real Mosaic compile of the quadrature kernel
    against the jnp path (both deterministic -- a strict gate, closing
    the interpreter-vs-chip gap for this kernel)."""
    params = jnp.asarray(rng.normal(size=(9000, 5)).astype(np.float32) * 1.5)
    m_j, v_j = jax.jit(lambda p: posterior_summaries_quadrature(
        p, mvg=True, dw_coeff=DWC))(params)
    m_p, v_p = quad_posterior_summaries(params, mvg=True, dw_coeff=DWC)
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_j),
                               rtol=1e-4, atol=1e-5)
    # Variances subtract E[x^2] - E[x]^2 in fp32; Mosaic's fused
    # multiply ordering differs from XLA's, so the cancellation leaves
    # few-ulp-of-E[x^2] absolute noise: R2' second moments reach ~3e2,
    # where 8 ulps ~ 2.5e-4 (measured max across runs).
    np.testing.assert_allclose(np.asarray(v_p), np.asarray(v_j),
                               rtol=2e-3, atol=5e-4)


def test_posterior_maps_method_integration(rng):
    """posterior_maps(method=...) end to end on a tiny model: both
    estimators produce finite maps of the right shapes, and the
    quadrature maps agree with the MC maps within MC error."""
    import dataclasses

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.infer import posterior_maps
    from qbold_vi_tpu.models.vi import FineTuner

    cfg = dataclasses.replace(
        OPTIMAL.model, no_units=8, no_intermediate_layers=1)
    tuner = FineTuner(cfg, SCAN)
    data = np.abs(rng.normal(size=(2, 8, 8, 4, SCAN.n_taus + 1))
                  ).astype(np.float32) * 50 + 100
    data[..., -1] = (rng.uniform(size=data.shape[:-1]) > 0.3)
    params = tuner.init(jax.random.PRNGKey(0),
                        jnp.asarray(data[:1, ..., :-1]))
    key = jax.random.PRNGKey(3)
    maps_q = posterior_maps(tuner, params, data, key, use_pallas=False,
                            method="quadrature")
    maps_mc = posterior_maps(tuner, params, data, key, use_pallas=False,
                             method="mc", no_samples=2000)
    for name in ("oef", "dbv", "r2p"):
        assert maps_q[name].shape == data.shape[:-1] + (1,)
        assert np.isfinite(maps_q[name]).all()
    se = np.sqrt(maps_q["stds"]) / np.sqrt(2000)
    for c, name in enumerate(("oef", "dbv", "r2p")):
        np.testing.assert_array_less(
            np.abs(maps_q[name][..., 0] - maps_mc[name][..., 0]),
            8.0 * se[..., c] + 1e-4)
