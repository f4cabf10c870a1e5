"""Gate the Pallas MC summarization kernel against the jnp path.

TPU-only: the Mosaic interpreter takes minutes per tiny call on this
class of CPU host, so these tests run only when a real TPU backend is
present (`python -m pytest tests/test_pallas.py` on a TPU VM; the CPU
suite skips them). The RNG streams differ (TPU PRNG vs threefry), so MC
outputs are compared within Monte-Carlo tolerance, per SURVEY.md's
RNG-parity note.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import ScanParams
from qbold_vi_tpu.dist.logit_mvn import LogitMVN

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="Pallas TPU kernel; Mosaic interpreter is impractically slow on CPU",
)

SCAN = ScanParams(simulate_noise=False)
DIST = LogitMVN()
DWC = SCAN.dw_coeff * SCAN.hct


@pytest.mark.parametrize("mvg", [True, False])
def test_kernel_matches_streamed_jnp_within_mc_error(rng, mvg):
    from qbold_vi_tpu.ops.pallas_summarize import mc_posterior_summaries

    n = 2048
    k = 5 if mvg else 4
    params = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32) * 0.3)
    s = 512
    # antithetic=False: this test gates iid-estimator equivalence with the
    # jnp path (pairing halves the independent count behind the variance
    # estimate and is covered by its own test below)
    means_k, vars_k = mc_posterior_summaries(
        params, jnp.int32(0), no_samples=s, mvg=mvg, dw_coeff=DWC,
        antithetic=False)
    means_j, vars_j = DIST.posterior_means_streamed(
        jax.random.PRNGKey(0), params, mvg, no_samples=s,
        r2p_fn=lambda o, d: DWC * o * d)

    # MC standard error of the mean ~ std/sqrt(S). The max runs over
    # n*3 ~ 6k independent z-scores, whose expected extreme is ~4.2
    # sigma; 8 sigma gives comfortable headroom without masking bugs
    # (a wrong transform shifts means by >> 10 SE).
    std = np.sqrt(np.asarray(vars_j))
    tol = 8.0 * std / np.sqrt(s) + 1e-4
    np.testing.assert_array_less(
        np.abs(np.asarray(means_k) - np.asarray(means_j)), tol)
    np.testing.assert_allclose(np.asarray(vars_k), np.asarray(vars_j),
                               rtol=0.5, atol=1e-5)


def test_kernel_zero_variance_case():
    """With log-std squashed to its floor the sample spread collapses and
    the mean must equal the deterministic forward transform."""
    from qbold_vi_tpu.ops.pallas_summarize import mc_posterior_summaries

    n = 128
    big_neg = -10.0  # tanh(-10)*3-1 ~ -4 -> std ~ e^-4
    params = jnp.asarray(
        np.tile([[0.2, big_neg, -1.0, big_neg, 0.0]], (n, 1)), jnp.float32)
    means, vars_ = mc_posterior_summaries(
        params, jnp.int32(3), no_samples=64, mvg=True, dw_coeff=DWC)
    expect = DIST.forward_transform(jnp.asarray([[0.2, -1.0]]))
    np.testing.assert_allclose(np.asarray(means[:, 0]),
                               float(expect[0, 0]), rtol=5e-2)
    np.testing.assert_allclose(np.asarray(means[:, 1]),
                               float(expect[0, 1]), rtol=5e-2)
    v = np.asarray(vars_)
    assert np.all(v[:, :2] < 1e-3)
    # R2' carries the ~300 1/s dw scale: var ~ (dwc*(dbv*s_oef+oef*s_dbv))^2
    assert np.all(v[:, 2] < 0.05)


def test_antithetic_unbiased_and_lower_variance(rng):
    """Antithetic pairing: same means within MC error, and LOWER spread
    of the mean estimator across repeated runs than iid at equal S."""
    from qbold_vi_tpu.ops.pallas_summarize import mc_posterior_summaries

    n = 512
    params = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.3)
    s = 64

    def means_over_seeds(antithetic, n_rep=8):
        outs = []
        for i in range(n_rep):
            m, _ = mc_posterior_summaries(
                params, jnp.int32(100 + i), no_samples=s, mvg=True,
                dw_coeff=DWC, antithetic=antithetic)
            outs.append(np.asarray(m))
        return np.stack(outs)

    iid = means_over_seeds(False)
    anti = means_over_seeds(True)
    # unbiasedness: grand means agree within MC error
    se = iid.std(0).mean() / np.sqrt(iid.shape[0])
    assert np.abs(iid.mean(0) - anti.mean(0)).mean() < 6 * se
    # variance reduction: estimator spread strictly smaller on average
    assert anti.std(0).mean() < iid.std(0).mean()


def test_mc_kl_kernel_matches_jnp(rng):
    """The fused MC-KL kernel must agree with the jnp sampled KL (value
    semantics: same reduced estimator, different RNG stream -> compare
    within MC tolerance, and both against the closed form)."""
    from qbold_vi_tpu.ops.pallas_summarize import mc_kl_map

    n = 1024
    q = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.4)
    p = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.4)
    s = 512
    kern = np.asarray(mc_kl_map(q, p, jnp.int32(3), no_samples=s, mvg=True))
    jnpv = np.asarray(DIST.mvg_kl_samples(jax.random.PRNGKey(0), q, p,
                                          no_samples=s))
    closed = np.asarray(DIST.mvg_kl_closed_form(q, p))
    # both estimators target the closed form; bound each by MC error
    for est, name in ((kern, "kernel"), (jnpv, "jnp")):
        err = np.abs(est - closed)
        tol = 8.0 * (np.abs(closed) + 1.0) / np.sqrt(s) + 0.05
        assert np.all(err < tol), (name, err.max())
    assert kern.shape == (n,)


def test_padding_handles_non_block_sizes(rng):
    from qbold_vi_tpu.ops.pallas_summarize import mc_posterior_summaries

    params = jnp.asarray(rng.normal(size=(1111, 5)).astype(np.float32) * 0.3)
    means, vars_ = mc_posterior_summaries(
        params, jnp.int32(1), no_samples=16, mvg=True, dw_coeff=DWC)
    assert means.shape == (1111, 3)
    assert vars_.shape == (1111, 3)
    assert np.all(np.isfinite(np.asarray(means)))
