"""Loss-function parity against the EXECUTED reference implementation.

Round 1 gated the physics layer against the executed reference
(tests/test_parity_reference.py) and the losses against scipy oracles.
This module closes the remaining gap: the reference's own loss functions
(model.py) run here as oracles wherever they are executable without a
real tensorflow_probability install --

  * logit_gaussian_mvg_log_prob / logit_gaussian_log_prob (tfp.math
    clip stubbed with tf.clip_by_value: value-identical),
  * synthetic_data_loss (MVG + diagonal paths, incl. the inverse-gamma
    prior via a hand-stubbed tfp.distributions.InverseGamma.log_prob),
  * fine_tune_loss_fn (the Gaussian branch the published student_t_df
    = 200 config takes),
  * smoothness_loss,
  * mvg_kl_samples (RNG streams differ, so gated against OUR
    closed-form KL within MC tolerance -- a bidirectional check).

Nothing is copied from the reference; its tree is imported read-only.
"""

import math
import sys
import types

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qbold_vi_tpu.config import ModelConfig, ScanParams  # noqa: E402
from qbold_vi_tpu.dist.logit_mvn import LogitMVN  # noqa: E402
from qbold_vi_tpu.train import losses  # noqa: E402

REFERENCE_DIR = "/root/reference"
SCAN = ScanParams(simulate_noise=False)
DIST = LogitMVN()


def _stub_tfp_for_losses():
    """tfp stub sufficient to EXECUTE the reference loss paths: the
    clip is value-identical to tf.clip_by_value, and InverseGamma only
    needs log_prob (standard closed form via tf.math.lgamma).

    MUTATES any already-registered stub in place (io.keras_import's
    stub_heavy_tf_extras may have run first in the same session, and the
    reference ``model`` module caches whatever tfp object it imported)."""
    class _InverseGamma:
        def __init__(self, alpha, beta):
            self.a = tf.cast(alpha, tf.float32)
            self.b = tf.cast(beta, tf.float32)

        def log_prob(self, x):
            return (self.a * tf.math.log(self.b) - tf.math.lgamma(self.a)
                    - (self.a + 1.0) * tf.math.log(x) - self.b / x)

    tfp = sys.modules.get("tensorflow_probability")
    if tfp is None:
        tfp = types.ModuleType("tensorflow_probability")
        sys.modules["tensorflow_probability"] = tfp
    if not hasattr(tfp, "layers"):
        tfp.layers = types.SimpleNamespace(VariableLayer=None)
    if not hasattr(tfp, "math"):
        tfp.math = types.SimpleNamespace()
    tfp.math.clip_by_value_preserve_gradient = tf.clip_by_value
    if not hasattr(tfp, "distributions"):
        tfp.distributions = types.SimpleNamespace()
    tfp.distributions.InverseGamma = _InverseGamma
    if "tensorflow_addons" not in sys.modules:
        tfa = types.ModuleType("tensorflow_addons")
        tfa.layers = types.SimpleNamespace(GroupNormalization=None)
        sys.modules["tensorflow_addons"] = tfa


@pytest.fixture(scope="module")
def refmodel():
    _stub_tfp_for_losses()
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import model as ref
    finally:
        sys.path.remove(REFERENCE_DIR)
    return ref


def make_trainer(refmodel, **kw):
    params = {"tau_start": str(SCAN.tau_start),
              "tau_step": str(SCAN.tau_step),
              "tau_end": str(SCAN.tau_end)}
    defaults = dict(system_params=params, no_samples=1, use_mvg=True,
                    student_t_df=200.0, heteroscedastic_noise=True,
                    multi_image_normalisation=False, predict_log_data=False,
                    use_population_prior=False, infer_inv_gamma=False)
    defaults.update(kw)
    return refmodel.EncoderTrainer(**defaults)


def _phys_obs(rng, n):
    oef = rng.uniform(0.06, 0.8, size=n).astype(np.float32)
    dbv = rng.uniform(0.003, 0.19, size=n).astype(np.float32)
    return np.stack([oef, dbv], -1)


class TestLogProbParity:
    def test_mvg_log_prob(self, refmodel, rng):
        tr = make_trainer(refmodel)
        n = 256
        obs = _phys_obs(rng, n)
        params = (rng.normal(size=(n, 5)) * 0.5).astype(np.float32)
        ref = tr.logit_gaussian_mvg_log_prob(
            tf.constant(obs), tf.constant(params.reshape(n, 1, 1, 1, 5)))
        ours = DIST.logit_gaussian_mvg_log_prob(jnp.asarray(obs),
                                                jnp.asarray(params))
        np.testing.assert_allclose(np.asarray(ours),
                                   np.asarray(ref).reshape(-1),
                                   rtol=2e-5, atol=2e-5)

    def test_diag_log_prob(self, refmodel, rng):
        tr = make_trainer(refmodel, use_mvg=False)
        n = 256
        obs = _phys_obs(rng, n)
        params = (rng.normal(size=(n, 4)) * 0.5).astype(np.float32)
        ref = tr.logit_gaussian_log_prob(
            tf.constant(obs), tf.constant(params.reshape(n, 1, 1, 1, 4)))
        ours = DIST.logit_gaussian_log_prob(jnp.asarray(obs),
                                            jnp.asarray(params))
        np.testing.assert_allclose(np.asarray(ours),
                                   np.asarray(ref).reshape(-1),
                                   rtol=2e-5, atol=2e-5)


class TestSyntheticLossParity:
    @pytest.mark.parametrize("use_mvg", [True, False])
    @pytest.mark.parametrize("ig", [(0.0, 0.0), (3.0, 0.5)])
    def test_synthetic_data_loss(self, refmodel, rng, use_mvg, ig):
        tr = make_trainer(refmodel, use_mvg=use_mvg)
        cfg = ModelConfig(use_mvg=use_mvg, student_t_df=200.0,
                          predict_log_data=False)
        n, k = 200, 5 if use_mvg else 4
        obs = _phys_obs(rng, n)
        dwc = np.float32(SCAN.dw_coeff * SCAN.hct)
        y_true = np.concatenate(
            [obs, (dwc * obs[:, :1] * obs[:, 1:2])], -1).astype(np.float32)
        y_pred = (rng.normal(size=(n, 1, 1, 1, k)) * 0.5).astype(np.float32)

        ref = tr.synthetic_data_loss(
            tf.constant(y_true.reshape(n, 1, 1, 1, 3)),
            tf.constant(y_pred), use_r2p_loss=False,
            inv_gamma_alpha=ig[0], inv_gamma_beta=ig[1])
        ours = losses.synthetic_data_loss(
            jax.random.PRNGKey(0), DIST, cfg, SCAN,
            jnp.asarray(y_true), jnp.asarray(y_pred.reshape(n, k)),
            use_r2p_loss=False, inv_gamma_alpha=ig[0], inv_gamma_beta=ig[1])
        np.testing.assert_allclose(float(ours), float(ref),
                                   rtol=3e-5, atol=3e-5)


class TestFineTuneNLLParity:
    @pytest.mark.parametrize("multi_norm", [True, False])
    @pytest.mark.parametrize("log_data", [True, False])
    def test_gaussian_branch(self, refmodel, rng, multi_norm, log_data):
        """The published config's likelihood (student_t_df=200 -> the
        Gaussian branch, reference model.py:557-561), both normalisation
        modes and the log-domain option."""
        tr = make_trainer(refmodel, multi_image_normalisation=multi_norm,
                          predict_log_data=log_data)
        cfg = ModelConfig(use_mvg=True, student_t_df=200.0,
                          multi_image_normalisation=multi_norm,
                          predict_log_data=log_data)
        b, x, y, z, t = 2, 5, 4, 2, SCAN.n_taus
        img = (np.abs(rng.normal(size=(b, x, y, z, t))) * 50 + 100
               ).astype(np.float32)
        mask = (rng.uniform(size=(b, x, y, z, 1)) > 0.3).astype(np.float32)
        pred = (np.abs(rng.normal(size=(b, x, y, z, t))) * 0.4 + 0.4
                ).astype(np.float32)
        sigma = (np.abs(rng.normal(size=(b, x, y, z, t))) * 0.05 + 0.02
                 ).astype(np.float32)

        y_true_ref = np.concatenate([img, mask], -1)
        y_pred_ref = np.concatenate([pred, sigma], -1)
        ref = tr.fine_tune_loss_fn(tf.constant(y_true_ref),
                                   tf.constant(y_pred_ref))
        ours = losses.fine_tune_nll(cfg, SCAN.se_idx, jnp.asarray(img),
                                    jnp.asarray(pred), jnp.asarray(sigma),
                                    jnp.asarray(mask))
        np.testing.assert_allclose(float(ours), float(ref),
                                   rtol=3e-5, atol=3e-5)


class TestSmoothnessParity:
    def test_smoothness(self, refmodel, rng):
        tr = make_trainer(refmodel)
        b, x, y, z = 2, 6, 5, 2
        q = (rng.normal(size=(b, x, y, z, 5)) * 0.5).astype(np.float32)
        mask = (rng.uniform(size=(b, x, y, z, 1)) > 0.3).astype(np.float32)
        # reference takes the mask as the 6th channel of true_params
        true_params = np.concatenate(
            [np.zeros((b, x, y, z, 5), np.float32), mask], -1)
        ref = tr.smoothness_loss(tf.constant(true_params), tf.constant(q))
        ours = losses.smoothness_loss(DIST, jnp.asarray(q),
                                      jnp.asarray(mask))
        np.testing.assert_allclose(float(ours), float(ref),
                                   rtol=2e-5, atol=2e-6)


class TestSampledKLCrossCheck:
    def test_reference_sampled_kl_matches_our_closed_form(self, refmodel,
                                                          rng):
        """RNG streams cannot match across frameworks, so the executed
        reference MC-KL estimator (model.py:592-610) is gated against
        OUR closed-form KL within Monte-Carlo tolerance -- the mirror
        image of the scipy gates on our own estimator."""
        tf.random.set_seed(0)
        tr = make_trainer(refmodel)
        b, x, y, z = 1, 8, 8, 1
        q = (rng.normal(size=(b, x, y, z, 5)) * 0.3).astype(np.float32)
        p = (rng.normal(size=(b, x, y, z, 5)) * 0.3).astype(np.float32)
        mask = np.ones((b, x, y, z, 1), np.float32)
        s = 512
        ref_kl = tr.mvg_kl_samples(
            tf.constant(np.concatenate([p, mask], -1)), tf.constant(q),
            no_samples=s)
        closed = DIST.mvg_kl_closed_form(
            jnp.asarray(q.reshape(-1, 5)), jnp.asarray(p.reshape(-1, 5)))
        ref_flat = np.asarray(ref_kl).reshape(-1)
        closed = np.asarray(closed)
        tol = 8.0 * (np.abs(closed) + 1.0) / math.sqrt(s) + 0.05
        assert np.all(np.abs(ref_flat - closed) < tol)
