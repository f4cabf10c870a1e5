"""Tests for the VI loss stack against independent oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

from qbold_vi_tpu.config import ModelConfig, ScanParams
from qbold_vi_tpu.dist.logit_mvn import LogitMVN
from qbold_vi_tpu.train import losses

SCAN = ScanParams(simulate_noise=False)
DIST = LogitMVN()


class TestDensities:
    def test_student_t_nll_vs_scipy(self, rng):
        resid = rng.normal(size=(50,)).astype(np.float32)
        sigma = np.abs(rng.normal(size=(50,)).astype(np.float32)) + 0.1
        for df in (2.0, 10.0, 49.0):
            ours = np.asarray(losses.student_t_nll(
                jnp.asarray(resid), jnp.asarray(sigma), df))
            ref = -scipy.stats.t.logpdf(resid, df, loc=0.0, scale=sigma)
            np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_gaussian_nll_vs_scipy(self, rng):
        resid = rng.normal(size=(20,)).astype(np.float32)
        sigma = np.abs(rng.normal(size=(20,)).astype(np.float32)) + 0.1
        ours = np.asarray(losses.gaussian_nll_full(
            jnp.asarray(resid), jnp.asarray(sigma)))
        ref = -scipy.stats.norm.logpdf(resid, scale=sigma)
        np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)

    def test_inv_gamma_vs_scipy(self, rng):
        x = np.abs(rng.normal(size=(20,)).astype(np.float32)) + 0.05
        for a, b in ((1.0, 2.0), (20.0, 2.5)):
            ours = np.asarray(losses.inv_gamma_log_prob(jnp.asarray(x), a, b))
            ref = scipy.stats.invgamma.logpdf(x, a, scale=b)
            np.testing.assert_allclose(ours, ref, rtol=1e-3)


def _raw_params(rng, shape, k):
    return jnp.asarray(rng.normal(size=shape + (k,)).astype(np.float32) * 0.3)


class TestSyntheticLoss:
    def _y_true(self, rng, n):
        oef = rng.uniform(0.1, 0.7, size=(n, 1)).astype(np.float32)
        dbv = rng.uniform(0.005, 0.18, size=(n, 1)).astype(np.float32)
        r2p = np.float32(SCAN.dw_coeff * SCAN.hct) * oef * dbv
        return jnp.asarray(np.concatenate([oef, dbv, r2p], -1))

    @pytest.mark.parametrize("mvg", [True, False])
    def test_finite_and_scalar(self, rng, mvg):
        cfg = ModelConfig(use_mvg=mvg)
        y_true = self._y_true(rng, 32)
        y_pred = _raw_params(rng, (32,), 5 if mvg else 4)
        loss = losses.synthetic_data_loss(
            jax.random.PRNGKey(0), DIST, cfg, SCAN, y_true, y_pred,
            use_r2p_loss=True, inv_gamma_alpha=2.0, inv_gamma_beta=0.5)
        assert loss.shape == ()
        assert np.isfinite(float(loss))

    def test_perfect_prediction_beats_bad(self, rng):
        """NLL at the true (backwards-transformed) mean with small std must
        be lower than at a wrong mean."""
        cfg = ModelConfig(use_mvg=False)
        y_true = self._y_true(rng, 16)
        lg = DIST.backwards_transform(y_true[:, :2], include_logit=True)
        tight = DIST.inv_transform_std(jnp.log(0.05))
        good = jnp.stack([lg[:, 0], jnp.full((16,), tight),
                          lg[:, 1], jnp.full((16,), tight)], -1)
        bad = jnp.stack([lg[:, 0] + 2.0, jnp.full((16,), tight),
                         lg[:, 1] - 2.0, jnp.full((16,), tight)], -1)
        args = dict(use_r2p_loss=False, inv_gamma_alpha=0.0, inv_gamma_beta=0.0)
        l_good = losses.synthetic_data_loss(
            jax.random.PRNGKey(0), DIST, cfg, SCAN, y_true, good, **args)
        l_bad = losses.synthetic_data_loss(
            jax.random.PRNGKey(0), DIST, cfg, SCAN, y_true, bad, **args)
        assert float(l_good) < float(l_bad)


class TestFineTuneNLL:
    def test_zero_residual_minimises(self, rng):
        cfg = ModelConfig(student_t_df=200.0, predict_log_data=False)
        y = jnp.asarray(np.abs(rng.normal(size=(2, 4, 4, 2, 11))) + 1.0,
                        jnp.float32)
        mask = jnp.ones((2, 4, 4, 2, 1))
        sigma = jnp.full_like(y, 0.1)
        nll_same = losses.fine_tune_nll(cfg, SCAN.se_idx, y, y, sigma, mask)
        y2 = y * jnp.asarray(
            1.0 + 0.3 * np.abs(np.sin(np.arange(11))), jnp.float32)
        nll_diff = losses.fine_tune_nll(cfg, SCAN.se_idx, y, y2, sigma, mask)
        assert float(nll_same) < float(nll_diff)

    def test_mask_excludes_voxels(self, rng):
        cfg = ModelConfig(student_t_df=2.0, predict_log_data=True)
        y = jnp.asarray(np.abs(rng.normal(size=(1, 2, 2, 1, 11))) + 1.0,
                        jnp.float32)
        y_pred = y * 1.1
        sigma = jnp.full_like(y, 0.1)
        full = jnp.ones((1, 2, 2, 1, 1))
        nll_full = losses.fine_tune_nll(cfg, SCAN.se_idx, y, y_pred, sigma, full)
        # Garbage in masked-out voxels must not change the masked mean
        y_pred2 = y_pred.at[0, 0, 0].mul(50.0)
        partial = full.at[0, 0, 0, 0, 0].set(0.0)
        a = losses.fine_tune_nll(cfg, SCAN.se_idx, y, y_pred, sigma, partial)
        b = losses.fine_tune_nll(cfg, SCAN.se_idx, y, y_pred2, sigma, partial)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5)
        assert np.isfinite(float(nll_full))


class TestKL:
    def test_diag_path_matches_normal_kl(self, rng):
        cfg = ModelConfig(use_mvg=False, use_population_prior=False)
        q = _raw_params(rng, (3, 2, 2, 1), 4)
        p = _raw_params(rng, (3, 2, 2, 1), 4)
        mask = jnp.ones((3, 2, 2, 1, 1))
        got = losses.kl_loss(jax.random.PRNGKey(0), DIST, cfg, p, q, mask)
        want = jnp.mean(DIST.diag_kl(q, p))
        np.testing.assert_allclose(float(got), float(want), rtol=1e-5)

    def test_mvg_sampled_close_to_closed_form(self, rng):
        cfg = ModelConfig(use_mvg=True)
        q = _raw_params(rng, (64,), 5)
        p = _raw_params(rng, (64,), 5)
        mask = jnp.ones((64, 1))
        got = losses.kl_loss(jax.random.PRNGKey(0), DIST, cfg, p, q, mask,
                             no_samples=4000)
        want = jnp.mean(DIST.mvg_kl_closed_form(q, p))
        np.testing.assert_allclose(float(got), float(want), rtol=0.08)

    def test_population_prior_cost_added(self, rng):
        cfg = ModelConfig(use_mvg=False, use_population_prior=True)
        q = _raw_params(rng, (2, 2, 2, 1), 4)
        p = _raw_params(rng, (2, 2, 2, 1), 4)
        mask = jnp.ones((2, 2, 2, 1, 1))
        with_prior = losses.kl_loss(jax.random.PRNGKey(0), DIST, cfg, p, q, mask)
        cfg2 = ModelConfig(use_mvg=False, use_population_prior=False)
        without = losses.kl_loss(jax.random.PRNGKey(0), DIST, cfg2, p, q, mask)
        assert float(with_prior) != float(without)


class TestSmoothness:
    def test_constant_map_is_zero(self):
        pred = jnp.zeros((1, 4, 4, 2, 5))
        mask = jnp.ones((1, 4, 4, 2, 1))
        assert float(losses.smoothness_loss(DIST, pred, mask)) == 0.0

    def test_penalises_in_plane_variation(self, rng):
        pred = jnp.asarray(rng.normal(size=(1, 4, 4, 2, 5)).astype(np.float32))
        mask = jnp.ones((1, 4, 4, 2, 1))
        assert float(losses.smoothness_loss(DIST, pred, mask)) > 0.0

    def test_mask_boundary_excluded(self, rng):
        pred = jnp.asarray(rng.normal(size=(1, 4, 4, 1, 4)).astype(np.float32))
        # two disconnected single-voxel islands -> no valid neighbour pairs
        mask = np.zeros((1, 4, 4, 1, 1), np.float32)
        mask[0, 0, 0] = 1.0
        mask[0, 2, 2] = 1.0
        out = losses.smoothness_loss(DIST, pred, jnp.asarray(mask))
        np.testing.assert_allclose(float(out), 0.0, atol=1e-7)


class TestSeWindowEdge:
    def test_fine_tune_nll_finite_at_se_idx_zero(self):
        """A tau grid starting at 0 gives se_idx=0; the 3-image
        normalisation window used to slice [-1:2] -> empty -> NaN."""
        import jax.numpy as jnp

        from qbold_vi_tpu.config import ModelConfig
        from qbold_vi_tpu.models.encoder import normalise_data
        from qbold_vi_tpu.train.losses import fine_tune_nll

        cfg = ModelConfig(use_mvg=True, student_t_df=200.0,
                          predict_log_data=False,
                          multi_image_normalisation=True)
        y = jnp.abs(jnp.arange(24, dtype=jnp.float32)).reshape(2, 12) + 100.0
        p = y * 1.01
        mask = jnp.ones((2, 1))
        nll = fine_tune_nll(cfg, 0, y, p, jnp.ones_like(y), mask)
        assert np.isfinite(float(nll))
        norm = normalise_data(y.reshape(1, 1, 1, 2, 12), 0, True)
        assert np.all(np.isfinite(np.asarray(norm)))
