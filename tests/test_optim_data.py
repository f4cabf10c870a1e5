"""Unit tests for the optimiser schedules/SWA and the data pipelines."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qbold_vi_tpu.config import TrainConfig
from qbold_vi_tpu.train import data as data_pipe
from qbold_vi_tpu.train import optim


class TestSchedules:
    def test_linear_decay_endpoints(self):
        """lr(0) = init; lr(total) = init/100 (the reference's effective
        schedule, train.py:300-302)."""
        sched = optim.linear_decay_schedule(5e-3, 4000)
        np.testing.assert_allclose(float(sched(0)), 5e-3, rtol=1e-6)
        np.testing.assert_allclose(float(sched(2000)), 5e-3 * 0.505, rtol=1e-5)
        np.testing.assert_allclose(float(sched(4000)), 5e-5, rtol=1e-5)

    def test_scheduled_adamw_decay_is_decoupled(self):
        """tfa semantics: update includes -wd(step)*param NOT multiplied
        by the lr (unlike optax.adamw)."""
        lr = lambda s: jnp.asarray(0.0)     # isolate the decay term
        wd = lambda s: jnp.asarray(0.01)
        opt = optim.scheduled_adamw(lr, wd)
        params = {"w": jnp.asarray([2.0, -4.0])}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.asarray([1.0, 1.0])}, state, params)
        np.testing.assert_allclose(np.asarray(updates["w"]),
                                   [-0.02, 0.04], atol=1e-8)

    def test_adamw_matches_adam_when_no_decay(self):
        lr = lambda s: jnp.asarray(1e-3)
        opt_a = optim.scheduled_adamw(lr, None)
        opt_b = optax.chain(optax.scale_by_adam(eps=1e-7),
                            optax.scale_by_schedule(lambda s: -lr(s)))
        p = {"w": jnp.asarray([0.5, -0.5])}
        g = {"w": jnp.asarray([0.1, 0.2])}
        ua, _ = opt_a.update(g, opt_a.init(p), p)
        ub, _ = opt_b.update(g, opt_b.init(p), p)
        np.testing.assert_allclose(np.asarray(ua["w"]), np.asarray(ub["w"]),
                                   rtol=1e-6)


class TestSWA:
    def test_average_window_semantics(self):
        """Snapshots folded every `period` steps from `start`
        (reference: tfa SWA(start_averaging, average_period),
        train.py:385)."""
        params = {"w": jnp.asarray(0.0)}
        state = optim.swa_init(params)
        start, period = 3, 2
        values = []
        for step in range(1, 10):
            params = {"w": jnp.asarray(float(step))}
            state = optim.swa_update(state, params, start, period)
            values.append((int(state.n_avg), float(state.average["w"])))
        # snapshots at steps 3, 5, 7, 9 -> averages 3, 4, 5, 6
        assert values[2] == (1, 3.0)
        assert values[4] == (2, 4.0)
        assert values[6] == (3, 5.0)
        assert values[8] == (4, 6.0)

    def test_no_average_before_start(self):
        params = {"w": jnp.asarray(1.0)}
        state = optim.swa_init(params)
        state = optim.swa_update(state, {"w": jnp.asarray(9.0)}, 10, 2)
        assert int(state.n_avg) == 0
        np.testing.assert_allclose(float(state.average["w"]), 1.0)


class TestRealCropSampler:
    def _make(self, rng, s=3, x=20, y=18, z=4, taus=5, crop=8):
        data = np.abs(rng.normal(size=(s, x, y, z, taus + 1))
                      ).astype(np.float32)
        data[..., -1] = (rng.uniform(size=(s, x, y, z)) > 0.3)
        priors = rng.normal(size=(s, x, y, z, 5)).astype(np.float32)
        return data_pipe.RealCropSampler(
            data, priors, crop, rng=np.random.default_rng(7)), data, priors

    def test_joint_crop_consistency(self, rng):
        """Images, mask, and priors must come from the SAME window
        (reference crops them jointly, train.py:44-60)."""
        sampler, data, priors = self._make(rng)
        batch = sampler.sample(6)
        assert batch["images"].shape == (6, 8, 8, 4, 5)
        assert batch["priors"].shape == (6, 8, 8, 4, 5)
        # reconstruct: find the source window of element 0 by matching
        # priors (unique continuous values) and check images match too
        p0 = batch["priors"][0]
        found = False
        for s in range(data.shape[0]):
            for x0 in range(data.shape[1] - 8 + 1):
                for y0 in range(data.shape[2] - 8 + 1):
                    if np.array_equal(priors[s, x0:x0 + 8, y0:y0 + 8], p0):
                        win = data[s, x0:x0 + 8, y0:y0 + 8]
                        np.testing.assert_array_equal(
                            batch["images"][0], win[..., :-1] * win[..., -1:])
                        np.testing.assert_array_equal(
                            batch["mask"][0], win[..., -1:])
                        found = True
        assert found

    def test_images_masked(self, rng):
        sampler, _, _ = self._make(rng)
        batch = sampler.sample(4)
        outside = batch["images"] * (1.0 - batch["mask"])
        np.testing.assert_allclose(outside, 0.0)

    def test_eval_batches_fixed_and_sequential(self, rng):
        sampler, data, _ = self._make(rng, s=4)
        batches = list(sampler.eval_batches(2))
        assert len(batches) == 2
        a = list(sampler.eval_batches(2))
        np.testing.assert_array_equal(batches[0]["images"], a[0]["images"])

    def test_crop_clamped_to_volume(self, rng):
        sampler, _, _ = self._make(rng, x=6, y=5, crop=25)
        batch = sampler.sample(2)
        assert batch["images"].shape[1:3] == (6, 5)


class TestPredictPriors:
    def test_masks_and_truncates(self, rng):
        data = np.abs(rng.normal(size=(3, 4, 4, 2, 6))).astype(np.float32)
        data[..., -1] = 1.0
        seen = []

        def encode(images):
            seen.append(np.asarray(images))
            q = np.tile(np.arange(7, dtype=np.float32), images.shape[:-1] + (1,))
            return q, None, None

        priors = data_pipe.predict_priors(encode, data, k=5, chunk=2)
        assert priors.shape == (3, 4, 4, 2, 5)
        # the ragged final chunk is zero-PADDED to the compiled shape
        # (one encoder program, no minutes-long ragged recompile through
        # the remote tunnel) and the pad row sliced off the output
        assert [s.shape[0] for s in seen] == [2, 2]
        np.testing.assert_array_equal(seen[1][1], 0.0)   # the pad row
        np.testing.assert_allclose(priors[0, 0, 0, 0], np.arange(5))


def test_blank_crop_guards_small_volumes():
    """The fixed 96x96 margins must not silently empty small volumes
    (that produced NaN losses downstream)."""
    import warnings

    from qbold_vi_tpu.train import data as data_pipe

    big = np.zeros((2, 96, 96, 8, 12), np.float32)
    assert data_pipe.blank_crop(big).shape == (2, 62, 76, 8, 12)
    small = np.zeros((2, 32, 32, 4, 12), np.float32)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = data_pipe.blank_crop(small)
    assert out.shape == small.shape
    assert any("blank_crop" in str(x.message) for x in w)


class TestPretrainDecayMask:
    def test_weight_decay_skips_finetune_only_leaves(self):
        """The reference's phase-1 model contains ONLY encoder weights,
        so its tfa.AdamW never decays pop_prior/log_sigma; an unmasked
        decoupled decay shrank them by (1-wd)^steps with zero gradient
        ever flowing. The pretrain optimiser must leave grad-less
        fine-tune leaves untouched."""
        import jax
        import jax.numpy as jnp
        import optax

        from qbold_vi_tpu.config import TrainConfig
        from qbold_vi_tpu.train.optim import make_pretrain_optimizer

        cfg = TrainConfig(use_swa=True, pt_adamw_decay=0.1, pt_lr=0.0)
        opt = make_pretrain_optimizer(cfg)
        params = {"encoder": {"w": jnp.ones((3,))},
                  "pop_prior": jnp.asarray([-0.97, 0.4, -1.14, 0.6, 0.0]),
                  "log_sigma": jnp.asarray(-2.5)}
        state = opt.init(params)
        pop0 = np.asarray(params["pop_prior"])
        sig0 = np.asarray(params["log_sigma"])
        grads = jax.tree_util.tree_map(jnp.zeros_like, params)
        for _ in range(3):
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)
        # fine-tune-only leaves BIT-untouched by decay...
        np.testing.assert_array_equal(np.asarray(params["pop_prior"]), pop0)
        np.testing.assert_array_equal(np.asarray(params["log_sigma"]), sig0)
        # ...while encoder weights decay
        assert np.all(np.asarray(params["encoder"]["w"]) < 1.0)
