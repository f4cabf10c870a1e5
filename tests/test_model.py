"""Tests for the encoder and the VI fine-tuner forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import ModelConfig, ScanParams
from qbold_vi_tpu.models.encoder import Encoder, normalise_data
from qbold_vi_tpu.models.vi import FineTuner

SCAN = ScanParams(simulate_noise=False)
CFG = ModelConfig(no_units=8, no_intermediate_layers=2, use_mvg=True,
                  channelwise_gating=True, gate_offset=-3.0)


def _images(key, b=2, x=6, y=5, z=2):
    return jax.random.uniform(key, (b, x, y, z, SCAN.n_taus),
                              minval=0.5, maxval=2.0)


class TestNormalise:
    def test_matches_reference_semantics(self):
        data = np.abs(np.random.default_rng(0).normal(
            size=(3, 4, 2, 11)).astype(np.float32)) + 0.5
        out = np.asarray(normalise_data(jnp.asarray(data), se_idx=2,
                                        multi_image=True))
        ref = np.log(np.clip(data, 1e-2, 1e8)
                     / np.mean(data[..., 1:4], -1, keepdims=True))
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=2e-4)

    def test_single_image_norm(self):
        data = jnp.ones((2, 3, 1, 11)) * 4.0
        out = normalise_data(data, se_idx=2, multi_image=False)
        np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


class TestEncoder:
    def test_output_shapes(self):
        enc = Encoder(CFG, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(0)
        img = _images(key)
        params = enc.init(key, img)
        out1, out2, sigma = enc.apply(params, img)
        assert out1.shape == img.shape[:-1] + (5,)
        assert out2.shape == img.shape[:-1] + (5,)
        assert sigma.shape == img.shape[:-1] + (SCAN.n_taus,)
        assert np.all(np.asarray(sigma) > 0)

    def test_diag_head_is_4(self):
        cfg = ModelConfig(no_units=4, use_mvg=False)
        enc = Encoder(cfg, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(0)
        img = _images(key)
        out1, _, _ = enc.apply(enc.init(key, img), img)
        assert out1.shape[-1] == 4

    def test_fold_hoist_bit_exact(self):
        """The hoisted z-fold (Encoder.__call__ runs the trunk in
        [B*Z,X,Y,C]) is bit-identical to the per-conv fold path: every
        op between fold and heads is voxelwise or the folded conv. The
        layer-norm configuration must keep the 5-D path (GroupNorm
        pools over all non-batch axes, so per-(b,z) statistics would
        change the math)."""
        key = jax.random.PRNGKey(3)
        img = _images(key, b=3, x=6, y=5, z=4)
        for use_ln in (False, True):
            cfg = ModelConfig(no_units=6, no_intermediate_layers=2,
                              use_mvg=True, channelwise_gating=True,
                              gate_offset=-3.0, use_layer_norm=use_ln)
            enc = Encoder(cfg, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
            params = enc.init(key, img)
            out = enc.apply(params, img)

            # reference path: per-conv fold, heads on 5-D nets (the
            # pre-hoist Encoder.__call__ body)
            def unfolded(mdl, images):
                features = mdl.embed(images)
                net1 = net2 = features
                for blk in mdl.blocks:
                    net1, net2 = blk(net1, net2, deterministic=True)
                net1 = net1.astype(jnp.float32)
                net2 = net2.astype(jnp.float32)
                return (mdl.final(net1), mdl.final(net2),
                        jnp.exp(mdl.sigma_head(net2)))

            ref = enc.apply(params, img, method=unfolded)
            for a, b, name in zip(out, ref, ("q1", "q2", "sigma")):
                assert np.array_equal(np.asarray(a), np.asarray(b)), (
                    f"{name} differs (use_layer_norm={use_ln})")

    def test_inner_outer_split(self):
        """features path == images path (tau-protocol transfer entry)."""
        enc = Encoder(CFG, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(1)
        img = _images(key)
        params = enc.init(key, img)
        feats = enc.apply(params, img, method=Encoder.embed)
        direct = enc.apply(params, img)
        via_features = enc.apply(params, features=feats)
        for a, b in zip(direct, via_features):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6)

    def test_infer_inv_gamma_channels(self):
        cfg = ModelConfig(no_units=4, use_mvg=False, infer_inv_gamma=True)
        enc = Encoder(cfg, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(2)
        img = _images(key)
        out1, out2, _ = enc.apply(enc.init(key, img), img)
        assert out1.shape[-1] == 8  # 4 params + 4 hyperprior
        assert out2.shape[-1] == 4
        # hyperprior init: exp(log([20, 2.5, 20, 2.5]))
        np.testing.assert_allclose(np.asarray(out1[0, 0, 0, 0, 4:]),
                                   [20.0, 2.5, 20.0, 2.5], rtol=1e-4)

    def test_bfloat16_trunk_close_to_fp32(self):
        """compute_dtype=bfloat16 runs the trunk in bf16 (MXU-fast) but
        heads emit float32 values close to the fp32 reference."""
        import dataclasses

        cfg16 = dataclasses.replace(CFG, compute_dtype="bfloat16")
        enc32 = Encoder(CFG, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        enc16 = Encoder(cfg16, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(4)
        img = _images(key)
        params = enc32.init(key, img)  # same pytree works for both
        o32 = enc32.apply(params, img)
        o16 = enc16.apply(params, img)
        for a, b in zip(o32, o16):
            assert b.dtype == jnp.float32
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=0.05, rtol=0.05)

    def test_compute_dtype_auto_and_validation(self):
        """"auto" (the default) resolves by backend -- float32 on the CPU
        test backend, bfloat16 on tpu/axon -- and unknown values raise."""
        import dataclasses

        from qbold_vi_tpu.models.encoder import _dtype_of

        on_tpu = jax.default_backend() in ("tpu", "axon")
        cfg_auto = dataclasses.replace(CFG, compute_dtype="auto")
        assert _dtype_of(cfg_auto) == (jnp.bfloat16 if on_tpu
                                       else jnp.float32)
        assert _dtype_of(dataclasses.replace(
            CFG, compute_dtype="float32")) == jnp.float32
        import pytest
        with pytest.raises(ValueError, match="compute_dtype"):
            _dtype_of(dataclasses.replace(CFG, compute_dtype="fp16"))

    def test_voxelwise_stream_is_spatially_local(self):
        """Stream-1 output at a voxel must not depend on neighbours
        (pure 1x1x1 path, reference model.py:198-199)."""
        enc = Encoder(CFG, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(3)
        img = np.asarray(_images(key))
        params = enc.init(key, jnp.asarray(img))
        out_a, _, _ = enc.apply(params, jnp.asarray(img))
        img2 = img.copy()
        img2[:, 3:, :, :, :] *= 1.7  # perturb a different spatial region
        out_b, _, _ = enc.apply(params, jnp.asarray(img2))
        np.testing.assert_allclose(np.asarray(out_a[:, :3]),
                                   np.asarray(out_b[:, :3]), rtol=1e-5)


class TestFineTuner:
    def test_apply_shapes_and_finiteness(self):
        tuner = FineTuner(CFG, SCAN)
        key = jax.random.PRNGKey(0)
        img = _images(key) * 100.0
        params = tuner.init(key, img)
        out = tuner.apply(params, key, img, no_samples=3)
        assert out["samples"].shape == (3,) + img.shape[:-1] + (2,)
        assert out["predicted_images"].shape == (3,) + img.shape
        assert out["im_sigma"].shape == img.shape
        for v in out.values():
            assert np.all(np.isfinite(np.asarray(v)))
        # physical samples inside the transform ranges
        s = np.asarray(out["samples"])
        assert s[..., 0].min() >= CFG.min_oef and s[..., 0].max() <= CFG.min_oef + CFG.oef_range
        assert s[..., 1].min() >= CFG.min_dbv and s[..., 1].max() <= CFG.min_dbv + CFG.dbv_range

    def test_dropout_active_only_in_training(self):
        cfg = ModelConfig(no_units=6, use_mvg=True, dropout_rate=0.5)
        tuner = FineTuner(cfg, SCAN)
        key = jax.random.PRNGKey(3)
        img = _images(key) * 100.0
        params = tuner.init(key, img)
        # train=True with different dropout keys -> different q params
        a = tuner.apply(params, jax.random.PRNGKey(1), img, train=True)
        b = tuner.apply(params, jax.random.PRNGKey(2), img, train=True)
        assert not np.allclose(np.asarray(a["predictions"]),
                               np.asarray(b["predictions"]))
        # inference (train=False): deterministic encoder
        c = tuner.apply(params, jax.random.PRNGKey(1), img)
        d = tuner.apply(params, jax.random.PRNGKey(2), img)
        np.testing.assert_allclose(np.asarray(c["predictions"]),
                                   np.asarray(d["predictions"]), rtol=1e-6)

    def test_layer_norm_path(self):
        cfg = ModelConfig(no_units=6, use_mvg=False, use_layer_norm=True)
        enc = Encoder(cfg, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
        key = jax.random.PRNGKey(5)
        img = _images(key)
        params = enc.init(key, img)
        out1, _, _ = enc.apply(params, img)
        assert np.all(np.isfinite(np.asarray(out1)))
        # GroupNorm(1) scale/bias params exist
        flat = jax.tree_util.tree_leaves(params)
        assert any("GroupNorm" in k for k in str(
            jax.tree_util.tree_structure(params)).split("'"))

    def test_mog_population_prior(self):
        cfg = ModelConfig(no_units=4, use_mvg=False,
                          use_population_prior=True, mog_components=3)
        tuner = FineTuner(cfg, SCAN)
        key = jax.random.PRNGKey(6)
        img = _images(key)
        params = tuner.init(key, img)
        assert params["pop_prior"].shape == (12,)  # 4 * mog_components
        _, q, _ = tuner.encode(params, img)
        prior = tuner.prior_params(params, q)
        assert prior.shape == q.shape[:-1] + (12,)

        # the MoG KL path runs and is finite
        from qbold_vi_tpu.train import losses
        mask = jnp.ones(q.shape[:-1] + (1,))
        kl = losses.kl_loss(key, tuner.dist, cfg, prior, q, mask)
        assert np.isfinite(float(kl))

    def test_population_prior_params(self):
        cfg = ModelConfig(no_units=4, use_mvg=True, use_population_prior=True)
        tuner = FineTuner(cfg, SCAN)
        key = jax.random.PRNGKey(1)
        img = _images(key)
        params = tuner.init(key, img)
        np.testing.assert_allclose(np.asarray(params["pop_prior"]),
                                   [-0.97, 0.4, -1.14, 0.6, 0.0])
        _, q, _ = tuner.encode(params, img)
        prior = tuner.prior_params(params, q)
        assert prior.shape == q.shape

    def test_homoscedastic_sigma(self):
        cfg = ModelConfig(no_units=4, use_mvg=False, heteroscedastic_noise=False,
                          im_loss_sigma=0.07)
        tuner = FineTuner(cfg, SCAN)
        key = jax.random.PRNGKey(2)
        img = _images(key)
        params = tuner.init(key, img)
        out = tuner.apply(params, key, img, no_samples=1)
        np.testing.assert_allclose(np.asarray(out["im_sigma"]), 0.07, rtol=1e-5)
