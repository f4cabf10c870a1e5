"""Tests for the TPU-native training fast paths: on-device streaming
synthetic pretraining and whole-epoch scan dispatch."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,
                                 SynthParams, TrainConfig)
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.parallel import make_mesh, replicate, shard_batch
from qbold_vi_tpu.synth import sample_batch_params
from qbold_vi_tpu.train import optim, steps
from qbold_vi_tpu.train.trainer import Trainer, WeightStatus

SCAN = ScanParams(simulate_noise=False)


def tiny_cfg(tmpdir, **train_kw):
    return QBoldConfig(
        scan=SCAN,
        synth=SynthParams(sample_size=40),
        model=ModelConfig(no_units=4, no_intermediate_layers=1,
                          student_t_df=200.0, use_mvg=True,
                          predict_log_data=False),
        train=TrainConfig(no_pt_epochs=1, no_ft_epochs=1, pt_batch_size=2,
                          ft_batch_size=2, ft_steps_per_epoch=3,
                          crop_size=6, save_directory=str(tmpdir),
                          swa_start=1, swa_period=1, **train_kw),
    )


class TestSampleBatchParams:
    def test_ranges_and_mixture(self):
        synth = SynthParams(uniform_prop=0.5)
        oef, dbv = sample_batch_params(jax.random.PRNGKey(0), synth, 4000)
        o, d = np.asarray(oef), np.asarray(dbv)
        assert o.shape == d.shape == (4000,)
        assert o.min() >= synth.oef_start and o.max() <= synth.oef_end
        assert d.min() >= synth.dbv_start and d.max() <= synth.dbv_end
        # uniform component puts mass near the upper OEF range end,
        # which the clipped normal (mean .4 std .2) rarely reaches
        assert (o > 0.7).mean() > 0.03
        # iid (not meshgrid-correlated): near-zero corr
        assert abs(np.corrcoef(o, d)[0, 1]) < 0.05


class TestStreamPretrain:
    def test_stream_step_learns(self, tmp_path):
        cfg = tiny_cfg(tmp_path, pt_lr=2e-3)
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_pretrain_optimizer(cfg.train)
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        state = steps.TrainState(params, opt.init(params),
                                 optim.swa_init(params),
                                 jnp.zeros([], jnp.int32))
        step = steps.make_pretrain_stream_step(tuner, cfg, opt)
        losses = []
        for i in range(40):
            state, m = step(state, jax.random.PRNGKey(i + 1))
            losses.append(float(m["loss"]))
        assert np.all(np.isfinite(losses))
        # fresh iid batches each step -> compare averaged windows
        assert np.mean(losses[-5:]) < np.mean(losses[:5])
        assert int(state.step) == 40

    def test_trainer_streaming_end_to_end(self, tmp_path):
        cfg = tiny_cfg(tmp_path, pt_on_device_synth=True)
        t = Trainer(cfg)
        t.pretrain()
        assert t.status is WeightStatus.PRE_TRAINED


class TestEpochScan:
    def _setup(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_finetune_optimizer(cfg.train)
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        state = steps.TrainState(params, opt.init(params), None,
                                 jnp.zeros([], jnp.int32))
        T, B = 3, 2
        mask = (rng.uniform(size=(T, B, 6, 6, 2, 1)) > 0.2).astype(np.float32)
        batches = {
            "images": (np.abs(rng.normal(size=(T, B, 6, 6, 2, SCAN.n_taus)))
                       .astype(np.float32) * 50 + 100) * mask,
            "mask": mask,
            "priors": rng.normal(size=(T, B, 6, 6, 2, 5)).astype(np.float32) * 0.3,
        }
        return cfg, tuner, opt, state, batches, key

    def test_epoch_equals_t_steps(self, tmp_path, rng):
        cfg, tuner, opt, state, batches, key = self._setup(tmp_path, rng)
        epoch_fn = steps.make_finetune_epoch(tuner, cfg, opt)
        state2, m = epoch_fn(state, key, batches)
        assert m["loss"].shape == (3,)
        assert np.all(np.isfinite(np.asarray(m["loss"])))
        assert int(state2.step) == 3

        # exact equivalence with the per-step path under the same keys
        cfg2, tuner2, opt2, state_b, _, _ = self._setup(tmp_path, rng)
        step_fn = steps.make_finetune_step(tuner2, cfg2, opt2)
        keys = jax.random.split(key, 3)
        losses = []
        for i in range(3):
            batch = {k: v[i] for k, v in batches.items()}
            state_b, mb = step_fn(state_b, keys[i], batch)
            losses.append(float(mb["loss"]))
        np.testing.assert_allclose(np.asarray(m["loss"]), losses, rtol=2e-4)
        for a, b in zip(jax.tree_util.tree_leaves(state2.params),
                        jax.tree_util.tree_leaves(state_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=2e-5)

    def test_on_device_crop_epoch(self, tmp_path, rng):
        """Device-resident volumes + dynamic_slice crops: runs, finite,
        crops respect mask/image coupling."""
        cfg, tuner, opt, state, _, key = self._setup(tmp_path, rng)
        epoch_fn = steps.make_finetune_epoch_on_device(
            tuner, cfg, opt, n_steps=3)
        s, x, y, z = 3, 12, 10, 2
        vols = np.abs(rng.normal(size=(s, x, y, z, SCAN.n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = (rng.uniform(size=(s, x, y, z)) > 0.2)
        priors = rng.normal(size=(s, x, y, z, 5)).astype(np.float32) * 0.3
        state, m = epoch_fn(state, key, jnp.asarray(vols),
                            jnp.asarray(priors))
        assert m["loss"].shape == (3,)
        assert np.all(np.isfinite(np.asarray(m["loss"])))
        assert int(state.step) == 3

    def test_epoch_scan_on_mesh(self, tmp_path, rng):
        assert jax.device_count() == 8
        cfg, tuner, opt, state, batches, key = self._setup(tmp_path, rng)
        # batch dim 2 is not divisible by 8; rebuild with B=8
        T, B = 2, 8
        mask = (rng.uniform(size=(T, B, 6, 6, 2, 1)) > 0.2).astype(np.float32)
        batches = {
            "images": (np.abs(rng.normal(size=(T, B, 6, 6, 2, SCAN.n_taus)))
                       .astype(np.float32) * 50 + 100) * mask,
            "mask": mask,
            "priors": rng.normal(size=(T, B, 6, 6, 2, 5)).astype(np.float32) * 0.3,
        }
        mesh = make_mesh()
        state = replicate(mesh, state)
        sharded = shard_batch(mesh, batches, time_axis=True)
        epoch_fn = steps.make_finetune_epoch(tuner, cfg, opt)
        state, m = epoch_fn(state, key, sharded)
        assert np.all(np.isfinite(np.asarray(m["loss"])))


class TestStreamEpochScan:
    """The scanned whole-epoch streaming pretrain (ONE dispatch/epoch)
    must compute exactly a sequence of stream steps with the epoch key
    split into per-step keys -- single-device and 8-device mesh."""

    def _setup(self, tmp_path):
        import dataclasses
        cfg = tiny_cfg(tmp_path, pt_lr=2e-3)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, pt_batch_size=8))
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_pretrain_optimizer(cfg.train)
        params = tuner.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        return cfg, tuner, opt, params

    def _fresh(self, opt, params):
        p = jax.tree_util.tree_map(jnp.copy, params)
        return steps.TrainState(p, opt.init(p), optim.swa_init(p),
                                jnp.zeros([], jnp.int32))

    def test_matches_sequential_steps(self, tmp_path):
        cfg, tuner, opt, params = self._setup(tmp_path)
        n_steps = 4
        key = jax.random.PRNGKey(7)

        epoch = steps.make_pretrain_stream_epoch(tuner, cfg, opt, n_steps)
        st_e, m = epoch(self._fresh(opt, params), key)
        assert m["loss"].shape == (n_steps,)

        st_s = self._fresh(opt, params)
        seq_losses = []
        sim = jax.jit(lambda s, k: steps._stream_step_body(
            s, k, tuner, cfg, opt, cfg.train.pt_batch_size, (10, 10, 5)))
        for k in jax.random.split(key, n_steps):
            st_s, ms = sim(st_s, k)
            seq_losses.append(float(ms["loss"]))
        np.testing.assert_allclose(np.asarray(m["loss"]), seq_losses,
                                   rtol=2e-5, atol=1e-5)
        for a, b in zip(jax.tree_util.tree_leaves(st_e.params),
                        jax.tree_util.tree_leaves(st_s.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)
        # SWA state advanced identically
        assert int(st_e.swa.n_avg) == int(st_s.swa.n_avg)

    def test_mesh_epoch_runs_and_stays_replicated(self, tmp_path):
        cfg, tuner, opt, params = self._setup(tmp_path)
        mesh = make_mesh()
        epoch = steps.make_pretrain_stream_epoch(tuner, cfg, opt, 3,
                                                 mesh=mesh)
        st = replicate(mesh, self._fresh(opt, params))
        hlo = epoch.lower(st, jax.random.PRNGKey(0)).compile().as_text()
        assert "all-reduce" in hlo
        st, m = epoch(st, jax.random.PRNGKey(0))
        assert m["loss"].shape == (3,)
        assert np.all(np.isfinite(np.asarray(m["loss"])))
        assert jax.tree_util.tree_leaves(
            st.params)[0].sharding.is_fully_replicated
