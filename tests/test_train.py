"""End-to-end training smoke tests: steps, sharding, trainer resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,
                                 SynthParams, TrainConfig)
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.parallel import make_mesh, replicate, shard_batch
from qbold_vi_tpu.train import optim, steps
from qbold_vi_tpu.train.trainer import Trainer, WeightStatus

SCAN = ScanParams(simulate_noise=False)


def tiny_cfg(tmpdir, **model_kw):
    return QBoldConfig(
        scan=SCAN,
        synth=SynthParams(sample_size=40),
        model=ModelConfig(no_units=4, no_intermediate_layers=1,
                          student_t_df=200.0, use_mvg=True,
                          predict_log_data=False, **model_kw),
        train=TrainConfig(no_pt_epochs=1, no_ft_epochs=1, pt_batch_size=8,
                          ft_batch_size=2, ft_steps_per_epoch=2,
                          crop_size=6, save_directory=str(tmpdir),
                          swa_start=1, swa_period=1),
    )


def synth_batch(rng, n=8):
    x = np.abs(rng.normal(size=(n, 2, 2, 1, SCAN.n_taus))).astype(np.float32) + 0.5
    oef = rng.uniform(0.1, 0.7, size=(n, 2, 2, 1, 1)).astype(np.float32)
    dbv = rng.uniform(0.005, 0.18, size=(n, 2, 2, 1, 1)).astype(np.float32)
    r2p = np.float32(SCAN.dw_coeff * SCAN.hct) * oef * dbv
    return {"x": x, "y": np.concatenate([oef, dbv, r2p], -1)}


def real_batch(rng, b=2, x=6, y=6, z=2, k=5):
    img = np.abs(rng.normal(size=(b, x, y, z, SCAN.n_taus))).astype(np.float32) * 50 + 100
    mask = (rng.uniform(size=(b, x, y, z, 1)) > 0.2).astype(np.float32)
    priors = rng.normal(size=(b, x, y, z, k)).astype(np.float32) * 0.3
    return {"images": img * mask, "mask": mask, "priors": priors}


class TestSteps:
    def test_pretrain_step_decreases_loss(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_pretrain_optimizer(cfg.train)
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        state = steps.TrainState(params, opt.init(params),
                                 optim.swa_init(params), jnp.zeros([], jnp.int32))
        step = steps.make_pretrain_step(tuner, cfg, opt)
        batch = synth_batch(rng)
        first = None
        for i in range(8):
            state, m = step(state, jax.random.PRNGKey(i + 1), batch)
            if first is None:
                first = float(m["loss"])
        assert float(m["loss"]) < first
        assert int(state.swa.n_avg) > 0

    def test_finetune_step_runs(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_finetune_optimizer(cfg.train)
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        state = steps.TrainState(params, opt.init(params), None,
                                 jnp.zeros([], jnp.int32))
        step = steps.make_finetune_step(tuner, cfg, opt)
        batch = real_batch(rng)
        state, m = step(state, key, batch)
        for v in m.values():
            assert np.isfinite(float(v))

    def test_finetune_eval_runs(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        tuner = FineTuner(cfg.model, cfg.scan)
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        ev = steps.make_finetune_eval(tuner, cfg, stochastic_passes=2,
                                      kl_samples=8)
        out = ev(params, key, real_batch(rng))
        assert set(out) >= {"val_nll", "val_kl", "val_elbo"}
        assert np.isfinite(float(out["val_elbo"]))


class TestSharding:
    def test_finetune_step_on_8_device_mesh(self, tmp_path, rng):
        assert jax.device_count() == 8, "conftest must force 8 cpu devices"
        cfg = tiny_cfg(tmp_path)
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_finetune_optimizer(cfg.train)
        mesh = make_mesh()
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        state = steps.TrainState(params, opt.init(params), None,
                                 jnp.zeros([], jnp.int32))
        state = replicate(mesh, state)
        batch = shard_batch(mesh, real_batch(rng, b=8))
        step = steps.make_finetune_step(tuner, cfg, opt)
        state, m = step(state, key, batch)
        assert np.isfinite(float(m["loss"]))
        # params remain replicated after the update
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        assert leaf.sharding.is_fully_replicated


class TestShardingCompilation:
    def test_gradient_allreduce_in_compiled_hlo(self, tmp_path, rng):
        """Under the mesh, XLA must actually partition the step and insert
        the gradient all-reduce (the psum the scaling-book recipe promises
        -- SURVEY.md SS2.3)."""
        cfg = tiny_cfg(tmp_path)
        tuner = FineTuner(cfg.model, cfg.scan)
        opt = optim.make_finetune_optimizer(cfg.train)
        mesh = make_mesh()
        key = jax.random.PRNGKey(0)
        params = tuner.init(key, jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        state = steps.TrainState(params, opt.init(params), None,
                                 jnp.zeros([], jnp.int32))
        state = replicate(mesh, state)
        batch = shard_batch(mesh, real_batch(rng, b=8))
        step = steps.make_finetune_step(tuner, cfg, opt)
        compiled = step.lower(state, key, batch).compile()
        hlo = compiled.as_text()
        assert "all-reduce" in hlo, "no gradient all-reduce in partitioned HLO"


class TestTrainer:
    def test_two_phase_with_resume(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        assert t.status is WeightStatus.NOT_TRAINED
        t.pretrain()
        assert t.status is WeightStatus.PRE_TRAINED
        assert os.path.isfile(t.pt_path)

        real = np.abs(rng.normal(size=(3, 40, 30, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) + 0.5
        real[..., -1] = 1.0
        t.finetune(real)
        assert t.status is WeightStatus.FULL_TRAINED
        assert os.path.isfile(t.final_path)

        # A fresh Trainer must resume FULL_TRAINED from disk with
        # identical weights (reference: qbold_build_model.py:45-56).
        t2 = Trainer(cfg)
        assert t2.status is WeightStatus.FULL_TRAINED
        a = jax.tree_util.tree_leaves(t.state.params)
        b = jax.tree_util.tree_leaves(t2.state.params)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y))

    def test_wandb_logging_and_nan_tripwire(self, tmp_path, rng):
        """Metrics flow to the wandb run when configured
        (reference: train.py:482-488) and non-finite metrics raise
        (reference: TerminateOnNaN, train.py:375,423)."""
        from qbold_vi_tpu.train.trainer import NaNLossError

        cfg = tiny_cfg(tmp_path)

        class FakeRun:
            def __init__(self):
                self.logged = []

            def log(self, m):
                self.logged.append(m)

        run = FakeRun()
        t = Trainer(cfg, wandb_run=run)
        t.pretrain()
        assert len(run.logged) == cfg.train.no_pt_epochs
        assert "val_loss" in run.logged[0]

        t2 = Trainer(cfg, wandb_run=None)
        with pytest.raises(NaNLossError):
            t2._log("test", 0, {"loss": float("nan")})

    def test_population_stats(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()
        data = np.abs(rng.normal(size=(1, 8, 8, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) + 0.5
        data[..., -1] = 1.0
        out = t.estimate_population_param_distribution(data)
        assert set(out) == {"mean_oef", "log_std_oef", "mean_dbv", "log_std_dbv"}
        for v in out.values():
            assert np.isfinite(v)
