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

    def test_finetune_logs_per_term_metrics(self, tmp_path, rng):
        """Every fine-tune epoch must surface the per-term training
        curves (nll / kl / smoothness / sigma) the reference's Keras
        ``fit`` + WandbCallback logs per compiled loss term
        (reference: train.py:313-320,370-375) -- round 3 computed them
        in the epoch scan and then discarded them."""
        cfg = tiny_cfg(tmp_path)
        logged = []
        t = Trainer(cfg, logger=lambda p, s, m: logged.append((p, m)))
        t.pretrain()
        real = np.abs(rng.normal(size=(3, 40, 30, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) + 0.5
        real[..., -1] = 1.0
        t.finetune(real)
        ft = [m for p, m in logged if p == "finetune"]
        assert ft, "no finetune epochs logged"
        for k in ("loss", "nll", "kl", "smoothness", "sigma"):
            assert k in ft[-1], f"missing per-term metric {k}"
            assert np.isfinite(ft[-1][k]), (k, ft[-1])
        # the terms actually sum to the (weighted) total
        m = ft[-1]
        total = (m["nll"] + m["kl"] * cfg.train.kl_weight
                 + m["smoothness"] * cfg.train.smoothness_weight)
        np.testing.assert_allclose(total, m["loss"], rtol=1e-4)

    def test_inv_gamma_hyperprior_metrics_logged(self, tmp_path, rng):
        """With the learned inverse-gamma hyperprior on, pretrain logs
        the four learned alpha/beta values each epoch (reference:
        train.py:395-413 reads them off the broadcast channels as
        oef/dbv alpha+beta metrics)."""
        cfg = tiny_cfg(tmp_path, infer_inv_gamma=True)
        logged = []
        t = Trainer(cfg, logger=lambda p, s, m: logged.append((p, m)))
        t.pretrain()
        pt = [m for p, m in logged if p == "pretrain"]
        assert pt, "no pretrain epochs logged"
        for k, init in (("oef_alpha", 20.0), ("oef_beta", 2.5),
                        ("dbv_alpha", 20.0), ("dbv_beta", 2.5)):
            v = pt[-1][k]
            assert np.isfinite(v) and v > 0
            # one tiny epoch: the learned value stays near its init
            assert abs(v - init) < 0.5 * init

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


class TestShardedEpochParity:
    """The shard_map fine-tune epoch must compute EXACTLY the algorithm it
    claims: per-device key folds -> local crop batches (live counts
    summing to the exact configured global batch) -> mask-share-scaled
    losses -> psum'd grads -> identical replicated update. Gated against
    a single-device simulation of that algorithm (VERDICT r1 #1 / r2 #3
    'done' criteria)."""

    def _setup(self, tmp_path, rng, n_steps=3):
        cfg = tiny_cfg(tmp_path)
        import dataclasses
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, ft_batch_size=8,
                                           ft_steps_per_epoch=n_steps,
                                           crop_size=6))
        tuner = FineTuner(cfg.model, cfg.scan)
        vols = np.abs(rng.normal(size=(3, 12, 12, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = (rng.uniform(size=vols.shape[:-1]) > 0.1)
        priors = rng.normal(size=(3, 12, 12, 2, 5)).astype(np.float32) * 0.3
        params = tuner.init(jax.random.PRNGKey(7),
                            jnp.zeros((1, 6, 6, 2, SCAN.n_taus)))
        opt = optim.make_finetune_optimizer(cfg.train)
        return cfg, tuner, vols, priors, params, opt

    def test_sharded_epoch_matches_single_device_simulation(
            self, tmp_path, rng):
        from qbold_vi_tpu.parallel.mesh import DATA_AXIS

        n_steps = 3
        cfg, tuner, vols, priors, params, opt = self._setup(
            tmp_path, rng, n_steps)
        mesh = make_mesh()
        n_dev = mesh.devices.size
        b_local = cfg.train.ft_batch_size // n_dev  # 8/8 = 1
        key = jax.random.PRNGKey(3)

        # --- sharded run -------------------------------------------------
        # NB copy params into the donated state: device_put-to-replicated
        # may alias the source device-0 buffer, and donation would delete
        # the original needed by the simulation below.
        epoch = steps.make_finetune_epoch_sharded(tuner, cfg, opt, n_steps,
                                                  mesh)
        p_copy = jax.tree_util.tree_map(jnp.copy, params)
        st = replicate(mesh, steps.TrainState(
            p_copy, opt.init(p_copy), None, jnp.zeros([], jnp.int32)))
        st, m_sh = epoch(st, key, replicate(mesh, jnp.asarray(vols)),
                         replicate(mesh, jnp.asarray(priors)))

        # --- single-device simulation of the same algorithm --------------
        from qbold_vi_tpu.train.steps import (_finetune_terms,
                                              sample_crop_batch)

        dev_keys = [
            jax.random.split(jax.random.fold_in(key, d), n_steps)
            for d in range(n_dev)
        ]

        @jax.jit
        def sim_epoch(state, volumes, priors_):
            def body(state, ks):
                # ks: (n_dev, 2) keys, one per simulated device. The
                # exact-global-batch algorithm: each device's loss is its
                # plain masked mean scaled by its mask share m_d / m_tot,
                # and psum(grads) sums the per-device contributions.
                def dev_batch(k):
                    k_crop, k_step = jax.random.split(k)
                    batch = sample_crop_batch(k_crop, volumes, priors_,
                                              b_local, cfg.train.crop_size)
                    return batch, k_step

                def one_dev(k, m_tot):
                    batch, k_step = dev_batch(k)
                    m_d = jnp.sum(batch["mask"])

                    def loss_fn(p):
                        total, _ = _finetune_terms(p, k_step, batch, tuner,
                                                   cfg)
                        return total * (m_d / m_tot)

                    return jax.value_and_grad(loss_fn)(state.params)

                m_tot = jnp.sum(jax.vmap(
                    lambda k: jnp.sum(dev_batch(k)[0]["mask"]))(ks))
                losses, grads = jax.vmap(one_dev, (0, None))(ks, m_tot)
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.sum(g, axis=0), grads)
                updates, opt_state = opt.update(grads, state.opt_state,
                                                state.params)
                new_params = jax.tree_util.tree_map(
                    lambda p, u: p + u, state.params, updates)
                return (steps.TrainState(new_params, opt_state, state.swa,
                                         state.step + 1),
                        jnp.sum(losses))

            keys = jnp.stack([jnp.stack(k) for k in dev_keys], 1)  # (T, D, key)
            return jax.lax.scan(body, state, keys)

        sim_state = steps.TrainState(params, opt.init(params), None,
                                     jnp.zeros([], jnp.int32))
        sim_state, sim_losses = sim_epoch(sim_state, jnp.asarray(vols),
                                          jnp.asarray(priors))

        np.testing.assert_allclose(np.asarray(m_sh["loss"]),
                                   np.asarray(sim_losses), rtol=2e-5,
                                   atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(st.params),
                        jax.tree_util.tree_leaves(sim_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)

    @pytest.mark.parametrize("b_global", [11, 3])
    def test_sharded_epoch_uneven_batch_exact(self, tmp_path, rng, b_global):
        """A global batch that does NOT divide the mesh (11 on 8 devices)
        is preserved exactly: per-device live counts [2,2,2,1,1,1,1,1]
        sum to 11, dead slots carry zero mask, and the updated params
        equal a single-device simulation of the same 11-crop global
        masked mean (the round-2 verdict's divisibility fix).

        b_global=3 < n_devices leaves five devices with ZERO live crops
        -- the regression case for the 0/0 masked means a dead device
        used to hit (losses._safe_mask_sum): the epoch must stay finite
        AND exactly equal to the simulation, not psum NaN into every
        device's gradients."""
        import dataclasses

        from qbold_vi_tpu.train.steps import (_device_crop_counts,
                                              _finetune_terms,
                                              sample_crop_batch)

        n_steps = 2
        cfg, tuner, vols, priors, params, opt = self._setup(
            tmp_path, rng, n_steps)
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           ft_batch_size=b_global))
        mesh = make_mesh()
        n_dev = mesh.devices.size
        b_local, (c_base, c_rem) = _device_crop_counts(b_global, n_dev)
        assert b_local * n_dev >= b_global > (b_local - 1) * n_dev
        counts = [c_base + (d < c_rem) for d in range(n_dev)]
        assert sum(counts) == b_global
        if b_global < n_dev:
            assert 0 in counts          # the zero-live-device case is real
        key = jax.random.PRNGKey(5)

        epoch = steps.make_finetune_epoch_sharded(tuner, cfg, opt, n_steps,
                                                  mesh)
        p_copy = jax.tree_util.tree_map(jnp.copy, params)
        st = replicate(mesh, steps.TrainState(
            p_copy, opt.init(p_copy), None, jnp.zeros([], jnp.int32)))
        st, m_sh = epoch(st, key, replicate(mesh, jnp.asarray(vols)),
                         replicate(mesh, jnp.asarray(priors)))

        dev_keys = jnp.stack([
            jnp.stack(jax.random.split(jax.random.fold_in(key, d), n_steps))
            for d in range(n_dev)
        ], 1)                                            # (T, D, key)
        live = jnp.asarray([[i < c for i in range(b_local)]
                            for c in counts], jnp.float32)  # (D, b_local)

        @jax.jit
        def sim_epoch(state, volumes, priors_):
            def body(state, ks):
                def dev_batch(k, lv):
                    k_crop, k_step = jax.random.split(k)
                    batch = sample_crop_batch(k_crop, volumes, priors_,
                                              b_local, cfg.train.crop_size)
                    batch = dict(batch, mask=batch["mask"]
                                 * lv[:, None, None, None, None])
                    return batch, k_step

                def one_dev(k, lv, m_tot):
                    batch, k_step = dev_batch(k, lv)
                    m_d = jnp.sum(batch["mask"])

                    def loss_fn(p):
                        total, _ = _finetune_terms(p, k_step, batch, tuner,
                                                   cfg)
                        return total * (m_d / m_tot)

                    return jax.value_and_grad(loss_fn)(state.params)

                m_tot = jnp.sum(jax.vmap(
                    lambda k, lv: jnp.sum(dev_batch(k, lv)[0]["mask"]))(
                        ks, live))
                losses, grads = jax.vmap(one_dev, (0, 0, None))(
                    ks, live, m_tot)
                grads = jax.tree_util.tree_map(
                    lambda g: jnp.sum(g, axis=0), grads)
                updates, opt_state = opt.update(grads, state.opt_state,
                                                state.params)
                return (steps.TrainState(
                    jax.tree_util.tree_map(lambda p, u: p + u,
                                           state.params, updates),
                    opt_state, state.swa, state.step + 1),
                    jnp.sum(losses))

            return jax.lax.scan(body, state, dev_keys)

        sim_state, sim_losses = sim_epoch(
            steps.TrainState(params, opt.init(params), None,
                             jnp.zeros([], jnp.int32)),
            jnp.asarray(vols), jnp.asarray(priors))

        # assert_allclose treats NaN == NaN as equal: finiteness must be
        # checked explicitly or a NaN-poisoned epoch would "match" a
        # NaN-poisoned simulation
        assert np.all(np.isfinite(np.asarray(m_sh["loss"])))
        for a in jax.tree_util.tree_leaves(st.params):
            assert np.all(np.isfinite(np.asarray(a)))
        np.testing.assert_allclose(np.asarray(m_sh["loss"]),
                                   np.asarray(sim_losses), rtol=2e-5,
                                   atol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(st.params),
                        jax.tree_util.tree_leaves(sim_state.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-5, atol=1e-6)

    def test_subject_shard_counts_apportionment(self):
        """Crop quotas are a largest-remainder apportionment of the
        global batch proportional to live subject counts: exact sum,
        <1-crop deviation from proportionality, equal shards exact."""
        from qbold_vi_tpu.train.steps import _subject_shard_counts

        # equal shards: exact proportionality, b_local == b/n
        s_pad, subj, crops, b_local = _subject_shard_counts(8, 8, 16)
        assert s_pad == 8 and subj == [1] * 8
        assert crops == [2] * 8 and b_local == 2
        # uneven subjects AND a non-proportional batch
        s_pad, subj, crops, b_local = _subject_shard_counts(3, 8, 8)
        assert s_pad == 8 and subj == [1, 1, 1, 0, 0, 0, 0, 0]
        assert sum(crops) == 8 and all(c == 0 for c in crops[3:])
        for s, c in zip(subj, crops):
            assert abs(c - 8 * s / 3) < 1.0
        # many subjects, non-dividing everything: counts must follow the
        # CONTIGUOUS chunk layout jax actually shards (full chunks up
        # front, one partial, zeros after) -- a round-robin split would
        # silently skip real subjects and sample pad rows (review
        # finding, round 5)
        s_pad, subj, crops, b_local = _subject_shard_counts(13, 8, 38)
        assert s_pad == 16 and subj == [2, 2, 2, 2, 2, 2, 1, 0]
        assert sum(crops) == 38
        for s, c in zip(subj, crops):
            assert abs(c - 38 * s / 13) < 1.0
        assert b_local == max(crops)
        s_pad, subj, crops, _ = _subject_shard_counts(100, 8, 38)
        assert s_pad == 104 and subj == [13] * 7 + [9]
        assert sum(crops) == 38

    def test_subject_marginal_uniform_within_rounding(self):
        """The documented distribution claim, checked exactly: a crop's
        subject marginal P(s) = crops[d]/(b*subj[d]) for s on device d
        must equal 1/S up to the <1-crop-per-device apportionment
        rounding, for a spread of cohort/batch shapes."""
        from qbold_vi_tpu.train.steps import _subject_shard_counts

        for n_subj, n_dev, b in ((8, 8, 16), (3, 8, 8), (13, 8, 38),
                                 (100, 8, 38), (11, 4, 7)):
            _, subj, crops, _ = _subject_shard_counts(n_subj, n_dev, b)
            for s_d, c_d in zip(subj, crops):
                if s_d == 0:
                    assert c_d == 0
                    continue
                p = c_d / (b * s_d)
                # exact quota is b*s_d/S crops; rounding moves it < 1
                bound = 1.0 / (b * s_d)
                assert abs(p - 1.0 / n_subj) < bound + 1e-12, (
                    n_subj, n_dev, b, s_d, c_d)

    def test_subject_counts_match_actual_shard_layout(self, rng):
        """The static live-subject counts must equal, per device, how
        many REAL (non-pad) rows jax's contiguous leading-axis sharding
        actually places on that device -- gated against the placement
        itself, not a re-derivation."""
        mesh = make_mesh()
        n_dev = mesh.devices.size
        for n_subj in (3, 8, 11, 13, 100):
            s_pad, subj, _, _ = steps._subject_shard_counts(n_subj, n_dev,
                                                            8)
            marks = np.zeros((s_pad, 1, 1, 1, 1), np.float32)
            marks[:n_subj] = 1.0
            sharded = shard_batch(mesh, marks)
            for shard in sharded.addressable_shards:
                live_rows = int(np.asarray(shard.data).sum())
                # shards are contiguous chunks; match by row range
                lo = shard.index[0].start or 0
                d_idx = lo // (s_pad // n_dev)
                assert live_rows == subj[d_idx], (n_subj, d_idx)

    def test_subject_sharded_epoch_bit_equals_replicated_on_equal_shards(
            self, tmp_path, rng):
        """With S == n_devices IDENTICAL subjects and a proportional
        batch, the subject-sharded epoch is BIT-identical to the
        replicated sharded epoch: same per-device keys, same crop
        windows (subject indices differ but index identical data), same
        live counts, same psum order -- so the only thing the new path
        changes is the residency (round-4 verdict #3 'parity' gate)."""
        import dataclasses

        cfg, tuner, vols, priors, params, opt = self._setup(tmp_path, rng)
        mesh = make_mesh()
        n_dev = mesh.devices.size
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ft_batch_size=2 * n_dev))
        n_steps = 2
        key = jax.random.PRNGKey(3)
        # n_dev identical subjects
        vols_t = np.broadcast_to(vols[:1], (n_dev,) + vols.shape[1:]).copy()
        priors_t = np.broadcast_to(priors[:1],
                                   (n_dev,) + priors.shape[1:]).copy()

        def fresh():
            p = jax.tree_util.tree_map(jnp.copy, params)
            return steps.TrainState(p, opt.init(p), None,
                                    jnp.zeros([], jnp.int32))

        rep = steps.make_finetune_epoch_sharded(tuner, cfg, opt, n_steps,
                                                mesh)
        st_r, m_r = rep(replicate(mesh, fresh()), key,
                        replicate(mesh, jnp.asarray(vols_t)),
                        replicate(mesh, jnp.asarray(priors_t)))

        sub = steps.make_finetune_epoch_subject_sharded(
            tuner, cfg, opt, n_steps, mesh, n_dev)
        sharded = shard_batch(mesh, {"v": vols_t, "p": priors_t})
        st_s, m_s = sub(replicate(mesh, fresh()), key, sharded["v"],
                        sharded["p"])

        assert np.all(np.isfinite(np.asarray(m_r["loss"])))
        np.testing.assert_array_equal(np.asarray(m_s["loss"]),
                                      np.asarray(m_r["loss"]))
        for a, b in zip(jax.tree_util.tree_leaves(st_s.params),
                        jax.tree_util.tree_leaves(st_r.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_subject_sharded_epoch_uneven_subjects(self, tmp_path, rng):
        """3 subjects on 8 devices (5 devices hold only a zero pad
        subject and zero live crops): the epoch executes, every metric
        is finite, the global crop count is preserved, and params stay
        replicated bit-exactly."""
        import dataclasses

        cfg, tuner, vols, priors, params, opt = self._setup(tmp_path, rng)
        mesh = make_mesh()
        n_dev = mesh.devices.size
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ft_batch_size=8))
        n_subj = vols.shape[0]            # 3
        s_pad, _, crops, _ = steps._subject_shard_counts(
            n_subj, n_dev, cfg.train.ft_batch_size)
        assert sum(crops) == cfg.train.ft_batch_size

        def pad(x):
            out = np.zeros((s_pad,) + x.shape[1:], np.float32)
            out[:n_subj] = x
            return out

        sub = steps.make_finetune_epoch_subject_sharded(
            tuner, cfg, opt, 2, mesh, n_subj)
        sharded = shard_batch(mesh, {"v": pad(vols), "p": pad(priors)})
        p = jax.tree_util.tree_map(jnp.copy, params)
        st = replicate(mesh, steps.TrainState(
            p, opt.init(p), None, jnp.zeros([], jnp.int32)))
        st, m = sub(st, jax.random.PRNGKey(5), sharded["v"], sharded["p"])
        assert np.all(np.isfinite(np.asarray(m["loss"])))
        for t in ("nll", "kl", "smoothness"):
            assert np.all(np.isfinite(np.asarray(m[t]))), t
        assert jax.tree_util.tree_leaves(
            st.params)[0].sharding.is_fully_replicated
        for a in jax.tree_util.tree_leaves(st.params):
            assert np.all(np.isfinite(np.asarray(a)))
        # the volume stack really is sharded: each device holds 1/n_dev
        # of the padded subject rows
        shard_rows = sharded["v"].sharding.shard_shape(
            sharded["v"].shape)[0]
        assert shard_rows == s_pad // n_dev

    def test_trainer_shard_subjects_resolution(self, tmp_path, rng):
        """cfg.train.ft_shard_subjects: auto stays replicated at tiny
        scale (below the 1 GiB bound), on forces sharding, bad raises."""
        import dataclasses

        cfg = tiny_cfg(tmp_path)

        class FakeSampler:
            data = np.zeros((3, 4, 4, 2, SCAN.n_taus + 1), np.float32)
            priors = np.zeros((3, 4, 4, 2, 5), np.float32)

        tr = Trainer(cfg, mesh=make_mesh())
        assert tr._shard_subjects(FakeSampler()) is False   # auto, tiny
        tr_on = Trainer(dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ft_shard_subjects="on")), mesh=make_mesh())
        assert tr_on._shard_subjects(FakeSampler()) is True
        tr_bad = Trainer(dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ft_shard_subjects="bogus")), mesh=make_mesh())
        with pytest.raises(ValueError, match="ft_shard_subjects"):
            tr_bad._shard_subjects(FakeSampler())

    def test_trainer_finetune_subject_sharded_end_to_end(self, tmp_path,
                                                         rng):
        """Trainer.finetune with ft_shard_subjects=on over the 8-device
        mesh: pretrain -> subject-sharded fine-tune -> FULL_TRAINED with
        finite metrics (the orchestration wiring, not just the step)."""
        import dataclasses

        cfg = tiny_cfg(tmp_path)
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, ft_shard_subjects="on", ft_batch_size=8))
        trainer = Trainer(cfg, mesh=make_mesh(), logger=lambda *_: None)
        trainer.pretrain()
        vols = np.abs(rng.normal(size=(3, 12, 12, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = 1.0
        state = trainer.finetune(vols)
        assert trainer.status is WeightStatus.FULL_TRAINED
        assert np.isfinite(trainer.last_finetune_metrics["loss"])
        for a in jax.tree_util.tree_leaves(state.params):
            assert np.all(np.isfinite(np.asarray(a)))

    def test_fused_elbo_inside_shard_map(self, tmp_path, rng):
        """Pallas∘shard_map composition (round-2 verdict weak #3): the
        fused ELBO kernel (host-noise, interpreter) runs INSIDE a
        shard_map'd grad with psum'd reductions on the 8-device CPU mesh,
        and matches the jnp path under the same keys exactly."""
        import dataclasses

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from qbold_vi_tpu.parallel.mesh import DATA_AXIS
        from qbold_vi_tpu.train.steps import _finetune_terms

        cfg, tuner, vols, priors, params, opt = self._setup(tmp_path, rng)
        mesh = make_mesh()
        n_dev = mesh.devices.size
        b = n_dev  # one crop per device
        imgs = np.abs(rng.normal(size=(b, 6, 6, 2, SCAN.n_taus))
                      ).astype(np.float32) * 50 + 100
        mask = (rng.uniform(size=(b, 6, 6, 2, 1)) > 0.2).astype(np.float32)
        pri = rng.normal(size=(b, 6, 6, 2, 5)).astype(np.float32) * 0.3
        batch = {"images": jnp.asarray(imgs * mask),
                 "mask": jnp.asarray(mask), "priors": jnp.asarray(pri)}
        key = jax.random.PRNGKey(2)

        def run(mode):
            c = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, fused_elbo=mode, fused_decode_nll="off"))

            def local(p, batch_l, k):
                # every device re-derives the key from its slot so the
                # jnp reference below can reproduce the draws
                d = jax.lax.axis_index(DATA_AXIS)
                k = jax.random.fold_in(k, d)

                def loss_fn(pp):
                    total, _ = _finetune_terms(pp, k, batch_l, tuner, c,
                                               kl_samples=6,
                                               axis_name=DATA_AXIS)
                    return total

                loss, grads = jax.value_and_grad(loss_fn)(p)
                return (jax.lax.psum(loss, DATA_AXIS),
                        jax.lax.psum(grads, DATA_AXIS))

            spec = P(DATA_AXIS)
            fn = shard_map(local, mesh=mesh,
                           in_specs=(P(), spec, P()),
                           out_specs=(P(), P()), check_vma=False)
            return jax.jit(fn)(params, batch, key)

        loss_f, grads_f = run("host-interpret")
        loss_r, grads_r = run("off")
        np.testing.assert_allclose(float(loss_f), float(loss_r),
                                   rtol=1e-5, atol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(grads_f),
                         jax.tree_util.tree_leaves(grads_r)):
            scale = np.abs(np.asarray(b_)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b_) / scale,
                                       rtol=5e-4, atol=5e-5)

    def test_fused_elbo_diag_inside_shard_map(self, tmp_path, rng):
        """The DIAGONAL kernel variant (analytic in-kernel KL, round 4)
        composed with shard_map -- the default-config mesh path; exact
        vs the jnp path under the same keys."""
        import dataclasses

        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        from qbold_vi_tpu.config import (ModelConfig, QBoldConfig,
                                         SynthParams, TrainConfig)
        from qbold_vi_tpu.parallel.mesh import DATA_AXIS
        from qbold_vi_tpu.train.steps import _finetune_terms

        cfg = QBoldConfig(
            scan=SCAN, synth=SynthParams(sample_size=40),
            model=ModelConfig(no_units=4, no_intermediate_layers=1,
                              student_t_df=200.0, use_mvg=False,
                              predict_log_data=False),
            train=TrainConfig(save_directory=str(tmp_path)))
        tuner = FineTuner(cfg.model, cfg.scan)
        params = tuner.init(jax.random.PRNGKey(7),
                            jnp.zeros((1, 6, 6, 2, SCAN.n_taus)))
        mesh = make_mesh()
        b = mesh.devices.size
        imgs = np.abs(rng.normal(size=(b, 6, 6, 2, SCAN.n_taus))
                      ).astype(np.float32) * 50 + 100
        mask = (rng.uniform(size=(b, 6, 6, 2, 1)) > 0.2).astype(np.float32)
        pri = rng.normal(size=(b, 6, 6, 2, 4)).astype(np.float32) * 0.3
        batch = {"images": jnp.asarray(imgs * mask),
                 "mask": jnp.asarray(mask), "priors": jnp.asarray(pri)}
        key = jax.random.PRNGKey(2)

        def run(mode):
            c = dataclasses.replace(cfg, train=dataclasses.replace(
                cfg.train, fused_elbo=mode, fused_decode_nll="off"))

            def local(p, batch_l, k):
                d = jax.lax.axis_index(DATA_AXIS)
                k = jax.random.fold_in(k, d)

                def loss_fn(pp):
                    total, _ = _finetune_terms(pp, k, batch_l, tuner, c,
                                               axis_name=DATA_AXIS)
                    return total

                loss, grads = jax.value_and_grad(loss_fn)(p)
                return (jax.lax.psum(loss, DATA_AXIS),
                        jax.lax.psum(grads, DATA_AXIS))

            spec = P(DATA_AXIS)
            fn = shard_map(local, mesh=mesh,
                           in_specs=(P(), spec, P()),
                           out_specs=(P(), P()), check_vma=False)
            return jax.jit(fn)(params, batch, key)

        loss_f, grads_f = run("host-interpret")
        loss_r, grads_r = run("off")
        np.testing.assert_allclose(float(loss_f), float(loss_r),
                                   rtol=1e-5, atol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(grads_f),
                         jax.tree_util.tree_leaves(grads_r)):
            scale = np.abs(np.asarray(b_)).max() + 1e-8
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b_) / scale,
                                       rtol=5e-4, atol=5e-5)

    def test_sharded_infer_nondivisible_subjects(self, tmp_path, rng):
        """posterior_maps_sharded handles subject counts that do not
        divide the mesh (e.g. the 14-subject benchmark cohort on 8
        devices) by pad-and-slice, matching the unsharded maps."""
        from qbold_vi_tpu.infer import posterior_maps, posterior_maps_sharded

        cfg, tuner, vols, priors, params, opt = self._setup(tmp_path, rng)
        mesh = make_mesh()
        n_subj = mesh.devices.size + 3          # deliberately non-divisible
        data = np.abs(rng.normal(
            size=(n_subj, 6, 6, 2, SCAN.n_taus + 1))).astype(np.float32) + 0.5
        data[..., -1] = (rng.uniform(size=data.shape[:-1]) > 0.2)
        key = jax.random.PRNGKey(0)
        sh = posterior_maps_sharded(tuner, params, data, key, mesh,
                                    no_samples=16, use_pallas=False)
        ref = posterior_maps(tuner, params, data, key, no_samples=16,
                             use_pallas=False)
        assert sh["oef"].shape == ref["oef"].shape == (n_subj, 6, 6, 2, 1)
        for k in ("oef", "dbv", "r2p"):
            assert np.all(np.isfinite(sh[k]))
        # deterministic channel must agree exactly between the two paths
        np.testing.assert_allclose(sh["raw_log_stds"], ref["raw_log_stds"],
                                   rtol=1e-5, atol=1e-6)

    def test_sharded_epoch_allreduce_and_replication(self, tmp_path, rng):
        cfg, tuner, vols, priors, params, opt = self._setup(tmp_path, rng)
        mesh = make_mesh()
        epoch = steps.make_finetune_epoch_sharded(
            tuner, cfg, opt, cfg.train.ft_steps_per_epoch, mesh)
        st = replicate(mesh, steps.TrainState(
            params, opt.init(params), None, jnp.zeros([], jnp.int32)))
        dv = replicate(mesh, jnp.asarray(vols))
        dp = replicate(mesh, jnp.asarray(priors))
        hlo = epoch.lower(st, jax.random.PRNGKey(0), dv, dp).compile().as_text()
        assert "all-reduce" in hlo, "no gradient all-reduce in sharded epoch"
        st, m = epoch(st, jax.random.PRNGKey(0), dv, dp)
        assert np.all(np.isfinite(np.asarray(m["loss"])))
        assert jax.tree_util.tree_leaves(
            st.params)[0].sharding.is_fully_replicated

    def test_sharded_stream_step_matches_simulation(self, tmp_path, rng):
        """Streaming pretrain under the mesh: per-device local generation,
        pmean'd grads == the mean of per-device single-path grads."""
        from qbold_vi_tpu.train.steps import (_pretrain_loss,
                                              stream_synthetic_batch)

        cfg = tiny_cfg(tmp_path)
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            scan=dataclasses.replace(cfg.scan, simulate_noise=False),
            train=dataclasses.replace(cfg.train, pt_batch_size=16))
        tuner = FineTuner(cfg.model, cfg.scan)
        mesh = make_mesh()
        n_dev = mesh.devices.size
        b_local = cfg.train.pt_batch_size // n_dev
        params = tuner.init(jax.random.PRNGKey(7),
                            jnp.zeros((1, 6, 6, 2, SCAN.n_taus)))
        opt = optim.make_pretrain_optimizer(cfg.train)
        key = jax.random.PRNGKey(11)

        sstep = steps.make_pretrain_stream_step_sharded(tuner, cfg, opt, mesh)
        p_copy = jax.tree_util.tree_map(jnp.copy, params)  # donation-safe
        st = replicate(mesh, steps.TrainState(
            p_copy, opt.init(p_copy), optim.swa_init(p_copy),
            jnp.zeros([], jnp.int32)))
        st, m = sstep(st, key)

        @jax.jit
        def sim(params):
            def one_dev(d):
                kd = jax.random.fold_in(key, d)
                k_batch, k_loss = jax.random.split(kd)
                batch = stream_synthetic_batch(k_batch, cfg, b_local)
                return jax.value_and_grad(_pretrain_loss)(
                    params, k_loss, batch, tuner, cfg)
            losses, grads = jax.vmap(one_dev)(jnp.arange(n_dev))
            return jnp.mean(losses), jax.tree_util.tree_map(
                lambda g: jnp.mean(g, 0), grads)

        sim_loss, sim_grads = sim(params)
        np.testing.assert_allclose(float(m["loss"]), float(sim_loss),
                                   rtol=2e-5, atol=1e-5)

    def test_trainer_mesh_path_end_to_end(self, tmp_path, rng):
        """Trainer under a mesh: streaming pretrain + sharded fine-tune
        epochs run with zero per-step host transfer and produce a resumable
        checkpoint."""
        import dataclasses

        cfg = tiny_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(cfg.train, pt_on_device_synth=True,
                                      pt_batch_size=8, ft_batch_size=8,
                                      crop_size=6))
        mesh = make_mesh()
        t = Trainer(cfg, mesh=mesh)
        t.pretrain()
        assert t.status is WeightStatus.PRE_TRAINED
        real = np.abs(rng.normal(size=(3, 40, 30, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) + 0.5
        real[..., -1] = 1.0
        t.finetune(real)
        assert t.status is WeightStatus.FULL_TRAINED
        assert os.path.isfile(t.final_path)
        assert jax.tree_util.tree_leaves(
            t.state.params)[0].sharding.is_fully_replicated

    def test_trainer_mesh_hostfed_pretrain(self, tmp_path, rng):
        """The host-fed (fixed-dataset) pretrain also works under a mesh:
        batches shard when they divide the mesh and replicate otherwise
        (tiny tail batches must not crash on divisibility)."""
        import dataclasses

        cfg = tiny_cfg(tmp_path)
        cfg = dataclasses.replace(
            cfg,
            synth=SynthParams(sample_size=40),   # -> 2 train pseudo-volumes
            train=dataclasses.replace(cfg.train, pt_on_device_synth=False,
                                      pt_batch_size=8))
        t = Trainer(cfg, mesh=make_mesh())
        t.pretrain()
        assert t.status is WeightStatus.PRE_TRAINED
        assert os.path.isfile(t.pt_path)


class TestMidPhaseResume:
    """checkpoint_every_epochs > 0 writes .partial full-pytree
    checkpoints so a crashed run resumes from the last completed epoch
    (the reference can only skip whole phases)."""

    def _cfg(self, tmp_path):
        import dataclasses

        cfg = tiny_cfg(tmp_path)
        return dataclasses.replace(
            cfg, train=dataclasses.replace(
                cfg.train, no_pt_epochs=3, no_ft_epochs=3,
                checkpoint_every_epochs=1))

    def test_pretrain_crash_resume(self, tmp_path, rng):
        cfg = self._cfg(tmp_path)

        class Crash(RuntimeError):
            pass

        seen = []

        def crashing_logger(phase, step, metrics):
            seen.append((phase, step))
            if len(seen) == 2:
                raise Crash()

        t = Trainer(cfg, logger=crashing_logger)
        with pytest.raises(Crash):
            t.pretrain()
        partial = t.pt_path + ".partial"
        assert os.path.isfile(partial)
        assert not os.path.isfile(t.pt_path)

        resumed = []
        t2 = Trainer(cfg, logger=lambda p, s, m: resumed.append((p, s)))
        t2.pretrain()
        # the checkpoint follows the log (so the NaN tripwire can veto a
        # poisoned state): epoch 0 logged+checkpointed, epoch 1's log
        # crashed before its checkpoint -> resume re-runs epochs 1 and 2
        assert resumed == [("pretrain", 1), ("pretrain", 2)]
        assert t2.status is WeightStatus.PRE_TRAINED
        assert os.path.isfile(t2.pt_path)
        assert not os.path.isfile(partial)  # cleaned up at phase end
        # step counter reflects ALL epochs, not just the resumed ones
        spe = int(t2.state.step) // cfg.train.no_pt_epochs
        assert int(t2.state.step) == spe * cfg.train.no_pt_epochs

    def test_finetune_crash_resume(self, tmp_path, rng):
        cfg = self._cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()
        real = np.abs(rng.normal(size=(3, 40, 30, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) + 0.5
        real[..., -1] = 1.0

        class Crash(RuntimeError):
            pass

        count = {"n": 0}

        def crashing_logger(phase, step, metrics):
            if phase == "finetune":
                count["n"] += 1
                if count["n"] == 2:   # epoch 0 checkpointed, crash at 1
                    raise Crash()

        t.logger = crashing_logger
        with pytest.raises(Crash):
            t.finetune(real)
        assert os.path.isfile(t.final_path + ".partial")

        resumed = []
        t2 = Trainer(cfg, logger=lambda p, s, m: resumed.append((p, s)))
        assert t2.status is WeightStatus.PRE_TRAINED
        t2.finetune(real)
        assert [e for p, e in resumed if p == "finetune"] == [1, 2]
        assert t2.status is WeightStatus.FULL_TRAINED
        assert int(t2.state.step) == (cfg.train.ft_steps_per_epoch
                                      * cfg.train.no_ft_epochs)
        assert not os.path.isfile(t2.final_path + ".partial")

    def test_disabled_by_default(self, tmp_path, rng):
        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()
        assert not os.path.isfile(t.pt_path + ".partial")


class TestCheckpointSchema:
    """Checkpoints embed a schema version + a model/scan config
    fingerprint + the writing phase's steps-per-epoch; restores against
    a changed configuration raise CheckpointMismatchError with a clear
    message instead of opaque flax shape errors (round-2 verdict #6)."""

    def test_fingerprint_mismatch_raises(self, tmp_path, rng):
        import dataclasses

        from qbold_vi_tpu.train.trainer import CheckpointMismatchError

        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()
        assert os.path.isfile(t.pt_path)

        changed = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, no_units=8))
        with pytest.raises(CheckpointMismatchError,
                           match="fingerprint|architecture"):
            Trainer(changed)

    def test_partial_steps_per_epoch_mismatch_raises(self, tmp_path, rng):
        import dataclasses

        from qbold_vi_tpu.train.trainer import CheckpointMismatchError

        cfg = dataclasses.replace(
            tiny_cfg(tmp_path), train=dataclasses.replace(
                tiny_cfg(tmp_path).train, no_ft_epochs=3,
                checkpoint_every_epochs=1))
        t = Trainer(cfg)
        t.pretrain()

        class Crash(RuntimeError):
            pass

        calls = []

        def crashing_logger(phase, step, metrics):
            calls.append(phase)
            if calls.count("finetune") == 2:
                raise Crash()

        t.logger = crashing_logger
        real = np.abs(rng.normal(size=(2, 10, 10, 2, SCAN.n_taus + 1))
                      ).astype(np.float32) + 0.5
        real[..., -1] = 1.0
        with pytest.raises(Crash):
            t.finetune(real)
        assert os.path.isfile(t.final_path + ".partial")

        changed = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           ft_steps_per_epoch=5))
        t2 = Trainer(changed)
        with pytest.raises(CheckpointMismatchError, match="steps/epoch"):
            t2.finetune(real)

    def test_runtime_only_switches_do_not_invalidate(self, tmp_path, rng):
        """The documented runtime switches (compute_dtype, quad_rule,
        fused_infer; scan simulate_noise/snr) select HOW a checkpoint
        executes, not its pytree shapes/meaning -- `infer --set
        compute_dtype=float32` (etc.) on an existing run directory must
        load, not raise CheckpointMismatchError."""
        import dataclasses

        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()

        changed = dataclasses.replace(
            cfg,
            model=dataclasses.replace(cfg.model, compute_dtype="float32",
                                      quad_rule="gj16", fused_infer="off"),
            scan=dataclasses.replace(cfg.scan, simulate_noise=False,
                                     snr=77.0))
        t2 = Trainer(changed)
        assert t2.status is WeightStatus.PRE_TRAINED

    def test_unversioned_checkpoint_still_loads(self, tmp_path, rng):
        """Round-2 checkpoints (no __meta__) and imports saved without a
        config (fingerprint 0) restore without error."""
        from qbold_vi_tpu.train.trainer import _save_state

        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()
        _save_state(t.pt_path, t.state)          # cfg=None -> fingerprint 0
        t2 = Trainer(cfg)
        assert t2.status is WeightStatus.PRE_TRAINED

    def test_legacy_full_dict_fingerprint_still_loads(self, tmp_path, rng):
        """Checkpoints written BEFORE the runtime-only keys were
        excluded from the fingerprint carry the full-dict hash; an
        unchanged config must still load them (no migration, no
        retrain)."""
        from flax import serialization

        from qbold_vi_tpu.train.trainer import _config_fingerprint

        cfg = tiny_cfg(tmp_path)
        t = Trainer(cfg)
        t.pretrain()

        legacy = _config_fingerprint(cfg, legacy=True)
        assert int(legacy) != int(_config_fingerprint(cfg))
        with open(t.pt_path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        raw["__meta__"]["fingerprint"] = legacy
        with open(t.pt_path, "wb") as f:
            f.write(serialization.msgpack_serialize(raw))

        t2 = Trainer(cfg)
        assert t2.status is WeightStatus.PRE_TRAINED

    def test_round4_fingerprint_without_fused_conv_still_matches(
            self, tmp_path):
        """Round-5 added ModelConfig.fused_conv (runtime-only): the
        fingerprint must be identical to what a round-4 build -- whose
        model dict had NO such key -- computed, in BOTH the current and
        the legacy variants, or every pre-round-5 checkpoint would
        raise CheckpointMismatchError (review finding, round 5)."""
        import dataclasses as dc
        import hashlib
        import json

        from qbold_vi_tpu.train.trainer import (_RUNTIME_ONLY_MODEL_KEYS,
                                                _RUNTIME_ONLY_SCAN_KEYS,
                                                _config_fingerprint)

        cfg = tiny_cfg(tmp_path)

        def round4_fp(legacy):
            model = dc.asdict(cfg.model)
            scan = dc.asdict(cfg.scan)
            model.pop("fused_conv")          # the key did not exist
            if not legacy:
                for k in _RUNTIME_ONLY_MODEL_KEYS:
                    model.pop(k, None)
                for k in _RUNTIME_ONLY_SCAN_KEYS:
                    scan.pop(k, None)
            blob = json.dumps({"model": model, "scan": scan},
                              sort_keys=True)
            return int.from_bytes(
                hashlib.sha256(blob.encode()).digest()[:8], "big")

        assert int(_config_fingerprint(cfg)) == round4_fp(False)
        assert int(_config_fingerprint(cfg, legacy=True)) == round4_fp(True)
        # and flipping the switch never changes either fingerprint
        cfg_on = dc.replace(cfg, model=dc.replace(cfg.model,
                                                  fused_conv="on"))
        assert int(_config_fingerprint(cfg_on)) == round4_fp(False)

    def test_tripwire_ignores_hyperprior_saturation(self, tmp_path, rng):
        """An inf inverse-gamma hyperprior metric (exp(raw) saturating
        fp32 for raw > ~88.7) is an extreme-but-loggable diagnostic, not
        a diverged run: _log must not raise. True divergence (NaN loss)
        still trips."""
        from qbold_vi_tpu.train.trainer import NaNLossError

        t = Trainer(tiny_cfg(tmp_path))
        t._log("pt", 0, {"val_loss": 1.0, "oef_alpha": float("inf"),
                         "dbv_beta": float("inf")})
        with pytest.raises(NaNLossError):
            t._log("pt", 0, {"val_loss": float("nan")})


class TestMvgInvGammaEval:
    def test_pretrain_eval_with_mvg_hyperprior_head(self, tmp_path, rng):
        """use_mvg=True + infer_inv_gamma=True emits 5+4 channels; the
        old `[..., : C // 2]` slice cut them to 4 and the MVG unpack
        indexed out of bounds on the first validation pass."""
        cfg = tiny_cfg(tmp_path, infer_inv_gamma=True)
        tuner = FineTuner(cfg.model, cfg.scan)
        params = tuner.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 2, 2, 1, SCAN.n_taus)))
        batch = synth_batch(rng)
        evaluate = steps.make_pretrain_eval(tuner, cfg)
        m = evaluate(params, jax.random.PRNGKey(1),
                     {"x": jnp.asarray(batch["x"]),
                      "y": jnp.asarray(batch["y"])})
        for k in ("val_loss", "oef_mse", "dbv_mse", "r2p_mse"):
            assert np.isfinite(float(m[k])), k
