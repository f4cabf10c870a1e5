"""Sweep subsystem: grid / random / Bayesian (TPE) search.

The reference's declarative sweep is a wandb *Bayesian* sweep
(reference: configurations/sweep_prior.yaml:2 ``method: bayes``);
bayes_search provides that capability natively and is gated here to
(a) parse the reference's own YAML grammar, (b) find the optimum of the
published tuning direction (gate_offset ~ -3) in fewer trials than
random search, and (c) rank trials out of the box via _default_run.
"""

import dataclasses

import numpy as np
import pytest
import yaml

from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,
                                 SynthParams, TrainConfig)
from qbold_vi_tpu.sweep import (_default_run, bayes_search,
                                parse_wandb_sweep, random_search)


def _objective_factory(noise=0.05, seed=0):
    """Noisy quadratic in gate_offset with optimum at the published -3.0
    (reference optimal.yaml gate_offset: -3.0), plus a log-scale pt_lr
    bowl at 2e-3 -- a cheap stand-in for the val_elbo landscape."""
    rng = np.random.default_rng(seed)

    def run(cfg):
        g = cfg.model.gate_offset
        lr = cfg.train.pt_lr
        y = ((g + 3.0) ** 2
             + (np.log10(lr) - np.log10(2e-3)) ** 2
             + rng.normal() * noise)
        return {"val_elbo": float(y)}

    return run


SPACE = {
    "gate_offset": ("uniform", -6.0, 0.0),
    "pt_lr": ("log_uniform", 1e-5, 1e-1),
}


class TestBayes:
    def test_tpe_converges_to_gate_offset_optimum(self, tmp_path):
        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        results = bayes_search(cfg, SPACE, n_trials=30,
                               run_fn=_objective_factory(), seed=1)
        best = results[0]["overrides"]
        assert abs(best["gate_offset"] + 3.0) < 0.5
        assert 5e-4 < best["pt_lr"] < 8e-3

    def test_tpe_beats_random_at_equal_budget(self, tmp_path):
        """Done-criterion from VERDICT r1 #2: the Bayesian sweep reaches
        the gate_offset ~ -3 optimum in fewer trials than random. Compared
        via best-so-far objective at a 20-trial budget, averaged over
        seeds (each method sees identically-seeded objective noise)."""
        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        n = 20
        bayes_best, rand_best = [], []
        for seed in range(4):
            rb = random_search(cfg, SPACE, n_trials=n, seed=seed,
                               run_fn=_objective_factory(seed=100 + seed))
            bb = bayes_search(cfg, SPACE, n_trials=n, seed=seed,
                              run_fn=_objective_factory(seed=100 + seed))
            rand_best.append(rb[0]["val_elbo"])
            bayes_best.append(bb[0]["val_elbo"])
        assert np.mean(bayes_best) < np.mean(rand_best)

    def test_fixed_choice_and_failed_trials(self, tmp_path):
        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        space = {
            "no_units": ("fixed", 30),
            "crop_size": ("choice", [16, 20, 25]),
            "gate_offset": ("uniform", -6.0, 0.0),
        }

        def run(cfg_):
            if cfg_.train.crop_size == 20:
                return {"status": "failed"}  # no metric -> ranks last
            return {"val_elbo": (cfg_.model.gate_offset + 3.0) ** 2}

        results = bayes_search(cfg, space, n_trials=15, run_fn=run, seed=0)
        assert all(r["overrides"]["no_units"] == 30 for r in results)
        assert all(r["overrides"]["crop_size"] in (16, 20, 25)
                   for r in results)
        # metric-less trials sort to the end
        ranked = [("val_elbo" in r) for r in results]
        assert ranked == sorted(ranked, reverse=True)

    def test_deterministic_given_seed(self, tmp_path):
        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        a = bayes_search(cfg, SPACE, n_trials=10,
                         run_fn=_objective_factory(), seed=3)
        b = bayes_search(cfg, SPACE, n_trials=10,
                         run_fn=_objective_factory(), seed=3)
        assert [r["overrides"] for r in a] == [r["overrides"] for r in b]


class TestWandbGrammar:
    def test_parses_reference_sweep_yaml(self):
        """The reference's own sweep file must load directly
        (reference: configurations/sweep_prior.yaml:1-51)."""
        with open("/root/reference/configurations/sweep_prior.yaml") as f:
            spec = yaml.safe_load(f)
        space, metric, goal, method = parse_wandb_sweep(spec)
        assert method == "bayes"
        assert metric == "val_elbo" and goal == "minimize"
        assert space["inv_gamma_alpha"] == ("uniform", 0.1, 10.0)
        assert space["no_pt_epochs"] == ("choice", [10, 20])
        assert space["no_units"] == ("fixed", 30)
        # NB: YAML 1.1 parses dot-less scientific notation as strings;
        # apply_flat_overrides coerces them to the field type downstream.
        assert space["pt_lr"][0] == "choice"
        assert any(float(v) == 2e-3 for v in space["pt_lr"][1])

    def test_repo_sweep_yaml_drives_bayes(self, tmp_path):
        with open("configurations/sweep_prior.yaml") as f:
            spec = yaml.safe_load(f)
        space, metric, goal, method = parse_wandb_sweep(spec)
        assert method == "bayes"
        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        seen = []

        def run(cfg_):
            seen.append(cfg_)
            return {"val_elbo": float(cfg_.train.inv_gamma_alpha)}

        results = bayes_search(cfg, space, n_trials=8, run_fn=run, seed=0)
        assert len(results) == 8
        for c in seen:
            assert 0.1 <= c.train.inv_gamma_alpha <= 10.0
            assert c.model.no_units == 30
            assert c.train.no_pt_epochs in (10, 20)
        # ranked by the metric ascending
        vals = [r["val_elbo"] for r in results]
        assert vals == sorted(vals)


class TestDefaultRun:
    def test_default_run_returns_val_elbo(self, tmp_path):
        """Out-of-the-box ranking: _default_run must produce the metric
        random_search/bayes_search sort by (VERDICT r1 weak #3)."""
        cfg = QBoldConfig(
            scan=ScanParams(simulate_noise=False),
            synth=SynthParams(sample_size=40),
            model=ModelConfig(no_units=4, no_intermediate_layers=1,
                              use_mvg=True, student_t_df=200.0,
                              predict_log_data=False),
            train=TrainConfig(no_pt_epochs=1, pt_batch_size=8,
                              save_directory=str(tmp_path)),
        )
        out = _default_run(cfg)
        assert "val_elbo" in out and np.isfinite(out["val_elbo"])
        assert out["val_elbo"] == out["val_loss"]
        assert out["status"] == "PRE_TRAINED"


class TestResumedTrial:
    def test_default_run_reports_metric_on_resume(self, tmp_path):
        """A trial resumed from an existing checkpoint directory (e.g. a
        re-run sweep) must still report val_elbo -- otherwise the ranking
        silently degrades to unranked (bit us in the round-2 evidence
        run)."""
        cfg = QBoldConfig(
            scan=ScanParams(simulate_noise=False),
            synth=SynthParams(sample_size=40),
            model=ModelConfig(no_units=4, no_intermediate_layers=1,
                              use_mvg=True, student_t_df=200.0,
                              predict_log_data=False),
            train=TrainConfig(no_pt_epochs=1, pt_batch_size=8,
                              save_directory=str(tmp_path)),
        )
        first = _default_run(cfg)
        again = _default_run(cfg)   # resumes PRE_TRAINED instantly
        assert np.isfinite(first["val_elbo"])
        assert np.isfinite(again["val_elbo"])


class TestPopulation:
    """Vmapped population execution of sweep trials (round-2 verdict #5):
    one device trains a stacked population per dispatch, per-trial
    metrics must match serial execution with the same keys."""

    def _cfg(self, tmp_path):
        return QBoldConfig(
            scan=ScanParams(simulate_noise=False),
            synth=SynthParams(sample_size=40),
            model=ModelConfig(no_units=4, no_intermediate_layers=1,
                              use_mvg=True, student_t_df=200.0,
                              predict_log_data=False),
            train=TrainConfig(no_pt_epochs=1, pt_batch_size=4,
                              save_directory=str(tmp_path),
                              swa_start=1, swa_period=1),
        )

    def test_population_matches_serial(self, tmp_path):
        from qbold_vi_tpu.sweep import population_pretrain

        cfg = self._cfg(tmp_path)
        trials = [
            {"pt_lr": 1e-3, "inv_gamma_alpha": 1.0, "inv_gamma_beta": 2.0},
            {"pt_lr": 5e-4, "inv_gamma_alpha": 3.0, "inv_gamma_beta": 1.0},
            {"pt_lr": 2e-3, "inv_gamma_alpha": 0.5, "inv_gamma_beta": 0.5},
        ]
        pop = population_pretrain(cfg, trials)
        ser = population_pretrain(cfg, trials, serial=True)
        assert len(pop) == len(ser) == 3
        for a, b in zip(pop, ser):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_allclose(a[k], b[k], rtol=2e-4,
                                           atol=1e-5, err_msg=k)
        # different hyperparameters must actually produce different runs
        assert len({round(r["val_elbo"], 6) for r in pop}) == 3

    def test_population_mesh_matches_single_device(self, tmp_path):
        """Trial axis sharded over the 8-device mesh (round-4 verdict
        #2): per-trial metrics match the single-device population
        (trials are independent -- the placement cannot change the
        math), including a trial count that does NOT divide the mesh
        (pad trials replicate trial 0 and are dropped)."""
        import jax

        from qbold_vi_tpu.parallel import make_mesh
        from qbold_vi_tpu.sweep import population_pretrain

        if jax.device_count() < 2:
            pytest.skip("needs the multi-device CPU mesh")
        cfg = self._cfg(tmp_path)
        trials = [{"pt_lr": 1e-3}, {"pt_lr": 5e-4}, {"pt_lr": 2e-3}]
        mesh = make_mesh()
        pop_mesh = population_pretrain(cfg, trials, mesh=mesh)
        pop_one = population_pretrain(cfg, trials)
        for a, b in zip(pop_mesh, pop_one):
            assert set(a) == set(b)
            for k in a:
                np.testing.assert_allclose(a[k], b[k], rtol=2e-5,
                                           atol=1e-6, err_msg=k)

    def test_population_groups_static_keys(self, tmp_path):
        from qbold_vi_tpu.sweep import population_pretrain

        cfg = self._cfg(tmp_path)
        trials = [
            {"pt_lr": 1e-3, "no_units": 4},
            {"pt_lr": 1e-3, "no_units": 6},   # different architecture
            {"pt_lr": 5e-4, "no_units": 4},
        ]
        out = population_pretrain(cfg, trials)
        assert len(out) == 3
        assert all(np.isfinite(r["val_elbo"]) for r in out)
        # trials 0 and 2 share a group; both differ from trial 1's arch
        assert out[0]["val_elbo"] != out[1]["val_elbo"]

    def test_population_mixed_inv_gamma_partitions(self, tmp_path):
        """The inverse-gamma prior is a trace-time gate: trials with and
        without it cannot share a vmapped program, so population_pretrain
        partitions them into separate groups (a sweep toggling the prior
        via values: [0, ...] must not die mid-run)."""
        from qbold_vi_tpu.sweep import population_pretrain

        cfg = self._cfg(tmp_path)
        trials = [
            {"inv_gamma_alpha": 1.0, "inv_gamma_beta": 1.0},
            {"inv_gamma_alpha": 0.0, "inv_gamma_beta": 0.0},
            {"inv_gamma_alpha": 2.0, "inv_gamma_beta": 1.0},
        ]
        out = population_pretrain(cfg, trials)
        assert len(out) == 3
        assert all(np.isfinite(r["val_elbo"]) for r in out)
        # order is preserved and the gate genuinely changes the loss
        ser = population_pretrain(cfg, trials, serial=True)
        for a, b in zip(out, ser):
            np.testing.assert_allclose(a["val_elbo"], b["val_elbo"],
                                       rtol=2e-4, atol=1e-5)
        assert out[0]["val_elbo"] != out[1]["val_elbo"]

    def test_population_batch_failure_isolated(self, tmp_path, monkeypatch):
        """A raising population batch must not abort the sweep: the batch
        retries serially and only the bad trial ranks last (the same
        isolation contract as _run_trial)."""
        import qbold_vi_tpu.sweep as sweep_mod

        cfg = self._cfg(tmp_path)
        real = sweep_mod.population_pretrain

        def flaky(cfg_, ovs, *a, **kw):
            if len(ovs) > 1:
                raise RuntimeError("vmapped batch exploded")
            if ovs[0].get("pt_lr") == 666.0:
                raise RuntimeError("bad trial")
            return real(cfg_, ovs, *a, **kw)

        monkeypatch.setattr(sweep_mod, "population_pretrain", flaky)
        space = {"pt_lr": ("choice", [1e-3, 666.0])}
        res = sweep_mod.random_search(cfg, space, n_trials=4,
                                      parallel_trials=2, seed=0)
        assert len(res) == 4
        ok = [r for r in res if "error" not in r]
        failed = [r for r in res if "error" in r]
        assert ok and failed
        assert all(np.isfinite(r["val_elbo"]) for r in ok)
        assert all(r["status"] == "failed" for r in failed)
        # failed trials rank last
        assert res[:len(ok)] == ok

    def test_random_search_parallel(self, tmp_path):
        cfg = self._cfg(tmp_path)
        space = {"pt_lr": ("log_uniform", 1e-4, 1e-2)}
        res = random_search(cfg, space, n_trials=4, parallel_trials=4)
        assert len(res) == 4
        vals = [r["val_elbo"] for r in res]
        assert vals == sorted(vals)
        assert all("overrides" in r and "trial" in r for r in res)

    def test_bayes_search_parallel(self, tmp_path):
        cfg = self._cfg(tmp_path)
        space = {"pt_lr": ("log_uniform", 1e-4, 1e-2)}
        res = bayes_search(cfg, space, n_trials=6, parallel_trials=3,
                           n_startup=3, seed=0)
        assert len(res) == 6
        vals = [r["val_elbo"] for r in res]
        assert vals == sorted(vals)


class TestWandbAgent:
    """run_wandb_agent: the propose -> train -> report loop against the
    wandb sweep SERVICE (the reference's exact tuning workflow,
    wandb_sweep.py / train.py:482-488), gated with a mocked wandb."""

    class FakeRun:
        def __init__(self, config):
            self.config = config
            self.logged = []
            self.finished = False

        def log(self, m):
            self.logged.append(m)

        def finish(self, exit_code=0):
            self.finished = True
            self.exit_code = exit_code

    class FakeWandb:
        """Stand-in for the wandb module: agent() drives the callback
        once per queued proposal, init() hands out the next config."""

        def __init__(self, proposals):
            self.proposals = list(proposals)
            self.runs = []
            self.agent_calls = []

        def init(self, **kw):
            run = TestWandbAgent.FakeRun(self.proposals[len(self.runs)])
            self.runs.append(run)
            return run

        def agent(self, sweep_id, function=None, count=None):
            self.agent_calls.append((sweep_id, count))
            n = count if count is not None else len(self.proposals)
            for _ in range(n):
                function()

    def test_agent_loop_reports_metric(self, tmp_path):
        from qbold_vi_tpu.sweep import run_wandb_agent

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        proposals = [{"gate_offset": -3.0, "pt_lr": 2e-3},
                     {"gate_offset": -1.0, "pt_lr": 1e-4}]
        fake = self.FakeWandb(proposals)
        objective = _objective_factory(noise=0.0)
        n = run_wandb_agent("team/proj/abc123", cfg, count=2,
                            run_fn=objective, wandb_module=fake)
        assert n == 2
        assert fake.agent_calls == [("team/proj/abc123", 2)]
        assert all(r.finished for r in fake.runs)
        # each run logged the ranking metric computed from ITS config
        v0 = fake.runs[0].logged[0]["val_elbo"]
        v1 = fake.runs[1].logged[0]["val_elbo"]
        assert v0 < v1          # -3/2e-3 is the optimum of the objective

    class ThreadSafeFakeWandb(FakeWandb):
        """The batched agent runs one wandb.agent per thread; init()
        must hand out proposals atomically."""

        def __init__(self, proposals):
            import threading
            super().__init__(proposals)
            self._lock = threading.Lock()

        def init(self, **kw):
            with self._lock:
                run = TestWandbAgent.FakeRun(
                    self.proposals[len(self.runs)])
                self.runs.append(run)
                return run

        def agent(self, sweep_id, function=None, count=None):
            with self._lock:
                self.agent_calls.append((sweep_id, count))
            n = count if count is not None else len(self.proposals)
            for _ in range(n):
                function()

    def test_agent_parallel_trials_batches_populations(self, tmp_path,
                                                       monkeypatch):
        """parallel_trials > 1 (round-4 verdict #7): agent proposals
        train as vmapped populations -- N trials per dispatch -- while
        every wandb run still logs ITS OWN metric and finishes. An odd
        trial budget exercises the drain path (the final partial batch
        flushes when an agent thread runs out of assignments instead of
        waiting out the timeout)."""
        import qbold_vi_tpu.sweep as sweep_mod
        from qbold_vi_tpu.sweep import run_wandb_agent

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        proposals = [{"pt_lr": 1e-3}, {"pt_lr": 2e-3}, {"pt_lr": 3e-3}]
        fake = self.ThreadSafeFakeWandb(proposals)
        batches = []

        def fake_pop(c, ovs, **kw):
            batches.append(list(ovs))
            return [{"val_elbo": float(o["pt_lr"]) * 1000.0}
                    for o in ovs]

        monkeypatch.setattr(sweep_mod, "population_pretrain", fake_pop)
        n = run_wandb_agent("id", cfg, count=3, wandb_module=fake,
                            parallel_trials=2)
        assert n == 3
        # every trial trained through the population executor, in
        # batches no larger than parallel_trials, at least one true
        # multi-trial dispatch
        assert sum(len(b) for b in batches) == 3
        assert max(len(b) for b in batches) == 2
        # per-run reporting intact: each run logged ITS trial's metric
        for run in fake.runs:
            assert run.finished and run.exit_code == 0
            assert run.logged[0]["val_elbo"] == pytest.approx(
                run.config["pt_lr"] * 1000.0)

    def test_agent_parallel_trials_smaller_count_no_stall(
            self, tmp_path, monkeypatch):
        """count < parallel_trials: every live agent thread parks a
        proposal, so the batch must flush IMMEDIATELY via the
        live-thread rule instead of sitting out the 300 s timeout
        (review finding, round 5)."""
        import time

        import qbold_vi_tpu.sweep as sweep_mod
        from qbold_vi_tpu.sweep import run_wandb_agent

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        fake = self.ThreadSafeFakeWandb([{"pt_lr": 1e-3}, {"pt_lr": 2e-3}])

        def fake_pop(c, ovs, **kw):
            return [{"val_elbo": float(o["pt_lr"])} for o in ovs]

        monkeypatch.setattr(sweep_mod, "population_pretrain", fake_pop)
        t0 = time.monotonic()
        n = run_wandb_agent("id", cfg, count=2, wandb_module=fake,
                            parallel_trials=4)
        wall = time.monotonic() - t0
        assert n == 2 and wall < 60.0, f"batch stalled {wall:.0f}s"
        for run in fake.runs:
            assert run.finished and run.logged[0]["val_elbo"] == \
                pytest.approx(run.config["pt_lr"])

    def test_agent_parallel_trials_custom_objective_falls_back(
            self, tmp_path):
        """A custom run_fn has no population executor: the agent warns
        and runs serially (existing semantics preserved)."""
        from qbold_vi_tpu.sweep import run_wandb_agent

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        fake = self.FakeWandb([{"pt_lr": 1e-3}, {"pt_lr": 2e-3}])

        def custom(run_cfg):
            return {"val_elbo": run_cfg.train.pt_lr}

        with pytest.warns(UserWarning, match="no population executor"):
            n = run_wandb_agent("id", cfg, count=2, run_fn=custom,
                                wandb_module=fake, parallel_trials=4)
        assert n == 2
        assert all(r.finished for r in fake.runs)

    def test_agent_dirs_keyed_on_run_id(self, tmp_path):
        """Trial directories must be keyed on the wandb run id, not a
        local success counter: counters reset on agent restart (and skip
        failed trials), and a REUSED directory makes Trainer auto-resume
        a different trial's checkpoints under new hyperparameters."""
        from qbold_vi_tpu.sweep import run_wandb_agent

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        fake = self.FakeWandb([{"pt_lr": 1e-3}, {"pt_lr": 2e-3}])
        seen_dirs = []

        def spy(run_cfg):
            seen_dirs.append(run_cfg.train.save_directory)
            return {"val_elbo": 1.0}

        # give the fake runs wandb-style unique ids
        orig_init = fake.init

        def init_with_id(**kw):
            run = orig_init(**kw)
            run.id = f"r{len(fake.runs)}z"
            return run

        fake.init = init_with_id
        run_wandb_agent("id", cfg, count=2, run_fn=spy, wandb_module=fake)
        assert len(seen_dirs) == len(set(seen_dirs)) == 2
        assert all(f"/agent_r" in d for d in seen_dirs)

    def test_agent_trial_failure_is_isolated(self, tmp_path, capsys):
        """One diverging proposal must not abort the agent session: the
        failed run finishes with exit_code=1 (so the hosted Bayes sweep
        learns the config was bad instead of seeing a clean run with no
        metric) and the REMAINING trials still execute."""
        from qbold_vi_tpu.sweep import run_wandb_agent

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        fake = self.FakeWandb([{"gate_offset": -2.0},
                               {"gate_offset": -3.0}])
        calls = {"n": 0}

        def boom_once(_cfg):
            calls["n"] += 1
            if calls["n"] == 1:
                raise RuntimeError("trial exploded")
            return {"val_elbo": 0.5}

        n = run_wandb_agent("id", cfg, count=2, run_fn=boom_once,
                            wandb_module=fake)
        assert n == 2 and calls["n"] == 2
        assert fake.runs[0].finished and fake.runs[0].exit_code == 1
        assert fake.runs[0].logged[-1]["status"] == "failed"
        assert fake.runs[1].finished and fake.runs[1].exit_code == 0
        assert fake.runs[1].logged[0]["val_elbo"] == 0.5
        assert "trial exploded" in capsys.readouterr().err


class TestFullRunObjective:
    """The reference's sweep PROGRAM is the full two-phase train.py
    (sweep_prior.yaml:1) ranking on the real-data ELBO callback's
    val_elbo (train.py:325-359) -- full_run reproduces that, and the
    CLI/agent auto-select it whenever the config points at real ASE
    volumes."""

    def _fake_data_dir(self, tmp_path, rng, n_taus):
        d = tmp_path / "data"
        d.mkdir()
        # training volumes: trailing brain-mask channel; large enough in
        # x/y that blank_crop keeps 6x10 voxels (margins 34, 20)
        vols = np.abs(rng.normal(size=(3, 40, 30, 2, n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = 1.0
        np.save(d / "ASE_scan.npy", vols)
        # study sets: TWO trailing channels (gm, brain) like the
        # reference's hyperv/baseline arrays (train.py:215-226)
        study = np.abs(rng.normal(size=(2, 12, 12, 2, n_taus + 2))
                       ).astype(np.float32) * 50 + 100
        study[..., -2:] = 1.0
        np.save(d / "hyperv_ase.npy", study)
        np.save(d / "baseline_ase.npy", study + 1.0)
        return str(d)

    def _tiny_cfg(self, tmp_path, data_dir):
        return QBoldConfig(
            scan=ScanParams(simulate_noise=False),
            synth=SynthParams(sample_size=40),
            model=ModelConfig(no_units=4, no_intermediate_layers=1,
                              student_t_df=200.0, use_mvg=True,
                              predict_log_data=False),
            train=TrainConfig(no_pt_epochs=1, no_ft_epochs=1,
                              pt_batch_size=8, ft_batch_size=2,
                              ft_steps_per_epoch=2, crop_size=6,
                              save_directory=str(tmp_path / "runs"),
                              data_directory=data_dir,
                              swa_start=1, swa_period=1),
        )

    def test_objective_auto_selection(self, tmp_path):
        from qbold_vi_tpu.sweep import default_objective, full_run

        empty = tmp_path / "empty"
        empty.mkdir()
        cfg = QBoldConfig(train=TrainConfig(data_directory=str(empty)))
        assert default_objective(cfg) is _default_run
        np.save(empty / "ASE_scan.npy", np.zeros((1, 2, 2, 1, 12)))
        assert default_objective(cfg) is full_run

    def test_full_run_trains_both_phases_and_ranks(self, tmp_path):
        from qbold_vi_tpu.sweep import full_run

        rng = np.random.default_rng(0)
        d = self._fake_data_dir(tmp_path, rng,
                                ScanParams(simulate_noise=False).n_taus)
        cfg = self._tiny_cfg(tmp_path, d)
        results = random_search(
            cfg, {"gate_offset": ("choice", [-3.0, -1.0])},
            n_trials=2, run_fn=full_run, seed=0)
        assert len(results) == 2
        for r in results:
            assert r["status"] == "FULL_TRAINED"
            # the ranking metric comes from the REAL-data ELBO pass
            for k in ("val_elbo", "val_nll", "val_kl"):
                assert np.isfinite(r[k]), (k, r)
        # sorted best-first on val_elbo
        assert results[0]["val_elbo"] <= results[1]["val_elbo"]
        # both phases left their checkpoints behind
        import os
        t0 = os.path.join(str(tmp_path / "runs"), "trial0")
        assert os.path.isfile(os.path.join(t0, "pt_model.msgpack"))
        assert os.path.isfile(os.path.join(t0, "final_model.msgpack"))

    def test_full_run_without_study_sets_falls_back(self, tmp_path):
        from qbold_vi_tpu.sweep import full_run

        rng = np.random.default_rng(1)
        scan = ScanParams(simulate_noise=False)
        d = tmp_path / "data"
        d.mkdir()
        vols = np.abs(rng.normal(size=(3, 40, 30, 2, scan.n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = 1.0
        np.save(d / "ASE_scan.npy", vols)
        cfg = self._tiny_cfg(tmp_path, str(d))
        with pytest.warns(UserWarning, match="study sets"):
            out = full_run(cfg)
        assert out["status"] == "FULL_TRAINED"
        # the same ELBO pass over the TRAINING volumes stands in, under
        # honest train_* keys mirrored to the ranking key
        assert np.isfinite(out["val_elbo"])
        assert out["val_elbo"] == out["train_elbo"]
        assert np.isfinite(out["train_nll"])

    def test_full_run_study_smaller_than_eval_batch(self, tmp_path):
        """A study set with fewer subjects than eval_batch_size must
        still produce a ranking metric: RealCropSampler.eval_batches
        yields the partial batch instead of nothing (a metric-less trial
        silently sorts last, which reads as ranked when it is not)."""
        from qbold_vi_tpu.sweep import full_run

        rng = np.random.default_rng(2)
        scan = ScanParams(simulate_noise=False)
        d = tmp_path / "data"
        d.mkdir()
        vols = np.abs(rng.normal(size=(3, 40, 30, 2, scan.n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = 1.0
        np.save(d / "ASE_scan.npy", vols)
        # ONE subject per study set -> 2 study subjects < batch 3
        study = np.abs(rng.normal(size=(1, 12, 12, 2, scan.n_taus + 2))
                       ).astype(np.float32) * 50 + 100
        study[..., -2:] = 1.0
        np.save(d / "hyperv_ase.npy", study)
        np.save(d / "baseline_ase.npy", study + 1.0)
        out = full_run(self._tiny_cfg(tmp_path, str(d)))
        assert out["status"] == "FULL_TRAINED"
        for k in ("val_elbo", "val_nll", "val_kl"):
            assert np.isfinite(out[k]), (k, out)

    def test_full_run_requires_training_volumes(self, tmp_path):
        from qbold_vi_tpu.sweep import full_run

        empty = tmp_path / "none"
        empty.mkdir()
        cfg = self._tiny_cfg(tmp_path, str(empty))
        with pytest.raises(FileNotFoundError, match="ASE training volumes"):
            full_run(cfg)


class TestPopulationFullRun:
    """Vmapped population execution of the reference's ACTUAL sweep
    program -- the full two-phase pipeline ranked on real-data val_elbo
    (round-3 verdict #4: populations previously covered only the
    pretrain objective)."""

    def _data_dir(self, tmp_path, with_study=True):
        rng = np.random.default_rng(7)
        scan = ScanParams(simulate_noise=False)
        d = tmp_path / "data"
        d.mkdir()
        vols = np.abs(rng.normal(size=(3, 40, 30, 2, scan.n_taus + 1))
                      ).astype(np.float32) * 50 + 100
        vols[..., -1] = 1.0
        np.save(d / "ASE_scan.npy", vols)
        if with_study:
            study = np.abs(rng.normal(size=(2, 12, 12, 2, scan.n_taus + 2))
                           ).astype(np.float32) * 50 + 100
            study[..., -2:] = 1.0
            np.save(d / "hyperv_ase.npy", study)
            np.save(d / "baseline_ase.npy", study + 1.0)
        return str(d)

    def _cfg(self, tmp_path, data_dir):
        return QBoldConfig(
            scan=ScanParams(simulate_noise=False),
            synth=SynthParams(sample_size=40),
            model=ModelConfig(no_units=4, no_intermediate_layers=1,
                              student_t_df=200.0, use_mvg=True,
                              predict_log_data=False),
            train=TrainConfig(no_pt_epochs=1, no_ft_epochs=1,
                              pt_batch_size=4, ft_batch_size=2,
                              ft_steps_per_epoch=2, crop_size=6,
                              save_directory=str(tmp_path / "runs"),
                              data_directory=data_dir,
                              swa_start=1, swa_period=1),
        )

    def test_population_full_run_matches_serial(self, tmp_path):
        from qbold_vi_tpu.sweep import population_full_run

        cfg = self._cfg(tmp_path, self._data_dir(tmp_path))
        trials = [
            {"pt_lr": 1e-3, "ft_lr": 2e-3},
            {"pt_lr": 5e-4, "ft_lr": 1e-3},
            {"pt_lr": 2e-3, "ft_lr": 5e-3},
        ]
        pop = population_full_run(cfg, trials)
        ser = population_full_run(cfg, trials, serial=True)
        assert len(pop) == len(ser) == 3
        for a, b in zip(pop, ser):
            assert a["status"] == "FULL_TRAINED"
            assert set(a) == set(b)
            for k in ("val_elbo", "val_nll", "val_kl", "loss",
                      "pt_val_loss"):
                np.testing.assert_allclose(a[k], b[k], rtol=5e-4,
                                           atol=1e-5, err_msg=k)
        # different hyperparameters genuinely produce different runs
        assert len({round(r["val_elbo"], 6) for r in pop}) == 3

    def test_population_full_run_keeps_fused_kernels(self, tmp_path):
        """The fused ELBO kernel stays ON inside the vmapped population
        (round-4 verdict #1): its custom-VJP fwd/bwd carry custom_vmap
        rules folding the trial axis into the voxel-row axis. In the
        bit-compatible host-noise mode the population must match the
        serial oracle running the SAME fused kernels (tolerances cover
        only vmap-vs-serial XLA reassociation in the encoder/pretrain,
        as in test_population_full_run_matches_serial)."""
        import dataclasses

        from qbold_vi_tpu.sweep import population_full_run

        cfg = self._cfg(tmp_path, self._data_dir(tmp_path))
        cfg = dataclasses.replace(cfg, train=dataclasses.replace(
            cfg.train, fused_elbo="host-interpret"))
        trials = [{"ft_lr": 2e-3}, {"ft_lr": 1e-3}]
        pop = population_full_run(cfg, trials)
        ser = population_full_run(cfg, trials, serial=True)
        assert len(pop) == len(ser) == 2
        for a, b in zip(pop, ser):
            assert a["status"] == "FULL_TRAINED"
            for k in ("val_elbo", "val_nll", "val_kl", "loss"):
                np.testing.assert_allclose(a[k], b[k], rtol=5e-4,
                                           atol=1e-5, err_msg=k)
        assert pop[0]["val_elbo"] != pop[1]["val_elbo"]

    def test_population_full_run_without_study_sets(self, tmp_path):
        from qbold_vi_tpu.sweep import population_full_run

        cfg = self._cfg(tmp_path, self._data_dir(tmp_path,
                                                 with_study=False))
        with pytest.warns(UserWarning, match="study sets"):
            out = population_full_run(cfg, [{"ft_lr": 2e-3}])
        assert out[0]["val_elbo"] == out[0]["train_elbo"]
        assert np.isfinite(out[0]["val_elbo"])

    def test_search_routes_full_run_through_population(self, tmp_path,
                                                       monkeypatch):
        """random_search with run_fn=full_run and parallel_trials > 1
        must dispatch vmapped population batches, not serial trials."""
        import qbold_vi_tpu.sweep as sweep_mod

        cfg = self._cfg(tmp_path, self._data_dir(tmp_path))
        calls = []
        real = sweep_mod.population_full_run

        def spy(cfg_, ovs, *a, **kw):
            calls.append(len(ovs))
            return real(cfg_, ovs, *a, **kw)

        monkeypatch.setattr(sweep_mod, "population_full_run", spy)
        res = sweep_mod.random_search(
            cfg, {"ft_lr": ("log_uniform", 1e-4, 5e-3)}, n_trials=3,
            run_fn=sweep_mod.full_run, parallel_trials=3, seed=0)
        assert calls == [3]
        assert len(res) == 3
        vals = [r["val_elbo"] for r in res]
        assert vals == sorted(vals)
        assert all(r["status"] == "FULL_TRAINED" for r in res)


class TestSpaceValidation:
    def test_bad_dimension_fails_fast(self, tmp_path):
        """A typo'd search-space key must abort the sweep BEFORE any
        trial runs (round-3 verdict weak #2: it used to flow through
        apply_flat_overrides and silently no-op, so TPE 'optimized'
        noise over identical configs)."""
        from qbold_vi_tpu.config import UnknownConfigKeyError

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        bad = {"pt_lrr": ("log_uniform", 1e-4, 1e-2)}
        calls = []

        def run(c):
            calls.append(c)
            return {"val_elbo": 0.0}

        with pytest.raises(UnknownConfigKeyError, match="pt_lr"):
            random_search(cfg, bad, n_trials=3, run_fn=run)
        with pytest.raises(UnknownConfigKeyError, match="pt_lr"):
            bayes_search(cfg, bad, n_trials=3, run_fn=run)
        assert calls == []   # no trial ever ran


class TestSweepRobustness:
    def test_failed_trial_ranks_last_not_aborts(self, tmp_path):
        """One diverged trial (NaN tripwire raising) must not abort the
        sweep and discard completed results."""
        calls = []

        def flaky(cfg):
            calls.append(cfg)
            if len(calls) == 2:
                raise FloatingPointError("non-finite loss at epoch 3")
            return {"val_elbo": float(len(calls))}

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        results = random_search(cfg, SPACE, n_trials=3, run_fn=flaky)
        assert len(results) == 3
        assert results[-1]["status"] == "failed"
        assert "non-finite" in results[-1]["error"]
        assert np.isfinite(results[0]["val_elbo"])

    def test_bayes_excludes_failed_trials_from_model(self, tmp_path):
        def flaky(cfg):
            g = cfg.model.gate_offset
            if g > -1.0:
                raise RuntimeError("diverged")
            return {"val_elbo": (g + 3.0) ** 2}

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        results = bayes_search(cfg, {"gate_offset": ("uniform", -6.0, 0.0)},
                               n_trials=12, run_fn=flaky, seed=3)
        assert len(results) == 12
        ok = [r for r in results if "val_elbo" in r]
        failed = [r for r in results if r.get("status") == "failed"]
        assert ok and all(np.isfinite(r["val_elbo"]) for r in ok)
        # failed trials sort strictly after every scored one
        assert all(results.index(f) >= len(ok) for f in failed)

    def test_random_search_maximize_and_nan_guard(self, tmp_path):
        vals = iter([0.2, float("nan"), 0.9, 0.5])

        def run(cfg):
            return {"val_elbo": next(vals)}

        cfg = QBoldConfig(train=TrainConfig(save_directory=str(tmp_path)))
        results = random_search(cfg, SPACE, n_trials=4, run_fn=run,
                                maximize=True)
        top = [r["val_elbo"] for r in results[:3]]
        assert top == [0.9, 0.5, 0.2]          # best-first under maximize
        assert np.isnan(results[-1]["val_elbo"])   # NaN ranks last
