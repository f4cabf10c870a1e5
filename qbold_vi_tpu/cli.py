"""Command-line entry points: train / infer / baseline / synth / sweep.

Replaces the reference's script soup (``python train.py cfg.yaml``,
``python signals.py``, ``python loglinear.py``, ``python wandb_sweep.py``
and the missing ``qbold_main.py`` named by its Dockerfile/instructions --
reference: train.py:454-491, signals.py:302-332, loglinear.py:107-157,
wandb_sweep.py:36-49, Dockerfile:7) with one ``python -m qbold_vi_tpu``
multi-command CLI over the typed config system.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

import numpy as np

from .config import OPTIMAL, QBoldConfig, apply_flat_overrides, load_yaml_config


def _load_cfg(args) -> QBoldConfig:
    base = OPTIMAL if args.preset == "optimal" else QBoldConfig()
    if getattr(args, "ini", None):
        # lossless reference-INI migration: scanner constants AND the
        # synthetic-population section (reference config:1-61)
        from .config import load_ini_config
        base = load_ini_config(args.ini, base)
    strict = not getattr(args, "allow_unknown_keys", False)
    cfg = (load_yaml_config(args.config, base=base, strict=strict)
           if args.config else base)
    overrides = dict(kv.split("=", 1) for kv in (args.set or []))
    if overrides:
        # a typo'd --set key raises with a did-you-mean
        # (config.UnknownConfigKeyError) unless --allow-unknown-keys
        cfg = apply_flat_overrides(cfg, overrides, strict=strict)
    return cfg


def _maybe_wandb(cfg: QBoldConfig):
    """wandb is optional (reference: qbold_train_model.py:22-25)."""
    if not cfg.train.wandb_project:
        return None
    try:
        import wandb
    except ImportError:
        print("wandb not installed; logging to stdout only", file=sys.stderr)
        return None
    return wandb.init(project=cfg.train.wandb_project, config=cfg.__dict__)


def cmd_train(args) -> int:
    """Two-phase training (reference: train.py:188-282).

    Multi-HOST: every host runs this same command with ``--coordinator
    host:port --num-processes N --process-id i`` (+ ``--mesh``); the
    global mesh spans all hosts' devices, collectives ride ICI/DCN,
    checkpoints/logs come from process 0 (parallel/multihost.py is the
    certification harness for this path). ``QBOLD_CPU_DEVICES=k``
    forces a k-device CPU backend (virtual-mesh runs / CPU workers).
    """
    import dataclasses

    import jax

    n_cpu = os.environ.get("QBOLD_CPU_DEVICES")
    if n_cpu:
        # must precede first backend use; the environment's
        # sitecustomize-forced platform list only yields to
        # jax.config.update (tests/conftest.py does the same)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", int(n_cpu))

    from .parallel import initialize_distributed, make_mesh
    from .train.trainer import Trainer

    initialize_distributed(getattr(args, "coordinator", None),
                           getattr(args, "num_processes", None),
                           getattr(args, "process_id", None))

    cfg = _load_cfg(args)
    if getattr(args, "smoke", False):
        # Tiny end-to-end run for verification: same code path, small
        # shapes, synthetic phase only unless real data exists.
        cfg = dataclasses.replace(
            cfg,
            synth=dataclasses.replace(cfg.synth, sample_size=64),
            model=dataclasses.replace(cfg.model, no_units=8,
                                      no_intermediate_layers=1),
            train=dataclasses.replace(cfg.train, no_pt_epochs=1,
                                      no_ft_epochs=1, ft_steps_per_epoch=2,
                                      pt_batch_size=4),
        )
    mesh = make_mesh() if (args.mesh and jax.device_count() > 1) else None
    trainer = Trainer(cfg, mesh=mesh, wandb_run=_maybe_wandb(cfg))
    trainer.pretrain()

    d = cfg.train.data_directory
    if not os.path.exists(d):
        print(f"real data directory {d} not found; pretraining only",
              file=sys.stderr)
        return 0

    from .train.data import load_real_directory
    real = load_real_directory(d)
    if real["train"] is None:
        print("no ASE training volumes found; pretraining only",
              file=sys.stderr)
        return 0
    train_data = real["train"]
    hyperv, baseline, study = real["hyperv"], real["baseline"], real["study"]

    from . import infer

    # Post-pretrain artifacts + population stats for prior initialisation
    # (reference train.py:241-251)
    if baseline is not None:
        stats = trainer.estimate_population_param_distribution(
            np.concatenate([baseline[..., :-2], baseline[..., -1:]], -1))
        print("population stats (for prior init):", stats)
        if trainer.status.name == "PRE_TRAINED":
            for name, arr in (("pt_baseline", baseline), ("pt_hyperv", hyperv)):
                if arr is None:
                    continue
                with_brain_mask = np.concatenate(
                    [arr[..., :-2], arr[..., -1:]], -1)
                tdir = os.path.join(d, f"transforms_{name.split('_')[1]}")
                infer.save_predictions(
                    trainer.tuner, cfg, trainer.state.params, with_brain_mask,
                    os.path.join(cfg.train.save_directory, name),
                    jax.random.PRNGKey(5),
                    transform_directory=tdir if os.path.isdir(tdir) else None)

    # Per-voxel priors from the PRE-finetune model, used for the KL maps
    # in the final exports (reference train.py:227-236)
    from .train import data as data_pipe
    k = 5 if cfg.model.use_mvg else 4
    priors = {}
    for name, arr in (("baseline", baseline), ("hyperv", hyperv)):
        if arr is not None:
            wbm = np.concatenate([arr[..., :-2], arr[..., -1:]], -1)
            priors[name] = data_pipe.predict_priors(
                trainer._encode_fn(), wbm, k)

    trainer.finetune(train_data, study_data=study)

    # Posterior export for the study sets (reference train.py:241-279)
    for name, arr in (("baseline", baseline), ("hyperv", hyperv)):
        if arr is None:
            continue
        with_brain_mask = np.concatenate([arr[..., :-2], arr[..., -1:]], -1)
        tdir = os.path.join(d, f"transforms_{name}")
        infer.save_predictions(
            trainer.tuner, cfg, trainer.state.params, with_brain_mask,
            os.path.join(cfg.train.save_directory, name),
            jax.random.PRNGKey(7),
            transform_directory=tdir if os.path.isdir(tdir) else None,
            use_first_op=False, fine_tuned=True, priors=priors.get(name))
    return 0


def cmd_synth(args) -> int:
    """Generate a synthetic dataset .npz (reference: signals.py:302-332)."""
    import jax

    cfg = _load_cfg(args)
    from .synth import create_synthetic_dataset

    x, y = create_synthetic_dataset(
        jax.random.PRNGKey(cfg.train.seed), cfg.scan, cfg.synth,
        full_model=cfg.train.full_model, use_blood=cfg.train.use_blood,
        quad_rule=cfg.model.quad_rule)
    np.savez(args.output, x=np.asarray(x), y=np.asarray(y))
    print(f"wrote {args.output}: x{tuple(x.shape)} y{tuple(y.shape)}")
    return 0


def cmd_baseline(args) -> int:
    """Log-linear WLS fit (reference: loglinear.py:107-157).

    Protocol: the reference CLI runs the 24-tau 'streamlined' grid
    (tau from -0.028 step 0.004, loglinear.py:149-152); --protocol auto
    (default) applies that grid when the data carries 24 tau channels
    and the config grid otherwise; 'streamlined'/'config' force it.
    With --transform-directory the (OEF, DBV, R2') maps are additionally
    warped to MNI space exactly like the reference's save_predictions
    (loglinear.py:31-61)."""
    import dataclasses

    import jax.numpy as jnp

    from .baseline import fit_wls
    from .io import fsl, nifti

    cfg = _load_cfg(args)
    # _load_volumes also reads the .npz layout `synth -o` writes (bare
    # np.load would hand an NpzFile to the slicing below)
    data = _load_volumes(args.data)
    if args.strip_channels:
        data = data[..., :-args.strip_channels]

    scan = cfg.scan
    if args.protocol == "streamlined":
        scan = dataclasses.replace(scan, tau_start=-0.028, tau_step=0.004)
    elif (args.protocol == "auto" and data.shape[-1] == 24
          and scan.n_taus != data.shape[-1]):
        # auto only substitutes the streamlined grid when the configured
        # grid does NOT already match the data -- a user-specified 24-tau
        # protocol must never be silently replaced
        scan = dataclasses.replace(scan, tau_start=-0.028, tau_step=0.004)
    if data.shape[-1] != scan.n_taus:
        print(f"data has {data.shape[-1]} tau channels but the "
              f"{args.protocol} protocol grid has {scan.n_taus}",
              file=sys.stderr)
        return 1

    oef, dbv, r2p = fit_wls(jnp.asarray(data), scan)
    base = args.output or os.path.splitext(args.data)[0]
    tdir = args.transform_directory
    if tdir and fsl.have_fsl():
        fsl.warp_maps_to_mni(np.asarray(oef), np.asarray(dbv),
                             np.asarray(r2p), base, tdir)
    elif tdir:
        print("FSL not found; skipping MNI warp", file=sys.stderr)
    for name, arr in (("oef", oef), ("dbv", dbv), ("r2p", r2p)):
        nifti.save_im_data(np.asarray(arr), f"{base}_{name}", tdir)
    print(f"wrote {base}_{{oef,dbv,r2p}}.nii.gz ({scan.n_taus}-tau grid)")
    return 0


def _load_volumes(path: str) -> np.ndarray:
    """Load an export request's volume stack: .npy, or .npz (the 'x'
    entry when present, else the archive's first array -- the layout
    `synth -o` and the reference's synthetic_data.npz use)."""
    arr = np.load(path)
    if hasattr(arr, "files"):
        # close the NpzFile's zip handle deterministically: the serve
        # loop opens one per request for the process's whole lifetime
        with arr:
            key = "x" if "x" in arr.files else arr.files[0]
            return np.asarray(arr[key])
    return np.asarray(arr)


def _infer_export(trainer, cfg: QBoldConfig, data: np.ndarray, output: str,
                  transform_directory: Optional[str], method: str) -> dict:
    """Shared one-volume-stack export body of ``infer`` and ``serve``
    (reference: model.py:772-887 driven by train.py:241-279). The KL map
    evaluates against per-voxel priors predicted by the PRETRAINED
    encoder (reference train.py:26-31); recover them from the pt
    checkpoint next to the final one when no population prior carries
    them in-model (save_predictions warns and skips _kl if neither
    exists)."""
    import jax

    from . import infer
    from .train.trainer import WeightStatus

    # reject a typo'd estimator name BEFORE any device work: on a
    # fine-tuned checkpoint the priors pass below is a full encoder
    # sweep over the cohort, seconds of compute that posterior_maps'
    # own validation would otherwise throw away
    infer._check_method(method)
    fine_tuned = trainer.status is WeightStatus.FULL_TRAINED
    priors = None
    if fine_tuned and not cfg.model.use_population_prior:
        encode = trainer.pretrained_encode_fn()
        if encode is not None:
            from .train import data as data_pipe

            priors = data_pipe.predict_priors(
                encode, data, 5 if cfg.model.use_mvg else 4)
    return infer.save_predictions(
        trainer.tuner, cfg, trainer.state.params, data, output,
        jax.random.PRNGKey(7), transform_directory=transform_directory,
        use_first_op=not fine_tuned, fine_tuned=fine_tuned, priors=priors,
        method=method)


def cmd_infer(args) -> int:
    """Posterior map export from a checkpoint (reference: model.py:772-887)."""
    from .train.trainer import Trainer, WeightStatus

    cfg = _load_cfg(args)
    trainer = Trainer(cfg)
    if trainer.status is WeightStatus.NOT_TRAINED:
        print("no checkpoint found in save_directory", file=sys.stderr)
        return 1
    _infer_export(trainer, cfg, _load_volumes(args.data), args.output,
                  args.transform_directory, args.method)
    return 0


def cmd_serve(args) -> int:
    """Warm inference server: load the checkpoint ONCE, then stream
    export requests as JSON lines on stdin, one ack line per request on
    stdout.

    Why this exists: the per-program cost of a one-shot export is the
    remote/XLA compile, not the compute -- the 14-subject cohort export
    runs in ~3 s warm but 28-460 s cold through a remote compile
    service (benchmarks/RESULTS.md "Stream-2 wall autopsy").
    Repeated-export serving should hold ONE process warm; this is that
    process. The reference can only export by re-running its training
    script end to end (train.py:241-279).

    Protocol (one JSON object per line):
      {"data": "vols.npy", "output": "out/subj"}      -> export request
        optional keys: "transform_directory", "method" ("quadrature"|"mc")
      {"cmd": "ping"}                                  -> readiness probe
      {"cmd": "shutdown"}  (or stdin EOF)              -> clean exit
    Ack lines: {"ok": true, "output": ..., "subjects": N, "voxels": N,
    "wall_s": T} or {"ok": false, "error": "..."}. Errors in one
    request never kill the server.

    ``--warm S X Y Z`` pre-compiles the export programs for that volume
    geometry at startup (zeros through the same code path), so the
    first real request is already warm.
    """
    import time

    from .train.trainer import Trainer, WeightStatus

    # validate --warm geometry BEFORE Trainer(cfg): restoring the
    # checkpoint includes a jax.jit(tuner.init) template compile, which
    # is minutes through a cold remote-compile tunnel (CLAUDE.md)
    if args.warm and min(args.warm) < 1:
        print(f"--warm dimensions must be >= 1, got {args.warm}",
              file=sys.stderr)
        return 1

    cfg = _load_cfg(args)
    trainer = Trainer(cfg)
    if trainer.status is WeightStatus.NOT_TRAINED:
        print("no checkpoint found in save_directory", file=sys.stderr)
        return 1

    def ack(obj: dict) -> None:
        print(json.dumps(obj), flush=True)

    if args.warm:
        s, x, y, z = args.warm
        import tempfile

        t0 = time.time()
        vols = np.zeros((s, x, y, z, cfg.scan.n_taus + 1), np.float32)
        vols[..., -1] = 1.0
        with tempfile.TemporaryDirectory() as td:
            _infer_export(trainer, cfg, vols, os.path.join(td, "warm"),
                          None, args.method)
        print(f"warmed ({s},{x},{y},{z}) export programs in "
              f"{time.time() - t0:.1f}s", file=sys.stderr)

    ack({"ok": True, "ready": True,
         "fine_tuned": trainer.status is WeightStatus.FULL_TRAINED})
    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError as e:
            ack({"ok": False, "error": f"bad json: {e}"})
            continue
        if not isinstance(req, dict):
            # valid JSON but not an object ("[]", "42", "null"): the
            # errors-never-kill-the-server contract covers this too
            ack({"ok": False,
                 "error": f"request must be a JSON object, "
                          f"got {type(req).__name__}"})
            continue
        if req.get("cmd") == "shutdown":
            ack({"ok": True, "shutdown": True})
            break
        if req.get("cmd") == "ping":
            ack({"ok": True, "ready": True})
            continue
        if "cmd" in req:
            # an unrecognized command must not fall through to the
            # export path, where it would ack a misleading KeyError
            ack({"ok": False, "error": f"unknown cmd: {req['cmd']!r}"})
            continue
        try:
            data = _load_volumes(req["data"])
            t0 = time.time()
            _infer_export(trainer, cfg, data, req["output"],
                          req.get("transform_directory"),
                          req.get("method", args.method))
            ack({"ok": True, "output": req["output"],
                 "subjects": int(data.shape[0]),
                 "voxels": int(np.prod(data.shape[:-1])),
                 "wall_s": round(time.time() - t0, 3)})
        except Exception as e:   # noqa: BLE001 -- a bad request must
            # never kill the warm process (its warmth is the point)
            ack({"ok": False, "error": f"{type(e).__name__}: {e}"})
    return 0


def cmd_export_model(args) -> int:
    """Serialize the inference program to a StableHLO serving artifact
    (io/export_model.py): the deployment story the reference lacks
    (its model.py:772-887 requires the training codebase to predict)."""
    from .io.export_model import export_inference, save_exported
    from .train.trainer import Trainer, WeightStatus

    cfg = _load_cfg(args)
    trainer = Trainer(cfg)
    if trainer.status is WeightStatus.NOT_TRAINED:
        print("no checkpoint found in save_directory", file=sys.stderr)
        return 1
    fine_tuned = trainer.status is WeightStatus.FULL_TRAINED
    platforms = tuple(p.strip() for p in args.platforms.split(",") if p.strip())
    if args.fused and platforms == ("tpu", "cpu"):
        platforms = ("tpu",)   # fused blobs are TPU-only by construction
    use_first_op = args.fused or not fine_tuned
    if args.fused and fine_tuned:
        print("note: --fused serves the stream-1 (voxelwise) posterior "
              "head -- the reference's save_predictions default "
              "(model.py:776) -- not the stream-2 maps the non-fused "
              "export of a fine-tuned checkpoint serves",
              file=sys.stderr)
    exp = export_inference(
        trainer.tuner, trainer.state.params,
        use_first_op=use_first_op, platforms=platforms,
        polymorphic=not (args.static_shape or args.fused),
        example_shape=tuple(args.static_shape) if args.static_shape else
        (1, 64, 64, 8), fused=args.fused)
    n = save_exported(exp, args.output)
    shape = ", ".join(str(d) for d in exp.in_avals[0].shape)
    print(f"wrote {args.output}: {n} bytes, platforms "
          f"{','.join(exp.platforms)}, input ({shape}) float32, "
          f"{'fine-tuned' if fine_tuned else 'pretrained'} checkpoint, "
          f"stream-{1 if use_first_op else 2} head")
    return 0


def cmd_dryrun(args) -> int:
    """Compile + run one sharded fine-tune step on an n-device mesh.

    Forces an n-device virtual CPU mesh: multi-chip hardware is usually
    absent, and remote single-chip backends (or env sitecustomize hooks
    that force them) cannot host a mesh. Must run before any JAX backend
    initialisation in this process.

    ``--processes N`` additionally certifies the MULTI-PROCESS
    (multi-host) path: N coordinated local processes (jax.distributed +
    CPU gloo collectives standing in for DCN) run the sharded train
    steps over a global mesh with per-host data feeding, and every
    metric is gated against this process's single-process mesh
    (parallel/multihost.py).
    """
    import importlib.util
    import os as _os

    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", int(args.devices))

    if args.processes > 1:
        from .parallel import multihost
        out = multihost.certify(args.processes, args.devices,
                                with_trainer=True)
        print(json.dumps(out))
        return 0

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        _os.path.join(_os.path.dirname(_os.path.dirname(__file__)),
                      "__graft_entry__.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(args.devices)
    return 0


def cmd_import_weights(args) -> int:
    """Convert a trained reference .h5 checkpoint into this framework's
    msgpack checkpoints (io/keras_import.py): a pt_model.h5 becomes
    pt_model.msgpack; --final converts a fine-tuned final_model.h5
    (incl. the learned population prior / trainable sigma extras,
    reference model.py:252-281) into final_model.msgpack, so Trainer
    resumes from it exactly as from our own training."""
    import jax.numpy as jnp

    from .io.keras_import import load_reference_h5
    from .train import optim
    from .train.steps import TrainState
    from .train.trainer import Trainer, _save_state

    cfg = _load_cfg(args)
    imported = load_reference_h5(args.h5, cfg.model, cfg.scan,
                                 reference_dir=args.reference_dir)
    trainer = Trainer(cfg)
    params = trainer._init_params()
    params.update(imported)   # encoder + pop_prior/log_sigma when present
    extras = sorted(set(imported) - {"encoder"})
    if args.final:
        optimizer = optim.make_finetune_optimizer(cfg.train)
        state = TrainState(params, optimizer.init(params), None,
                           jnp.zeros([], jnp.int32))
        out = trainer.final_path
    else:
        optimizer = optim.make_pretrain_optimizer(cfg.train)
        state = TrainState(params, optimizer.init(params),
                           optim.swa_init(params) if cfg.train.use_swa
                           else None,
                           jnp.zeros([], jnp.int32))
        out = trainer.pt_path
    _save_state(out, state, cfg=cfg)
    print(f"imported {args.h5} -> {out}"
          + (f" (extras: {', '.join(extras)})" if extras else ""))
    return 0


def cmd_transfer(args) -> int:
    """Retarget a pretrained checkpoint to a different tau protocol
    (models/transfer.py): trunk weights are kept, the tau-dependent first
    conv and sigma head are re-initialised for the new grid."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as _np

    from .models.transfer import transfer_params
    from .train import optim
    from .train.steps import TrainState
    from .train.trainer import Trainer, WeightStatus, _save_state

    cfg = _load_cfg(args)
    src = Trainer(cfg)
    if src.status is WeightStatus.NOT_TRAINED:
        print("no checkpoint in save_directory", file=sys.stderr)
        return 1

    new_scan = dataclasses.replace(
        cfg.scan, tau_start=args.tau_start, tau_step=args.tau_step,
        tau_end=args.tau_end)
    new_cfg = dataclasses.replace(
        cfg, scan=new_scan,
        train=dataclasses.replace(cfg.train, save_directory=args.output))
    sample = jnp.zeros((1, 4, 4, 2, new_scan.n_taus), jnp.float32)
    params = transfer_params(jax.random.PRNGKey(cfg.train.seed),
                             src.state.params, new_cfg.model, new_scan, sample)
    optimizer = optim.make_pretrain_optimizer(new_cfg.train)
    state = TrainState(params, optimizer.init(params),
                       optim.swa_init(params) if new_cfg.train.use_swa else None,
                       jnp.zeros([], jnp.int32))
    dst = Trainer(new_cfg)
    _save_state(dst.pt_path, state, cfg=new_cfg)
    print(f"transferred to {new_scan.n_taus}-tau protocol -> {dst.pt_path}")
    return 0


def cmd_sweep(args) -> int:
    """Grid sweep (reference wandb_sweep.py) or a declarative sweep from
    a space YAML -- Bayesian (TPE) by default, matching the reference's
    ``method: bayes`` wandb sweep (configurations/sweep_prior.yaml),
    random search via --method random. ``--agent <sweep-id>`` instead
    attaches to an existing wandb sweep service (the reference's exact
    workflow, wandb_sweep.py + train.py:482-488): wandb proposes the
    configs, trials run here, val_elbo reports back."""
    cfg = _load_cfg(args)
    # The reference's sweep program is the full two-phase train.py
    # (sweep_prior.yaml:1): when the config points at real ASE volumes,
    # trials pretrain + fine-tune and rank on the real-data val_elbo;
    # otherwise the pretrain-only synthetic objective ranks them.
    from .sweep import _default_run, default_objective
    objective = default_objective(cfg)
    run_fn = None if objective is _default_run else objective
    print(f"sweep objective: "
          f"{'two-phase (real-data val_elbo)' if run_fn else 'pretrain (synthetic val loss)'}",
          file=sys.stderr)
    if run_fn is not None and args.parallel_trials > 1:
        # both objectives have population executors now
        # (sweep.population_full_run for the two-phase program)
        print(f"two-phase objective: vmapped populations of "
              f"{args.parallel_trials} trials per dispatch", file=sys.stderr)
    mesh = None
    if getattr(args, "mesh", False) and args.parallel_trials > 1:
        import jax

        from .parallel import make_mesh
        if jax.device_count() > 1:
            mesh = make_mesh()
            print(f"population trial axis sharded over "
                  f"{mesh.devices.size} devices", file=sys.stderr)
    if getattr(args, "agent", None):
        from .sweep import run_wandb_agent
        n = run_wandb_agent(args.agent, cfg, count=args.trials or None,
                            run_fn=run_fn,
                            parallel_trials=args.parallel_trials,
                            mesh=mesh)
        print(json.dumps({"agent": args.agent, "trials_run": n}))
        return 0
    if args.space:
        import yaml

        from .sweep import bayes_search, parse_wandb_sweep, random_search
        with open(args.space) as f:
            spec = yaml.safe_load(f)
        if "parameters" in spec:
            # the reference's own wandb sweep grammar
            space, metric, goal, method = parse_wandb_sweep(spec)
        else:
            # legacy flat format: {space: {...}, metric: ..., method: ...}
            space = spec["space"]
            metric = spec.get("metric", "val_elbo")
            goal = spec.get("goal", "minimize")
            method = spec.get("method", "bayes")
        if args.method:
            method = args.method
        if method == "bayes":
            results = bayes_search(cfg, space, n_trials=args.trials,
                                   metric=metric, run_fn=run_fn,
                                   maximize=goal == "maximize",
                                   parallel_trials=args.parallel_trials,
                                   mesh=mesh)
        else:
            results = random_search(cfg, space, n_trials=args.trials,
                                    metric=metric, run_fn=run_fn,
                                    maximize=goal == "maximize",
                                    parallel_trials=args.parallel_trials,
                                    mesh=mesh)
    else:
        from .sweep import run_grid_sweep
        results = run_grid_sweep(cfg, layers=args.layers, units=args.units,
                                 seeds=args.seeds, run_fn=run_fn)
    print(json.dumps(results, default=str, indent=1))
    return 0


def build_parser() -> argparse.ArgumentParser:
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--config", "-c", default=None, help="YAML config path")
    common.add_argument("--preset", default="default",
                        choices=["default", "optimal"])
    common.add_argument("--set", action="append", metavar="KEY=VAL",
                        help="flat config overrides (reference-style keys); "
                             "unknown keys raise with a did-you-mean")
    common.add_argument("--ini", default=None, metavar="CONFIG",
                        help="reference-style INI config file: loads the "
                             "scanner constants AND the synthetic-"
                             "population section (lossless migration of "
                             "the reference's `config` file)")
    common.add_argument("--allow-unknown-keys", action="store_true",
                        help="ignore (with a warning) config keys this "
                             "build does not know instead of raising "
                             "(forward-compat YAML escape)")

    p = argparse.ArgumentParser(prog="qbold_vi_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def add(name, **kw):
        return sub.add_parser(name, parents=[common], **kw)

    sp = add("train", help="two-phase training")
    sp.add_argument("--mesh", action="store_true",
                    help="data-parallel over all (global) devices")
    sp.add_argument("--smoke", action="store_true",
                    help="tiny end-to-end run (verification)")
    sp.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                    help="multi-host: jax.distributed coordinator "
                         "address (run the SAME command on every host "
                         "with its own --process-id; checkpoints/logs "
                         "come from process 0)")
    sp.add_argument("--num-processes", type=int, default=None)
    sp.add_argument("--process-id", type=int, default=None)
    sp.set_defaults(fn=cmd_train)

    sp = add("dryrun", help="multi-device sharding dry run")
    sp.add_argument("--devices", type=int, default=8)
    sp.add_argument("--processes", type=int, default=1,
                    help="certify the multi-process (multi-host) path: "
                         "spawn this many coordinated processes "
                         "(jax.distributed over localhost; --devices "
                         "split across them) and gate loss/grad parity "
                         "against the single-process mesh")
    sp.set_defaults(fn=cmd_dryrun)

    sp = add("synth", help="generate synthetic dataset")
    sp.add_argument("--output", "-o", default="synthetic_data.npz")
    sp.set_defaults(fn=cmd_synth)

    sp = add("baseline", help="log-linear WLS fit")
    sp.add_argument("data", help=".npy signal volumes")
    sp.add_argument("--output", "-o", default=None)
    sp.add_argument("--strip-channels", type=int, default=2,
                    help="trailing mask channels to drop (reference uses 2)")
    sp.add_argument("--protocol", default="auto",
                    choices=["auto", "streamlined", "config"],
                    help="tau grid: the reference CLI's 24-tau "
                         "streamlined protocol, the config grid, or "
                         "auto-pick by channel count (default)")
    sp.add_argument("--transform-directory", default=None,
                    help="directory with nonlin<i>.nii.gz warps + "
                         "MNI152_T1_2mm.nii.gz for MNI-space export "
                         "(reference loglinear.py:31-61)")
    sp.set_defaults(fn=cmd_baseline)

    sp = add("infer", help="posterior map export")
    sp.add_argument("data", help=".npy volumes with trailing mask channel")
    sp.add_argument("--output", "-o", required=True)
    sp.add_argument("--transform-directory", default=None)
    sp.add_argument("--method", choices=("quadrature", "mc"),
                    default="quadrature",
                    help="posterior summary estimator: deterministic "
                         "Gaussian quadrature (default; ops/quadrature.py) "
                         "or the reference's 200-sample MC "
                         "(model.py:326-343)")
    sp.set_defaults(fn=cmd_infer)

    sp = add("serve", help="warm inference server: JSON-line export "
                           "requests on stdin, one ack per line on "
                           "stdout (compile once, export many)")
    sp.add_argument("--method", choices=("quadrature", "mc"),
                    default="quadrature",
                    help="default posterior summary estimator "
                         "(per-request 'method' overrides)")
    sp.add_argument("--warm", type=int, nargs=4, default=None,
                    metavar=("S", "X", "Y", "Z"),
                    help="pre-compile the export programs for this "
                         "volume geometry before accepting requests")
    sp.set_defaults(fn=cmd_serve)

    sp = add("export-model", help="serialize inference to a StableHLO "
                                  "serving artifact (jax.export)")
    sp.add_argument("--output", "-o", required=True,
                    help="artifact path (e.g. model.stablehlo)")
    sp.add_argument("--platforms", default="tpu,cpu",
                    help="comma-separated lowering targets (default "
                         "tpu,cpu -- one multi-platform artifact)")
    sp.add_argument("--static-shape", type=int, nargs=4, default=None,
                    metavar=("S", "X", "Y", "Z"),
                    help="bake a fixed volume geometry instead of the "
                         "default shape-polymorphic (s, x, y, z) export")
    sp.add_argument("--fused", action="store_true",
                    help="export the TPU fused-kernel program (Pallas "
                         "stream-1 encode + packed quadrature; "
                         "channel-major (n_taus+1, N) input with N "
                         "baked from --static-shape; TPU platform only)")
    sp.set_defaults(fn=cmd_export_model)

    sp = add("import-weights", help="convert a reference .h5 checkpoint")
    sp.add_argument("h5", help="path to reference pt_model.h5/final_model.h5")
    sp.add_argument("--reference-dir", default="/root/reference",
                    help="checkout of the upstream reference code")
    sp.add_argument("--final", action="store_true",
                    help="the .h5 is a fine-tuned final_model: write "
                         "final_model.msgpack (FULL_TRAINED resume)")
    sp.set_defaults(fn=cmd_import_weights)

    sp = add("transfer", help="retarget a checkpoint to a new tau protocol")
    sp.add_argument("--tau-start", type=float, required=True)
    sp.add_argument("--tau-step", type=float, required=True)
    sp.add_argument("--tau-end", type=float, required=True)
    sp.add_argument("--output", "-o", required=True,
                    help="save_directory for the transferred checkpoint")
    sp.set_defaults(fn=cmd_transfer)

    sp = add("sweep", help="grid sweep over layers x units, or a "
                           "Bayesian/random search from a space YAML")
    sp.add_argument("--layers", type=int, nargs="+", default=[2, 4, 6, 8, 10])
    sp.add_argument("--units", type=int, nargs="+", default=[2, 4, 6, 8, 10])
    sp.add_argument("--seeds", type=int, default=3)
    sp.add_argument("--space", default=None,
                    help="search-space YAML, wandb sweep grammar or flat "
                         "(e.g. configurations/sweep_prior.yaml)")
    sp.add_argument("--method", default=None, choices=["bayes", "random"],
                    help="override the YAML's sweep method")
    sp.add_argument("--trials", type=int, default=20)
    sp.add_argument("--parallel-trials", type=int, default=1,
                    dest="parallel_trials",
                    help="train this many trials per dispatch as ONE "
                         "vmapped population (default objective only)")
    sp.add_argument("--mesh", action="store_true",
                    help="shard the population's trial axis over all "
                         "devices (trials x data parallelism; needs "
                         "--parallel-trials > 1)")
    sp.add_argument("--agent", default=None, metavar="SWEEP_ID",
                    help="attach to an existing wandb sweep service as "
                         "an agent (wandb proposes, val_elbo reports "
                         "back); --trials caps the run count")
    sp.set_defaults(fn=cmd_sweep)
    return p


def main(argv: Optional[list] = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
