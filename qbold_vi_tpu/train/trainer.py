"""Two-phase training orchestrator with WeightStatus resume.

Re-design of the reference orchestration (reference: train.py:188-427,
qbold_build_model.py:11-82, qbold_train_model.py:16-147):

* ``WeightStatus`` {NOT_TRAINED, PRE_TRAINED, FULL_TRAINED} with
  auto-loading of the most advanced checkpoint
  (reference: qbold_build_model.py:11-14,45-56);
* checkpoints are full pytrees -- params AND optimiser/SWA state and the
  step counter -- serialised with flax msgpack (an improvement over the
  reference's weights-only .h5 files, which cannot resume the optimiser;
  phase-granular resume semantics are preserved: an existing
  ``pt_model.msgpack`` skips pretraining, ``final_model.msgpack`` skips
  fine-tuning, train.py:193-202,260-263);
* NaN tripwire per epoch (reference: TerminateOnNaN, train.py:375,423);
* pluggable metric logger (stdout always; wandb when configured,
  reference: train.py:482-488, qbold_train_model.py:22-25);
* optional mid-phase crash recovery: ``checkpoint_every_epochs`` writes
  .partial full-pytree checkpoints and a restart continues from the
  last completed epoch (TPU extension; the reference resumes only at
  phase granularity);
* optional data-parallel mesh (absent from the reference entirely):
  params/volumes replicated, every device samples its own crops or
  generates its own synthetic sub-batch inside shard_map epochs with
  pmean'd grads (steps.make_finetune_epoch_sharded /
  make_pretrain_stream_step_sharded) -- zero per-step host transfer on
  the multi-chip path.
"""

from __future__ import annotations

import enum
import os
import time
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization

from ..config import QBoldConfig
from ..models.vi import FineTuner
from ..parallel import mesh as pmesh
from ..synth import create_synthetic_dataset_host
from . import data as data_pipe
from .optim import make_finetune_optimizer, make_pretrain_optimizer, swa_init
from .steps import (TrainState, _subject_shard_counts,
                    make_finetune_epoch_on_device,
                    make_finetune_epoch_sharded,
                    make_finetune_epoch_subject_sharded, make_finetune_eval,
                    make_pretrain_eval, make_pretrain_step,
                    make_pretrain_stream_epoch)

__all__ = ["WeightStatus", "Trainer", "CheckpointMismatchError",
           "pretrain_val_fold", "val_batch_count"]


def pretrain_val_fold(cfg: QBoldConfig):
    """(vx, vy): the FIXED held-out synthetic validation fold.

    Derived from a fold of the config seed (never a rolling key chain)
    and clipped to a small host-generated set, so a fresh run, a
    mid-phase resume, an external evaluation, and a vmapped population
    sweep trial (sweep._population_group) all rank on the SAME set.
    This is the single source of truth -- Trainer.build_pretrain_data
    (streaming branch) and the sweep both call it."""
    import dataclasses

    data_key = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed),
                                  0x5EED)
    val_synth = dataclasses.replace(
        cfg.synth, sample_size=min(cfg.synth.sample_size, 160))
    x, y = create_synthetic_dataset_host(
        data_key, cfg.scan, val_synth,
        full_model=cfg.train.full_model,
        use_blood=cfg.train.use_blood,
        quad_rule=cfg.model.quad_rule)
    (_, _), val = data_pipe.split_synthetic(x, y)
    return val


def val_batch_count(n_volumes: int, vol_voxels: int) -> int:
    """Per-epoch eval batch bound (~4k voxels), shared by
    Trainer._clip_val_batch and the population sweep."""
    return min(n_volumes, 4096 // vol_voxels + 1)


class WeightStatus(enum.Enum):
    """Training progress marker (reference: qbold_build_model.py:11-14)."""
    NOT_TRAINED = 0
    PRE_TRAINED = 1
    FULL_TRAINED = 2


class NaNLossError(RuntimeError):
    pass


class CheckpointMismatchError(RuntimeError):
    """Raised when a checkpoint's recorded schema / config fingerprint /
    steps-per-epoch disagrees with the current configuration -- a clear
    error instead of an opaque flax from_state_dict shape failure (or a
    silent mis-restore when shapes happen to match)."""


_CKPT_SCHEMA = 1


# Documented runtime-only switches: they select HOW a checkpoint is
# executed (kernel routing, trunk dtype, quadrature rule, data-gen
# noise), never the shape or meaning of its pytrees -- flipping them at
# inference/export time (`--set compute_dtype=float32`, `quad_rule=gj16`,
# `fused_infer=off`, ...) must NOT invalidate an existing checkpoint.
_RUNTIME_ONLY_MODEL_KEYS = ("compute_dtype", "quad_rule", "fused_infer",
                            "fused_conv")
_RUNTIME_ONLY_SCAN_KEYS = ("simulate_noise", "snr")
# Runtime-only keys added AFTER the legacy-fingerprint era: the legacy
# hash must reproduce exactly what an old build computed, and old
# builds' config dicts had no such keys -- so these pop in BOTH modes.
_POST_LEGACY_MODEL_KEYS = ("fused_conv",)


def _config_fingerprint(cfg: QBoldConfig, *, legacy: bool = False) -> np.uint64:
    """Stable 64-bit fingerprint of everything that determines the
    meaning/shape of the checkpointed pytrees: the model architecture
    and the scan (tau grid -> channel counts) configs, minus the
    runtime-only execution switches above.

    ``legacy=True`` keeps the runtime-only keys in the hash -- the
    fingerprint written before those keys were excluded. Restores accept
    it so checkpoints from earlier builds of THIS framework keep
    loading under an unchanged config."""
    import dataclasses
    import hashlib
    import json

    model = dataclasses.asdict(cfg.model)
    scan = dataclasses.asdict(cfg.scan)
    for k in _POST_LEGACY_MODEL_KEYS:
        model.pop(k, None)
    if not legacy:
        for k in _RUNTIME_ONLY_MODEL_KEYS:
            model.pop(k, None)
        for k in _RUNTIME_ONLY_SCAN_KEYS:
            scan.pop(k, None)
    blob = json.dumps({"model": model, "scan": scan}, sort_keys=True)
    return np.uint64(int.from_bytes(
        hashlib.sha256(blob.encode()).digest()[:8], "big"))


def _save_state(path: str, state: TrainState,
                cfg: Optional[QBoldConfig] = None,
                steps_per_epoch: int = 0) -> None:
    if jax.process_index() != 0:
        # multi-host: params/opt-state are replicated, so process 0's
        # write IS the checkpoint -- concurrent writers on a shared
        # filesystem would race on the same path (every process still
        # RESTORES, trainer._load_state)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {
        "params": state.params,
        "opt_state": state.opt_state,
        "swa": state.swa._asdict() if state.swa is not None else None,
        "step": np.asarray(state.step),
    }
    state_dict = serialization.to_state_dict(
        jax.tree_util.tree_map(np.asarray, payload))
    # metadata rides OUTSIDE the state-dict template so old readers /
    # the template restore below are unaffected
    state_dict["__meta__"] = {
        "schema": np.int32(_CKPT_SCHEMA),
        "fingerprint": (_config_fingerprint(cfg) if cfg is not None
                        else np.uint64(0)),
        "steps_per_epoch": np.int32(steps_per_epoch),
    }
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(state_dict))


def _stdout_logger(phase: str, step: int, metrics: dict) -> None:
    parts = " ".join(f"{k}={float(v):.5g}" for k, v in sorted(metrics.items()))
    print(f"[{phase} {step}] {parts}", flush=True)


class Trainer:
    """End-to-end two-phase trainer.

    Usage:
        t = Trainer(cfg)
        t.pretrain()                     # phase 1 (synthetic)
        t.finetune(train_data)           # phase 2 (real volumes, MC-ELBO)
    """

    def __init__(self, cfg: QBoldConfig, *,
                 mesh: Optional[Any] = None,
                 logger: Callable[[str, int, dict], None] = _stdout_logger,
                 wandb_run: Any = None):
        self.cfg = cfg
        self.tuner = FineTuner(cfg.model, cfg.scan,
                               full_model=cfg.train.full_model,
                               use_blood=cfg.train.use_blood)
        self.mesh = mesh
        self.logger = logger
        self.wandb_run = wandb_run
        self.key = jax.random.PRNGKey(cfg.train.seed)
        self.state: Optional[TrainState] = None
        self.status = WeightStatus.NOT_TRAINED
        self.save_dir = cfg.train.save_directory
        # last fine-tune epoch's logged metrics (incl. the ELBO
        # validation keys when study data was given) -- what a wandb
        # sweep would see as the run's final summary values
        self.last_finetune_metrics: dict = {}
        self._ft_eval_sampler = None
        self._ft_eval_fn = None
        self._pt_eval_fn = None
        self._encode_jit = None
        self._pt_params_cache = None
        self._maybe_resume()

    # ---- checkpointing -----------------------------------------------------------

    @property
    def pt_path(self) -> str:
        return os.path.join(self.save_dir, "pt_model.msgpack")

    @property
    def final_path(self) -> str:
        return os.path.join(self.save_dir, "final_model.msgpack")

    def _next_key(self):
        self.key, k = jax.random.split(self.key)
        return k

    def _template_state(self, swa: bool, optimizer) -> TrainState:
        """Build an abstract state to deserialise into."""
        params = self._init_params()
        opt_state = optimizer.init(params)
        return TrainState(params, opt_state,
                          swa_init(params) if swa else None,
                          jnp.zeros([], jnp.int32))

    def _init_params(self):
        n_taus = self.cfg.scan.n_taus
        sample = jnp.zeros((1, 4, 4, 2, n_taus), jnp.float32)
        # ONE compiled program: eager flax init costs dozens of
        # per-op roundtrips through the remote TPU tunnel (minutes of
        # wall clock on resume paths that only need a template)
        return jax.jit(self.tuner.init)(self._next_key(), sample)

    def _load_state(self, path: str, swa: bool, optimizer,
                    expect_steps_per_epoch: Optional[int] = None
                    ) -> TrainState:
        template = self._template_state(swa, optimizer)
        with open(path, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        meta = raw.pop("__meta__", None)
        if meta is not None:
            if int(meta["schema"]) > _CKPT_SCHEMA:
                raise CheckpointMismatchError(
                    f"checkpoint {path} has schema {int(meta['schema'])}, "
                    f"this build reads <= {_CKPT_SCHEMA} -- upgrade the "
                    f"framework to restore it")
            have = np.uint64(meta["fingerprint"])
            want = _config_fingerprint(self.cfg)
            # also accept the pre-runtime-key-exclusion fingerprint, so
            # checkpoints written by earlier builds still load under an
            # unchanged config
            legacy = _config_fingerprint(self.cfg, legacy=True)
            if int(have) not in (0, int(want), int(legacy)):
                raise CheckpointMismatchError(
                    f"checkpoint {path} was trained with model/scan config "
                    f"fingerprint {int(have):#018x}, the current config "
                    f"fingerprints {int(want):#018x} -- the architecture "
                    f"or tau protocol changed since it was written "
                    f"(adjust the config, or retrain)")
            saved_spe = int(meta["steps_per_epoch"])
            if (expect_steps_per_epoch is not None and saved_spe > 0
                    and saved_spe != expect_steps_per_epoch):
                raise CheckpointMismatchError(
                    f"mid-phase checkpoint {path} was written with "
                    f"{saved_spe} steps/epoch but the config now says "
                    f"{expect_steps_per_epoch} -- the resume position "
                    f"(step // steps_per_epoch) would be wrong; refusing "
                    f"to resume (delete the .partial to restart the phase)")
        payload = {
            "params": template.params,
            "opt_state": template.opt_state,
            "swa": template.swa._asdict() if template.swa is not None else None,
            "step": np.asarray(template.step),
        }
        restored = serialization.from_state_dict(payload, raw)
        swa_state = None
        if restored["swa"] is not None and template.swa is not None:
            swa_state = type(template.swa)(**restored["swa"])
        return TrainState(restored["params"], restored["opt_state"], swa_state,
                          jnp.asarray(restored["step"]))

    def pretrained_params(self):
        """Params of the PRETRAINED checkpoint when one exists on disk
        (even after fine-tuning finished) -- the encoder the reference
        predicts per-voxel priors with (train.py:26-31); None when no
        pt checkpoint was kept."""
        if self.status is WeightStatus.PRE_TRAINED:
            return self.state.params
        if not os.path.isfile(self.pt_path):
            return None
        opt = make_pretrain_optimizer(self.cfg.train)
        return self._load_state(self.pt_path, swa=self.cfg.train.use_swa,
                                optimizer=opt).params

    def _maybe_resume(self) -> None:
        """Auto-load the most advanced checkpoint
        (reference: qbold_build_model.py:45-56)."""
        if os.path.isfile(self.final_path):
            opt = make_finetune_optimizer(self.cfg.train)
            self.state = self._load_state(self.final_path, swa=False, optimizer=opt)
            self.status = WeightStatus.FULL_TRAINED
        elif os.path.isfile(self.pt_path):
            opt = make_pretrain_optimizer(self.cfg.train)
            self.state = self._load_state(
                self.pt_path, swa=self.cfg.train.use_swa, optimizer=opt)
            self.status = WeightStatus.PRE_TRAINED

    # ---- mid-phase crash recovery --------------------------------------------------
    #
    # The reference resumes only at phase granularity (a finished
    # pt_model/final_model file skips the whole phase,
    # train.py:193-202,260-263); with checkpoint_every_epochs > 0 a
    # ``<phase>.partial`` full-pytree checkpoint is additionally written
    # every N epochs, so a crashed/preempted run continues from the last
    # completed epoch instead of restarting the phase. Epoch position is
    # derived from the saved step counter (steps per epoch are static);
    # the host PRNG key sequence restarts on resume -- distributionally
    # equivalent, documented.

    @staticmethod
    def _partial_path(final_path: str) -> str:
        return final_path + ".partial"

    def _phase_start(self, final_path: str, *, swa: bool, optimizer,
                     steps_per_epoch: int):
        """(state | None, start_epoch) -- loads a mid-phase checkpoint
        when one exists."""
        partial = self._partial_path(final_path)
        if self.cfg.train.checkpoint_every_epochs <= 0 or \
                not os.path.isfile(partial):
            return None, 0
        state = self._load_state(partial, swa=swa, optimizer=optimizer,
                                 expect_steps_per_epoch=steps_per_epoch)
        start_epoch = int(state.step) // max(1, steps_per_epoch)
        return state, start_epoch

    def _phase_checkpoint(self, final_path: str, state: TrainState,
                          epoch: int, steps_per_epoch: int = 0) -> None:
        k = self.cfg.train.checkpoint_every_epochs
        if k > 0 and (epoch + 1) % k == 0:
            _save_state(self._partial_path(final_path), state,
                        cfg=self.cfg, steps_per_epoch=steps_per_epoch)

    def _phase_done(self, final_path: str) -> None:
        partial = self._partial_path(final_path)
        if os.path.isfile(partial):
            os.remove(partial)

    def _put_eval_batch(self, batch: dict) -> dict:
        """Device-put a batch for the (jitted, non-shard_map) step/eval
        fns: sharded over the mesh when the leading dim divides it,
        replicated otherwise (small batches -- replication costs nothing,
        keeps shapes static, and psum-mean of identical per-device grads
        equals the single-device gradient)."""
        if self.mesh is None:
            return batch
        lead = next(iter(batch.values())).shape[0]
        if lead % self.mesh.devices.size == 0:
            return pmesh.shard_batch(self.mesh, batch)
        return pmesh.replicate(self.mesh, batch)

    # ---- logging -----------------------------------------------------------------

    # Diagnostic metrics the NaN tripwire ignores: the learned
    # inverse-gamma hyperprior is logged as exp(raw) in fp32, which
    # saturates to inf for raw > ~88.7 -- an extreme-but-loggable
    # hyperprior, not a diverged run (the reference logs it the same way
    # and only tripwires the LOSS, train.py:395-413,423; true divergence
    # still surfaces through val_loss, which prices these params).
    _TRIPWIRE_EXEMPT = frozenset(
        {"oef_alpha", "oef_beta", "dbv_alpha", "dbv_beta"})

    def _log(self, phase: str, step: int, metrics: dict) -> None:
        metrics = {k: float(v) for k, v in metrics.items()}
        if jax.process_index() == 0:
            # multi-host: metrics are replicated -- one process reports
            # (duplicate wandb.log calls would double every curve)
            self.logger(phase, step, metrics)
            if self.wandb_run is not None:
                self.wandb_run.log(metrics)
        # the NaN tripwire runs on EVERY process (replicated metrics ->
        # all processes raise together instead of one hanging the
        # collective)
        if not all(np.isfinite(v) for k, v in metrics.items()
                   if k not in self._TRIPWIRE_EXEMPT):
            raise NaNLossError(f"non-finite metrics at {phase} step {step}: "
                               f"{metrics}")

    # ---- pretraining data ----------------------------------------------------------

    def build_pretrain_data(self, synthetic: Optional[tuple] = None):
        """(train_set | None, (vx, vy)): the synthetic training split
        (None when streaming -- batches are generated on device) and the
        held-out validation split.

        Derived from a FIXED fold of the config seed, not the trainer's
        rolling key chain, so a fresh run, a mid-phase resume, and an
        external evaluation (sweep._pretrain_val_metrics) all see the
        SAME validation set -- otherwise resumed sweep trials would be
        ranked on a different set than fresh ones.
        """
        cfg = self.cfg
        data_key = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed),
                                      0x5EED)
        streaming = cfg.train.pt_on_device_synth and synthetic is None
        if streaming:
            # Validation uses a small fixed host set; training draws
            # fresh batches on device. Host-CPU generation: a fixed set
            # through the accelerator backend costs a ~190 s remote
            # compile on tunneled TPUs for seconds of compute (synth.py).
            return None, pretrain_val_fold(cfg)
        if synthetic is None:
            x, y = create_synthetic_dataset_host(
                data_key, cfg.scan, cfg.synth,
                full_model=cfg.train.full_model,
                use_blood=cfg.train.use_blood,
                quad_rule=cfg.model.quad_rule)
        else:
            x, y = synthetic
        train, val = data_pipe.split_synthetic(x, y)
        return train, val

    def _clip_val_batch(self, vx, vy) -> dict:
        """Bound the per-epoch eval batch (~4k voxels) and place it for
        the mesh (shard when divisible, replicate otherwise)."""
        n_val = val_batch_count(len(vx), int(np.prod(vx.shape[1:4])))
        if self.mesh is not None:
            n_dev = self.mesh.devices.size
            n_val = max(n_val // n_dev * n_dev, min(len(vx), n_dev))
        return self._put_eval_batch({"x": vx[:n_val], "y": vy[:n_val]})

    def _pretrain_eval_fn(self):
        """One jitted pretrain-eval program per Trainer (same rationale
        as _finetune_eval_fn: remote compiles cost minutes and the
        client-side compile cache does not engage through the tunnel --
        pretrain() and every sweep trial's pretrain_val_metrics must
        share one compile)."""
        if self._pt_eval_fn is None:
            self._pt_eval_fn = make_pretrain_eval(self.tuner, self.cfg)
        return self._pt_eval_fn

    def pretrain_val_metrics(self, synthetic: Optional[tuple] = None, *,
                             fold: bool = False) -> dict:
        """Held-out synthetic validation metrics for the CURRENT state --
        the same eval (same set, same clipping) pretrain() runs per
        epoch; usable on a resumed/loaded state without retraining.

        ``fold=True`` evaluates on the FIXED seed-fold validation set
        (pretrain_val_fold) regardless of training mode. Sweep trials
        rank on this: the per-epoch validation set differs between the
        streaming and host-dataset pretrain modes (the fold vs the 90/10
        split of the full synthetic set), so without it a serial trial
        and a vmapped population trial would be ranked on different
        data."""
        if self.state is None:
            raise RuntimeError("no trained state to evaluate")
        if fold and synthetic is None:
            vx, vy = pretrain_val_fold(self.cfg)
        else:
            _, (vx, vy) = self.build_pretrain_data(synthetic)
        eval_fn = self._pretrain_eval_fn()
        m = eval_fn(self.state.params, jax.random.PRNGKey(0),
                    self._clip_val_batch(vx, vy))
        return {k: float(v) for k, v in m.items()}

    # ---- phase 1: synthetic pretraining -------------------------------------------

    def pretrain(self, synthetic: Optional[tuple] = None) -> TrainState:
        """Pretrain on synthetic voxels (reference: train.py:379-427).

        synthetic: optional (x, y) arrays; generated from the config's
        physics when omitted (reference: train.py:419-420).
        """
        cfg = self.cfg
        if self.status.value >= WeightStatus.PRE_TRAINED.value:
            return self.state

        # Streaming generation works on one device AND under a mesh: the
        # sharded variant has every device generate its own sub-batch
        # locally (steps.make_pretrain_stream_step_sharded), so the mesh
        # path keeps the zero-host-transfer property.
        streaming = cfg.train.pt_on_device_synth and synthetic is None
        train_set, (vx, vy) = self.build_pretrain_data(synthetic)
        if streaming:
            vol = 500  # pseudo-volume voxels (10*10*5)
            steps_per_epoch = max(1, round(
                0.9 * cfg.synth.sample_size**2 / vol / cfg.train.pt_batch_size))
        else:
            tx, ty = train_set
            steps_per_epoch = max(1, len(tx) // cfg.train.pt_batch_size)

        optimizer = make_pretrain_optimizer(cfg.train)
        state, start_epoch = self._phase_start(
            self.pt_path, swa=cfg.train.use_swa, optimizer=optimizer,
            steps_per_epoch=steps_per_epoch)
        if state is None:
            params = self._init_params()
            state = TrainState(params, optimizer.init(params),
                               swa_init(params) if cfg.train.use_swa else None,
                               jnp.zeros([], jnp.int32))
        if self.mesh is not None:
            state = pmesh.replicate(self.mesh, state)

        step_fn = make_pretrain_step(self.tuner, cfg, optimizer)
        stream_epoch_fn = None
        if streaming:
            # whole-epoch scan: ONE dispatch per epoch (round-1 measured
            # the streaming phase wall-dominated by per-step dispatch
            # through the remote link)
            stream_epoch_fn = make_pretrain_stream_epoch(
                self.tuner, cfg, optimizer, steps_per_epoch, mesh=self.mesh)
        eval_fn = self._pretrain_eval_fn()
        rng = np.random.default_rng(cfg.train.seed)
        val_batch = self._clip_val_batch(vx, vy)

        for epoch in range(start_epoch, cfg.train.no_pt_epochs):
            t0 = time.time()
            if streaming:
                state, m = stream_epoch_fn(state, self._next_key())
                losses = [m["loss"]]
            else:
                losses = []
                for batch in data_pipe.synthetic_batches(
                        rng, tx, ty, cfg.train.pt_batch_size):
                    batch = self._put_eval_batch(batch)
                    state, m = step_fn(state, self._next_key(), batch)
                    losses.append(m["loss"])
            # (inverse-gamma hyperprior metrics, when configured, come
            # back inside eval_fn's jitted program -- steps.py)
            metrics = dict(eval_fn(state.params, self._next_key(),
                                   val_batch))
            # float() forces device sync so the timing is honest
            metrics["loss"] = float(jnp.mean(jnp.concatenate(
                [jnp.atleast_1d(x) for x in losses])))
            metrics["epoch_time_s"] = time.time() - t0
            # NB checkpoint only AFTER the NaN tripwire in _log: a
            # diverged state must never reach the .partial file, or every
            # resume would reload it and re-crash.
            self._log("pretrain", epoch, metrics)
            self._phase_checkpoint(self.pt_path, state, epoch,
                                   steps_per_epoch)

        # SWA adoption is opt-in (cfg.train.swa_adopt): the reference
        # builds the tfa SWA wrapper but never calls assign_average_vars
        # (train.py:382-385), so its averaged weights are never applied;
        # the default False reproduces that executed behaviour.
        if (cfg.train.swa_adopt and state.swa is not None
                and int(state.swa.n_avg) > 0):
            state = state._replace(params=state.swa.average)

        self.state = state
        self.status = WeightStatus.PRE_TRAINED
        _save_state(self.pt_path, state, cfg=self.cfg)
        self._phase_done(self.pt_path)
        return state

    # ---- phase 2: real-data fine-tuning -------------------------------------------

    def _shared_encode_jit(self):
        """The ONE compiled (params, images) encoder program, built
        lazily and shared by every caller that binds params -- a fresh
        closure per call would discard the jit cache and pay a
        minutes-long remote recompile on every use (priors for
        train/study/export are all predicted through this)."""
        if self._encode_jit is None:
            tuner = self.tuner
            self._encode_jit = jax.jit(
                lambda p, images: tuner.encode(p, images))
        return self._encode_jit

    def _encode_fn(self):
        """Jitted encoder pass bound to the CURRENT params."""
        enc, params = self._shared_encode_jit(), self.state.params
        return lambda images: enc(params, images)

    def pretrained_encode_fn(self):
        """Jitted encoder pass bound to the PRETRAINED checkpoint's
        params (the encoder the reference predicts per-voxel priors
        with, train.py:26-31); None when no pt checkpoint exists.
        Shares _encode_fn's compiled (params, images) program -- params
        enter as an argument -- and caches the loaded pt pytree, so a
        long-lived process (cli.cmd_serve) neither re-reads the
        checkpoint nor recompiles per request."""
        if self._pt_params_cache is None:
            self._pt_params_cache = self.pretrained_params()
            if self._pt_params_cache is None:
                return None
        enc, params = self._shared_encode_jit(), self._pt_params_cache
        return lambda images: enc(params, images)

    def prepare_real(self, train_data: np.ndarray, *, blank_crop: bool = True):
        """Blank-crop + predict priors -> RealCropSampler
        (reference: train.py:17-72)."""
        if blank_crop:
            train_data = data_pipe.blank_crop(train_data)
        k = 5 if self.cfg.model.use_mvg else 4
        priors = data_pipe.predict_priors(self._encode_fn(), train_data, k)
        return data_pipe.RealCropSampler(
            train_data, priors, self.cfg.train.crop_size,
            rng=np.random.default_rng(self.cfg.train.seed))

    # Replicated volume+prior footprint above which "auto" switches the
    # sharded fine-tune epoch to subject-sharded residency. ~1 GiB: at
    # the published scale the stack is a few MB and replication is free
    # (and keeps the bit-identical-epoch property on equal shards); a
    # cohort whose stack approaches the 16 GiB/chip HBM budget must
    # shard or it cannot train at all. Memory per device when sharded:
    # ceil(S/n_dev) subjects' volumes + priors (documented bound,
    # steps.make_finetune_epoch_subject_sharded).
    SHARD_SUBJECTS_AUTO_BYTES: int = 1 << 30

    def _shard_subjects(self, sampler) -> bool:
        """Resolve cfg.train.ft_shard_subjects (auto|on|off) for this
        mesh + cohort. Unknown values raise (config strictness)."""
        from ..config import normalize_mode

        mode = normalize_mode(self.cfg.train.ft_shard_subjects,
                              ("auto", "on", "off"), "ft_shard_subjects")
        if mode != "auto":
            return mode == "on"
        nbytes = (np.asarray(sampler.data).nbytes
                  + np.asarray(sampler.priors).nbytes)
        return nbytes > self.SHARD_SUBJECTS_AUTO_BYTES

    def finetune(self, train_data: np.ndarray,
                 study_data: Optional[np.ndarray] = None) -> TrainState:
        """Fine-tune with the MC-ELBO on real volumes
        (reference: train.py:285-376).

        train_data: (S, X, Y, Z, n_taus+1) with trailing mask channel.
        study_data: optional held-out set for the ELBO validation callback
        (reference: train.py:325-359).
        """
        cfg = self.cfg
        if self.status is WeightStatus.FULL_TRAINED:
            return self.state
        if self.status is WeightStatus.NOT_TRAINED:
            raise RuntimeError("pretrain() must run before finetune()")

        sampler = self.prepare_real(train_data)
        eval_sampler = None
        if study_data is not None:
            eval_sampler = self._study_eval_sampler(study_data)

        optimizer = make_finetune_optimizer(cfg.train)
        state, start_epoch = self._phase_start(
            self.final_path, swa=False, optimizer=optimizer,
            steps_per_epoch=cfg.train.ft_steps_per_epoch)
        if state is None:
            params = self.state.params
            if cfg.model.use_population_prior and "pop_prior" not in params:
                params = dict(params)
                params.update({k: v for k, v in self._init_params().items()
                               if k != "encoder"})
            state = TrainState(params, optimizer.init(params), None,
                               jnp.zeros([], jnp.int32))
        if self.mesh is not None:
            state = pmesh.replicate(self.mesh, state)

        eval_fn = self._finetune_eval_fn()
        # Volumes + priors stay resident on device (uploaded once, a few
        # MB); crops are dynamic_slices inside the epoch scan -- no
        # per-epoch host transfer on either path. Under a mesh each device
        # samples its own sub-batch of crops and grads are pmean-reduced
        # (steps.make_finetune_epoch_sharded); the round-1 host-stacked
        # mesh pipeline (~0.8 GB/epoch) is gone.
        if self.mesh is None:
            epoch_fn = make_finetune_epoch_on_device(
                self.tuner, cfg, optimizer, cfg.train.ft_steps_per_epoch)
            dev_volumes = jnp.asarray(sampler.data)
            dev_priors = jnp.asarray(sampler.priors)
        elif self._shard_subjects(sampler):
            # Subject-sharded residency: each device holds ONLY its
            # ceil(S/n) subject rows of the (zero-padded) stack and
            # samples crops from local live subjects -- 1/n the HBM
            # footprint of replication, same exact global batch
            # (steps.make_finetune_epoch_subject_sharded).
            n_subj = sampler.data.shape[0]
            epoch_fn = make_finetune_epoch_subject_sharded(
                self.tuner, cfg, optimizer, cfg.train.ft_steps_per_epoch,
                self.mesh, n_subj)
            s_pad, _, _, _ = _subject_shard_counts(
                n_subj, self.mesh.devices.size, cfg.train.ft_batch_size)

            def pad_subjects(x):
                out = np.zeros((s_pad,) + x.shape[1:], np.float32)
                out[:n_subj] = x
                return out

            sharded = pmesh.shard_batch(self.mesh, {
                "volumes": pad_subjects(np.asarray(sampler.data)),
                "priors": pad_subjects(np.asarray(sampler.priors))})
            dev_volumes, dev_priors = sharded["volumes"], sharded["priors"]
        else:
            epoch_fn = make_finetune_epoch_sharded(
                self.tuner, cfg, optimizer, cfg.train.ft_steps_per_epoch,
                self.mesh)
            dev_volumes = pmesh.replicate(self.mesh,
                                          jnp.asarray(sampler.data))
            dev_priors = pmesh.replicate(self.mesh,
                                         jnp.asarray(sampler.priors))

        for epoch in range(start_epoch, cfg.train.no_ft_epochs):
            t0 = time.time()
            state, m = epoch_fn(state, self._next_key(),
                                dev_volumes, dev_priors)
            # ONE device_get of the whole (T,)-per-term aux dict: it
            # forces device sync (honest timing) and surfaces the
            # per-term training curves the reference's Keras fit +
            # WandbCallback logs every epoch (train.py:313-320,370-375)
            # -- nll/kl/smoothness/sigma were previously computed in the
            # epoch scan and then discarded. Per-key float() fetches
            # would cost a ~35-40 ms tunnel round-trip EACH.
            host_m = jax.device_get(m)
            metrics = {"loss": float(np.mean(host_m["loss"])),
                       "epoch_time_s": time.time() - t0}
            for term in ("nll", "kl", "smoothness", "sigma"):
                if term in host_m:
                    metrics[term] = float(np.mean(host_m[term]))
            if eval_sampler is not None:
                metrics.update(self._elbo_eval(eval_fn, eval_sampler,
                                               state.params))
            # checkpoint only AFTER the NaN tripwire (see pretrain)
            self._log("finetune", epoch, metrics)
            self.last_finetune_metrics = dict(metrics)
            self._phase_checkpoint(self.final_path, state, epoch,
                                   cfg.train.ft_steps_per_epoch)

        self.state = state
        self.status = WeightStatus.FULL_TRAINED
        _save_state(self.final_path, state, cfg=self.cfg)
        self._phase_done(self.final_path)
        return state

    # ---- ELBO validation (reference train.py:325-359) -------------------------------

    def _finetune_eval_fn(self):
        """One jitted ELBO-eval program per Trainer: rebuilding it per
        call would re-trace and re-compile the identical program (remote
        TPU compiles run minutes and the client-side compile cache does
        not engage through the tunnel)."""
        if self._ft_eval_fn is None:
            self._ft_eval_fn = make_finetune_eval(self.tuner, self.cfg)
        return self._ft_eval_fn

    def _study_eval_sampler(self, study_data: np.ndarray):
        """Held-out study crops with per-voxel priors from the CURRENT
        encoder (called before fine-tuning starts, so these are the
        pretrained-model priors the reference callback evaluates against,
        train.py:26-31,223-238)."""
        sd = np.float32(study_data)
        k = 5 if self.cfg.model.use_mvg else 4
        priors = data_pipe.predict_priors(self._encode_fn(), sd, k)
        self._ft_eval_sampler = data_pipe.RealCropSampler(
            sd, priors, 76, rng=np.random.default_rng(0))
        return self._ft_eval_sampler

    def _elbo_eval(self, eval_fn, eval_sampler, params,
                   batches: int = 4) -> dict:
        """Mean val_nll/val_kl/val_smoothness/val_elbo over up to
        ``batches`` study batches (reference train.py:333: 4 batches)."""
        vals = []
        for i, vb in enumerate(eval_sampler.eval_batches(
                self.cfg.train.eval_batch_size)):
            if i >= batches:
                break
            vb = self._put_eval_batch(vb)
            vals.append(eval_fn(params, self._next_key(), vb))
        if not vals:
            return {}
        return {k: jnp.mean(jnp.stack([v[k] for v in vals]))
                for k in vals[0]}

    def finetune_val_metrics(self, study_data: Optional[np.ndarray] = None,
                             batches: int = 4) -> dict:
        """One authoritative ELBO validation pass on held-out study data
        with the current weights -- the reference sweep's ranking metric
        (``val_elbo``; sweep_prior.yaml:3-5 minimises what the ELBO
        callback logs, train.py:325-359).

        Reuses the sampler built when ``finetune(study_data=...)`` ran in
        this process (priors from the PRETRAINED encoder, exactly what
        the per-epoch callback saw); otherwise ``study_data`` must be
        given and priors come from the current encoder (documented
        deviation -- only reachable when fine-tuning was resumed from a
        finished checkpoint, where the reference would re-run nothing and
        report nothing at all)."""
        if self.state is None:
            raise RuntimeError("no trained weights to evaluate")
        sampler = self._ft_eval_sampler
        if sampler is None:
            if study_data is None:
                raise ValueError("no stored eval sampler: pass study_data")
            sampler = self._study_eval_sampler(study_data)
        return self._elbo_eval(self._finetune_eval_fn(), sampler,
                               self.state.params, batches=batches)

    # ---- population statistics -----------------------------------------------------

    def estimate_population_param_distribution(self, data: np.ndarray) -> dict:
        """Masked population mean/std of predicted logit-means, for prior
        initialisation (reference: model.py:756-770)."""
        encode = self._encode_fn()
        mask = data[..., -1:]
        q, _, _ = encode(jnp.asarray(data[..., :-1] * mask))
        mask = jnp.asarray(mask)
        n = jnp.sum(mask)
        out = {}
        for name, idx in (("oef", 0), ("dbv", 2)):
            ch = q[..., idx:idx + 1] * mask
            mean = jnp.sum(ch) / n
            std = jnp.sqrt(jnp.sum(jnp.square(ch - mean) * mask) / n)
            out[f"mean_{name}"] = float(mean)
            out[f"log_std_{name}"] = float(
                self.tuner.dist.inv_transform_std(jnp.log(std)))
        return out
