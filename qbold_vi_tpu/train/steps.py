"""Jitted train/eval steps for both phases.

The reference drives training through Keras ``model.fit`` with loss/metric
closures (reference: train.py:370-423). Here each phase is one pure,
donate-able jitted step over an explicit ``TrainState`` pytree; under a
data-parallel mesh (parallel/mesh.py) XLA inserts the psum gradient
reductions automatically.

Loss wiring (reference: train.py:313-320):
    total = fine_tune_nll + kl * kl_weight + smoothness * smoothness_weight
Note the reference parses ``kl_weight`` but multiplies the KL by a fixed
non-trainable 1.0 instead (train.py:118,313-320 -- documented quirk); we
wire ``kl_weight`` for real, with default 1.0 preserving reference
behaviour.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import QBoldConfig
from ..models.vi import FineTuner
from . import losses
from .optim import SWAState, swa_update

__all__ = ["TrainState", "make_pretrain_step", "make_finetune_step",
           "make_pretrain_eval", "make_finetune_eval", "posterior_mse_metrics",
           "sample_crop_batch", "stream_synthetic_batch",
           "make_finetune_epoch_on_device", "make_finetune_epoch",
           "make_finetune_epoch_sharded", "make_pretrain_stream_step", "make_pretrain_stream_epoch",
           "make_pretrain_stream_step_sharded",
           "make_finetune_epoch_subject_sharded"]


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    swa: Optional[SWAState]
    step: jax.Array


def posterior_mse_metrics(key, tuner: FineTuner, q, y_true, no_samples: int = 20):
    """OEF/DBV/R2' MSE of MC posterior means vs truth
    (reference: model.py:326-374 calculate_means + oef_dbv_metrics)."""
    dist = tuner.dist
    samples = dist.sample_many(key, q, tuner.cfg.use_mvg, no_samples)  # (S,...,2)
    means = jnp.mean(samples, axis=0).reshape((-1, 2))
    dw_coeff = tuner.scan.dw_coeff * tuner.scan.hct
    r2p = jnp.mean(dw_coeff * samples[..., 0] * samples[..., 1], axis=0).reshape((-1,))
    y = y_true.reshape((-1, 3))
    return {
        "oef_mse": jnp.mean(jnp.square(means[:, 0] - y[:, 0])),
        "dbv_mse": jnp.mean(jnp.square(means[:, 1] - y[:, 1])),
        "r2p_mse": jnp.mean(jnp.square(r2p - y[:, 2])),
    }


def _pretrain_loss(params, key, batch, tuner: FineTuner, cfg: QBoldConfig,
                   live=None, axis_name=None, train: bool = True):
    """``live``/``axis_name``: pad-and-mask support for sharded streams
    whose global batch does not divide the mesh -- ``live`` flags the
    device's real volumes (dead slots weigh zero), and the mean is taken
    over the psum'd live-voxel count so per-device losses SUM to the
    exact global mean (callers then psum loss and grads).

    ``train``: dropout active. Validation passes train=False (Keras
    ``fit(validation_data=...)`` evaluates with training=False upstream,
    so the reference's val_loss never sees dropout)."""
    x, y = batch["x"], batch["y"]
    key, k_drop = jax.random.split(key)
    out1, _, _ = tuner.encode(
        params, x,
        dropout_key=k_drop if (train and cfg.model.dropout_rate > 0.0)
        else None)
    rows_or_mean = losses.synthetic_data_loss(
        key, tuner.dist, cfg.model, cfg.scan, y, out1,
        use_r2p_loss=cfg.train.use_r2p_loss,
        inv_gamma_alpha=cfg.train.inv_gamma_alpha,
        inv_gamma_beta=cfg.train.inv_gamma_beta,
        return_mean=live is None,
    )
    if live is None:
        return rows_or_mean
    b = x.shape[0]
    n_per_vol = rows_or_mean.shape[0] // b
    num = jnp.sum(jnp.sum(rows_or_mean.reshape(b, n_per_vol), axis=1) * live)
    den = jnp.sum(live) * n_per_vol
    if axis_name is not None:
        den = jax.lax.psum(den, axis_name)
    return num / den


def make_pretrain_step(tuner: FineTuner, cfg: QBoldConfig,
                       optimizer: optax.GradientTransformation):
    """Returns jitted (state, key, batch{x,y}) -> (state, metrics)."""

    def step(state: TrainState, key, batch):
        loss, grads = jax.value_and_grad(_pretrain_loss)(
            state.params, key, batch, tuner, cfg)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        swa = state.swa
        if swa is not None:
            swa = swa_update(swa, params, cfg.train.swa_start, cfg.train.swa_period)
        return (TrainState(params, opt_state, swa, state.step + 1),
                {"loss": loss})

    return jax.jit(step, donate_argnums=(0,))


def sample_crop_batch(key, volumes, priors, b: int, crop_size: int,
                      n_subjects=None):
    """Draw a b-crop fine-tune batch from device-resident volumes with
    jax.random + dynamic_slice (uniform subjects with replacement,
    uniform in-plane windows -- distributionally identical to
    data.RealCropSampler, reference train.py:35-68).

    volumes: (S, X, Y, Z, n_taus+1) with trailing mask channel;
    priors:  (S, X, Y, Z, 4|5). Returns {images, mask, priors}.

    ``n_subjects``: restrict subject draws to the first ``n_subjects``
    rows (may be traced -- the subject-sharded epoch passes its device's
    LIVE subject count so pad subjects are never sampled; clamped to 1
    so zero-subject devices still execute, their crops being dead-masked
    by the caller)."""
    s_n, x_n, y_n, z_n, c_n = volumes.shape
    cx = min(crop_size, x_n)
    cy = min(crop_size, y_n)
    k_p = priors.shape[-1]
    k_s, k_x, k_y = jax.random.split(key, 3)
    hi = s_n if n_subjects is None else jnp.maximum(n_subjects, 1)
    si = jax.random.randint(k_s, (b,), 0, hi)
    xi = jax.random.randint(k_x, (b,), 0, x_n - cx + 1)
    yi = jax.random.randint(k_y, (b,), 0, y_n - cy + 1)

    def take(arr, si, xi, yi, c):
        return jax.lax.dynamic_slice(
            arr[si], (xi, yi, 0, 0), (cx, cy, z_n, c))

    windows = jax.vmap(take, (None, 0, 0, 0, None))(volumes, si, xi, yi, c_n)
    mask = windows[..., -1:]
    return {
        "images": windows[..., :-1] * mask,
        "mask": mask,
        "priors": jax.vmap(take, (None, 0, 0, 0, None))(
            priors, si, xi, yi, k_p),
    }


def make_finetune_epoch_on_device(tuner: FineTuner, cfg: QBoldConfig,
                                  optimizer: optax.GradientTransformation,
                                  n_steps: int):
    """Whole-epoch fine-tune dispatch with ON-DEVICE random cropping.

    The full (S, X, Y, Z, n_taus+1) volume stack and its prior maps are
    uploaded ONCE (a few MB); every scan step draws (subject, x0, y0)
    with jax.random and extracts the 38-crop batch with dynamic_slice --
    no per-epoch host crop assembly or transfer (the host-stacked path
    ships ~0.8 GB/epoch at the published sizes).

    Returns jitted (state, key, volumes, priors) -> (state, metrics).
    """
    b = cfg.train.ft_batch_size

    def loss_fn(params, key, batch):
        return _finetune_terms(params, key, batch, tuner, cfg)

    def epoch(state: TrainState, key, volumes, priors):
        keys = jax.random.split(key, n_steps)

        def body(state, k):
            k_crop, k_step = jax.random.split(k)
            batch = sample_crop_batch(k_crop, volumes, priors, b,
                                      cfg.train.crop_size)
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, k_step, batch)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            aux["loss"] = loss
            return (TrainState(params, opt_state, state.swa, state.step + 1),
                    aux)

        return jax.lax.scan(body, state, keys)

    return jax.jit(epoch, donate_argnums=_finetune_donate(tuner, cfg))


def _device_crop_counts(b_global: int, n_dev: int):
    """(b_local, counts): every device samples ``b_local = ceil(b/n)``
    crop SLOTS (static shape, same SPMD program) but only its first
    ``counts[d] = b//n + (d < b%n)`` are live -- counts sum to exactly
    ``b_global``, so the published global batch (38, reference
    train.py:68) is preserved on ANY mesh size via pad-and-mask instead
    of being silently rounded to a multiple of the mesh."""
    b_local = -(-b_global // n_dev)
    return b_local, (b_global // n_dev, b_global % n_dev)


def make_finetune_epoch_sharded(tuner: FineTuner, cfg: QBoldConfig,
                                optimizer: optax.GradientTransformation,
                                n_steps: int, mesh):
    """Mesh-parallel whole-epoch fine-tune with PER-DEVICE on-device
    crop sampling -- the multi-chip path with zero per-step host traffic.

    Everything (params, optimiser state, the volume stack, priors) is
    replicated -- the stack is a few MB and the model ~10k params, so
    replication is free and the only collective needed is the gradient
    reduction. Each device folds its mesh position into the step key and
    samples ``ceil(ft_batch_size / n_devices)`` crop slots locally
    (sample_crop_batch), of which only its _device_crop_counts share is
    live (dead slots get a zeroed mask) -- the global step is therefore
    EXACTLY the published ft_batch_size crops on any mesh size. Each
    device's loss is rescaled to its mask share of the global masked
    mean (_finetune_terms axis_name), grads and metrics are
    ``psum``-reduced over ICI (summing exact global gradients), every
    device applies the identical update, and params stay replicated
    bit-exactly. Replaces the round-2 behaviour that silently changed
    batch 38 into 4*8=32 on 8 devices.

    Returns jitted (state, key, volumes, priors) -> (state, metrics),
    with state/volumes/priors device_put replicated over ``mesh``.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.devices.size
    b_local, (c_base, c_rem) = _device_crop_counts(
        cfg.train.ft_batch_size, n_dev)

    def loss_fn(params, key, batch):
        return _finetune_terms(params, key, batch, tuner, cfg,
                               axis_name=DATA_AXIS)

    def local_epoch(state: TrainState, key, volumes, priors):
        # Per-device stream: fold the mesh position into the epoch key so
        # devices draw disjoint crops (and disjoint ELBO sample noise).
        d = jax.lax.axis_index(DATA_AXIS)
        live = (jnp.arange(b_local) < c_base + (d < c_rem)).astype(
            jnp.float32)
        key = jax.random.fold_in(key, d)
        keys = jax.random.split(key, n_steps)

        def body(state, k):
            k_crop, k_step = jax.random.split(k)
            batch = sample_crop_batch(k_crop, volumes, priors, b_local,
                                      cfg.train.crop_size)
            batch = dict(batch, live=live,
                         mask=batch["mask"] * live[:, None, None, None, None])
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, k_step, batch)
            grads = jax.lax.psum(grads, DATA_AXIS)
            # every aux entry is a global-sum contribution after the
            # axis_name rescaling (sigma carries a 1/n_dev factor), so
            # one psum recovers the exact global metrics
            aux["loss"] = loss
            aux = jax.lax.psum(aux, DATA_AXIS)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params, opt_state, state.swa, state.step + 1),
                    aux)

        return jax.lax.scan(body, state, keys)

    fn = shard_map(local_epoch, mesh=mesh,
                   in_specs=(P(), P(), P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn, donate_argnums=_finetune_donate(tuner, cfg))


def _subject_shard_counts(n_subjects: int, n_dev: int, b_global: int):
    """Static layout of the subject-sharded fine-tune epoch.

    Subjects pad to ``s_pad = chunk*n`` rows (``chunk = ceil(S/n)``) so
    the stack shards evenly. jax shards the leading axis CONTIGUOUSLY
    in chunk-sized blocks, so device d's local shard holds rows
    ``[d*chunk, (d+1)*chunk)`` of the padded stack and its LIVE subject
    count is ``subj[d] = clamp(S - d*chunk, 0, chunk)`` -- full chunks
    up front, one partial chunk, zeros after (NOT the round-robin
    ``S//n + (d < S%n)`` split, which would skip real subjects on
    full-chunk devices and sample pad rows on the partial one whenever
    S > n and S % n != 0). The global batch of ``b_global`` crops is
    apportioned to devices proportionally to their live subject counts
    by largest remainder (deterministic, ties to the lower device
    index), so counts sum EXACTLY to b_global and each crop's subject
    marginal is uniform over all S subjects up to the <1-crop-per-device
    apportionment rounding (exact whenever b_global*subj[d]/S is
    integral -- e.g. equal shards). Returns (s_pad, subj, crops,
    b_local) with b_local = max(crops) slot count (pad slots are
    dead-masked, the pad-and-mask mechanism of _device_crop_counts)."""
    chunk = -(-n_subjects // n_dev)
    s_pad = chunk * n_dev
    subj = [min(max(n_subjects - d * chunk, 0), chunk)
            for d in range(n_dev)]
    quota = [b_global * s / n_subjects for s in subj]
    crops = [int(q) for q in quota]
    short = b_global - sum(crops)
    order = sorted(range(n_dev), key=lambda d: (crops[d] - quota[d], d))
    for d in order[:short]:
        crops[d] += 1
    assert sum(crops) == b_global
    return s_pad, subj, crops, max(max(crops), 1)


def make_finetune_epoch_subject_sharded(tuner: FineTuner, cfg: QBoldConfig,
                                        optimizer, n_steps: int, mesh,
                                        n_subjects: int):
    """Mesh-parallel whole-epoch fine-tune where each device holds ONLY
    its subject shard of the volume stack -- the training-data residency
    story for cohorts that outgrow one device's HBM (round-4 verdict #3;
    inference already shards subjects, infer.posterior_maps_sharded).

    Params/optimiser state replicate as in make_finetune_epoch_sharded
    (the model is ~10k params); volumes and priors arrive sharded on the
    subject axis (``parallel.mesh.shard_batch`` of the s_pad-padded
    stack). Each device samples its _subject_shard_counts crop share
    from its LIVE local subjects only (pad subjects are unreachable by
    construction), dead crop slots carry a zeroed mask, and the
    axis_name-rescaled loss + psum reduction reproduce the exact global
    masked-mean semantics of the replicated path. With equal shards and
    a proportional batch the two paths are BIT-identical on identical
    data (gated in tests/test_train.py); in general the subject marginal
    matches the replicated path's uniform draw up to <1 crop/device of
    apportionment rounding.

    Memory bound per device: ``ceil(S/n)*X*Y*Z*(n_taus+1+K)*4`` bytes of
    volume+prior residency -- 1/n of the replicated path's, the whole
    point. Returns jitted (state, key, volumes_sharded, priors_sharded)
    -> (state, metrics); reference semantics scaled:
    /root/reference/train.py:35-68.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.devices.size
    _, subj, crops, b_local = _subject_shard_counts(
        n_subjects, n_dev, cfg.train.ft_batch_size)
    subj_c = jnp.asarray(subj, jnp.int32)
    crops_c = jnp.asarray(crops, jnp.int32)

    def loss_fn(params, key, batch):
        return _finetune_terms(params, key, batch, tuner, cfg,
                               axis_name=DATA_AXIS)

    def local_epoch(state: TrainState, key, volumes, priors):
        d = jax.lax.axis_index(DATA_AXIS)
        s_d = jnp.take(subj_c, d)
        live = (jnp.arange(b_local) < jnp.take(crops_c, d)).astype(
            jnp.float32)
        key = jax.random.fold_in(key, d)
        keys = jax.random.split(key, n_steps)

        def body(state, k):
            k_crop, k_step = jax.random.split(k)
            batch = sample_crop_batch(k_crop, volumes, priors, b_local,
                                      cfg.train.crop_size, n_subjects=s_d)
            batch = dict(batch, live=live,
                         mask=batch["mask"] * live[:, None, None, None, None])
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, k_step, batch)
            grads = jax.lax.psum(grads, DATA_AXIS)
            aux["loss"] = loss
            aux = jax.lax.psum(aux, DATA_AXIS)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            return (TrainState(params, opt_state, state.swa, state.step + 1),
                    aux)

        return jax.lax.scan(body, state, keys)

    spec_subj = P(DATA_AXIS)
    fn = shard_map(local_epoch, mesh=mesh,
                   in_specs=(P(), P(), spec_subj, spec_subj),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn, donate_argnums=_finetune_donate(tuner, cfg))


def stream_synthetic_batch(key, cfg: QBoldConfig, batch_size: int,
                           vol_shape=(10, 10, 5)):
    """Draw a fresh synthetic pretraining batch ON DEVICE: iid population
    parameters (synth.sample_batch_params) pushed through the same
    augmentation/noise pipeline as create_synthetic_dataset, reshaped to
    pseudo-volumes. Returns {x (B,*vol,taus), y (B,*vol,3)}."""
    from ..ops import physics
    from ..synth import sample_batch_params, synth_oef_bound

    scan, synth = cfg.scan, cfg.synth
    n_vox = batch_size * vol_shape[0] * vol_shape[1] * vol_shape[2]
    k_par, k_mis, k_noise = jax.random.split(key, 3)
    oef, dbv = sample_batch_params(k_par, synth, n_vox)
    r2p = physics.r2_prime(oef, dbv, scan.hct, scan)
    y = jnp.stack([oef, dbv, r2p], -1)

    sig_oef, sig_dbv = oef, dbv
    per_tau = synth.misalign_prob > 0.0
    if per_tau:
        sig_oef, sig_dbv = physics.misalign_params(
            k_mis, oef, dbv, scan.n_taus, synth.misalign_prob)
    x = physics.ase_signal(sig_oef, sig_dbv, scan,
                           full_model=cfg.train.full_model,
                           include_blood=cfg.train.use_blood,
                           per_tau_params=per_tau,
                           quad_rule=cfg.model.quad_rule,
                           max_oef=synth_oef_bound(synth))
    if scan.simulate_noise:
        x = physics.add_acquisition_noise(k_noise, x, scan.taus())
    return {
        "x": x.reshape((batch_size,) + vol_shape + (scan.n_taus,)),
        "y": y.reshape((batch_size,) + vol_shape + (3,)),
    }


def _stream_step_body(state: TrainState, key, tuner: FineTuner,
                      cfg: QBoldConfig, optimizer, batch_size: int,
                      vol_shape, axis_name=None, live=None):
    """Shared body of the streaming pretrain step: draw a fresh on-device
    synthetic batch, grad, (optionally psum-reduce over a mesh axis),
    update. ``live`` marks the device's real volumes when the global
    batch does not divide the mesh (pad-and-mask; counts across devices
    sum to the exact configured batch)."""
    k_batch, k_loss = jax.random.split(key)
    batch = stream_synthetic_batch(k_batch, cfg, batch_size, vol_shape)
    loss, grads = jax.value_and_grad(_pretrain_loss)(
        state.params, k_loss, batch, tuner, cfg, live, axis_name)
    if axis_name is not None:
        # per-device losses are global-sum contributions (live-weighted
        # over the psum'd voxel count) -> psum recovers the exact global
        # mean and its gradient
        grads = jax.lax.psum(grads, axis_name)
        loss = jax.lax.psum(loss, axis_name)
    updates, opt_state = optimizer.update(grads, state.opt_state,
                                          state.params)
    params = optax.apply_updates(state.params, updates)
    swa = state.swa
    if swa is not None:
        swa = swa_update(swa, params, cfg.train.swa_start,
                         cfg.train.swa_period)
    return (TrainState(params, opt_state, swa, state.step + 1),
            {"loss": loss})


def make_pretrain_stream_step(tuner: FineTuner, cfg: QBoldConfig,
                              optimizer: optax.GradientTransformation,
                              vol_shape=(10, 10, 5)):
    """On-device streaming pretraining step: the synthetic batch is drawn
    and decoded through the physics forward model INSIDE the jitted step
    -- zero host->device data movement (the reference ships a ~1 GB
    host-generated batch per step at the published sizes,
    train.py:103,419-421).

    Each step sees a fresh iid population draw (synth.sample_batch_params)
    pushed through the same augmentation/noise pipeline as
    create_synthetic_dataset. Returns jitted (state, key) ->
    (state, metrics).
    """

    def step(state: TrainState, key):
        return _stream_step_body(state, key, tuner, cfg, optimizer,
                                 cfg.train.pt_batch_size, vol_shape)

    return jax.jit(step, donate_argnums=(0,))


def make_pretrain_stream_epoch(tuner: FineTuner, cfg: QBoldConfig,
                               optimizer: optax.GradientTransformation,
                               n_steps: int, mesh=None,
                               vol_shape=(10, 10, 5)):
    """Whole-EPOCH streaming pretraining: ``lax.scan`` over ``n_steps``
    on-device-generated batches in ONE dispatch.

    Per-step dispatch latency through a remote/tunneled TPU link is
    ~10 ms and round-1 measured the pretrain phase wall-dominated by
    dispatch (220 s wall vs ~4 s device compute at published scale);
    scanning the epoch removes all but one dispatch per epoch. Without a
    mesh this is the scanned form of make_pretrain_stream_step; with a
    mesh each device generates its own ``pt_batch_size / n_devices``
    sub-batch per step under shard_map with pmean'd grads (the scanned
    form of make_pretrain_stream_step_sharded).

    Returns jitted (state, key) -> (state, metrics with (T,) leaves).
    """
    b_local = cfg.train.pt_batch_size
    axis_name = None
    c_base = c_rem = 0
    if mesh is not None:
        from ..parallel.mesh import DATA_AXIS
        axis_name = DATA_AXIS
        b_local, (c_base, c_rem) = _device_crop_counts(
            cfg.train.pt_batch_size, mesh.devices.size)

    def epoch(state: TrainState, key):
        live = None
        if axis_name is not None:
            d = jax.lax.axis_index(axis_name)
            live = (jnp.arange(b_local) < c_base + (d < c_rem)).astype(
                jnp.float32)
            key = jax.random.fold_in(key, d)
        keys = jax.random.split(key, n_steps)

        def body(state, k):
            return _stream_step_body(state, k, tuner, cfg, optimizer,
                                     b_local, vol_shape,
                                     axis_name=axis_name, live=live)

        return jax.lax.scan(body, state, keys)

    if mesh is not None:
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        epoch = shard_map(epoch, mesh=mesh, in_specs=(P(), P()),
                          out_specs=(P(), P()), check_vma=False)
    return jax.jit(epoch, donate_argnums=(0,))


def make_pretrain_stream_step_sharded(tuner: FineTuner, cfg: QBoldConfig,
                                      optimizer: optax.GradientTransformation,
                                      mesh, vol_shape=(10, 10, 5)):
    # NB the trainer uses the scanned make_pretrain_stream_epoch; this
    # single-step variant stays for the dryrun contract and tests.
    """Mesh-parallel streaming pretraining: every device generates its own
    ``pt_batch_size / n_devices`` pseudo-volumes locally (key folded by
    mesh position), so synthetic generation scales linearly with the mesh
    and the step still moves ZERO bytes host->device. Grads and the loss
    are pmean-reduced; params stay replicated bit-exactly.

    One (documented) local/global nuance: the acquisition-noise std is
    derived from the batch-mean signal per tau (physics
    add_acquisition_noise, reference signals.py:122-126) -- under the
    mesh that mean is over the device-local sub-batch. At the published
    batch (512 volumes over <=64 devices) the sub-batch mean estimates
    the same population mean; distributionally equivalent.

    Returns jitted (state, key) -> (state, metrics) with state replicated.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    n_dev = mesh.devices.size
    b_local, (c_base, c_rem) = _device_crop_counts(
        cfg.train.pt_batch_size, n_dev)

    def local_step(state: TrainState, key):
        d = jax.lax.axis_index(DATA_AXIS)
        live = (jnp.arange(b_local) < c_base + (d < c_rem)).astype(
            jnp.float32)
        key = jax.random.fold_in(key, d)
        return _stream_step_body(state, key, tuner, cfg, optimizer,
                                 b_local, vol_shape, axis_name=DATA_AXIS,
                                 live=live)

    fn = shard_map(local_step, mesh=mesh, in_specs=(P(), P()),
                   out_specs=(P(), P()), check_vma=False)
    return jax.jit(fn, donate_argnums=(0,))


def make_pretrain_eval(tuner: FineTuner, cfg: QBoldConfig):
    """Validation loss + OEF/DBV/R2' MSE metrics on synthetic data."""

    def evaluate(params, key, batch):
        k1, k2 = jax.random.split(key)
        loss = _pretrain_loss(params, k1, batch, tuner, cfg, train=False)
        out1, _, _ = tuner.encoder.apply({"params": params["encoder"]}, batch["x"])
        if cfg.model.infer_inv_gamma:
            out1 = out1[..., :-4]   # drop the 4 exp'd hyperprior
            # channels (losses.py:103); `// 2` was only right for
            # the diagonal head (4+4), not MVG (5+4)
        metrics = posterior_mse_metrics(k2, tuner, out1, batch["y"])
        metrics["val_loss"] = loss
        if cfg.model.infer_inv_gamma:
            # the learned inverse-gamma hyperprior, logged per epoch like
            # the reference (train.py:395-413); computed in the same
            # jitted program so it rides the existing eval dispatch (an
            # eager param fetch costs its own ~35-40 ms tunnel
            # round-trip per epoch)
            a_o, b_o, a_d, b_d = jnp.exp(
                params["encoder"]["inv_gamma_raw"].astype(jnp.float32))
            metrics.update(oef_alpha=a_o, oef_beta=b_o,
                           dbv_alpha=a_d, dbv_beta=b_d)
        return metrics

    return jax.jit(evaluate)


def _fused_nll_fn(tuner: FineTuner, cfg: QBoldConfig):
    """The fused Pallas decode+NLL op when enabled and applicable, else
    None (jnp path). Resolved at trace/build time (Python), so the
    decision costs nothing inside the compiled step.

    Mode strings are normalised/validated by config.normalize_mode --
    unknown values raise instead of silently picking a path.
    'on'/'interpret' are FORCE semantics: an uncovered config errors
    loudly rather than falling back."""
    from ..config import normalize_mode

    mode = normalize_mode(cfg.train.fused_decode_nll,
                          ("auto", "on", "off", "interpret"),
                          "fused_decode_nll")
    if mode == "off":
        return None
    if mode == "auto" and jax.default_backend() not in ("tpu", "axon"):
        return None
    from ..ops import pallas_decode

    if not pallas_decode.fused_available(cfg.model, tuner.scan,
                                         tuner.full_model, tuner.use_blood):
        if mode in ("on", "interpret"):
            raise ValueError(
                "fused_decode_nll was forced on but the configuration is "
                "not covered by the kernel (needs the full SDR model, "
                "heteroscedastic noise, and an interior spin-echo window "
                "for multi-image normalisation)")
        return None
    return pallas_decode.make_fused_decode_nll(
        cfg.model, tuner.scan, use_blood=tuner.use_blood,
        interpret=mode == "interpret")


def _fused_elbo_fn(tuner: FineTuner, cfg: QBoldConfig, s_nll: int,
                   s_kl: int):
    """The fully fused Pallas ELBO op (sample + decode + NLL + KL,
    ops/pallas_elbo.py) when enabled and applicable, as (fn, host_noise),
    else None. Resolved at trace/build time like _fused_nll_fn.

    'on'/'host'/'interpret'/'host-interpret' are FORCE semantics: an
    uncovered configuration errors loudly rather than falling back."""
    from ..config import normalize_mode

    mode = normalize_mode(cfg.train.fused_elbo,
                          ("auto", "on", "off", "host", "interpret",
                           "host-interpret"), "fused_elbo")
    if mode == "off":
        return None
    if mode == "auto" and jax.default_backend() not in ("tpu", "axon"):
        return None
    from ..ops import pallas_elbo

    if not pallas_elbo.fused_elbo_available(cfg.model, tuner.scan,
                                            tuner.full_model,
                                            tuner.use_blood):
        if mode != "auto":
            raise ValueError(
                "fused_elbo was forced on but the configuration is not "
                "covered by the kernel (needs the full SDR model, "
                "heteroscedastic noise, an interior spin-echo window for "
                "multi-image normalisation, and either an MVG posterior "
                "or a diagonal one WITHOUT a population prior -- the "
                "diag+population-prior KL carries a whole-map hyperprior "
                "cost the per-voxel kernel cannot express)")
        return None
    host = mode in ("host", "host-interpret")
    fn = pallas_elbo.make_fused_elbo(
        cfg.model, tuner.scan, use_blood=tuner.use_blood,
        s_nll=s_nll, s_kl=s_kl, noise="host" if host else "device",
        interpret=mode in ("interpret", "host-interpret"))
    return fn, host


def _finetune_terms(params, key, batch, tuner: FineTuner, cfg: QBoldConfig,
                    no_samples: Optional[int] = None, kl_samples: int = 70,
                    train: bool = True, axis_name: Optional[str] = None):
    """Shared forward + the three loss terms (nll, kl, smoothness).

    ``train``: dropout active (the ELBO validation pass uses model.predict
    semantics upstream, i.e. dropout off -- reference train.py:338).

    ``axis_name``: inside shard_map, rescale every (masked-mean) term by
    ``sum(mask_local) / psum(sum(mask))`` so that per-device totals SUM
    to the exact global masked mean -- the mechanism behind exact
    pad-and-mask data parallelism (a device's dead padding crops carry
    zero mask and drop out of numerator and denominator alike). Callers
    must then reduce loss/grads/aux with ``psum``, NOT ``pmean``.
    Sharded callers put their live-crop flags in ``batch['live']`` so
    the diagonal-posterior population-prior hyperprior cost (scaled by
    the reference's batch dimension, model.py:716) counts live crops
    only -- with it, every term is exact under padding."""
    images, mask = batch["images"], batch["mask"]
    n_crops = (jnp.sum(batch["live"]) if "live" in batch
               else images.shape[0])
    k_sample, k_kl = jax.random.split(key)

    def _globalise(aux_and_total):
        """Rescale local masked means into global-sum contributions."""
        total, aux = aux_and_total
        if axis_name is None:
            return total, aux
        m_local = jnp.sum(mask)
        m_total = jax.lax.psum(m_local, axis_name)
        scale = m_local / m_total
        aux = dict(aux)
        for k in ("nll", "kl", "smoothness"):
            aux[k] = aux[k] * scale
        # sigma is a plain (unmasked) monitoring mean: average it over
        # devices instead of mask-weighting
        n_dev = jax.lax.psum(jnp.ones(()), axis_name)
        aux["sigma"] = aux["sigma"] / n_dev
        return total * scale, aux

    s = no_samples if no_samples is not None else cfg.model.no_samples
    elbo = _fused_elbo_fn(tuner, cfg, s, kl_samples)
    if elbo is not None:
        # Fully fused path (SURVEY.md §7.8's end state): ONE Pallas op
        # draws the posterior samples, decodes the physics, accumulates
        # the NLL AND runs the S_kl-sample KL loop with q/prior resident
        # in VMEM -- no S-fold HBM broadcasts, no separate KL pass
        # (~10 ms of the round-2 26 ms step sat in exactly these seams,
        # benchmarks/RESULTS.md).
        fused_fn, host_noise = elbo
        k_draw, k_drop = jax.random.split(k_sample)
        _, q, sigma = tuner.encode(
            params, images,
            dropout_key=k_drop if (train and cfg.model.dropout_rate > 0.0)
            else None)
        prior = (tuner.prior_params(params, q)
                 if cfg.model.use_population_prior else batch["priors"])
        t = tuner.scan.n_taus
        n = q.size // q.shape[-1]
        k_chan = 5 if cfg.model.use_mvg else 4
        qf = q.reshape(-1, k_chan)
        pf = prior.reshape(-1, k_chan)
        yf = images.reshape(-1, t)
        sf = sigma.reshape(-1, t)
        mf = mask.reshape(-1)
        if host_noise:
            # Same key-split structure as the jnp path (sample_many /
            # mvg_kl_samples), so values and gradients are bit-compatible
            # with fused_elbo='off' given the same step key. Diagonal
            # posteriors need no KL normals: their KL is analytic
            # in-kernel (pallas_elbo.py).
            z_nll = jax.vmap(lambda k: jax.random.normal(k, (n, 2)))(
                jax.random.split(k_draw, s))
            if cfg.model.use_mvg:
                z_kl = jax.vmap(lambda k: jax.random.normal(k, (n, 2)))(
                    jax.random.split(k_kl, kl_samples))
                nll_rows, kl_rows = fused_fn(qf, pf, yf, sf, mf, z_nll,
                                             z_kl)
            else:
                nll_rows, kl_rows = fused_fn(qf, pf, yf, sf, mf, z_nll)
        else:
            seed = jax.random.randint(k_draw, (), 0, np.int32(2**31 - 1))
            nll_rows, kl_rows = fused_fn(qf, pf, yf, sf, mf, seed)
        # Safe denominator: a zero-live device under pad-and-mask
        # sharding must contribute exact 0, not 0/0.
        denom = losses._safe_mask_sum(mf)
        nll = jnp.sum(nll_rows) / (s * denom)
        kl = jnp.sum(kl_rows) / denom
        smooth = losses.smoothness_loss(tuner.dist, q, mask)
        aux = {"nll": nll, "kl": kl, "smoothness": smooth,
               "sigma": jnp.mean(sigma)}
        total = (nll + kl * cfg.train.kl_weight
                 + smooth * cfg.train.smoothness_weight)
        return _globalise((total, aux))

    fused = _fused_nll_fn(tuner, cfg)
    if fused is not None:
        # Fused path: encode + sample in XLA, then ONE Pallas op for the
        # physics decode + reconstruction NLL with a closed-form VJP
        # (ops/pallas_decode.py; XLA left 7.9/12.5 ms on the table here,
        # benchmarks/RESULTS.md). Gradient-exact vs the jnp branch below.
        k_draw, k_drop = jax.random.split(k_sample)
        s = no_samples if no_samples is not None else cfg.model.no_samples
        _, q, sigma = tuner.encode(
            params, images,
            dropout_key=k_drop if (train and cfg.model.dropout_rate > 0.0)
            else None)
        samples = tuner.dist.sample_many(k_draw, q, cfg.model.use_mvg, s)
        t = tuner.scan.n_taus
        yb = jnp.broadcast_to(images, (s,) + images.shape).reshape(-1, t)
        sb = jnp.broadcast_to(sigma, (s,) + sigma.shape).reshape(-1, t)
        mb = jnp.broadcast_to(mask, (s,) + mask.shape).reshape(-1)
        rows = fused(samples[..., 0].reshape(-1),
                     samples[..., 1].reshape(-1), yb, sb, mb)
        nll = jnp.sum(rows) / losses._safe_mask_sum(mb)
    else:
        out = tuner.apply(params, k_sample, images, no_samples=no_samples,
                          train=train)
        q = out["predictions"]
        # Reconstruction NLL over the leading samples axis; y_true
        # broadcasts (equivalent to the reference's concat-to-batch
        # replication, model.py:529,245-246).
        pred = out["predicted_images"]
        sigma = out["im_sigma"]
        nll = losses.fine_tune_nll(
            cfg.model, tuner.scan.se_idx,
            jnp.broadcast_to(images, pred.shape), pred,
            jnp.broadcast_to(sigma, pred.shape),
            jnp.broadcast_to(mask, pred.shape[:-1] + (1,)))

    if cfg.model.use_population_prior:
        prior = tuner.prior_params(params, q)
    else:
        prior = batch["priors"]
    kl = losses.kl_loss(k_kl, tuner.dist, cfg.model, prior, q, mask,
                        no_samples=kl_samples, n_crops=n_crops)
    smooth = losses.smoothness_loss(tuner.dist, q, mask)
    aux = {"nll": nll, "kl": kl, "smoothness": smooth,
           "sigma": jnp.mean(sigma)}
    total = (nll + kl * cfg.train.kl_weight
             + smooth * cfg.train.smoothness_weight)
    return _globalise((total, aux))



def _finetune_donate(tuner: FineTuner, cfg: QBoldConfig) -> tuple:
    """Donation interacts badly with the fused Pallas custom calls:
    input-output aliasing around the opaque op costs the compiled step
    ~7 ms at the published workload (measured A/B on chip,
    benchmarks/RESULTS.md), while donating the ~0.4 MB params/opt-state
    saves nothing material -- so fused steps do not donate."""
    if _fused_elbo_fn(tuner, cfg, cfg.model.no_samples, 70) is not None:
        return ()
    return () if _fused_nll_fn(tuner, cfg) is not None else (0,)

def make_finetune_step(tuner: FineTuner, cfg: QBoldConfig,
                       optimizer: optax.GradientTransformation):
    """Returns jitted (state, key, batch{images,mask[,priors]}) ->
    (state, metrics)."""

    def loss_fn(params, key, batch):
        return _finetune_terms(params, key, batch, tuner, cfg)

    def step(state: TrainState, key, batch):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, key, batch)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        aux["loss"] = loss
        return TrainState(params, opt_state, state.swa, state.step + 1), aux

    return jax.jit(step, donate_argnums=_finetune_donate(tuner, cfg))


def make_finetune_epoch(tuner: FineTuner, cfg: QBoldConfig,
                        optimizer: optax.GradientTransformation):
    """Whole-epoch fine-tune dispatch: ``lax.scan`` over T pre-stacked
    batches, ONE host->device round trip per epoch.

    Per-step dispatch latency through a remote TPU link is ~10 ms -- at
    the published 100 steps/epoch (reference train.py:376) that is ~1 s
    of pure overhead per epoch, removed here. Semantics are identical to
    100 calls of make_finetune_step.

    Returns jitted (state, key, batches{(T,B,...)}) -> (state, metrics)
    with each metric of shape (T,).
    """

    def loss_fn(params, key, batch):
        return _finetune_terms(params, key, batch, tuner, cfg)

    def epoch(state: TrainState, key, batches):
        n_steps = jax.tree_util.tree_leaves(batches)[0].shape[0]
        keys = jax.random.split(key, n_steps)

        def body(state, xs):
            k, batch = xs
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, k, batch)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            aux["loss"] = loss
            return (TrainState(params, opt_state, state.swa, state.step + 1),
                    aux)

        return jax.lax.scan(body, state, (keys, batches))

    return jax.jit(epoch, donate_argnums=_finetune_donate(tuner, cfg))


def make_finetune_eval(tuner: FineTuner, cfg: QBoldConfig,
                       stochastic_passes: int = 10, kl_samples: int = 70):
    """The ELBO validation pass (reference: train.py:325-359): NLL
    averaged over ``stochastic_passes`` forward draws, plus KL and
    smoothness, on a held-out batch."""

    def evaluate(params, key, batch):
        k_kl, *keys = jax.random.split(key, stochastic_passes + 1)

        images, mask = batch["images"], batch["mask"]

        def one_nll(k):
            out = tuner.apply(params, k, images)
            pred = out["predicted_images"]
            sigma = jnp.broadcast_to(out["im_sigma"], pred.shape)
            return losses.fine_tune_nll(
                cfg.model, tuner.scan.se_idx,
                jnp.broadcast_to(images, pred.shape), pred, sigma,
                jnp.broadcast_to(mask, pred.shape[:-1] + (1,)))

        nll = jnp.mean(jax.vmap(one_nll)(jnp.stack(keys)))

        # KL and smoothness are deterministic in the encoder output, so
        # computed once (the reference callback does the same,
        # train.py:334-344).
        _, q, _ = tuner.encode(params, images)
        prior = (tuner.prior_params(params, q)
                 if cfg.model.use_population_prior else batch["priors"])
        kl = losses.kl_loss(k_kl, tuner.dist, cfg.model, prior, q, mask,
                            no_samples=kl_samples)
        smooth = losses.smoothness_loss(tuner.dist, q, mask)
        return {
            "val_nll": nll,
            "val_kl": kl,
            "val_smoothness": smooth,
            "val_smoothness_scaled": smooth * cfg.train.smoothness_weight,
            "val_elbo": nll + kl,
            "val_elbo_smooth": nll + kl * cfg.train.kl_weight
                               + smooth * cfg.train.smoothness_weight,
        }

    return jax.jit(evaluate)
