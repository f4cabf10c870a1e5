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
import optax

from ..config import QBoldConfig
from ..models.vi import FineTuner
from . import losses
from .optim import SWAState, swa_update

__all__ = ["TrainState", "make_pretrain_step", "make_finetune_step",
           "make_pretrain_eval", "make_finetune_eval", "posterior_mse_metrics"]


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


def _pretrain_loss(params, key, batch, tuner: FineTuner, cfg: QBoldConfig):
    x, y = batch["x"], batch["y"]
    key, k_drop = jax.random.split(key)
    out1, _, _ = tuner.encode(
        params, x,
        dropout_key=k_drop if cfg.model.dropout_rate > 0.0 else None)
    return losses.synthetic_data_loss(
        key, tuner.dist, cfg.model, cfg.scan, y, out1,
        use_r2p_loss=cfg.train.use_r2p_loss,
        inv_gamma_alpha=cfg.train.inv_gamma_alpha,
        inv_gamma_beta=cfg.train.inv_gamma_beta,
    )


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


def make_finetune_epoch_on_device(tuner: FineTuner, cfg: QBoldConfig,
                                  optimizer: optax.GradientTransformation,
                                  n_steps: int):
    """Whole-epoch fine-tune dispatch with ON-DEVICE random cropping.

    The full (S, X, Y, Z, n_taus+1) volume stack and its prior maps are
    uploaded ONCE (a few MB); every scan step draws (subject, x0, y0)
    with jax.random and extracts the 38-crop batch with dynamic_slice --
    no per-epoch host crop assembly or transfer (the host-stacked path
    ships ~0.8 GB/epoch at the published sizes). Distributionally
    identical to data.RealCropSampler (uniform subjects with replacement,
    uniform in-plane windows).

    Returns jitted (state, key, volumes, priors) -> (state, metrics).
    """
    b = cfg.train.ft_batch_size

    def loss_fn(params, key, batch):
        return _finetune_terms(params, key, batch, tuner, cfg)

    def epoch(state: TrainState, key, volumes, priors):
        s_n, x_n, y_n, z_n, c_n = volumes.shape
        cx = min(cfg.train.crop_size, x_n)
        cy = min(cfg.train.crop_size, y_n)
        k_p = priors.shape[-1]
        keys = jax.random.split(key, n_steps)

        def take(arr, si, xi, yi, c):
            return jax.lax.dynamic_slice(
                arr[si], (xi, yi, 0, 0), (cx, cy, z_n, c))

        def body(state, k):
            k_s, k_x, k_y, k_step = jax.random.split(k, 4)
            si = jax.random.randint(k_s, (b,), 0, s_n)
            xi = jax.random.randint(k_x, (b,), 0, x_n - cx + 1)
            yi = jax.random.randint(k_y, (b,), 0, y_n - cy + 1)
            windows = jax.vmap(take, (None, 0, 0, 0, None))(
                volumes, si, xi, yi, c_n)
            mask = windows[..., -1:]
            batch = {
                "images": windows[..., :-1] * mask,
                "mask": mask,
                "priors": jax.vmap(take, (None, 0, 0, 0, None))(
                    priors, si, xi, yi, k_p),
            }
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, k_step, batch)
            updates, opt_state = optimizer.update(grads, state.opt_state,
                                                  state.params)
            params = optax.apply_updates(state.params, updates)
            aux["loss"] = loss
            return (TrainState(params, opt_state, state.swa, state.step + 1),
                    aux)

        return jax.lax.scan(body, state, keys)

    return jax.jit(epoch, donate_argnums=(0,))


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
    from ..ops import physics
    from ..synth import sample_batch_params

    scan, synth = cfg.scan, cfg.synth
    vol = vol_shape[0] * vol_shape[1] * vol_shape[2]
    n_vox = cfg.train.pt_batch_size * vol

    def step(state: TrainState, key):
        k_par, k_mis, k_noise, k_loss = jax.random.split(key, 4)
        oef, dbv = sample_batch_params(k_par, synth, n_vox)
        r2p = physics.r2_prime(oef, dbv, scan.hct, scan)
        y = jnp.stack([oef, dbv, r2p], -1)

        sig_oef, sig_dbv = oef, dbv
        if synth.misalign_prob > 0.0:
            sig_oef, sig_dbv = physics.misalign_params(
                k_mis, oef, dbv, scan.n_taus, synth.misalign_prob)
        x = physics.ase_signal(sig_oef, sig_dbv, scan,
                               full_model=cfg.train.full_model,
                               include_blood=cfg.train.use_blood)
        if scan.simulate_noise:
            x = physics.add_acquisition_noise(k_noise, x, scan.taus())

        batch = {
            "x": x.reshape((cfg.train.pt_batch_size,) + vol_shape
                           + (scan.n_taus,)),
            "y": y.reshape((cfg.train.pt_batch_size,) + vol_shape + (3,)),
        }
        loss, grads = jax.value_and_grad(_pretrain_loss)(
            state.params, k_loss, batch, tuner, cfg)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        swa = state.swa
        if swa is not None:
            swa = swa_update(swa, params, cfg.train.swa_start,
                             cfg.train.swa_period)
        return (TrainState(params, opt_state, swa, state.step + 1),
                {"loss": loss})

    return jax.jit(step, donate_argnums=(0,))


def make_pretrain_eval(tuner: FineTuner, cfg: QBoldConfig):
    """Validation loss + OEF/DBV/R2' MSE metrics on synthetic data."""

    def evaluate(params, key, batch):
        k1, k2 = jax.random.split(key)
        loss = _pretrain_loss(params, k1, batch, tuner, cfg)
        out1, _, _ = tuner.encoder.apply({"params": params["encoder"]}, batch["x"])
        if cfg.model.infer_inv_gamma:
            out1 = out1[..., : out1.shape[-1] // 2]
        metrics = posterior_mse_metrics(k2, tuner, out1, batch["y"])
        metrics["val_loss"] = loss
        return metrics

    return jax.jit(evaluate)


def _finetune_terms(params, key, batch, tuner: FineTuner, cfg: QBoldConfig,
                    no_samples: Optional[int] = None, kl_samples: int = 70,
                    train: bool = True):
    """Shared forward + the three loss terms (nll, kl, smoothness).

    ``train``: dropout active (the ELBO validation pass uses model.predict
    semantics upstream, i.e. dropout off -- reference train.py:338)."""
    images, mask = batch["images"], batch["mask"]
    k_sample, k_kl = jax.random.split(key)
    out = tuner.apply(params, k_sample, images, no_samples=no_samples,
                      train=train)
    q = out["predictions"]

    if cfg.model.use_population_prior:
        prior = tuner.prior_params(params, q)
    else:
        prior = batch["priors"]

    # Reconstruction NLL over the leading samples axis; y_true broadcasts
    # (equivalent to the reference's concat-to-batch replication,
    # model.py:529,245-246).
    pred = out["predicted_images"]
    sigma = out["im_sigma"]
    nll = losses.fine_tune_nll(cfg.model, tuner.scan.se_idx,
                               jnp.broadcast_to(images, pred.shape), pred,
                               jnp.broadcast_to(sigma, pred.shape),
                               jnp.broadcast_to(mask, pred.shape[:-1] + (1,)))
    kl = losses.kl_loss(k_kl, tuner.dist, cfg.model, prior, q, mask,
                        no_samples=kl_samples)
    smooth = losses.smoothness_loss(tuner.dist, q, mask)
    aux = {"nll": nll, "kl": kl, "smoothness": smooth,
           "sigma": jnp.mean(sigma)}
    total = (nll + kl * cfg.train.kl_weight
             + smooth * cfg.train.smoothness_weight)
    return total, aux


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

    return jax.jit(step, donate_argnums=(0,))


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

    return jax.jit(epoch, donate_argnums=(0,))


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
