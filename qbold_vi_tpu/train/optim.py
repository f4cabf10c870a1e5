"""Optimisers: AdamW with scheduled decoupled weight decay, linear LR
decay, and stochastic weight averaging (SWA) -- optax-native.

Reproduces the reference's effective optimisation setup:

* Fine-tune LR schedule: the reference's ``LRSchedule`` computes an
  exponential-decay expression and then overwrites it with linear decay
  to lr/100 over 40x100 steps (reference: train.py:287-306) -- the
  *effective* schedule is linear; only that is implemented.
* tfa.optimizers.AdamW semantics (reference: train.py:308-312): decoupled
  weight decay applied with its own (scheduled) coefficient, NOT
  multiplied by the learning rate (unlike optax.adamw); beta_2 = 0.9 for
  fine-tuning.
* tfa.optimizers.SWA(start_averaging=880, average_period=22) for
  pretraining (reference: train.py:382-385): a running average of params,
  updated every ``period`` steps once ``start`` is reached.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..config import TrainConfig

__all__ = [
    "linear_decay_schedule",
    "scheduled_adamw",
    "make_pretrain_optimizer",
    "make_finetune_optimizer",
    "SWAState",
    "swa_init",
    "swa_update",
]


def linear_decay_schedule(init_value: float, total_steps: int,
                          final_div: float = 100.0) -> Callable:
    """value(step) = init + (init/final_div - init) * step / total_steps,
    extrapolated past total_steps exactly as the reference's unclamped
    linear expression does (train.py:300-302)."""
    def schedule(step):
        frac = jnp.asarray(step, jnp.float32) / float(total_steps)
        final = init_value / final_div
        return init_value + (final - init_value) * frac
    return schedule


def _add_scheduled_weight_decay(wd_schedule: Callable,
                                wd_mask: Optional[Callable] = None
                                ) -> optax.GradientTransformation:
    """update += -wd(step) * param  (tfa-AdamW-style decoupled decay).

    ``wd_mask(params) -> bool pytree``: decay only the True leaves.
    Decay acts WITHOUT a gradient, so leaves a phase never trains (the
    reference's phase-1 model simply does not contain them) must be
    masked out or they shrink toward zero across the phase."""

    def init_fn(params):
        del params
        return optax.ScaleByScheduleState(count=jnp.zeros([], jnp.int32))

    def update_fn(updates, state, params):
        if params is None:
            raise ValueError("scheduled weight decay requires params")
        wd = wd_schedule(state.count)
        if wd_mask is None:
            updates = jax.tree_util.tree_map(
                lambda u, p: u - wd * p, updates, params)
        else:
            updates = jax.tree_util.tree_map(
                lambda u, p, m: u - wd * p if m else u,
                updates, params, wd_mask(params))
        return updates, optax.ScaleByScheduleState(count=state.count + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def scheduled_adamw(lr_schedule: Callable, wd_schedule: Optional[Callable],
                    b1: float = 0.9, b2: float = 0.999,
                    eps: float = 1e-7,
                    wd_mask: Optional[Callable] = None
                    ) -> optax.GradientTransformation:
    """Adam with decoupled, independently-scheduled weight decay
    (tfa.optimizers.AdamW semantics; eps matches Keras' 1e-7 default)."""
    parts = [
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.scale_by_schedule(lambda s: -lr_schedule(s)),
    ]
    if wd_schedule is not None:
        parts.append(_add_scheduled_weight_decay(wd_schedule, wd_mask))
    return optax.chain(*parts)


def _encoder_only(params):
    """Decay mask for pretraining: True on the encoder subtree only.
    The reference's phase-1 Keras model contains ONLY encoder weights
    (the pop_prior/log_sigma VariableLayers are created by
    build_fine_tuner afterwards, model.py:252-281), so its tfa.AdamW
    never decays them; an unmasked decay here would shrink the prior
    initialisation / noise scale by (1-wd)^steps with no gradient ever
    touching them."""
    return {k: jax.tree_util.tree_map(lambda _: k == "encoder", v)
            for k, v in params.items()}


def make_pretrain_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Pretraining optimiser (reference: train.py:382-385): plain Adam, or
    AdamW at fixed decay when SWA is enabled (averaging handled by
    swa_update in the train loop)."""
    if cfg.use_swa:
        return scheduled_adamw(
            lambda s: jnp.asarray(cfg.pt_lr, jnp.float32),
            lambda s: jnp.asarray(cfg.pt_adamw_decay, jnp.float32),
            wd_mask=_encoder_only,
        )
    return optax.adam(cfg.pt_lr, eps=1e-7)


def make_finetune_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Fine-tune optimiser (reference: train.py:308-312): AdamW with
    linearly-decayed lr AND weight decay, beta_2=0.9; plain Adam with the
    lr schedule when adamw_decay == 0."""
    total = cfg.no_ft_epochs * cfg.ft_steps_per_epoch
    lr = linear_decay_schedule(cfg.ft_lr, total)
    if cfg.adamw_decay > 0.0:
        wd = linear_decay_schedule(cfg.adamw_decay, total)
        return scheduled_adamw(lr, wd, b2=0.9)
    return optax.adam(lr, eps=1e-7)


class SWAState(NamedTuple):
    """Running parameter average (tfa.optimizers.SWA semantics)."""
    step: jax.Array       # total optimiser steps taken
    n_avg: jax.Array      # number of snapshots averaged so far
    average: Optional[dict]  # pytree like params


def swa_init(params) -> SWAState:
    return SWAState(
        step=jnp.zeros([], jnp.int32),
        n_avg=jnp.zeros([], jnp.int32),
        average=jax.tree_util.tree_map(jnp.copy, params),
    )


def swa_update(state: SWAState, params, start: int, period: int) -> SWAState:
    """Fold the current params into the running average every ``period``
    steps after ``start`` (reference: train.py:385). jit-safe."""
    step = state.step + 1
    due = jnp.logical_and(step >= start, (step - start) % period == 0)

    def fold(avg, p):
        n = state.n_avg.astype(p.dtype)
        new_avg = (avg * n + p) / (n + 1.0)
        return jnp.where(due, new_avg, avg)

    average = jax.tree_util.tree_map(fold, state.average, params)
    return SWAState(step=step, n_avg=state.n_avg + due.astype(jnp.int32),
                    average=average)
