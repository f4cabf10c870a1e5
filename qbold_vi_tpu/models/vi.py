"""The VI fine-tuner: encoder -> reparameterised posterior sample ->
biophysical decoder (the physics forward model) -> heteroscedastic noise.

Functional re-design of the reference's Keras graph surgery
(reference: model.py:239-286 build_fine_tuner). Instead of wiring Keras
tensors, ``FineTuner`` is a pure apply function over an explicit pytree:

    params = {
        "encoder":   flax Encoder variables,
        "pop_prior": (5,)|(4*mog,) learned population prior, optional
                     (reference model.py:252-267, tfp VariableLayer),
        "log_sigma": scalar learned noise, only when heteroscedastic
                     noise is off (reference model.py:278-281),
    }

Posterior samples keep a leading S axis (S, B, X, Y, Z, ...) rather than
the reference's concat-to-batch replication (model.py:245-246) -- the
masked-mean losses are invariant to that layout, and a leading axis lets
XLA batch the physics decoder over samples without reshuffling HBM.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp

from ..config import ModelConfig, ScanParams
from ..dist.logit_mvn import LogitMVN
from ..ops import physics
from .encoder import Encoder

__all__ = ["FineTuner", "POP_PRIOR_INIT_MVG", "POP_PRIOR_INIT_DIAG"]

# Logit-space population prior init (reference model.py:255-263).
POP_PRIOR_INIT_MVG = (-0.97, 0.4, -1.14, 0.6, 0.0)
POP_PRIOR_INIT_DIAG = (-0.97, 0.4, -1.14, 0.6)


@dataclass(frozen=True)
class FineTuner:
    """Bundles the encoder module + physics decoder into one apply fn."""

    cfg: ModelConfig
    scan: ScanParams
    full_model: bool = True
    use_blood: bool = True

    @property
    def encoder(self) -> Encoder:
        return Encoder(self.cfg, n_taus=self.scan.n_taus, se_idx=self.scan.se_idx)

    @property
    def dist(self) -> LogitMVN:
        c = self.cfg
        return LogitMVN(c.oef_range, c.min_oef, c.dbv_range, c.min_dbv)

    # ---- parameter initialisation ------------------------------------------------

    def init(self, key: jax.Array, sample_images: jax.Array) -> dict:
        k_enc, k_prior = jax.random.split(key)
        params: dict[str, Any] = {
            "encoder": self.encoder.init(k_enc, sample_images)["params"]
        }
        cfg = self.cfg
        if cfg.use_population_prior:
            if cfg.use_mvg:
                init = jnp.asarray(POP_PRIOR_INIT_MVG, jnp.float32)
            elif cfg.mog_components > 1:
                init = jax.random.normal(k_prior, (4 * cfg.mog_components,))
            else:
                init = jnp.asarray(POP_PRIOR_INIT_DIAG, jnp.float32)
            params["pop_prior"] = init
        if not cfg.heteroscedastic_noise:
            params["log_sigma"] = jnp.asarray(
                jnp.log(cfg.im_loss_sigma), jnp.float32)
        return params

    # ---- encoder passes ----------------------------------------------------------

    def encode(self, params: dict, images: jax.Array,
               dropout_key: jax.Array | None = None):
        """(q_voxelwise, q_neighbourhood, im_sigma) from images
        (== reference outer model call, model.py:242).

        dropout_key: when given (training with cfg.dropout_rate > 0),
        dropout is active; omitted -> deterministic (inference)."""
        if dropout_key is not None and self.cfg.dropout_rate > 0.0:
            return self.encoder.apply(
                {"params": params["encoder"]}, images,
                deterministic=False, rngs={"dropout": dropout_key})
        return self.encoder.apply({"params": params["encoder"]}, images)

    def prior_params(self, params: dict, q: jax.Array) -> jax.Array:
        """Broadcast the learned population prior to the shape of q
        (reference model.py:252-271). Requires use_population_prior."""
        pop = params["pop_prior"]
        return jnp.broadcast_to(pop, q.shape[:-1] + pop.shape)

    # ---- the fine-tune forward pass ---------------------------------------------

    def apply(self, params: dict, key: jax.Array, images: jax.Array,
              no_samples: int | None = None, train: bool = False) -> dict:
        """One stochastic forward pass (reference model.py:239-286).

        images: (B, X, Y, Z, n_taus). ``train=True`` activates dropout
        (Keras fit vs predict semantics). Returns a dict:
          predictions      (B, ..., 4|5)      raw posterior params
          samples          (S, B, ..., 2)     physical (OEF, DBV) draws
          predicted_images (S, B, ..., n_taus) noise-free decoded signals
          im_sigma         (B, ..., n_taus)   heteroscedastic scales
        """
        cfg = self.cfg
        s = no_samples if no_samples is not None else cfg.no_samples
        key, k_drop = jax.random.split(key)
        _, q, im_sigma = self.encode(
            params, images,
            dropout_key=k_drop if (train and cfg.dropout_rate > 0.0) else None)

        samples = self.dist.sample_many(key, q, cfg.use_mvg, s)  # (S,B,...,2)
        pred = physics.ase_signal(
            samples[..., 0], samples[..., 1], self.scan,
            full_model=self.full_model, include_blood=self.use_blood,
            quad_rule=cfg.quad_rule,
            # the forward transform's OEF upper bound (model.py:299-305):
            # the envelope gate must see the CONFIGURED range, not the
            # default 0.84, or widened-OEF configs clamp silently
            max_oef=cfg.min_oef + cfg.oef_range)

        if not cfg.heteroscedastic_noise:
            im_sigma = jnp.full_like(im_sigma, jnp.exp(params["log_sigma"]))
        return {
            "predictions": q,
            "samples": samples,
            "predicted_images": pred,
            "im_sigma": im_sigma,
        }
