"""Tau-protocol transfer: retarget a trained encoder to a new tau grid.

The reference exposes an "inner model" taking post-first-conv features so
a trained core can be reused across acquisition protocols with different
numbers of tau images (reference: model.py:183,216-223; the
pt_transfer_model.h5 / transfer_model.h5 weight files at train.py:195-196).
Functionally: everything after the first 1x1x1 conv is tau-count-agnostic;
only the first conv (n_taus -> no_units) and the heteroscedastic sigma
head (no_units -> n_taus) are protocol-specific.

``transfer_params`` builds a parameter pytree for a new ScanParams by
keeping the trained trunk (blocks + final head) and re-initialising the
two protocol-specific layers.
"""

from __future__ import annotations

import jax

from ..config import ModelConfig, ScanParams
from .vi import FineTuner

__all__ = ["transfer_params"]

_PROTOCOL_LAYERS = ("first_conv", "sigma_head")


def transfer_params(key: jax.Array, trained: dict, cfg: ModelConfig,
                    new_scan: ScanParams, sample_images) -> dict:
    """Retarget trained fine-tuner params to ``new_scan``'s tau grid.

    trained: params pytree from a FineTuner on the old protocol.
    sample_images: (B, X, Y, Z, new_n_taus) example batch for shape
    inference. Returns a new params pytree: trunk weights shared with
    ``trained``, first conv + sigma head freshly initialised.
    """
    new_tuner = FineTuner(cfg, new_scan)
    fresh = new_tuner.init(key, sample_images)

    enc = dict(fresh["encoder"])
    for name in enc:
        if name not in _PROTOCOL_LAYERS and name in trained["encoder"]:
            enc[name] = trained["encoder"][name]
    out = dict(trained)
    out["encoder"] = enc
    for extra in ("pop_prior", "log_sigma"):
        if extra in fresh and extra not in out:
            out[extra] = fresh[extra]
    return out
