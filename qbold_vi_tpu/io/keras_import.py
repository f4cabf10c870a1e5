"""Import trained reference (Keras) encoder weights into this framework.

A user switching from the reference can bring their trained
``pt_model.h5`` / ``final_model.h5`` along: build the reference encoder
with their checkout of the upstream code (heavy TF extras are stubbed
out automatically), load the weights, and convert.

Layer mapping (reference model.py:122-223 -> models/encoder.py):

    Conv3D 1x1x1 (n_taus -> U)   -> first_conv Dense      (squeeze spatial)
    per block i:
      Conv3D 1x1x1 shared        -> block_i/Dense_0
      Conv3D 3x3x1 (x2)          -> block_i/ConvXY_{0,1}/Conv_0 (squeeze z)
      Conv3D 1x1x1 gating        -> block_i/Dense_1
    Conv3D 1x1x1 (U -> 4|5)      -> final
    Conv3D 1x1x1 (U -> n_taus)   -> sigma_head

Conv3D layers are identified in creation order (Keras names layers with
a monotonic counter, and create_encoder's construction order is fixed).
Gated against the executed reference in tests/test_keras_import.py:
converted weights must reproduce the reference model's outputs.
"""

from __future__ import annotations

import re
import sys
import types
from typing import Any

import numpy as np

__all__ = ["stub_heavy_tf_extras", "build_reference_encoder",
           "params_from_reference_encoder", "load_reference_h5"]


def stub_heavy_tf_extras() -> None:
    """Register import stubs for tensorflow_addons / tensorflow_probability,
    which the reference imports but does not exercise at the default
    configuration (no layer norm, no inferred inverse-gamma)."""
    if "tensorflow_addons" not in sys.modules:
        tfa = types.ModuleType("tensorflow_addons")
        tfa.layers = types.SimpleNamespace(GroupNormalization=None)
        sys.modules["tensorflow_addons"] = tfa
    if "tensorflow_probability" not in sys.modules:
        tfp = types.ModuleType("tensorflow_probability")
        tfp.layers = types.SimpleNamespace(VariableLayer=None)
        tfp.distributions = types.SimpleNamespace()
        tfp.math = types.SimpleNamespace()
        sys.modules["tensorflow_probability"] = tfp


def build_reference_encoder(cfg, scan, reference_dir: str):
    """Construct the upstream encoder (reference model.py:122-223) from a
    reference checkout, with heavy extras stubbed. Returns the Keras
    outer model."""
    stub_heavy_tf_extras()
    sys.path.insert(0, reference_dir)
    try:
        import model as refmodel
    finally:
        sys.path.remove(reference_dir)

    params = {"tau_start": str(scan.tau_start), "tau_step": str(scan.tau_step),
              "tau_end": str(scan.tau_end)}
    trainer = refmodel.EncoderTrainer(
        system_params=params,
        no_units=cfg.no_units,
        use_layer_norm=cfg.use_layer_norm,
        dropout_rate=cfg.dropout_rate,
        no_intermediate_layers=cfg.no_intermediate_layers,
        student_t_df=cfg.student_t_df,
        initial_im_sigma=cfg.im_loss_sigma,
        activation_type=cfg.activation,
        multi_image_normalisation=cfg.multi_image_normalisation,
        channelwise_gating=cfg.channelwise_gating,
        infer_inv_gamma=cfg.infer_inv_gamma,
        use_mvg=cfg.use_mvg,
        use_population_prior=cfg.use_population_prior,
        predict_log_data=cfg.predict_log_data,
    )
    outer, _inner = trainer.create_encoder(
        gate_offset=cfg.gate_offset, resid_init_std=cfg.resid_init_std,
        no_ip_images=scan.n_taus)
    return outer


def _iter_convs(model) -> list:
    """All Conv3D layers (recursing into nested Models), sorted by the
    Keras creation counter embedded in their names."""
    convs = []

    def walk(m):
        for layer in m.layers:
            if hasattr(layer, "layers"):
                walk(layer)
            elif hasattr(layer, "kernel_size"):
                convs.append(layer)

    walk(model)

    def order(layer):
        match = re.search(r"_(\d+)$", layer.name)
        return int(match.group(1)) if match else -1

    return sorted(convs, key=order)


def _dense(layer) -> dict:
    k = np.asarray(layer.kernel)
    return {"kernel": np.squeeze(k, axis=(0, 1, 2)),
            "bias": np.asarray(layer.bias)}


def _convxy(layer) -> dict:
    k = np.asarray(layer.kernel)          # (3, 3, 1, in, out)
    return {"Conv_0": {"kernel": np.squeeze(k, axis=2),
                       "bias": np.asarray(layer.bias)}}


def params_from_reference_encoder(ref_model, cfg) -> dict:
    """Convert a (loaded) reference Keras encoder into this framework's
    encoder param pytree."""
    convs = _iter_convs(ref_model)
    n_blocks = cfg.no_intermediate_layers
    expected = 1 + 4 * n_blocks + 2
    assert len(convs) == expected, (
        f"expected {expected} Conv3D layers, found {len(convs)}")

    enc: dict[str, Any] = {"first_conv": _dense(convs[0])}
    for i in range(n_blocks):
        base = 1 + 4 * i
        enc[f"block_{i}"] = {
            "Dense_0": _dense(convs[base]),        # shared 1x1x1
            "ConvXY_0": _convxy(convs[base + 1]),
            "ConvXY_1": _convxy(convs[base + 2]),
            "Dense_1": _dense(convs[base + 3]),    # gating
        }
    enc["final"] = _dense(convs[1 + 4 * n_blocks])
    enc["sigma_head"] = _dense(convs[2 + 4 * n_blocks])
    return {"encoder": enc}


def load_reference_h5(h5_path: str, cfg, scan,
                      reference_dir: str = "/root/reference") -> dict:
    """Build the reference encoder, load an upstream .h5 checkpoint into
    it, and convert to our param pytree."""
    model = build_reference_encoder(cfg, scan, reference_dir)
    model.load_weights(h5_path)
    return params_from_reference_encoder(model, cfg)
