"""Serialized serving artifacts: jax.export / StableHLO inference.

The reference's only deployment story is "clone the repo and load
final_model.h5 into the same Keras graph" (reference model.py:772-887:
``save_predictions`` re-drives ``model.predict`` from Python inside the
training codebase). A framework intended for production serving needs a
compiled, self-contained artifact instead: :func:`export_inference`
serializes the full-brain posterior-map program (in-model normalisation
-> encoder -> deterministic quadrature posterior summaries -- the same
math as ``infer.posterior_maps``'s default path) to portable StableHLO
via ``jax.export``, with the trained parameters baked in as constants
(the published encoder is ~10k params, ~40 kB).

Design choices, all TPU-serving-first:

* **Shape-polymorphic**: exported with symbolic ``(subjects, x, y, z)``
  dimensions by default, so ONE artifact serves any volume geometry
  without re-exporting (``jax.export`` symbolic shapes). The
  tau/channel axis stays static -- a different tau grid is a different
  scan protocol, hence a different (transferred) model.
* **Multi-platform**: lowered for every requested platform (default
  TPU + CPU) in one artifact; the serving host needs jax and this blob,
  not qbold_vi_tpu, flax, or the checkpoint machinery.
* **PRNG-free**: the deterministic quadrature estimator
  (ops/quadrature.py) replaces the reference's 200-sample MC summaries,
  so the serving signature is ``volume -> maps`` with no key plumbing
  and bit-stable outputs. The MC estimator stays available in-process
  via ``infer.posterior_maps(method="mc")``.
* **No Pallas in the DEFAULT artifact**: a Mosaic custom call pins the
  blob to TPU and breaks the CPU lowering; XLA compiles the jnp
  quadrature path well everywhere. For TPU-only serving hosts,
  ``fused=True`` exports the fused-kernel program instead (the
  stream-1 encode + packed quadrature Pallas kernels, channel-major
  serving layout -- the same path ``infer.posterior_maps`` runs on
  TPU, ~5x the jnp artifact's throughput at 1M voxels): input is
  ``(n_taus + 1, N)`` channel-major with a baked N (Pallas grids are
  static, so no shape polymorphism), output maps are channel-major
  rows, and the blob carries a ``tpu_custom_call`` (TPU platform
  only).

The encoder trunk dtype is resolved at EXPORT time (``compute_dtype:
auto`` -> bf16 when exporting from a TPU-backed process, fp32
elsewhere); pass an explicit ``compute_dtype`` through the model config
to pin it.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["make_serving_fn", "make_fused_serving_fn",
           "export_inference", "save_exported",
           "load_exported"]


def make_serving_fn(tuner, params, use_first_op: bool = True) -> Callable:
    """The inference program that gets exported, as a plain traceable
    function: ``volume (S, X, Y, Z, n_taus + 1)`` (trailing channel =
    brain mask, the §1 data contract) -> the ``infer.posterior_maps``
    map dict (oef/dbv/r2p means, quadrature variances under ``stds``,
    squashed raw log-stds). Parameters are closed over."""
    from ..infer import _encode_q
    from ..ops.quadrature import posterior_summaries_quadrature

    cfg = tuner.cfg
    dw_coeff = float(tuner.scan.dw_coeff * tuner.scan.hct)

    def serve(volume: jax.Array) -> dict:
        mask = volume[..., -1:]
        images = volume[..., :-1] * mask
        q, raw_log_stds = _encode_q(tuner, params, images,
                                    use_first_op=use_first_op)
        means, stds = posterior_summaries_quadrature(
            q, mvg=cfg.use_mvg, oef_range=cfg.oef_range,
            min_oef=cfg.min_oef, dbv_range=cfg.dbv_range,
            min_dbv=cfg.min_dbv, dw_coeff=dw_coeff)
        return {"oef": means[..., 0:1], "dbv": means[..., 1:2],
                "r2p": means[..., 2:3], "stds": stds,
                "raw_log_stds": raw_log_stds}

    return serve


def make_fused_serving_fn(tuner, params) -> Callable:
    """The TPU fused-kernel serving program: ``volume_cm
    (n_taus + 1, N)`` CHANNEL-major (last row = brain mask, voxels on
    the minor axis -- the layout ``infer.posterior_maps`` uploads) ->
    channel-major maps ``{"means" (3, N): (oef, dbv, r2p) rows,
    "stds" (3, N), "raw_log_stds" (2|3, N)}``. Runs the stream-1 encode
    + packed quadrature Pallas kernels (ops/pallas_infer.py /
    ops/quadrature.py); stream-1-only, i.e. the ``use_first_op=True``
    posterior-map path."""
    from ..infer import _fused_posterior_summaries

    def serve(volume_cm: jax.Array) -> dict:
        m, v, r = _fused_posterior_summaries(
            tuner, params, volume_cm, mask_channel=True,
            input_layout="channel")
        return {"means": m, "stds": v, "raw_log_stds": r}

    return serve


def export_inference(tuner, params, *, use_first_op: bool = True,
                     platforms: Sequence[str] = ("tpu", "cpu"),
                     polymorphic: bool = True,
                     example_shape: Sequence[int] = (1, 64, 64, 8),
                     fused: bool = False):
    """Export the posterior-map inference program to a serializable
    ``jax.export.Exported``.

    ``polymorphic`` (default) exports with symbolic (s, x, y, z) input
    dimensions (x, y >= 3 for the in-plane convs); otherwise the
    ``example_shape`` spatial geometry is baked in. Returns the
    ``Exported``; call ``.serialize()`` (or :func:`save_exported`) for
    the portable bytes.

    ``fused=True`` exports the Pallas fused-kernel program instead
    (TPU-only platform, channel-major ``(n_taus + 1, N)`` input with
    N = prod(example_shape) baked -- Pallas grids are static -- and
    channel-major outputs; requires ``use_first_op``). The blob carries
    a ``tpu_custom_call``, so the corresponding export safety check is
    disabled for it.
    """
    from jax import export as jexport

    n_ch = tuner.scan.n_taus + 1
    if fused:
        if not use_first_op:
            raise ValueError(
                "fused serving export covers the stream-1 "
                "(use_first_op) posterior-map path only")
        from ..ops.pallas_infer import fused_infer_available

        if not fused_infer_available(tuner.cfg.activation):
            raise ValueError(
                f"fused serving export: activation "
                f"{tuner.cfg.activation!r} has no Mosaic-safe "
                "implementation (ops/pallas_infer.SUPPORTED_ACTS)")
        if any(p != "tpu" for p in platforms):
            raise ValueError(
                "fused serving blobs carry a Mosaic (tpu_custom_call) "
                "kernel: platforms must be ('tpu',)")
        n = int(np.prod(example_shape))
        spec = jax.ShapeDtypeStruct((n_ch, n), jnp.float32)
        serve = make_fused_serving_fn(tuner, params)
        return jexport.export(
            jax.jit(serve), platforms=list(platforms),
            disabled_checks=[
                jexport.DisabledSafetyCheck.custom_call("tpu_custom_call")],
        )(spec)
    if polymorphic:
        dims = jexport.symbolic_shape(
            "s, x, y, z", constraints=("x >= 3", "y >= 3"))
        shape = tuple(dims) + (n_ch,)
    else:
        shape = tuple(example_shape) + (n_ch,)
    spec = jax.ShapeDtypeStruct(shape, jnp.float32)
    serve = make_serving_fn(tuner, params, use_first_op=use_first_op)
    return jexport.export(jax.jit(serve), platforms=list(platforms))(spec)


def save_exported(exported, path: str) -> int:
    """Serialize an ``Exported`` to ``path``; returns the byte count."""
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Load a serving artifact written by :func:`save_exported`.
    Returns the ``Exported``; drive it with ``.call(volume)`` (jit-able,
    runs on whichever enabled platform the host provides)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())
