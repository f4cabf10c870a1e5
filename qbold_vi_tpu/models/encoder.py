"""Voxelwise two-stream 3-D CNN encoder, TPU-native (flax.linen).

Re-design of the reference Keras encoder (reference: model.py:122-223).
Architectural mapping, with the TPU rationale for each choice:

* 1x1x1 Conv3D stacks (reference model.py:115-120) become ``nn.Dense`` on
  the trailing channel axis -- identical math, and XLA lowers a trailing-
  axis dense over a flattened voxel batch straight onto the MXU as one
  large matmul instead of a degenerate convolution.
* 3x3x1 Conv3D (in-plane context, reference model.py:152-157) becomes a
  2-D 3x3 convolution with the z axis folded into the batch: the kernel
  never mixes z, so [B,X,Y,Z,C] -> [B*Z,X,Y,C] is exact and gives XLA a
  plain NHWC conv it tiles well.
* The inner/outer model split for tau-protocol transfer (reference
  model.py:183,216-223) is the ``from_features`` entry point: the same
  bound module can be applied either to raw images or to post-first-conv
  features.
* tfp.layers.VariableLayer for the learned inverse-gamma hyperprior
  (reference model.py:201-205) is a plain flax param leaf.

Outputs match the reference outer model triple: (voxelwise distribution
params, neighbourhood distribution params, heteroscedastic per-tau sigma)
(reference model.py:222).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import ModelConfig

__all__ = ["Encoder", "normalise_data"]


def normalise_data(data: jax.Array, se_idx: int, multi_image: bool) -> jax.Array:
    """In-model normalisation (reference: model.py:97-113): clip, divide
    by the mean of the spin-echo(-adjacent) images, log."""
    data = jnp.clip(data, 1e-2, 1e8)
    if multi_image:
        # clamp at the grid edge: se_idx == 0 would slice [-1:2] ->
        # empty -> NaN (same guard as losses.fine_tune_nll)
        ref = jnp.mean(data[..., max(se_idx - 1, 0):se_idx + 2],
                       axis=-1, keepdims=True)
    else:
        ref = data[..., se_idx:se_idx + 1]
    return jnp.log(data / ref)


def _activation(name: str):
    return getattr(nn, name) if name != "linear" else (lambda x: x)


def _dtype_of(cfg: ModelConfig):
    if cfg.compute_dtype == "auto":
        # bf16 trunk on TPU backends (quality-gated neutral at scale,
        # benchmarks/RESULTS.md); fp32 elsewhere (CPU bf16 is emulated
        # and slower, and the parity/test suites run on CPU).
        return (jnp.bfloat16 if jax.default_backend() in ("tpu", "axon")
                else jnp.float32)
    if cfg.compute_dtype not in ("float32", "bfloat16"):
        raise ValueError(f"unknown compute_dtype {cfg.compute_dtype!r}")
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32


class _ConvImpl(nn.Conv):
    """nn.Conv with an optional Pallas fast path (ops/pallas_conv.py).

    Subclasses nn.Conv so the parameter tree ("kernel"/"bias" under the
    same module name) and initialisation are IDENTICAL whichever path
    runs -- checkpoints and fingerprints are oblivious to the flag. The
    fused path replicates flax's promote_dtype semantics (params cast to
    ``dtype`` for compute, grads flowing back through the cast) and is
    gradient-exact vs nn.Conv (tests/test_pallas_conv.py)."""

    fused: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from ..config import normalize_mode
        from ..ops.pallas_conv import conv3x3_available, make_conv3x3

        mode = normalize_mode(self.fused, ("auto", "on", "off",
                                           "interpret"), "fused_conv")
        if mode == "auto":
            # auto == OFF: the kernel measured SLOWER than XLA's native
            # conv at the published shape in both dtypes (the honest
            # negative result, benchmarks/RESULTS.md "Pallas conv A/B"
            # -- ops/pallas_conv.py docstring for the full record), so
            # nothing adopts it by default; "on"/"interpret" force it.
            mode = "off"
        # the kernel implements exactly nn.Conv((3,3), SAME, unit
        # strides, bias, one feature group) -- anything else must fall
        # to nn.Conv or the param-tree-identity invariant above breaks
        strides = self.strides if self.strides is not None else 1
        if isinstance(strides, int):
            strides = (strides,) * 2
        supported = (tuple(self.kernel_size) == (3, 3)
                     and self.padding == "SAME" and self.use_bias
                     and self.feature_group_count == 1
                     and all(s == 1 for s in strides))
        if mode != "off" and not supported:
            raise ValueError(
                "fused_conv supports only nn.Conv((3, 3), padding='SAME',"
                " unit strides, bias, feature_group_count=1); got "
                f"kernel_size={self.kernel_size} padding={self.padding!r}"
                f" strides={self.strides} use_bias={self.use_bias}")
        if mode == "off" or not conv3x3_available(x.shape[1], x.shape[2]):
            if mode == "interpret":
                raise ValueError(
                    "fused_conv was forced to 'interpret' but the plane "
                    f"is smaller than the 3x3 window: {x.shape}")
            return super().__call__(x)
        kernel = self.param(
            "kernel", self.kernel_init,
            (3, 3, x.shape[-1], self.features), self.param_dtype)
        bias = self.param("bias", self.bias_init, (self.features,),
                          self.param_dtype)
        dt = self.dtype or x.dtype
        op = make_conv3x3(x.shape[1], x.shape[2], x.shape[-1],
                          self.features, interpret=mode == "interpret")
        return op(x.astype(dt), kernel.astype(dt), bias.astype(dt))


class ConvXY(nn.Module):
    """3x3x1 'Conv3D' as a z-folded 2-D conv (see module docstring).

    Accepts the 5-D [B,X,Y,Z,C] layout (folds/unfolds around the conv)
    or an already-folded 4-D [B*Z,X,Y,C] layout: the Encoder hoists the
    fold across ALL blocks and heads, so a full pass pays one transpose
    of the 60-channel features instead of one pair per conv (~16
    tensor transposes per train step at the published 2-block config).

    ``fused`` routes through the Pallas conv kernel (cfg.fused_conv;
    ops/pallas_conv.py -- the round-5 trunk hot path).
    """

    features: int
    init_std: float
    dtype: Any = jnp.float32
    fused: str = "off"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        conv = _ConvImpl(
            self.features, (3, 3), padding="SAME", dtype=self.dtype,
            kernel_init=nn.initializers.normal(self.init_std),
            fused=self.fused, name="Conv_0",
        )
        if x.ndim == 4:
            return conv(x)
        b, h, w, d, c = x.shape
        x2 = jnp.moveaxis(x, 3, 1).reshape(b * d, h, w, c)
        y = conv(x2)
        return jnp.moveaxis(y.reshape(b, d, h, w, self.features), 1, 3)


class GatedResBlock(nn.Module):
    """One two-stream block (reference: model.py:142-174).

    Stream 1: shared 1x1x1 conv (+activation). Stream 2: the same shared
    conv as skip, vs. a residual path of two 3x3x1 convs, blended by a
    learned sigmoid gate with offset (channelwise or scalar).
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, net1, net2, *, deterministic: bool = True):
        cfg = self.cfg
        act = _activation(cfg.activation)
        dt = _dtype_of(cfg)
        # Shared 1x1x1 conv applied to both stream 1 and the skip path
        # (reference model.py:144-148 reuses one conv_layer object).
        shared = nn.Dense(cfg.no_units, dtype=dt,
                          kernel_init=nn.initializers.he_normal())
        out1 = act(shared(net1))
        skip = act(shared(net2))

        def norm_drop(h):
            if cfg.dropout_rate > 0.0:
                h = nn.Dropout(cfg.dropout_rate, deterministic=deterministic)(h)
            if cfg.use_layer_norm:
                # flax GroupNorm(num_groups=1) normalises over ALL
                # non-batch axes (spatial + channels) -- exactly what the
                # reference's tfa.GroupNormalization(groups=1, axis=-1)
                # does (model.py:139). Deliberate: per-voxel LayerNorm
                # would NOT be parity (statistics here pool the crop).
                h = nn.GroupNorm(num_groups=1)(h)
            return h

        fused = cfg.fused_conv
        h = norm_drop(net2)
        h = act(h)
        h = ConvXY(cfg.no_units, cfg.resid_init_std, dtype=dt,
                   fused=fused)(h)
        h = norm_drop(h)
        h = act(h)
        h = ConvXY(cfg.no_units, cfg.resid_init_std, dtype=dt,
                   fused=fused)(h)

        gating_units = cfg.no_units if cfg.channelwise_gating else 1
        gate_raw = nn.Dense(
            gating_units, dtype=dt,
            kernel_init=nn.initializers.normal(cfg.resid_init_std)
        )(h)
        gate = nn.sigmoid(gate_raw + cfg.gate_offset)
        out2 = skip * (1.0 - gate) + h * gate
        return out1, out2


class Encoder(nn.Module):
    """The full encoder; mirrors the reference outer/inner model pair.

    ``__call__(images)``      == reference outer_model (model.py:222)
    ``__call__(features=f)``  == reference inner_model + sigma head
                                 (model.py:216-223), for transfer across
                                 tau protocols.
    Returns (dist_params, dist_params_neighbourhood, im_sigma).
    dist_params has 4 (diag) or 5 (mvg) channels, +4 exp(hyperprior)
    channels when ``infer_inv_gamma`` (reference model.py:201-205).
    """

    cfg: ModelConfig
    n_taus: int
    se_idx: int

    def setup(self):
        cfg = self.cfg
        self.first_conv = nn.Dense(
            cfg.no_units, dtype=_dtype_of(cfg),
            kernel_init=nn.initializers.he_normal())
        self.blocks = [
            GatedResBlock(cfg, name=f"block_{i}")
            for i in range(cfg.no_intermediate_layers)
        ]
        n_out = 5 if cfg.use_mvg else 4
        self.final = nn.Dense(n_out, kernel_init=nn.initializers.he_normal())
        self.sigma_head = nn.Dense(
            self.n_taus,
            kernel_init=nn.initializers.normal(cfg.resid_init_std),
            bias_init=nn.initializers.constant(math.log(cfg.im_loss_sigma)),
        )
        if cfg.infer_inv_gamma:
            self.inv_gamma_raw = self.param(
                "inv_gamma_raw",
                lambda key, shape: jnp.log(
                    jnp.asarray([20.0, 2.5, 20.0, 2.5], jnp.float32)),
                (4,),
            )

    def embed(self, images: jax.Array) -> jax.Array:
        """Raw images -> post-first-conv features (the inner-model input,
        reference model.py:178-183)."""
        act = _activation(self.cfg.activation)
        x = normalise_data(images, self.se_idx, self.cfg.multi_image_normalisation)
        return act(self.first_conv(x))

    def __call__(self, images: jax.Array | None = None, *,
                 features: jax.Array | None = None,
                 deterministic: bool = True):
        if features is None:
            if images is None:
                raise ValueError("provide images or features")
            features = self.embed(images)
        # Hoist the 3x3x1 z-fold across the whole trunk: every op between
        # here and the heads is either voxelwise (Dense/act/gate) or the
        # z-folded conv, so running the blocks in [B*Z,X,Y,C] is exact
        # and replaces per-conv transpose pairs of the 60-channel nets
        # with ONE fold here + unfolds of the small head outputs.
        # GroupNorm pools over all non-batch axes, so the layer-norm
        # configuration keeps the 5-D per-block path (per-(b,z) stats
        # would NOT be parity with the reference's tfa groups=1 over the
        # full crop, model.py:139).
        fold = features.ndim == 5 and not self.cfg.use_layer_norm
        if fold:
            b, h, w, d, _ = features.shape
            features = jnp.moveaxis(features, 3, 1).reshape(
                b * d, h, w, features.shape[-1])

            def unfold(y):
                return jnp.moveaxis(
                    y.reshape(b, d, h, w, y.shape[-1]), 1, 3)
        else:
            def unfold(y):
                return y
        net1 = net2 = features
        for blk in self.blocks:
            net1, net2 = blk(net1, net2, deterministic=deterministic)
        # heads always run (and emit) float32: posterior means/log-stds
        # and noise scales need full precision.
        net1 = net1.astype(jnp.float32)
        net2 = net2.astype(jnp.float32)
        out1 = unfold(self.final(net1))
        out2 = unfold(self.final(net2))
        sigma = unfold(jnp.exp(self.sigma_head(net2)))
        if self.cfg.infer_inv_gamma:
            hyper = jnp.exp(self.inv_gamma_raw)
            out1 = jnp.concatenate(
                [out1, jnp.ones_like(out1[..., :4]) * hyper], axis=-1)
        return out1, out2, sigma
