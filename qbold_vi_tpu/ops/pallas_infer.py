"""Fused Pallas stream-1 inference encoder: normalise -> dense chain -> q.

Why this kernel exists (benchmarks/probe_encoder.py, RESULTS.md round-3):
the headline inference program (``save_predictions``'s encode + summarize,
reference model.py:772-803) only ever evaluates encoder stream 1
(``use_first_op=True``) -- a pure VOXELWISE dense chain, since stream 2's
convs are dead under XLA DCE -- yet the XLA encode costs 4.07 ms of the
5.78 ms composite at 1.03M voxels. Two structural reasons, both layout:

* every intermediate (N, 60) activation round-trips HBM between matmuls,
  and
* the trailing 11/60-channel axis occupies 11-60 of the 128 lanes of
  every TPU tile, so the elementwise stages (clip/log normalisation,
  activations) run at ~8-47% lane occupancy (~84 GB/s effective).

This kernel runs the whole chain per voxel tile with all state in VMEM:

    clip -> spin-echo-window normalise -> log   (reference model.py:97-113)
    -> Dense(T->U) + act                        (model.py:115-120)
    -> [shared Dense(U->U) + act] x n_blocks    (model.py:144-148: stream 1
                                                 is out1 = act(shared(net1)))
    -> float32 Dense(U->4|5) head               (model.py:191-199)

Inside the kernel activations live CHANNEL-MAJOR ``(C, R)``: the voxel
axis fills all 128 lanes of every VPU op and MXU tile (the first matmul
contracts the input's trailing tau axis directly, so no explicit
transpose is ever materialised). The head output is written as a dense
channel-major ``(5, n_pad)`` array whose minor (voxel) axis is unpadded
in the tiled HBM layout -- it feeds the quadrature summarize kernel
(ops/quadrature.py::quad_posterior_summaries_packed) through a cheap
minor-split reshape instead of ``pack_params_tiled``'s (N, 5) transpose,
whose padded-minor source wastes 123/128 lanes of HBM traffic.

Coverage: stream 1 is voxelwise for EVERY encoder configuration --
GroupNorm and dropout act only on the stream-2 residual path (reference
model.py:142-174; models/encoder.py::GatedResBlock) -- so the only
requirement is a Mosaic-safe activation. The learned inverse-gamma
hyperprior channels (appended constants, model.py:201-205) are not
emitted: the summarization path strips them anyway (infer._encode_q).

Forward-only by design: this is the inference path; training gradients
flow through the jnp/flax encoder (and the fused ELBO kernel's VJP).

Gated in tests/test_pallas_infer.py: interpret mode against the flax
encoder on CPU across configurations, and on-chip against the same jnp
program on the real Mosaic compile.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["encode_q1_packed", "encode_quad_fused",
           "fused_infer_available", "SUPPORTED_ACTS"]

# Rows (voxels) per grid step. Swept interleaved on v5e at 1.03M voxels
# (median of 3 blocks x 80 reps): 1024 -> 2.67 ms, 2048 -> 2.43,
# 4096 -> 2.33, 8192 -> 2.28. VMEM at 8192: one (8192, 128)-padded fp32
# input tile (4 MB) double-buffered + (64, 8192) activations -- well
# under budget.
_ROWS = 8192
# The packed-q consumer (quadrature kernel at its default 1024 lanes)
# needs n_pad % (8 * lanes) == 0.
_PAD_MULTIPLE = 8192

# Activations with Mosaic-safe jax.nn implementations (elementwise
# exp/tanh/erf compositions). flax resolves cfg.activation via
# getattr(nn, name) (models/encoder.py::_activation); same functions.
SUPPORTED_ACTS = ("relu", "gelu", "tanh", "sigmoid", "softplus", "elu",
                  "silu", "swish", "leaky_relu", "relu6", "linear")


def fused_infer_available(activation: str) -> bool:
    return activation in SUPPORTED_ACTS


def _act_fn(name: str):
    if name == "linear":
        return lambda x: x
    return getattr(jax.nn, name)


def _encode_body(x, wfc_ref, bfc_ref, wb_ref, bb_ref, wf_ref, bf_ref, *,
                 se_idx: int, multi_image: bool, activation: str,
                 n_blocks: int, trunk: str, mask_channel: bool,
                 channel_major: bool):
    """Shared kernel body: one voxel tile of the stream-1 encode,
    returning the raw head rows ``q (5, R)`` in fp32 (row 4 zero for
    diagonal heads). ``x``: (R, T[+1]) voxel-major or (T[+1], R)
    channel-major."""
    act = _act_fn(activation)
    dt = jnp.bfloat16 if trunk == "bfloat16" else jnp.float32

    # ---- in-model normalisation (reference model.py:97-113; bit-identical
    # to models/encoder.py::normalise_data, float32); mask_channel fuses
    # the brain-mask zeroing into the same read (save_predictions masks
    # before the encode, reference model.py:776), avoiding one XLA
    # read+write of the padded-minor (..., T) tile layout. ---------------
    #
    # The normalisation runs CHANNEL-MAJOR (T, R): on voxel-major (R, 11)
    # tiles the VPU processes all 128 lanes of each 8x128 tile, so the
    # transcendental work pays ~12x its useful share; channel-major it
    # runs at full occupancy and the embed matmul contracts the leading
    # axis (the canonical MXU form). With ``channel_major`` input the
    # block arrives (T, R) already -- the production serving layout,
    # whose dense-minor HBM tiles also read 3.2x faster than the padded
    # voxel-major ones (benchmarks/RESULTS.md DMA probe) -- otherwise
    # the (R, T) block is transposed in VMEM first.
    if not channel_major:
        x = x.T                                          # (T[+1], R)
    if mask_channel:
        x = x[:-1, :] * x[-1:, :]
    # tolerate bf16 input volumes (halves the kernel's HBM read, but a
    # measured net loss: benchmarks/probe_bf16_input.py -- fp32 stays
    # the serving dtype); all normalisation math runs fp32 either way
    # (no-op cast for the default fp32 inputs)
    x = x.astype(jnp.float32)
    x = jnp.clip(x, 1e-2, 1e8)
    if multi_image:
        lo = max(se_idx - 1, 0)                          # se_idx=0 edge guard
        ref = jnp.mean(x[lo:se_idx + 2, :], axis=0, keepdims=True)
    else:
        ref = x[se_idx:se_idx + 1, :]
    h = jnp.log(x / ref).astype(dt)                      # (T, R)
    w = wfc_ref[:].astype(dt)                            # (U, T)
    h = jax.lax.dot_general(w, h, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    h = act(h.astype(dt) + bfc_ref[:].astype(dt))        # (U, R)

    # ---- stream-1 trunk: out1 = act(shared_dense(net1)) per block
    # (reference model.py:144-148). flax Dense(dtype=dt) rounds the fp32
    # MXU accumulator to dt before the bias add; matched here. ---------------
    for i in range(n_blocks):
        w = wb_ref[i].astype(dt)                         # (U, U)
        h = jax.lax.dot_general(w, h, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = act(h.astype(dt) + bb_ref[i].astype(dt))

    # ---- float32 head (models/encoder.py casts net1 to fp32 first) ---------
    h = h.astype(jnp.float32)
    q = jax.lax.dot_general(wf_ref[:], h, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return q + bf_ref[:]


def _kernel(x_ref, wfc_ref, bfc_ref, wb_ref, bb_ref, wf_ref, bf_ref,
            q_ref, **statics):
    q_ref[:] = _encode_body(x_ref[:], wfc_ref, bfc_ref, wb_ref, bb_ref,
                            wf_ref, bf_ref, **statics)


def _encode_quad_kernel(x_ref, wfc_ref, bfc_ref, wb_ref, bb_ref, wf_ref,
                        bf_ref, mean_ref, var_ref, raw_ref, *,
                        quad: dict, **statics):
    """THE single-kernel inference path: stream-1 encode + deterministic
    quadrature posterior summaries + raw-log-std transforms, one HBM
    read of the voxel tile, three small channel-major writes -- q never
    leaves VMEM. The per-tile q rows (5, R) are re-split into full
    (8, R/8) VPU tiles before the quadrature's ~150 transcendentals per
    voxel (on (1, R) rows the VPU would pay 8x the useful sublane work);
    the resulting voxel bijection (v = tile*R + s*(R/8) + lane) is what
    the wrapper's minor-split reshape of the (3, rows8, R/8) outputs
    reproduces."""
    from .quadrature import quad_tile_summaries

    q = _encode_body(x_ref[:], wfc_ref, bfc_ref, wb_ref, bb_ref,
                     wf_ref, bf_ref, **statics)          # (5, R) fp32
    r = q.shape[1]
    qs = q.reshape(5, 8, r // 8)
    means, variances, (ls0, ls1, od) = quad_tile_summaries(
        qs[0], qs[1], qs[2], qs[3], qs[4], **quad)
    mean_ref[0], mean_ref[1], mean_ref[2] = means
    var_ref[0], var_ref[1], var_ref[2] = variances
    raw_ref[0] = ls0
    raw_ref[1] = ls1
    raw_ref[2] = od


def _stream1_weights(enc_params, n_blocks: int):
    """Extract + pre-transpose the stream-1 weights from the flax Encoder
    param tree (models/encoder.py naming: first_conv / block_i/Dense_0 /
    final). The head is zero-padded to 5 output channels so the kernel's
    output block is the (5, n_pad) layout the summarize kernels consume
    for both MVG and diagonal posteriors (diag reads row 4 as 0)."""
    wfc = enc_params["first_conv"]["kernel"]             # (T, U)
    bfc = enc_params["first_conv"]["bias"]               # (U,)
    u = wfc.shape[1]
    wb = jnp.stack([enc_params[f"block_{i}"]["Dense_0"]["kernel"].T
                    for i in range(n_blocks)])           # (nb, U, U)
    bb = jnp.stack([enc_params[f"block_{i}"]["Dense_0"]["bias"]
                    for i in range(n_blocks)])[..., None]  # (nb, U, 1)
    wf = enc_params["final"]["kernel"]                   # (U, K)
    bf = enc_params["final"]["bias"]                     # (K,)
    k = wf.shape[1]
    wf_t = jnp.zeros((5, u), wf.dtype).at[:k].set(wf.T)
    bf_t = jnp.zeros((5, 1), bf.dtype).at[:k, 0].set(bf)
    return (wfc.T, bfc[:, None], wb, bb, wf_t, bf_t)


@partial(jax.jit, static_argnames=("se_idx", "multi_image", "activation",
                                   "n_blocks", "trunk", "rows",
                                   "pad_multiple", "interpret",
                                   "mask_channel", "input_layout"))
def encode_q1_packed(images: jax.Array, enc_params, *, se_idx: int,
                     multi_image: bool, activation: str, n_blocks: int,
                     trunk: str, rows: int = _ROWS,
                     pad_multiple: int = _PAD_MULTIPLE,
                     interpret: bool = False,
                     mask_channel: bool = False,
                     input_layout: str = "voxel") -> jax.Array:
    """Fused stream-1 encode -> channel-major raw posterior params
    ``q_t (5, n_pad)`` (row 4 zero for diagonal heads).

    ``input_layout``: "voxel" -- images are ``(..., T)``, the user-facing
    array contract; each (rows, T) block is transposed in VMEM (its
    padded-minor HBM tiles DMA at ~1/3 the dense rate -- the measured
    layout tax, benchmarks/RESULTS.md). "channel" -- images are
    ``(T, N)`` channel-major, the production serving layout
    (posterior_maps uploads chunks this way: the transpose rides the
    host->device copy): dense-minor tiles, full-rate DMA.

    ``mask_channel``: images carry the brain mask as a trailing channel
    (``(..., T+1)`` / leading ``(T+1, N)`` row) and the zeroing is fused
    into the kernel's first read.

    n_pad = ceil(N / lcm(rows, pad_multiple)) * that; padded voxels carry
    neutral inputs (constant 1 -> log ratio 0) and must be sliced off by
    the caller (``q_t[:, :N]``). ``trunk``: "float32" | "bfloat16" -- the
    dtype of the embed/trunk matmuls, matching the flax encoder's
    ``compute_dtype`` resolution; normalisation and the head are always
    float32 (models/encoder.py).
    """
    x, inputs, in_specs, n_pad, grid = _prologue(
        images, enc_params, n_blocks=n_blocks, mask_channel=mask_channel,
        input_layout=input_layout, rows=rows, pad_multiple=pad_multiple)
    kernel = partial(_kernel, se_idx=se_idx, multi_image=multi_image,
                     activation=activation, n_blocks=n_blocks, trunk=trunk,
                     mask_channel=mask_channel,
                     channel_major=input_layout == "channel")
    q_t = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((5, rows), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((5, n_pad), jnp.float32),
        compiler_params=_COMPILER_PARAMS,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, *inputs)
    return q_t


def _prologue(images, enc_params, *, n_blocks: int, mask_channel: bool,
              input_layout: str, rows: int, pad_multiple: int = 1):
    """Shared wrapper prologue for both fused-inference kernels: layout
    validation, voxel padding (neutral constant-1 rows), weight
    extraction, tau-channel check, and the input BlockSpecs. Returns
    (x, weight_arrays, in_specs, n_pad, grid)."""
    if input_layout not in ("voxel", "channel"):
        raise ValueError(f"input_layout must be voxel|channel, "
                         f"got {input_layout!r}")
    channel_major = input_layout == "channel"
    if channel_major:
        t, n = images.shape
        x = images
    else:
        x = images.reshape(-1, images.shape[-1])
        n, t = x.shape
    blk = int(np.lcm(rows, pad_multiple))
    n_pad = ((n + blk - 1) // blk) * blk
    if n_pad != n:
        pad_shape = ((t, n_pad - n) if channel_major else (n_pad - n, t))
        x = jnp.concatenate(
            [x, jnp.ones(pad_shape, x.dtype)],
            axis=1 if channel_major else 0)

    wfc, bfc, wb, bb, wf, bf = _stream1_weights(enc_params, n_blocks)
    u = wfc.shape[0]
    t_im = t - 1 if mask_channel else t   # tau channels (mask excluded)
    if wfc.shape[1] != t_im:
        raise ValueError(
            f"images carry {t_im} tau channels but first_conv expects "
            f"{wfc.shape[1]}")

    full = lambda i: (0, 0)                              # noqa: E731
    x_spec = (pl.BlockSpec((t, rows), lambda i: (0, i),
                           memory_space=pltpu.VMEM) if channel_major
              else pl.BlockSpec((rows, t), lambda i: (i, 0),
                                memory_space=pltpu.VMEM))
    in_specs = [
        x_spec,
        pl.BlockSpec((u, t_im), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((u, 1), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((n_blocks, u, u), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_blocks, u, 1), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((5, u), full, memory_space=pltpu.VMEM),
        pl.BlockSpec((5, 1), full, memory_space=pltpu.VMEM),
    ]
    return x, (wfc, bfc, wb, bb, wf, bf), in_specs, n_pad, n_pad // rows


# rows >= 32768 exceeds the 16 MB scoped-VMEM default (the fp32
# normalise + (U, R) activations); v5e carries 128 MB
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


@partial(jax.jit, static_argnames=("se_idx", "multi_image", "activation",
                                   "n_blocks", "trunk", "rows", "interpret",
                                   "mask_channel", "input_layout", "mvg",
                                   "oef_range", "min_oef", "dbv_range",
                                   "min_dbv", "dw_coeff"))
def encode_quad_fused(images: jax.Array, enc_params, *, se_idx: int,
                      multi_image: bool, activation: str, n_blocks: int,
                      trunk: str, mvg: bool, oef_range: float,
                      min_oef: float, dbv_range: float, min_dbv: float,
                      dw_coeff: float, rows: int = _ROWS,
                      interpret: bool = False, mask_channel: bool = False,
                      input_layout: str = "voxel"):
    """The single-kernel inference program: fused stream-1 encode +
    deterministic quadrature summaries + raw-log-std transforms. Same
    contract as ``encode_q1_packed`` for the input side; returns
    channel-major ``(means_t (3, n_pad), vars_t (3, n_pad),
    raw_t (3, n_pad))`` -- raw rows are (log-std0, log-std1, offdiag;
    row 2 zero for diagonal heads); callers slice ``[:, :N]``. q never
    touches HBM. ``rows`` must be a multiple of 8 (the in-kernel voxel
    re-split)."""
    if rows % 8:
        raise ValueError(f"rows must be a multiple of 8, got {rows}")
    x, inputs, in_specs, n_pad, grid = _prologue(
        images, enc_params, n_blocks=n_blocks, mask_channel=mask_channel,
        input_layout=input_layout, rows=rows)
    lq = rows // 8

    kernel = partial(_encode_quad_kernel, se_idx=se_idx,
                     multi_image=multi_image, activation=activation,
                     n_blocks=n_blocks, trunk=trunk,
                     mask_channel=mask_channel,
                     channel_major=input_layout == "channel",
                     quad=dict(mvg=mvg, oef_range=oef_range, min_oef=min_oef,
                               dbv_range=dbv_range, min_dbv=min_dbv,
                               dw_coeff=dw_coeff))
    out_spec = pl.BlockSpec((3, 8, lq), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((3, n_pad // lq, lq), jnp.float32)
    mean_t, var_t, raw_t = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[out_shape, out_shape, out_shape],
        compiler_params=_COMPILER_PARAMS,
        interpret=pltpu.InterpretParams() if interpret else False,
    )(x, *inputs)
    # the kernel's (5, R) -> (5, 8, R/8) split makes voxel v of tile i
    # land at [i, s, l] with v = i*rows + s*(rows/8) + l; the row-major
    # reshape below inverts exactly that
    return (mean_t.reshape(3, n_pad), var_t.reshape(3, n_pad),
            raw_t.reshape(3, n_pad))
