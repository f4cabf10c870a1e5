"""Pallas 3x3x1 convolution for the encoder trunk (training hot path).

The round-5 step-split probe (benchmarks/probe_ft_split.py) measured the
encoder fwd+bwd at 94% of the 8.7 ms fine-tune step, and the four
3x3x1 convs (reference model.py:152-157, run z-folded as 2-D NHWC
convs -- models/encoder.py::ConvXY) at ~6.9 ms of it. At the published
folded shape (304 planes of 25x25x60, bf16) that conv stack is ~10x off
BOTH roofs: ~0.06 ms of MXU math and ~0.06 ms of HBM traffic per conv,
yet XLA spends 1.72 ms per conv fwd+bwd -- the 60-channel operands fill
60/128 lanes and the conv kernels are overhead-bound at this plane
size. The round-3 formulation probe (benchmarks/probe_conv.py) showed
no XLA-level re-plumbing wins: XLA's im2col pays a 9x activation blowup
THROUGH HBM. Here the shifted views never leave VMEM.

**Measured OUTCOME (round 5): NEGATIVE -- the kernel is correct but
does not beat XLA's native conv**, and ``fused_conv`` therefore
defaults OFF (benchmarks/RESULTS.md "Pallas conv A/B"). Same-session
interleaved steady state at (304, 25, 25, 60) bf16: fwd 2.44 ms Pallas
vs 1.53 XLA; dx 3.37 vs 1.16; dw 2.98. Two formulations were built and
measured (per-tap sublane slicing, then the dx-packed row-tap layout
below); both lose to XLA's conv despite clean Mosaic lowering -- at
60-channel planes the MXU inefficiency (60/128 lanes) binds BOTH
implementations and XLA's conv emitter amortises it better than a
Pallas grid of small dots. This extends the round-3 conclusion
("XLA's native conv wins" among XLA formulations) to hand-written
kernels: the remaining encoder headroom needs fewer/wider convs, an
architecture change that would break reference parity. The op stays
in-tree as a fully-tested option (``fused_conv=on|interpret``) with
vmap/population support, and as the measured record.

Mosaic-native layout, arrived at by measurement: planes are SAME-
padded to an 8-ALIGNED width ``W_SL = round8(W)`` and the three W
shifts are packed DX-MAJOR ONTO THE CHANNEL AXIS in XLA
(``_pack``: (N, H+2, W_SL, 3C), one fused relayout per pass, ~0.1 ms
of extra HBM at the published shape). In-kernel slicing then touches
only UNTILED dims -- row taps on H -- and the aligned W_SL collapse to
rows is relayout-free (v1 sliced the sublane axis at the 9 tap offsets
in-kernel: every tap paid a VMEM relayout, and the unaligned-collapse
variant before it crashed the Mosaic compiler outright).

* forward: per program, 3 accumulating (Np*H*W_SL, 3Ci) x (3Ci, Co)
  MXU dots (one per ROW tap; K = 3C = 180 at the published width,
  vs 9 thin K=60 dots) + bias;
* backward: ONE kernel pass computes dx (flipped/transposed tap
  weights prebuilt in XLA over the packed cotangent), dw and db -- the
  weight grads as fp32 accumulators revisited across the sequential
  plane grid (grid-constant output index maps), one (3Ci, Co) dot per
  row tap covering all three W taps at once.

A ``groups`` grid axis carries population-sweep batching: vmapped
trials with per-trial kernels run as grid (G, N) with the weights
indexed by the group coordinate -- the custom_vmap rules fold a leading
trial axis into either the plane axis (shared weights) or the group
axis (per-trial weights), so ``--parallel-trials`` sweeps keep this
kernel too (the same policy as ops/pallas_elbo.py).

Numerics: dots accumulate in fp32 (``preferred_element_type``) whatever
the activation dtype, matching XLA's conv accumulation; outputs cast
back to the activation dtype. Gated exactly against ``nn.Conv`` in
fp32 through the Mosaic interpreter (tests/test_pallas_conv.py) and
on-chip (tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["make_conv3x3", "conv3x3_available"]

# Planes per program (both passes). 4 is the measured-robust setting:
# npp=8 blocks compile only up to ~12 grid steps before the remote
# Mosaic toolchain rejects the program (bisected on-chip: npp=8/nb<=12
# ok, npp=8/nb>=14 and npp=16 fail; npp=4 compiles to at least nb=76),
# and npp=4 vs 8 measured within noise where both compiled.
_FWD_PLANES = 4


def conv3x3_available(h: int, w: int) -> bool:
    """Planes smaller than the kernel window fall back to XLA (SAME
    padding semantics on degenerate planes are all edge cases)."""
    return h >= 3 and w >= 3


def _round8(x: int) -> int:
    return -(-x // 8) * 8


def _row_taps(xw, h, w_sl, c3, np_):
    """Yield the 3 row-shifted views of the dx-packed planes
    (Np, H+2, W_SL, 3C) as (Np*H*W_SL, 3C) matrices. The W shifts were
    packed onto the channel axis in XLA (dx-major blocks), so the only
    in-kernel slicing is on the UNTILED row dim -- no relayouts; the
    collapse merges untiled dims into the 8-aligned W_SL sublanes."""
    for dy in range(3):
        yield dy, xw[:, dy:dy + h, :, :].reshape(np_ * h * w_sl, c3)


def _fwd_kernel(xw_ref, w_ref, b_ref, o_ref, *, h, w_sl, ci, co, np_):
    acc = None
    for dy, xs in _row_taps(xw_ref[:], h, w_sl, 3 * ci, np_):
        d = jax.lax.dot_general(
            xs, w_ref[0, dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    acc = acc + b_ref[:].astype(jnp.float32)   # (1, Co) broadcast row
    o_ref[:] = acc.reshape(np_, h, w_sl, co).astype(o_ref.dtype)


def _bwd_kernel(xw_ref, wt_ref, ctw_ref, ctc_ref, dx_ref, dw_ref,
                db_ref, *, h, w_sl, ci, co, np_):
    # dx: transposed-kernel row taps over the dx-packed padded cotangent
    acc = None
    for dy, cts in _row_taps(ctw_ref[:], h, w_sl, 3 * co, np_):
        d = jax.lax.dot_general(
            cts, wt_ref[0, dy], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = d if acc is None else acc + d
    dx_ref[:] = acc.reshape(np_, h, w_sl, ci).astype(dx_ref.dtype)

    # dw/db: fp32 accumulators revisited across the sequential plane
    # grid (their index maps are constant in the plane coordinate).
    # The pad columns of both operands are zero, so they add nothing;
    # one (3Ci, Co) dot per row tap covers all three W taps at once.
    ct_c = ctc_ref[:].reshape(np_ * h * w_sl, co)
    first = pl.program_id(1) == 0
    for dy, xs in _row_taps(xw_ref[:], h, w_sl, 3 * ci, np_):
        dw = jax.lax.dot_general(xs, ct_c, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)

        @pl.when(first)
        def _init(dw=dw, dy=dy):
            dw_ref[0, dy] = dw

        @pl.when(jnp.logical_not(first))
        def _acc(dw=dw, dy=dy):
            dw_ref[0, dy] += dw

    db = jnp.sum(ct_c.astype(jnp.float32), axis=0, keepdims=True)

    @pl.when(first)
    def _init_db():
        db_ref[0] = db

    @pl.when(jnp.logical_not(first))
    def _acc_db():
        db_ref[0] += db


@functools.lru_cache(maxsize=64)
def make_conv3x3(h: int, w: int, c_in: int, c_out: int,
                 interpret: bool = False):
    """Build the fused 3x3 SAME conv op for a static plane shape.

    Returns ``f(x, kernel, bias) -> y`` with x (N, H, W, Ci), kernel
    (3, 3, Ci, Co), bias (Co,), y (N, H, W, Co) -- ``nn.Conv(features,
    (3, 3), padding='SAME')`` semantics with a closed-form custom VJP
    w.r.t. all three inputs. Mixed dtypes follow the caller (cast
    kernel/bias to the activation dtype first, as flax's promote_dtype
    does); dots accumulate fp32 either way.
    """
    interp = pltpu.InterpretParams() if interpret else False
    w_sl = _round8(w)
    w_pad = w_sl + 8

    def _pack(x):
        """(N, H, W, C) -> dx-packed (N, H+2, W_SL, 3C): SAME-pad, then
        the three W shifts concatenated dx-major on the channel axis
        (in XLA, where the relayout is one fused copy) so the kernels
        slice only untiled dims."""
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, w_pad - w - 1), (0, 0)))
        return jnp.concatenate(
            [xp[:, :, s:s + w_sl, :] for s in range(3)], axis=-1)

    def _run_fwd(xw, k, b, groups):
        gn, hp, _, _ = xw.shape
        n = gn // groups
        npp = min(_FWD_PLANES, n)
        nb = -(-n // npp)
        xw = _pad_planes(xw, groups, n, nb, npp)
        w_r = k.reshape(groups, 3, 3 * c_in, c_out)
        out = pl.pallas_call(
            functools.partial(_fwd_kernel, h=h, w_sl=w_sl, ci=c_in,
                              co=c_out, np_=npp),
            grid=(groups, nb),
            in_specs=[
                pl.BlockSpec((npp, hp, w_sl, 3 * c_in),
                             lambda g, i: (g * nb + i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, 3 * c_in, c_out),
                             lambda g, i: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c_out), lambda g, i: (g, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((npp, h, w_sl, c_out),
                                   lambda g, i: (g * nb + i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(
                (groups * nb * npp, h, w_sl, c_out), xw.dtype),
            interpret=interp,
        )(xw, w_r, b)
        out = out[:, :, :w, :]
        if nb * npp != n:
            out = out.reshape(groups, nb * npp, h, w, c_out)[:, :n]
            out = out.reshape(groups * n, h, w, c_out)
        return out

    def _pad_planes(x, groups, n, nb, npp):
        """Zero-pad the per-group plane count up to nb*npp (zero planes
        contribute nothing to dw/db; their dx rows are sliced off)."""
        if nb * npp == n:
            return x
        return jnp.concatenate(
            [x.reshape((groups, n) + x.shape[1:]),
             jnp.zeros((groups, nb * npp - n) + x.shape[1:], x.dtype)],
            axis=1).reshape((groups * nb * npp,) + x.shape[1:])

    def _run_bwd(xw, k, ctw, groups):
        gn, hp, _, _ = xw.shape
        n = gn // groups
        npp = min(_FWD_PLANES, n)
        nb = -(-n // npp)
        xw = _pad_planes(xw, groups, n, nb, npp)
        ctw = _pad_planes(ctw, groups, n, nb, npp)
        # transposed/flipped taps for dx (built in XLA):
        # wt_r[dy', s*Co+co, ci] = w[2-dy', 2-s, ci, co]
        wt_r = jnp.flip(k, axis=(1, 2)).swapaxes(-1, -2).reshape(
            groups, 3, 3 * c_out, c_in)
        # the centre (unshifted) cotangent: block s=1 of the packing,
        # sliced in XLA to avoid an in-kernel lane-offset slice
        ctc = ctw[:, 1:1 + h, :, c_out:2 * c_out]
        dx, dw, db = pl.pallas_call(
            functools.partial(_bwd_kernel, h=h, w_sl=w_sl, ci=c_in,
                              co=c_out, np_=npp),
            grid=(groups, nb),
            in_specs=[
                pl.BlockSpec((npp, hp, w_sl, 3 * c_in),
                             lambda g, i: (g * nb + i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, 3 * c_out, c_in),
                             lambda g, i: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npp, hp, w_sl, 3 * c_out),
                             lambda g, i: (g * nb + i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((npp, h, w_sl, c_out),
                             lambda g, i: (g * nb + i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((npp, h, w_sl, c_in),
                             lambda g, i: (g * nb + i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3, 3 * c_in, c_out),
                             lambda g, i: (g, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, c_out), lambda g, i: (g, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((groups * nb * npp, h, w_sl, c_in),
                                     ctw.dtype),
                jax.ShapeDtypeStruct((groups, 3, 3 * c_in, c_out),
                                     jnp.float32),
                jax.ShapeDtypeStruct((groups, 1, c_out), jnp.float32),
            ],
            interpret=interp,
        )(xw, wt_r, ctw, ctc)
        dx = dx[:, :, :w, :]
        if nb * npp != n:
            dx = dx.reshape((groups, nb * npp) + dx.shape[1:])[:, :n]
            dx = dx.reshape((groups * n,) + dx.shape[2:])
        dw = dw.reshape(groups, 3, 3, c_in, c_out).astype(k.dtype)
        db = db.reshape(groups, c_out).astype(k.dtype)
        return dx, dw, db

    # ---- flat implementations (custom_vmap boundaries) ------------------
    # The batch ("population trial") axis folds into either the plane
    # axis (shared weights) or the group axis (per-trial weights); both
    # directions sit behind custom_vjp, so the rules fire only under
    # pure batch traces (same policy as ops/pallas_elbo.py).

    @custom_batching.custom_vmap
    def flat_fwd(x, k, b):
        return _run_fwd(_pack(x), k[None], b[None], 1)

    @flat_fwd.def_vmap
    def _flat_fwd_vmap(axis_size, in_batched, x, k, b):
        xb, kb, bb = in_batched
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        if not (kb or bb):
            out = flat_fwd(x.reshape((-1,) + x.shape[2:]), k, b)
            return out.reshape((axis_size, -1) + out.shape[1:]), True
        if not kb:
            k = jnp.broadcast_to(k, (axis_size,) + k.shape)
        if not bb:
            b = jnp.broadcast_to(b, (axis_size,) + b.shape)
        out = _run_fwd(_pack(x.reshape((-1,) + x.shape[2:])), k, b,
                       axis_size)
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    @custom_batching.custom_vmap
    def flat_bwd(x, k, ct):
        dx, dw, db = _run_bwd(_pack(x), k[None], _pack(ct), 1)
        return dx, dw[0], db[0]

    @flat_bwd.def_vmap
    def _flat_bwd_vmap(axis_size, in_batched, x, k, ct):
        xb, kb, ctb = in_batched
        if not xb:
            x = jnp.broadcast_to(x, (axis_size,) + x.shape)
        if not ctb:
            ct = jnp.broadcast_to(ct, (axis_size,) + ct.shape)
        if not kb:
            # Shared weights still take the GROUPED path (broadcast k)
            # so dw/db come back PER TRIAL: vmap semantics require each
            # batch element's own weight gradient (vmap-of-grad); when
            # the trial axis is instead a grad-of-vmap broadcast, the
            # custom_vjp machinery sums the batched cotangent -- correct
            # either way. Returning the fold-summed dw as unbatched
            # (the tempting optimisation) silently hands every element
            # the cross-trial SUM under vmap-of-grad (review finding,
            # round 5).
            k = jnp.broadcast_to(k, (axis_size,) + k.shape)
        fold = (-1,) + x.shape[2:]
        ct_f = ct.reshape((-1,) + ct.shape[2:])
        dx, dw, db = _run_bwd(_pack(x.reshape(fold)), k, _pack(ct_f),
                              axis_size)
        return ((dx.reshape((axis_size, -1) + dx.shape[1:]), dw, db),
                (True, True, True))

    @jax.custom_vjp
    def conv(x, k, b):
        return flat_fwd(x, k, b)

    def conv_fwd(x, k, b):
        return flat_fwd(x, k, b), (x, k)

    def conv_bwd(res, ct):
        x, k = res
        dx, dw, db = flat_bwd(x, k, ct)
        return dx, dw, db

    conv.defvjp(conv_fwd, conv_bwd)
    return conv
