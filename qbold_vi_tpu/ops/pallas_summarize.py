"""Fused Pallas kernel: MC posterior summarization (the inference hot path).

Per voxel the inference path draws S (default 200) correlated logit-Normal
samples, forward-transforms them to physical (OEF, DBV), derives R2', and
accumulates means/variances (reference: model.py:326-343 via 200 predict
passes, model.py:790). The jnp fallback streams this with lax.fori_loop
(dist/logit_mvn.py posterior_means_streamed); this kernel goes further:

* the whole S-sample loop runs with ALL state in VMEM/registers -- HBM
  traffic is exactly one read of the posterior params and one write of
  the means + variances;
* normals are generated on-chip with the TPU PRNG (pltpu.prng_random_bits
  + Box-Muller), no HBM-resident random tensors;
* the voxel axis is laid out as native (8 sublanes x 128 lanes) VPU
  tiles: host packs params as (5, 8, N/8) so every per-param row the
  kernel touches is a full-rank-2 tile (also required by the TPU PRNG,
  which only emits rank>=2 shapes).

Gated against the jnp path in tests/test_pallas.py (TPU-only: the Mosaic
interpreter is impractically slow on CPU hosts): deterministic parts must
agree exactly; MC summaries within Monte-Carlo error.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["mc_posterior_summaries", "mc_posterior_summaries_packed",
           "mc_kl_map",
           "pack_params_tiled", "unpack_summaries_tiled"]

_SUB = 8             # sublanes
# lanes per grid step -> 8*1024 = 8192 voxels/block. Swept on v5e
# (1M voxels, S=200): 256 -> 393 ms, 512 -> 17.2 ms, 1024 -> 11.8 ms,
# 2048 -> 16.1 ms.
_LANES = 1024
_TWO_PI = 2.0 * math.pi


def pack_params_tiled(params, lanes: int):
    """(pt, n_pad, grid): (N, 4|5) raw posterior params -> the
    (5, 8, n_pad/8) sublane-tiled layout the summary kernels consume
    (diag inputs zero-pad the off-diagonal channel; the voxel axis is
    zero-padded to a whole number of (8, lanes) tiles). Shared by the MC
    and quadrature summarize kernels -- which are gated against each
    other, so their voxel layouts must never drift apart."""
    n, k = params.shape
    blk = _SUB * lanes
    n_pad = ((n + blk - 1) // blk) * blk
    pt = jnp.zeros((5, n_pad), params.dtype)
    pt = pt.at[:k, :n].set(params.T)
    pt = pt.reshape(5, _SUB, n_pad // _SUB)
    return pt, n_pad, (n_pad // _SUB) // lanes


def unpack_summaries_tiled(mean_t, var_t, n: int, n_pad: int):
    """Inverse of pack_params_tiled for the (3, 8, n_pad/8) outputs:
    -> (means (N, 3), vars (N, 3))."""
    mean = mean_t.reshape(3, n_pad)[:, :n].T
    var = var_t.reshape(3, n_pad)[:, :n].T
    return mean, var


def _box_muller(shape):
    """Two independent standard-normal draws of ``shape`` (rank >= 2)
    from the on-chip PRNG (must be seeded first)."""
    # bitcast to uint32 BEFORE shifting: the raw bits arrive as int32 and
    # an arithmetic >> of negative values sign-extends, producing
    # negative "uniforms" (and NaNs through log). Mosaic cannot cast
    # uint32 -> float32, so bitcast the (now < 2^24, hence non-negative)
    # shifted value back to int32 first.
    def bits_to_unit(raw):
        b = pltpu.bitcast(raw, jnp.uint32) >> 8
        return pltpu.bitcast(b, jnp.int32).astype(jnp.float32) * (
            1.0 / (1 << 24))

    # 24-bit mantissa uniforms in (0, 1]; +1e-12 avoids log(0).
    u1 = bits_to_unit(pltpu.prng_random_bits(shape)) + 1e-12
    u2 = bits_to_unit(pltpu.prng_random_bits(shape))
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2), r * jnp.sin(_TWO_PI * u2)


def _summarize_kernel(seed_ref, params_ref, mean_ref, var_ref, *,
                      no_samples: int, mvg: bool, oef_range: float,
                      min_oef: float, dbv_range: float, min_dbv: float,
                      dw_coeff: float, antithetic: bool):
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * jnp.int32(7919))

    mu0 = params_ref[0]                               # (8, L)
    ls0 = jnp.tanh(params_ref[1]) * 3.0 - 1.0         # transform_std
    mu1 = params_ref[2]
    ls1 = jnp.tanh(params_ref[3]) * 3.0 - 1.0
    std0 = jnp.exp(ls0)
    std1 = jnp.exp(ls1)
    offd = jnp.tanh(params_ref[4]) * math.exp(-2.0) if mvg else 0.0

    zero = jnp.zeros_like(mu0)
    acc = (zero, zero, zero, zero, zero, zero)

    def accumulate(acc, z0, z1):
        s_o, s2_o, s_d, s2_d, s_r, s2_r = acc
        oef_l = mu0 + z0 * std0
        if mvg:
            dbv_l = mu1 + z0 * offd + z1 * std1
        else:
            dbv_l = mu1 + z1 * std1
        oef = jax.nn.sigmoid(oef_l) * oef_range + min_oef
        dbv = jax.nn.sigmoid(dbv_l) * dbv_range + min_dbv
        r2p = dw_coeff * oef * dbv
        return (s_o + oef, s2_o + oef * oef,
                s_d + dbv, s2_d + dbv * dbv,
                s_r + r2p, s2_r + r2p * r2p)

    if antithetic:
        # Each draw is used as (z, -z): unbiased for every summary
        # (z and -z have the same law), halves PRNG/Box-Muller work per
        # sample, and the negative pair correlation REDUCES the variance
        # of mean estimates through the monotone sigmoid transform.
        def body(_, acc):
            z0, z1 = _box_muller(mu0.shape)
            acc = accumulate(acc, z0, z1)
            return accumulate(acc, -z0, -z1)

        n_iter = no_samples // 2
    else:
        def body(_, acc):
            z0, z1 = _box_muller(mu0.shape)
            return accumulate(acc, z0, z1)

        n_iter = no_samples

    s_o, s2_o, s_d, s2_d, s_r, s2_r = jax.lax.fori_loop(0, n_iter, body, acc)

    effective = 2 * (no_samples // 2) if antithetic else no_samples
    inv_n = 1.0 / float(effective)
    m_o, m_d, m_r = s_o * inv_n, s_d * inv_n, s_r * inv_n
    mean_ref[0] = m_o
    mean_ref[1] = m_d
    mean_ref[2] = m_r
    var_ref[0] = jnp.maximum(s2_o * inv_n - m_o * m_o, 0.0)
    var_ref[1] = jnp.maximum(s2_d * inv_n - m_d * m_d, 0.0)
    var_ref[2] = jnp.maximum(s2_r * inv_n - m_r * m_r, 0.0)


def _kl_kernel(seed_ref, q_ref, p_ref, kl_ref, *, no_samples: int,
               mvg: bool):
    """Monte-Carlo KL(q || p) map, the algebraically-reduced form of
    dist/logit_mvn.py::mvg_kl_samples (Jacobian/normaliser cancellation):
        kl = mean_s 0.5 (swr_p(l_s) - swr_q(l_s))
             + 0.5 (logdet_p - logdet_q)
    evaluated per voxel with the on-chip PRNG, accumulators in VMEM."""
    pid = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + pid * jnp.int32(12553))

    q_mu0 = q_ref[0]
    q_ls0 = jnp.tanh(q_ref[1]) * 3.0 - 1.0
    q_mu1 = q_ref[2]
    q_ls1 = jnp.tanh(q_ref[3]) * 3.0 - 1.0
    q_std0 = jnp.exp(q_ls0)
    q_std1 = jnp.exp(q_ls1)
    q_od = jnp.tanh(q_ref[4]) * math.exp(-2.0) if mvg else 0.0

    p_mu0 = p_ref[0]
    p_ls0 = jnp.tanh(p_ref[1]) * 3.0 - 1.0
    p_mu1 = p_ref[2]
    p_ls1 = jnp.tanh(p_ref[3]) * 3.0 - 1.0
    p_od = jnp.tanh(p_ref[4]) * math.exp(-2.0) if mvg else 0.0

    # Cholesky whitening shared with dist/logit_mvn.py (the single
    # owner of that algebra; pure jnp, runs inside Pallas). The factors
    # depend only on the q/p tiles, not the draw: hoisted out of the
    # sample loop -- 6 exps per TILE instead of per DRAW (the same
    # pattern as ops/pallas_elbo.py; Mosaic does not guarantee LICM of
    # vector transcendentals inside fori_loop).
    from ..dist.logit_mvn import _whiten_apply, _whiten_factors

    bound = math.log((1.0 - 1e-6) / 1e-6)
    qf = _whiten_factors(q_ls0, q_ls1, q_od)
    pf = _whiten_factors(p_ls0, p_ls1, p_od)

    def body(_, acc):
        z0, z1 = _box_muller(q_mu0.shape)
        l0 = q_mu0 + z0 * q_std0
        if mvg:
            l1 = q_mu1 + z0 * q_od + z1 * q_std1
        else:
            l1 = q_mu1 + z1 * q_std1
        l0 = jnp.clip(l0, -bound, bound)
        l1 = jnp.clip(l1, -bound, bound)
        _, _, w0q, w1q = _whiten_apply(l0, l1, q_mu0, q_mu1, qf)
        _, _, w0p, w1p = _whiten_apply(l0, l1, p_mu0, p_mu1, pf)
        return acc + 0.5 * ((w0p * w0p + w1p * w1p)
                            - (w0q * w0q + w1q * w1q))

    acc = jax.lax.fori_loop(0, no_samples, body, jnp.zeros_like(q_mu0))
    det_term = (p_ls0 + p_ls1) - (q_ls0 + q_ls1)
    kl_ref[0] = acc * (1.0 / float(no_samples)) + det_term


@partial(jax.jit, static_argnames=("no_samples", "mvg", "interpret", "lanes"))
def mc_kl_map(q_params: jax.Array, p_params: jax.Array, seed: jax.Array, *,
              no_samples: int = 100, mvg: bool = True,
              interpret: bool = False, lanes: int = _LANES):
    """Per-voxel Monte-Carlo KL(q || p) (the reference's kl map export,
    model.py:827) as a fused Pallas kernel. q_params/p_params: (N, 4|5)
    raw head outputs. Returns (N,) float32. Gradient-free (inference
    export only); gated vs the jnp path in tests/test_pallas.py."""
    n = q_params.shape[0]
    qt, n_pad, grid = pack_params_tiled(q_params, lanes)
    pt, _, _ = pack_params_tiled(p_params, lanes)
    kernel = partial(_kl_kernel, no_samples=no_samples, mvg=mvg)
    kl = pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((5, _SUB, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, _SUB, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _SUB, lanes), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, _SUB, n_pad // _SUB),
                                       q_params.dtype),
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray([seed], jnp.int32), qt, pt)
    return kl.reshape(n_pad)[:n]


@partial(jax.jit, static_argnames=("no_samples", "mvg", "oef_range",
                                   "min_oef", "dbv_range", "min_dbv",
                                   "dw_coeff", "interpret", "lanes",
                                   "antithetic"))
def mc_posterior_summaries(params: jax.Array, seed: jax.Array, *,
                           no_samples: int = 200, mvg: bool = True,
                           oef_range: float = 0.8, min_oef: float = 0.04,
                           dbv_range: float = 0.2, min_dbv: float = 0.001,
                           dw_coeff: float = 1.0,
                           interpret: bool = False, lanes: int = _LANES,
                           antithetic: bool = True):
    """MC means/variances of (OEF, DBV, R2') per voxel.

    params: (N, 4|5) raw posterior head outputs (any leading shape is
    flattened by the caller); seed: int32 scalar. ``antithetic`` (default)
    draws samples in (z, -z) pairs: unbiased for all summaries, ~33%
    fewer transcendentals per sample, and lower-variance posterior means
    (set False for the reference's plain-iid estimator).
    Returns (means (N, 3), vars (N, 3)).
    """
    if no_samples < 1:
        raise ValueError(f"no_samples must be >= 1, got {no_samples}")
    n = params.shape[0]
    pt, n_pad, grid = pack_params_tiled(params, lanes)
    mean_t, var_t = _mc_call(pt, grid, seed, no_samples=no_samples,
                             mvg=mvg, oef_range=oef_range, min_oef=min_oef,
                             dbv_range=dbv_range, min_dbv=min_dbv,
                             dw_coeff=dw_coeff, interpret=interpret,
                             lanes=lanes, antithetic=antithetic)
    return unpack_summaries_tiled(mean_t, var_t, n, n_pad)


@partial(jax.jit, static_argnames=("no_samples", "mvg", "oef_range",
                                   "min_oef", "dbv_range", "min_dbv",
                                   "dw_coeff", "interpret", "lanes",
                                   "antithetic"))
def mc_posterior_summaries_packed(params_t: jax.Array, seed: jax.Array, *,
                                  no_samples: int = 200, mvg: bool = True,
                                  oef_range: float = 0.8,
                                  min_oef: float = 0.04,
                                  dbv_range: float = 0.2,
                                  min_dbv: float = 0.001,
                                  dw_coeff: float = 1.0,
                                  interpret: bool = False,
                                  lanes: int = _LANES,
                                  antithetic: bool = True):
    """Packed channel-major entry (same contract as
    quadrature.quad_posterior_summaries_packed): ``params_t (5, n_pad)``
    with n_pad % (8 * lanes) == 0, as emitted by the fused stream-1
    encode kernel. Returns channel-major (means_t (3, n_pad),
    vars_t (3, n_pad)); the caller slices its pad."""
    if no_samples < 1:
        raise ValueError(f"no_samples must be >= 1, got {no_samples}")
    n_pad = params_t.shape[1]
    if n_pad % (_SUB * lanes):
        raise ValueError(
            f"packed MC summaries need n_pad % {_SUB * lanes} == 0, "
            f"got {n_pad}")
    pt = params_t.reshape(5, _SUB, n_pad // _SUB)
    mean_t, var_t = _mc_call(pt, (n_pad // _SUB) // lanes, seed,
                             no_samples=no_samples, mvg=mvg,
                             oef_range=oef_range, min_oef=min_oef,
                             dbv_range=dbv_range, min_dbv=min_dbv,
                             dw_coeff=dw_coeff, interpret=interpret,
                             lanes=lanes, antithetic=antithetic)
    return mean_t.reshape(3, n_pad), var_t.reshape(3, n_pad)


def _mc_call(pt, grid, seed, *, no_samples, mvg, oef_range, min_oef,
             dbv_range, min_dbv, dw_coeff, interpret, lanes, antithetic):
    n_pad = pt.shape[1] * pt.shape[2]
    if antithetic and (no_samples < 2 or no_samples % 2):
        # (z, -z) pairing needs an even sample count >= 2; fall back to
        # the plain iid estimator instead of silently dropping a sample.
        antithetic = False
    kernel = partial(_summarize_kernel, no_samples=no_samples, mvg=mvg,
                     oef_range=oef_range, min_oef=min_oef,
                     dbv_range=dbv_range, min_dbv=min_dbv, dw_coeff=dw_coeff,
                     antithetic=antithetic)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((5, _SUB, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((3, _SUB, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, _SUB, lanes), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((3, _SUB, n_pad // _SUB), pt.dtype),
            jax.ShapeDtypeStruct((3, _SUB, n_pad // _SUB), pt.dtype),
        ],
        # bool interpret would use the generic HLO interpreter, which has
        # no rule for the TPU PRNG primitives; the Mosaic TPU interpreter
        # runs them on CPU (slowly -- test use only).
        interpret=pltpu.InterpretParams() if interpret else False,
    )(jnp.asarray([seed], jnp.int32), pt)
