"""Fused Pallas ELBO kernel: posterior sampling + physics decode + NLL
+ sampled KL in ONE VMEM pass per voxel block (SURVEY.md §7.8's stated
end state; the reference hot loop it replaces is model.py:239-286 +
592-610 driven from train.py:376).

Round-2 built the middle of this (ops/pallas_decode.py: decode + NLL
with an analytic recompute-VJP) but left three seams in XLA, together
~10 ms of the 26 ms published fine-tune step (benchmarks/RESULTS.md):

* the S posterior draws ran as jax.random.normal over the voxel batch;
* images/sigma/mask were S-fold broadcast through HBM
  ((S*N, T) reshape copies, train/steps.py);
* the 70-sample MC KL was a separate fori_loop pass whose every
  iteration re-read the q/prior maps from HBM (~0.5 GB of traffic at
  the published 38x25x25x8 workload).

Here ONE kernel per (8 x 256)-voxel tile reads the raw posterior map q
(5 channels), the prior map p (5), the tau-series y and sigma (T each)
and the mask ONCE, then with everything resident in VMEM/registers:

* draws the S_nll posterior samples (on-chip TPU PRNG + Box-Muller,
  shared with ops/pallas_summarize.py -- or host-injected normals for
  bit-exact gating against the jnp path), forward-transforms, evaluates
  the full-SDR tau-series and accumulates the masked reconstruction
  NLL row (pallas_decode._nll_row);
* runs the S_kl-sample reduced KL loop (the algebra of
  dist/logit_mvn.py::mvg_kl_samples: Jacobians/normalisers cancel,
  leaving two squared whitened residuals per draw) in-register;
* the backward pass RECOMPUTES every draw (PRNG replay from the same
  seed / the same injected normals) and emits closed-form gradients
  w.r.t. the raw q map, the prior map, sigma and y -- no stored
  residuals beyond the packed inputs.

HBM traffic per step is exactly: read (q, p, y, sigma, mask), write
two rows -- independent of S_nll and S_kl.

Gating: ``noise='host'`` makes the kernel bit-compatible with the jnp
path (same jax.random normals), so value AND all gradients are gated
exactly in interpreter mode (tests/test_pallas_elbo.py); the on-chip
PRNG path is gated statistically and end-to-end.
"""

from __future__ import annotations

import functools
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import custom_batching
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import ModelConfig, ScanParams
from ..dist.logit_mvn import _whiten_apply, _whiten_factors
from .pallas_decode import (_SUB, _consts, _fold_to_rows, _nll_row,
                            _nll_row_grads, _pack_rows, _pack_taus,
                            _unfold_rows, fused_available)
from .pallas_summarize import _box_muller

__all__ = ["make_fused_elbo", "fused_elbo_available"]

# Lane sweep on v5e at the published 38x25x25x8 workload (value+grad,
# chained timing): 256 -> 10.18 ms, 512 -> 9.29 ms (-9%); 1024 OOM'd
# in scoped VMEM at the old 16 MB budget and, re-probed under the 64 MB
# budget (round 4), compiles but runs 17% SLOWER than 512 (2.43 vs
# 2.08 ms kernel-only -- the wider backward spills its ~4*T tau tiles
# + 10 KL accumulators).
_LANES = 512
# Raised scoped-VMEM budget (default 16 MB): the backward's recompute
# working set (~2*T tau tiles + the 10 KL accumulators + the 2T+5-tile
# draw carry) measures 16.1 MB at s_nll=2 x 512 lanes -- 104 KB over
# the default. v5e cores carry 128 MB of VMEM; 64 MB leaves the
# pipeline's double buffers ample headroom and keeps every supported
# (s_nll, lanes) combination compiling.
_VMEM_LIMIT = 64 * 1024 * 1024
_KL_BOUND = math.log((1.0 - 1e-6) / 1e-6)
_EXP_M2 = math.exp(-2.0)


def fused_elbo_available(cfg: ModelConfig, scan: ScanParams,
                         full_model: bool, use_blood: bool) -> bool:
    """The ELBO kernel covers the decode+NLL kernel's configuration
    space (full SDR model, heteroscedastic noise, interior spin-echo
    window) for BOTH posterior families: MVG (sampled KL, reference
    model.py:592-610,658-665 -- the published optimal.yaml) and
    diagonal (the analytic logit-Normal KL folded into the same kernel,
    reference model.py:685-710 -- 4 exps + FMAs per voxel next to the
    decode). The one exclusion: a diagonal posterior WITH a population
    prior -- its KL adds a whole-map hyperprior cost on the prior stds
    (model.py:712-716, a scalar over the map, not a per-voxel row), so
    it keeps the decode+NLL kernel + the jnp KL (documented in
    config.py's fused_elbo help)."""
    if not fused_available(cfg, scan, full_model, use_blood):
        return False
    return cfg.use_mvg or not cfg.use_population_prior


def _elbo_consts(cfg: ModelConfig, scan: ScanParams, use_blood: bool) -> dict:
    C = dict(_consts(cfg, scan, use_blood))
    C.update(oef_range=float(cfg.oef_range), min_oef=float(cfg.min_oef),
             dbv_range=float(cfg.dbv_range), min_dbv=float(cfg.min_dbv))
    return C


def _unpack_q(ref, mvg: bool = True):
    """Raw (5|4, 8, L) head tile -> squashed pieces + tanh chain factors
    (dist/logit_mvn.py transform_std / transform_offdiag). Diagonal
    heads carry no off-diagonal channel: od = 0 (its chain factor is a
    dead 0 so the gradient writes below stay uniform)."""
    mu0 = ref[0, 0]
    t1 = jnp.tanh(ref[0, 1])
    ls0 = t1 * 3.0 - 1.0
    mu1 = ref[0, 2]
    t3 = jnp.tanh(ref[0, 3])
    ls1 = t3 * 3.0 - 1.0
    if mvg:
        t4 = jnp.tanh(ref[0, 4])
        od = t4 * _EXP_M2
        c4 = _EXP_M2 * (1.0 - t4 * t4)
    else:
        od = jnp.zeros_like(mu0)
        c4 = jnp.zeros_like(mu0)
    chains = (3.0 * (1.0 - t1 * t1), 3.0 * (1.0 - t3 * t3), c4)
    return (mu0, ls0, mu1, ls1, od), chains


# Whitening algebra is owned by dist/logit_mvn.py (_whiten_factors /
# _whiten_apply, pure jnp, runs inside Pallas). The factors depend only
# on the q/p parameter tiles, so both kernels hoist them out of the
# S_kl-draw fori_loop: 6 exps per TILE instead of 6 exps per DRAW
# (420 per voxel at the published s_kl=70).


def _elbo_fwd_kernel(*refs, C, s_nll, s_kl, host_noise, mvg=True):
    if host_noise and mvg:
        (q_ref, p_ref, y_ref, sig_ref, mask_ref, zn_ref, zk_ref,
         nll_ref, kl_ref) = refs
    elif host_noise:
        # diagonal: the KL is analytic -- no injected KL normals
        (q_ref, p_ref, y_ref, sig_ref, mask_ref, zn_ref,
         nll_ref, kl_ref) = refs
    else:
        (seed_ref, q_ref, p_ref, y_ref, sig_ref, mask_ref,
         nll_ref, kl_ref) = refs
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(7919))

    (q_mu0, q_ls0, q_mu1, q_ls1, q_od), _ = _unpack_q(q_ref, mvg)
    (p_mu0, p_ls0, p_mu1, p_ls1, p_od), _ = _unpack_q(p_ref, mvg)
    q_std0 = jnp.exp(q_ls0)
    q_std1 = jnp.exp(q_ls1)
    mask = mask_ref[0]
    T = len(C["taus"])
    ys = [y_ref[0, t] for t in range(T)]
    sigs = [sig_ref[0, t] for t in range(T)]

    # ---- reconstruction NLL over S_nll posterior draws -------------------
    def nll_draw(s, acc):
        if host_noise:
            z0, z1 = zn_ref[0, 2 * s], zn_ref[0, 2 * s + 1]
        else:
            z0, z1 = _box_muller(q_mu0.shape)
        l0 = q_mu0 + z0 * q_std0
        l1 = q_mu1 + z0 * q_od + z1 * q_std1
        oef = jax.nn.sigmoid(l0) * C["oef_range"] + C["min_oef"]
        dbv = jax.nn.sigmoid(l1) * C["dbv_range"] + C["min_dbv"]
        return acc + _nll_row(oef, dbv, ys, sigs, mask, C)

    if s_nll == 1:
        # Straight-line for the production draw count: the tuned
        # 512-lane codegen (see _LANES sweep note).
        nll_acc = nll_draw(0, jnp.zeros_like(q_mu0))
    else:
        # fori_loop bounds scoped VMEM to ONE draw's tau working set:
        # unrolled, Mosaic keeps every draw's ~2*T recompute tiles live
        # at once and s_nll=2 already overflows the 16 MB budget at 512
        # lanes on the backward pass.
        nll_acc = jax.lax.fori_loop(0, s_nll, nll_draw,
                                    jnp.zeros_like(q_mu0))

    if mvg:
        # ---- sampled KL over S_kl draws (reduced form, clip on the
        # logit draw -- dist/logit_mvn.py::_mvg_kl_streamed). Whitening
        # factors are draw-independent: hoisted, the loop body is FMAs
        # + the draw.
        qf = _whiten_factors(q_ls0, q_ls1, q_od)
        pf = _whiten_factors(p_ls0, p_ls1, p_od)

        def kl_term(z0, z1):
            l0 = jnp.clip(q_mu0 + z0 * q_std0, -_KL_BOUND, _KL_BOUND)
            l1 = jnp.clip(q_mu1 + z0 * q_od + z1 * q_std1,
                          -_KL_BOUND, _KL_BOUND)
            _, _, wq0, wq1 = _whiten_apply(l0, l1, q_mu0, q_mu1, qf)
            _, _, wp0, wp1 = _whiten_apply(l0, l1, p_mu0, p_mu1, pf)
            return 0.5 * ((wp0 * wp0 + wp1 * wp1) - (wq0 * wq0 + wq1 * wq1))

        if host_noise:
            # fori_loop with DYNAMIC loads of the injected normals: a
            # Python-unrolled 70-iteration loop made the Mosaic compile
            # of the host kernels impractically slow (>9 min remote)
            def body(s, acc):
                return acc + kl_term(zk_ref[0, 2 * s], zk_ref[0, 2 * s + 1])
        else:
            def body(_, acc):
                z0, z1 = _box_muller(q_mu0.shape)
                return acc + kl_term(z0, z1)

        kl_acc = jax.lax.fori_loop(0, s_kl, body, jnp.zeros_like(q_mu0))

        kl = kl_acc * (1.0 / float(s_kl)) + ((p_ls0 + p_ls1)
                                             - (q_ls0 + q_ls1))
    else:
        # ---- analytic diagonal KL (dist/logit_mvn.py::diag_kl /
        # normal_kl; reference model.py:692-710 via tfp.LogitNormal.
        # kl_divergence, exact under the shared sigmoid bijector): 4
        # exps + FMAs per voxel, free next to the decode.
        vr0 = jnp.exp(2.0 * (q_ls0 - p_ls0))
        vr1 = jnp.exp(2.0 * (q_ls1 - p_ls1))
        d0 = (q_mu0 - p_mu0) * jnp.exp(-p_ls0)
        d1 = (q_mu1 - p_mu1) * jnp.exp(-p_ls1)
        kl = (0.5 * (vr0 + d0 * d0 - 1.0) + p_ls0 - q_ls0
              + 0.5 * (vr1 + d1 * d1 - 1.0) + p_ls1 - q_ls1)
    nll_ref[0] = nll_acc * mask
    kl_ref[0] = jnp.where(mask > 0, kl, 0.0)


def _elbo_bwd_kernel(*refs, C, s_nll, s_kl, host_noise, mvg=True):
    if host_noise and mvg:
        (q_ref, p_ref, y_ref, sig_ref, mask_ref, zn_ref, zk_ref,
         ctn_ref, ctk_ref, dq_ref, dp_ref, dsig_ref, dy_ref) = refs
    elif host_noise:
        (q_ref, p_ref, y_ref, sig_ref, mask_ref, zn_ref,
         ctn_ref, ctk_ref, dq_ref, dp_ref, dsig_ref, dy_ref) = refs
    else:
        (seed_ref, q_ref, p_ref, y_ref, sig_ref, mask_ref,
         ctn_ref, ctk_ref, dq_ref, dp_ref, dsig_ref, dy_ref) = refs
        # PRNG REPLAY: same seed expression and same draw ORDER as the
        # forward kernel (S_nll NLL pairs, then S_kl KL pairs) -> the
        # recomputed samples are bit-identical.
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0) * jnp.int32(7919))

    (q_mu0, q_ls0, q_mu1, q_ls1, q_od), (qc1, qc3, qc4) = _unpack_q(q_ref,
                                                                    mvg)
    (p_mu0, p_ls0, p_mu1, p_ls1, p_od), (pc1, pc3, pc4) = _unpack_q(p_ref,
                                                                    mvg)
    q_std0 = jnp.exp(q_ls0)
    q_std1 = jnp.exp(q_ls1)
    mask = mask_ref[0]
    ct_n = ctn_ref[0] * mask                      # nll row was masked
    ct_k = ctk_ref[0] * jnp.where(mask > 0, 1.0, 0.0)
    T = len(C["taus"])
    ys = [y_ref[0, t] for t in range(T)]
    sigs = [sig_ref[0, t] for t in range(T)]

    zero = jnp.zeros_like(q_mu0)

    # ---- NLL side: pathwise grads through each draw ----------------------
    def nll_draw_grads(s, acc):
        (g_mu0, g_ls0, g_mu1, g_ls1, g_od), dsig_acc, dy_acc = acc
        if host_noise:
            z0, z1 = zn_ref[0, 2 * s], zn_ref[0, 2 * s + 1]
        else:
            z0, z1 = _box_muller(q_mu0.shape)
        l0 = q_mu0 + z0 * q_std0
        l1 = q_mu1 + z0 * q_od + z1 * q_std1
        s0 = jax.nn.sigmoid(l0)
        s1 = jax.nn.sigmoid(l1)
        oef = s0 * C["oef_range"] + C["min_oef"]
        dbv = s1 * C["dbv_range"] + C["min_dbv"]
        doef, ddbv, dsigs, dys = _nll_row_grads(oef, dbv, ys, sigs, mask, C)
        dl0 = doef * (C["oef_range"] * s0 * (1.0 - s0))
        dl1 = ddbv * (C["dbv_range"] * s1 * (1.0 - s1))
        return ((g_mu0 + dl0, g_ls0 + dl0 * z0 * q_std0, g_mu1 + dl1,
                 g_ls1 + dl1 * z1 * q_std1, g_od + dl1 * z0),
                tuple(dsig_acc[t] + dsigs[t] for t in range(T)),
                tuple(dy_acc[t] + dys[t] for t in range(T)))

    nll_acc0 = ((zero,) * 5, (zero,) * T, (zero,) * T)
    if s_nll == 1:
        nll_grads = nll_draw_grads(0, nll_acc0)
    else:
        # Same VMEM-bounding fori_loop as the forward kernel (and the
        # same draw ORDER, so on-chip PRNG replay stays bit-identical):
        # unrolled, s_nll=2 overflows the 16 MB scoped-VMEM budget at
        # 512 lanes.
        nll_grads = jax.lax.fori_loop(0, s_nll, nll_draw_grads, nll_acc0)
    (g_mu0, g_ls0, g_mu1, g_ls1, g_od), dsig_acc, dy_acc = nll_grads

    if mvg:
        # ---- KL side: closed-form per-draw grads (the algebra of
        # dist/logit_mvn.py::_mvg_kl_streamed_bwd; clip is straight-
        # through, q's own params stop-gradiented inside swr_q). All
        # whitening factors and the p off-diag exp are draw-independent:
        # hoisted.
        q_itl, q_ibr, q_ibl = qf = _whiten_factors(q_ls0, q_ls1, q_od)
        p_itl, p_ibr, p_ibl = pf = _whiten_factors(p_ls0, p_ls1, p_od)
        p_ee = jnp.exp(-p_ls0 - p_ls1)

        def kl_grads(z0, z1, acc):
            (k_qm0, k_qls0, k_qm1, k_qls1, k_qod,
             k_pm0, k_pls0, k_pm1, k_pls1, k_pod) = acc
            l0 = jnp.clip(q_mu0 + z0 * q_std0, -_KL_BOUND, _KL_BOUND)
            l1 = jnp.clip(q_mu1 + z0 * q_od + z1 * q_std1,
                          -_KL_BOUND, _KL_BOUND)
            rp0, _rp1, wp0, wp1 = _whiten_apply(l0, l1, p_mu0, p_mu1, pf)
            _, _, wq0, wq1 = _whiten_apply(l0, l1, q_mu0, q_mu1, qf)
            dp_l0 = wp0 * p_itl + wp1 * p_ibl
            dp_l1 = wp1 * p_ibr
            dl0 = dp_l0 - (wq0 * q_itl + wq1 * q_ibl)
            dl1 = dp_l1 - wq1 * q_ibr
            return (k_qm0 + dl0, k_qls0 + dl0 * z0 * q_std0, k_qm1 + dl1,
                    k_qls1 + dl1 * z1 * q_std1, k_qod + dl1 * z0,
                    k_pm0 - dp_l0,
                    k_pls0 - (wp0 * wp0 + wp1 * rp0 * p_ibl),
                    k_pm1 - dp_l1,
                    k_pls1 - wp1 * wp1,
                    k_pod - wp1 * rp0 * p_ee)

        acc0 = (zero,) * 10
        if host_noise:
            def body(s, acc):
                return kl_grads(zk_ref[0, 2 * s], zk_ref[0, 2 * s + 1], acc)
        else:
            def body(_, acc):
                z0, z1 = _box_muller(q_mu0.shape)
                return kl_grads(z0, z1, acc)

        acc = jax.lax.fori_loop(0, s_kl, body, acc0)

        inv_n = 1.0 / float(s_kl)
        (k_qm0, k_qls0, k_qm1, k_qls1, k_qod,
         k_pm0, k_pls0, k_pm1, k_pls1, k_pod) = [a * inv_n for a in acc]
        # det term: + (p_ls0 + p_ls1); the q logdet is stop-gradiented
        # (reference model.py:596 semantics), so no q-side det
        # contribution.
        k_pls0 = k_pls0 + 1.0
        k_pls1 = k_pls1 + 1.0
    else:
        # ---- analytic diagonal KL grads (exact derivatives of
        # normal_kl, both channels; no stop-gradients in the jnp
        # diag path -- losses.kl_loss -> dist.diag_kl):
        #   d/dq_mu  =  (q_mu - p_mu) e^{-2 p_ls}
        #   d/dq_ls  =  e^{2(q_ls - p_ls)} - 1
        #   d/dp_mu  = -(q_mu - p_mu) e^{-2 p_ls}
        #   d/dp_ls  =  1 - e^{2(q_ls - p_ls)} - (q_mu - p_mu)^2 e^{-2 p_ls}
        vr0 = jnp.exp(2.0 * (q_ls0 - p_ls0))
        vr1 = jnp.exp(2.0 * (q_ls1 - p_ls1))
        ip0 = jnp.exp(-2.0 * p_ls0)
        ip1 = jnp.exp(-2.0 * p_ls1)
        dm0 = (q_mu0 - p_mu0) * ip0
        dm1 = (q_mu1 - p_mu1) * ip1
        k_qm0, k_qm1 = dm0, dm1
        k_qls0, k_qls1 = vr0 - 1.0, vr1 - 1.0
        k_pm0, k_pm1 = -dm0, -dm1
        k_pls0 = 1.0 - vr0 - (q_mu0 - p_mu0) * dm0
        k_pls1 = 1.0 - vr1 - (q_mu1 - p_mu1) * dm1
        k_qod = zero
        k_pod = zero

    dq_ref[0, 0] = ct_n * g_mu0 + ct_k * k_qm0
    dq_ref[0, 1] = (ct_n * g_ls0 + ct_k * k_qls0) * qc1
    dq_ref[0, 2] = ct_n * g_mu1 + ct_k * k_qm1
    dq_ref[0, 3] = (ct_n * g_ls1 + ct_k * k_qls1) * qc3
    if mvg:
        dq_ref[0, 4] = (ct_n * g_od + ct_k * k_qod) * qc4
    dp_ref[0, 0] = ct_k * k_pm0
    dp_ref[0, 1] = ct_k * k_pls0 * pc1
    dp_ref[0, 2] = ct_k * k_pm1
    dp_ref[0, 3] = ct_k * k_pls1 * pc3
    if mvg:
        dp_ref[0, 4] = ct_k * k_pod * pc4
    for t in range(T):
        dsig_ref[0, t] = ct_n * dsig_acc[t]
        dy_ref[0, t] = ct_n * dy_acc[t]


def _pack_noise(z, n_pad, lanes):
    """(S, N, 2) normals -> (NB, 2S, 8, L); column 2s+c is z[s, :, c]
    (the jax.random.normal(key, shape + (2,)) layout of LogitMVN.sample,
    so host-noise runs are bit-compatible with the jnp path)."""
    s, n, _ = z.shape
    return _pack_taus(z.transpose(1, 0, 2).reshape(n, 2 * s), n_pad, lanes)


@functools.lru_cache(maxsize=32)
def make_fused_elbo(cfg: ModelConfig, scan: ScanParams,
                    use_blood: bool = True, s_nll: int = 1, s_kl: int = 70,
                    noise: str = "device", interpret: bool = False,
                    lanes: int = _LANES):
    """Build the fused sample+decode+NLL+KL op for a configuration.

    MVG posteriors (cfg.use_mvg): returns
    f(q, p, y, sigma, mask, seed | z_nll, z_kl) with the S_kl-sample MC
    KL in-kernel. Diagonal posteriors: returns
    f(q, p, y, sigma, mask, seed | z_nll) -- the KL is the ANALYTIC
    logit-Normal KL (reference model.py:692-710), no KL noise consumed.
    Either way -> (nll_rows (N,), kl_rows (N,)) with a closed-form
    custom VJP w.r.t. (q, p, y, sigma). Inputs flat: q/p (N, 5|4) raw
    head/prior maps, y/sigma (N, T), mask (N,). ``noise='device'``
    draws on-chip (seed: int32 scalar, PRNG replay in the backward);
    ``noise='host'`` takes z_nll (s_nll, N, 2) (and z_kl (s_kl, N, 2)
    for MVG) standard normals and is then bit-compatible with the jnp
    path (exactness gates, tests/test_pallas_elbo.py).

    Loss assembly (matches train/steps.py::_finetune_terms):
        nll = sum(nll_rows) / (s_nll * sum(mask))
        kl  = sum(kl_rows) / sum(mask)
    """
    if noise not in ("device", "host"):
        raise ValueError(f"noise must be device|host, got {noise!r}")
    if interpret:
        # The Mosaic interpreter's threaded buffer allocation aborts
        # (C-level, deterministic) at 512-lane tiles under a
        # multi-device shard_map (io_callback _allocate_buffer from 8
        # interpreter threads). Interpret mode is TEST-ONLY, so cap it
        # at the long-proven narrower tiling; the shipped 512-lane width
        # is separately gated bit-exact on the real Mosaic compile
        # (tests/test_pallas.py::test_elbo_kernel_chip_host_noise_exact).
        lanes = min(lanes, 256)
    mvg = bool(cfg.use_mvg)
    K = 5 if mvg else 4
    C = _elbo_consts(cfg, scan, use_blood)
    T = len(C["taus"])
    host = noise == "host"
    interp = pltpu.InterpretParams() if interpret else False

    def row_spec():
        return pl.BlockSpec((1, _SUB, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def chan_spec(c):
        return pl.BlockSpec((1, c, _SUB, lanes), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def _packed(q, p, y, sigma, mask, *zs):
        n = mask.shape[0]
        blk = _SUB * lanes
        n_pad = ((n + blk - 1) // blk) * blk
        packed = (_pack_taus(q, n_pad, lanes), _pack_taus(p, n_pad, lanes),
                  _pack_taus(y, n_pad, lanes),
                  _pack_taus(sigma, n_pad, lanes),
                  _pack_rows(mask, n_pad, lanes))
        if host:
            packed += tuple(_pack_noise(z, n_pad, lanes) for z in zs)
        return n, n_pad, packed

    def _seed_arg(seed):
        return (jnp.asarray(jnp.ravel(seed)[:1], jnp.int32),)

    def _run_fwd(n, n_pad, packed, seed):
        nb = n_pad // (_SUB * lanes)
        in_specs = [chan_spec(K), chan_spec(K), chan_spec(T), chan_spec(T),
                    row_spec()]
        args = packed
        if host:
            in_specs += [chan_spec(2 * s_nll)]
            if mvg:
                in_specs += [chan_spec(2 * s_kl)]
        else:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
            args = _seed_arg(seed) + packed
        nll, kl = pl.pallas_call(
            partial(_elbo_fwd_kernel, C=C, s_nll=s_nll, s_kl=s_kl,
                    host_noise=host, mvg=mvg),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=[row_spec(), row_spec()],
            out_shape=[jax.ShapeDtypeStruct((nb, _SUB, lanes), jnp.float32)] * 2,
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(*args)
        return nll.reshape(n_pad)[:n], kl.reshape(n_pad)[:n]

    def _run_bwd(n, n_pad, packed, seed, ct_n, ct_k):
        nb = n_pad // (_SUB * lanes)
        in_specs = [chan_spec(K), chan_spec(K), chan_spec(T), chan_spec(T),
                    row_spec()]
        args = packed
        if host:
            in_specs += [chan_spec(2 * s_nll)]
            if mvg:
                in_specs += [chan_spec(2 * s_kl)]
        else:
            in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)] + in_specs
            args = _seed_arg(seed) + packed
        in_specs += [row_spec(), row_spec()]
        args = args + (_pack_rows(ct_n, n_pad, lanes),
                       _pack_rows(ct_k, n_pad, lanes))
        dq, dp, dsig, dy = pl.pallas_call(
            partial(_elbo_bwd_kernel, C=C, s_nll=s_nll, s_kl=s_kl,
                    host_noise=host, mvg=mvg),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=[chan_spec(K), chan_spec(K), chan_spec(T),
                       chan_spec(T)],
            out_shape=[
                jax.ShapeDtypeStruct((nb, K, _SUB, lanes), jnp.float32),
                jax.ShapeDtypeStruct((nb, K, _SUB, lanes), jnp.float32),
                jax.ShapeDtypeStruct((nb, T, _SUB, lanes), jnp.float32),
                jax.ShapeDtypeStruct((nb, T, _SUB, lanes), jnp.float32),
            ],
            interpret=interp,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT),
        )(*args)

        def unpack(x, c):
            return x.transpose(0, 2, 3, 1).reshape(n_pad, c)[:n]

        return (unpack(dq, K), unpack(dp, K), unpack(dy, T),
                unpack(dsig, T))

    # ---- vmap support: fold a population-trial axis into the row axis.
    # The kernels are row-local, so stacking P trials' rows into ONE
    # (P*N)-row kernel is exact per row -- bit-equal for the host-noise
    # variants, where the normals are explicit inputs that fold
    # alongside their rows (gated in tests/test_pallas_elbo.py). Both
    # directions get custom_vmap rules; custom_vjp shields them from
    # autodiff so the rules only ever fire under pure batch traces.
    n_z = (2 if mvg else 1) if host else 0

    def _fold_z(axis_size, z, batched):
        """(S, N, 2) noise [batched: (P, S, N, 2)] -> (S, P*N, 2), rows
        trial-major to match _fold_to_rows' fold of q/p/y/sigma/mask."""
        if not batched:
            z = jnp.broadcast_to(z, (axis_size,) + z.shape)
        return z.transpose(1, 0, 2, 3).reshape(z.shape[1], -1, 2)

    def _fold_seed(axis_size, seed, batched):
        """Per-trial seeds mix into ONE stream seed (odd-multiplier dot;
        int32 wrap-around is defined). Noise stays independent across
        trials because each trial's rows land in distinct row slots of
        the per-tile PRNG stream; a folded run is therefore a valid
        fresh draw, though not bit-identical to the serial per-trial
        draws (the host-noise variants are, and carry the exactness
        gates)."""
        if not batched:
            return seed
        s = jnp.ravel(seed).astype(jnp.int32)
        odd = 2 * jnp.arange(s.shape[0], dtype=jnp.int32) + 1
        return jnp.sum(s * odd)

    def _fold_args(axis_size, in_batched, args):
        folded = _fold_to_rows(axis_size, in_batched[:5], args[:5])
        i = 5
        if host:
            for _ in range(n_z):
                folded.append(_fold_z(axis_size, args[i], in_batched[i]))
                i += 1
        else:
            folded.append(_fold_seed(axis_size, args[i], in_batched[i]))
            i += 1
        if len(args) > i:   # backward: the two cotangent rows
            folded.extend(_fold_to_rows(axis_size, in_batched[i:],
                                        args[i:]))
        return folded

    @custom_batching.custom_vmap
    def flat_fwd(*args):
        if host:
            n, n_pad, packed = _packed(*args)
            return _run_fwd(n, n_pad, packed, None)
        n, n_pad, packed = _packed(*args[:5])
        return _run_fwd(n, n_pad, packed, args[5])

    @flat_fwd.def_vmap
    def _flat_fwd_vmap(axis_size, in_batched, *args):
        nll, kl = flat_fwd(*_fold_args(axis_size, in_batched, args))
        return ((_unfold_rows(axis_size, nll),
                 _unfold_rows(axis_size, kl)), (True, True))

    @custom_batching.custom_vmap
    def flat_bwd(*args):
        *main, ct_n, ct_k = args
        if host:
            n, n_pad, packed = _packed(*main)
            return _run_bwd(n, n_pad, packed, None, ct_n, ct_k)
        n, n_pad, packed = _packed(*main[:5])
        return _run_bwd(n, n_pad, packed, main[5], ct_n, ct_k)

    @flat_bwd.def_vmap
    def _flat_bwd_vmap(axis_size, in_batched, *args):
        outs = flat_bwd(*_fold_args(axis_size, in_batched, args))
        return tuple(_unfold_rows(axis_size, o) for o in outs), (True,) * 4

    # Raw args as residuals (repacked in the backward; XLA CSEs the
    # fwd/bwd packing inside one value_and_grad program): the fold
    # boundary must enclose pack -> kernel -> unpack, so packed tensors
    # cannot be carried across it.
    if host and mvg:
        @jax.custom_vjp
        def rows(q, p, y, sigma, mask, z_nll, z_kl):
            return flat_fwd(q, p, y, sigma, mask, z_nll, z_kl)

        def rows_fwd(*args):
            return flat_fwd(*args), args

        def rows_bwd(res, cts):
            dq, dp, dy, dsig = flat_bwd(*res, *cts)
            n = res[4].shape[0]
            return (dq, dp, dy, dsig, jnp.zeros((n,), jnp.float32),
                    jnp.zeros((s_nll, n, 2), jnp.float32),
                    jnp.zeros((s_kl, n, 2), jnp.float32))
    elif host:
        @jax.custom_vjp
        def rows(q, p, y, sigma, mask, z_nll):
            return flat_fwd(q, p, y, sigma, mask, z_nll)

        def rows_fwd(*args):
            return flat_fwd(*args), args

        def rows_bwd(res, cts):
            dq, dp, dy, dsig = flat_bwd(*res, *cts)
            n = res[4].shape[0]
            return (dq, dp, dy, dsig, jnp.zeros((n,), jnp.float32),
                    jnp.zeros((s_nll, n, 2), jnp.float32))
    else:
        @jax.custom_vjp
        def rows(q, p, y, sigma, mask, seed):
            return flat_fwd(q, p, y, sigma, mask, seed)

        def rows_fwd(*args):
            return flat_fwd(*args), args

        def rows_bwd(res, cts):
            dq, dp, dy, dsig = flat_bwd(*res, *cts)
            n = res[4].shape[0]
            return (dq, dp, dy, dsig, jnp.zeros((n,), jnp.float32),
                    np.zeros(jnp.shape(res[5]), dtype=jax.dtypes.float0))

    rows.defvjp(rows_fwd, rows_bwd)
    return rows
