"""Fused Pallas kernel: physics decode + reconstruction NLL (training).

The fine-tune likelihood term evaluates, per voxel, the full SDR signal
-- via the Chebyshev surrogate of the tissue integral when the scan
envelope fits (physics.select_quad_rule; one Clenshaw per (voxel, tau))
or the (tau x 16-node) J0 quadrature lattice otherwise -- normalises the
predicted and true tau-series, and accumulates a Student-t/Gaussian NLL
(models/vi.py apply + losses.fine_tune_nll; reference model.py:239-286,
527-568). Left to XLA this costs 7.9 ms fwd / 12.5 ms grad at the
published 38x25x25x8 batch against a ~1.3 ms traffic bound and ~0.7 ms
compute bound (benchmarks/RESULTS.md round-2 probe) -- the lattice and
its AD residuals materialise between unfused kernels. Here the whole
computation runs per voxel in VMEM registers:

* forward: one pass producing the per-voxel summed (masked) NLL row --
  HBM touches exactly (oef, dbv, y, sigma, mask) in, one row out;
* backward: a custom VJP RECOMPUTES the lattice (J1 via the analytic
  d(1-J0) identity, ops/bessel.py) and emits closed-form
  d nll / d (oef, dbv, sigma) -- no stored residuals at all.

PRNG-free, so unlike the summarize kernel this one is fully gated on
CPU via the Mosaic interpreter against the jnp path (value AND grads);
tests/test_pallas_decode.py. Asymptotic-model or non-heteroscedastic
configs fall back to the jnp path (wrapper returns None).
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
from . import physics
from .bessel import bessel_j1, one_minus_j0

__all__ = ["make_fused_decode_nll", "fused_available"]

_SUB = 8
# (8 x 256) voxel tiles: the backward pass keeps ~4*T live tau tiles, so
# larger blocks hit the 16 MB scoped-VMEM stack limit (1024 lanes OOMs);
# 256 vs 512 measured identical on chip.
_LANES = 256


def fused_available(cfg: ModelConfig, scan: ScanParams, full_model: bool,
                    use_blood: bool) -> bool:
    """The kernel covers the published configuration space: full SDR
    tissue model, heteroscedastic noise, and (for multi-image
    normalisation) an interior spin-echo window. (Asymptotic model,
    scalar sigma, or an se window touching the tau-grid edge -> jnp
    path; NB at se_idx == 0 the jnp multi-norm itself degenerates --
    the reference's se-1 slice is empty -- so no tau protocol with a
    boundary spin echo should use multi_image_normalisation at all.)"""
    del use_blood
    if cfg.multi_image_normalisation and not (
            1 <= scan.se_idx < scan.n_taus - 1):
        return False
    return bool(full_model) and cfg.heteroscedastic_noise


def _consts(cfg: ModelConfig, scan: ScanParams, use_blood: bool) -> dict:
    """Python-float constants baked into the kernel at trace time."""
    taus = scan.taus().astype(np.float64)
    k = scan.dw_coeff * scan.hct                     # dw = k * oef
    envelope = math.exp(-scan.te * scan.r2t)
    # blood compartment constants (physics.blood_signal; signals.py:233-247)
    r2b = 1.0 / 0.189
    td = (2.6 ** 2.0) / 2.0 * 1e-3
    a_g0 = (4.0 / 45.0) * scan.hct * (1.0 - scan.hct) * (
        4.0 * math.pi * scan.b0 * scan.dchi) ** 2     # g0 = a_g0 * oef^2
    te = scan.te
    phase = (te / td + math.sqrt(0.25 + te / td) + 1.5
             - 2.0 * np.sqrt(0.25 + (te + taus) / td)
             - 2.0 * np.sqrt(0.25 + (te - taus) / td))
    beta = 0.5 * scan.gamma ** 2 * td ** 2 * a_g0 * phase  # per tau
    bc = math.exp(-r2b * te)
    m_bld = 1.0 - (2.0 - math.exp(-(scan.tr - scan.ti) / scan.t1b)) \
        * math.exp(-scan.ti / scan.t1b)
    # SDR integral rule: mirror the jnp decode path's static selection
    # (models/vi.py -> physics.ase_signal -> select_quad_rule) so the
    # kernel-vs-jnp gates compare like against like -- including the
    # model's actual OEF transform bound (min_oef + oef_range), which the
    # jnp decode passes as max_oef. "cheb" bakes the ONE Chebyshev table
    # (physics._CHEB_I32/_CHEB_DI32); None -> Gauss-Jacobi lattice.
    rule = physics.select_quad_rule(
        scan, getattr(cfg, "quad_rule", "auto"),
        max_oef=cfg.min_oef + cfg.oef_range)
    cheb = None
    if rule == "cheb":
        cheb = {
            "ci": physics._CHEB_I32,
            "cd": physics._CHEB_DI32,
            "inv_cmax2": 1.0 / physics._CHEB_CMAX ** 2,
        }
    return {
        "taus": taus, "k": float(k), "envelope": float(envelope),
        "beta": beta.astype(np.float64), "bc": float(bc),
        "mnb": float(m_bld * scan.nb), "use_blood": bool(use_blood),
        "u": physics._GJ16_U64, "wg": physics._GJ16_WG64, "cheb": cheb,
        "se": scan.se_idx, "multi": cfg.multi_image_normalisation,
        "log_data": cfg.predict_log_data,
        "df": (float(cfg.student_t_df)
               if cfg.student_t_df is not None else None),
    }


def _signal_tiles(oef, dbv, C):
    """Per-tau signal tiles + the pieces the backward pass reuses.

    Returns (preds [T tiles], tissues, integrals, bloods)."""
    taus, u, wg = C["taus"], C["u"], C["wg"]
    k, env = C["k"], C["envelope"]
    preds, tissues, integrals, bloods = [], [], [], []
    w = C["mnb"] * dbv if C["use_blood"] else dbv
    for t in range(len(taus)):
        if C["cheb"] is not None:
            # Chebyshev surrogate: one Clenshaw in (tau*dw)^2 replaces the
            # 16-node J0 lattice. THE SAME functions as the jnp path
            # (physics._clenshaw / physics.cheb_abscissa on the same
            # table), so bit-exactness is by construction, not by keeping
            # two implementations synchronized.
            x = physics.cheb_abscissa((taus[t] * k) * oef)
            integral = physics._clenshaw(x, C["cheb"]["ci"])
        else:
            c = (1.5 * taus[t] * k) * oef
            integral = 0.0
            for i in range(len(u)):
                integral += float(wg[i]) * one_minus_j0(c * float(u[i]))
        tissue = jnp.exp(-dbv * integral) * env
        if C["use_blood"]:
            blood = C["bc"] * jnp.exp(-float(C["beta"][t]) * oef * oef)
            pred = (1.0 - w) * tissue + w * blood
        else:
            blood = jnp.zeros_like(tissue)
            pred = (1.0 - w) * tissue
        preds.append(pred)
        tissues.append(tissue)
        integrals.append(integral)
        bloods.append(blood)
    return preds, tissues, integrals, bloods


def _refs(tiles, C):
    """Spin-echo normaliser of a per-tau tile list (losses.fine_tune_nll)."""
    se = C["se"]
    if C["multi"]:
        return (tiles[se - 1] + tiles[se] + tiles[se + 1]) / 3.0
    return tiles[se]


def _nll_terms(r, sigma, C):
    """(nll_t, dnll/dr, dnll/dsigma) for one tau tile."""
    df = C["df"]
    if df is not None and df < 50.0:
        const = -(math.lgamma((df + 1.0) / 2.0) - math.lgamma(df / 2.0)
                  - 0.5 * math.log(df * math.pi))
        denom = df * sigma * sigma + r * r
        nll = const + jnp.log(sigma) \
            + ((df + 1.0) / 2.0) * jnp.log1p(r * r / (df * sigma * sigma))
        d_r = (df + 1.0) * r / denom
        d_sig = 1.0 / sigma - (df + 1.0) * r * r / (sigma * denom)
    else:
        nll = jnp.log(sigma) + 0.5 * math.log(2.0 * math.pi) \
            + 0.5 * jnp.square(r / sigma)
        d_r = r / (sigma * sigma)
        d_sig = 1.0 / sigma - r * r / (sigma ** 3)
    return nll, d_r, d_sig


_EPS = 1e-3  # normaliser epsilon (reference model.py:540-545)


def _nll_row(oef, dbv, ys, sigs, mask, C):
    """Per-voxel summed-over-tau NLL tile for one (oef, dbv) draw.

    ys/sigs: T-length lists of tau tiles. Shared by the decode+NLL
    kernel below and the fused ELBO kernel (ops/pallas_elbo.py)."""
    T = len(C["taus"])
    preds, _, _, _ = _signal_tiles(oef, dbv, C)
    t_ref = _refs(ys, C) + _EPS
    p_ref = _refs(preds, C) + _EPS
    acc = 0.0
    for t in range(T):
        yh = ys[t] / t_ref
        q = preds[t] / p_ref
        if C["log_data"]:
            yh = jnp.where(mask > 0, jnp.log(yh), 0.0)
            q = jnp.where(mask > 0, jnp.log(q), 0.0)
        nll, _, _ = _nll_terms(yh - q, sigs[t], C)
        acc = acc + nll
    return acc


def _fwd_kernel(oef_ref, dbv_ref, y_ref, sig_ref, mask_ref, out_ref, *, C):
    oef = oef_ref[0]
    dbv = dbv_ref[0]
    mask = mask_ref[0]
    T = len(C["taus"])
    ys = [y_ref[0, t] for t in range(T)]
    sigs = [sig_ref[0, t] for t in range(T)]
    out_ref[0] = _nll_row(oef, dbv, ys, sigs, mask, C) * mask


def _nll_row_grads(oef, dbv, ys, sigs, mask, C):
    """Closed-form per-voxel gradients of ``_nll_row`` for one draw:
    (doef, ddbv, dsig_list, dy_list), NOT cotangent-scaled. Shared by
    the decode+NLL backward and the fused ELBO backward."""
    T = len(C["taus"])
    taus, u, wg, k = C["taus"], C["u"], C["wg"], C["k"]

    preds, tissues, integrals, bloods = _signal_tiles(oef, dbv, C)
    # dpred/doef, dpred/ddbv per tau
    w = C["mnb"] * dbv if C["use_blood"] else dbv
    dpred_doef, dpred_ddbv = [], []
    for t in range(T):
        if C["cheb"] is not None:
            # dI/doef = clenshaw(x, dI/dt table) * 4 c / cmax^2 * dc/doef,
            # the EXACT derivative of the forward surrogate -- zeroed
            # where the abscissa clamps (the forward is constant there),
            # matching physics._sdr_integral_cheb_jvp.
            cc = (taus[t] * k) * oef
            raw = 2.0 * (jnp.square(cc) * C["cheb"]["inv_cmax2"]) - 1.0
            x = jnp.minimum(raw, 1.0)
            dI = physics._clenshaw(x, C["cheb"]["cd"]) \
                * (4.0 * C["cheb"]["inv_cmax2"] * float(taus[t] * k)) * cc
            dI = jnp.where(raw <= 1.0, dI, 0.0)
        else:
            c = (1.5 * taus[t] * k) * oef
            dI = 0.0
            for i in range(len(u)):
                dI += float(wg[i] * u[i] * 1.5 * taus[t] * k) * bessel_j1(
                    c * float(u[i]))
        dt_doef = -dbv * dI * tissues[t]
        dt_ddbv = -integrals[t] * tissues[t]
        if C["use_blood"]:
            db_doef = -2.0 * float(C["beta"][t]) * oef * bloods[t]
            dpred_doef.append((1.0 - w) * dt_doef + w * db_doef)
            dpred_ddbv.append((1.0 - w) * dt_ddbv
                              + C["mnb"] * (bloods[t] - tissues[t]))
        else:
            dpred_doef.append((1.0 - w) * dt_doef)
            dpred_ddbv.append((1.0 - w) * dt_ddbv - tissues[t])

    t_ref = _refs(ys, C) + _EPS
    p_ref = _refs(preds, C) + _EPS

    # e_t = dnll/dq_t and c_t = dnll/dyhat_t (through the optional log),
    # plus sigma grads
    es, cs, yhs, dsigs = [], [], [], []
    for t in range(T):
        yh_lin = ys[t] / t_ref
        q_lin = preds[t] / p_ref
        if C["log_data"]:
            yh = jnp.where(mask > 0, jnp.log(yh_lin), 0.0)
            z = jnp.where(mask > 0, jnp.log(q_lin), 0.0)
        else:
            yh = yh_lin
            z = q_lin
        _, d_r, d_sig = _nll_terms(yh - z, sigs[t], C)
        e = -d_r
        c = d_r
        if C["log_data"]:
            e = e / q_lin
            # guard: masked/zero y voxels have yh_lin == 0 and a zeroed
            # cotangent; avoid inf * 0 -> NaN
            c = jnp.where(mask > 0,
                          d_r / jnp.maximum(yh_lin, 1e-30), 0.0)
        es.append(e)
        cs.append(c)
        yhs.append(yh_lin)
        dsigs.append(d_sig)

    # dnll/dpred_k = e_k / P - (sum_t e_t q_t) * w_k / P, w_k = dP/dpred_k
    # dnll/dy_k    = c_k / Tref - (sum_t c_t yhat_t) * w_k / Tref  (same
    # chain through the y-side normaliser)
    sum_eq = 0.0
    sum_cy = 0.0
    for t in range(T):
        sum_eq = sum_eq + es[t] * (preds[t] / p_ref)
        sum_cy = sum_cy + cs[t] * yhs[t]
    doef = jnp.zeros_like(oef)
    ddbv = jnp.zeros_like(oef)
    dys = []
    se = C["se"]
    window = range(se - 1, se + 2) if C["multi"] else (se,)
    wk = 1.0 / 3.0 if C["multi"] else 1.0
    for t in range(T):
        dnll_dpred = es[t] / p_ref
        dnll_dy = cs[t] / t_ref
        if t in window:
            dnll_dpred = dnll_dpred - sum_eq * (wk / p_ref)
            dnll_dy = dnll_dy - sum_cy * (wk / t_ref)
        doef = doef + dnll_dpred * dpred_doef[t]
        ddbv = ddbv + dnll_dpred * dpred_ddbv[t]
        dys.append(dnll_dy)
    return doef, ddbv, dsigs, dys


def _bwd_kernel(oef_ref, dbv_ref, y_ref, sig_ref, mask_ref, ct_ref,
                doef_ref, ddbv_ref, dsig_ref, dy_ref, *, C):
    oef = oef_ref[0]
    dbv = dbv_ref[0]
    mask = mask_ref[0]
    ct = ct_ref[0] * mask          # row output was masked
    T = len(C["taus"])
    ys = [y_ref[0, t] for t in range(T)]
    sigs = [sig_ref[0, t] for t in range(T)]
    doef, ddbv, dsigs, dys = _nll_row_grads(oef, dbv, ys, sigs, mask, C)
    for t in range(T):
        dsig_ref[0, t] = ct * dsigs[t]
        dy_ref[0, t] = ct * dys[t]
    doef_ref[0] = ct * doef
    ddbv_ref[0] = ct * ddbv


def _pack_rows(x, n_pad, lanes):
    """(N,) -> (NB, 8, L)."""
    nb = n_pad // (_SUB * lanes)
    out = jnp.zeros((n_pad,), x.dtype).at[: x.shape[0]].set(x)
    return out.reshape(nb, _SUB, lanes)


def _fold_to_rows(axis_size, in_batched, args):
    """vmap fold rule body shared by the fused kernels: collapse a
    leading batch ("population trial") axis into the flat voxel-row
    axis. The kernels are row-local -- every output row depends only on
    that row's inputs -- so running ONE kernel over the (P*N) stacked
    rows is exact per row (bit-equal for explicit-noise variants; the
    same tile arithmetic for all). Unbatched args broadcast first;
    custom_vmap guarantees batched axes sit at dim 0."""
    out = []
    for a, b in zip(args, in_batched):
        if not b:
            a = jnp.broadcast_to(a, (axis_size,) + a.shape)
        out.append(a.reshape((-1,) + a.shape[2:]))
    return out


def _unfold_rows(axis_size, x):
    """(P*N, ...) -> (P, N, ...)."""
    return x.reshape((axis_size, x.shape[0] // axis_size) + x.shape[1:])


def _pack_taus(x, n_pad, lanes):
    """(N, T) -> (NB, T, 8, L)."""
    n, t = x.shape
    nb = n_pad // (_SUB * lanes)
    out = jnp.ones((n_pad, t), x.dtype)  # ones: log-safe padding
    out = out.at[:n].set(x)
    return out.transpose(1, 0).reshape(t, nb, _SUB, lanes).transpose(
        1, 0, 2, 3)


@functools.lru_cache(maxsize=32)
def make_fused_decode_nll(cfg: ModelConfig, scan: ScanParams,
                          use_blood: bool = True, interpret: bool = False,
                          lanes: int = _LANES):
    """Build the fused decode+NLL op for a configuration.

    Returns f(oef, dbv, y_true, sigma, mask) -> (N,) per-voxel masked
    NLL rows (sum over tau), with a closed-form custom VJP w.r.t.
    (oef, dbv, sigma). All inputs flat: oef/dbv/mask (N,),
    y_true/sigma (N, T). ``sum(rows) / sum(mask)`` reproduces
    losses.fine_tune_nll exactly (gated in tests/test_pallas_decode.py).
    """
    C = _consts(cfg, scan, use_blood)
    T = len(C["taus"])
    interp = pltpu.InterpretParams() if interpret else False

    def row_spec():
        return pl.BlockSpec((1, _SUB, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)

    def tau_spec():
        return pl.BlockSpec((1, T, _SUB, lanes), lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def _packed(oef, dbv, y, sigma, mask):
        n = oef.shape[0]
        blk = _SUB * lanes
        n_pad = ((n + blk - 1) // blk) * blk
        return (n, n_pad,
                (_pack_rows(oef, n_pad, lanes),
                 _pack_rows(dbv, n_pad, lanes),
                 _pack_taus(y, n_pad, lanes),
                 _pack_taus(sigma, n_pad, lanes),
                 _pack_rows(mask, n_pad, lanes)))

    def _run_fwd(n, n_pad, packed):
        nb = n_pad // (_SUB * lanes)
        out = pl.pallas_call(
            partial(_fwd_kernel, C=C),
            grid=(nb,),
            in_specs=[row_spec(), row_spec(), tau_spec(), tau_spec(),
                      row_spec()],
            out_specs=row_spec(),
            out_shape=jax.ShapeDtypeStruct((nb, _SUB, lanes),
                                           packed[0].dtype),
            interpret=interp,
        )(*packed)
        return out.reshape(n_pad)[:n]

    # Both directions are custom_vmap'd with the trial-fold rule
    # (_fold_to_rows): under jax.vmap -- the population-sweep programs,
    # sweep.py -- ONE kernel runs over the (P*N) stacked rows instead of
    # falling back to the jnp path (round-4 verdict #1). custom_vjp
    # shields both from autodiff, so the custom_vmap rules only ever
    # fire under pure batch traces (the supported composition).
    @custom_batching.custom_vmap
    def flat_fwd(oef, dbv, y, sigma, mask):
        n, n_pad, packed = _packed(oef, dbv, y, sigma, mask)
        return _run_fwd(n, n_pad, packed)

    @flat_fwd.def_vmap
    def _flat_fwd_vmap(axis_size, in_batched, *args):
        out = flat_fwd(*_fold_to_rows(axis_size, in_batched, args))
        return _unfold_rows(axis_size, out), True

    @custom_batching.custom_vmap
    def flat_bwd(oef, dbv, y, sigma, mask, ct):
        n, n_pad, packed = _packed(oef, dbv, y, sigma, mask)
        nb = n_pad // (_SUB * lanes)
        doef, ddbv, dsig, dy = pl.pallas_call(
            partial(_bwd_kernel, C=C),
            grid=(nb,),
            in_specs=[row_spec(), row_spec(), tau_spec(), tau_spec(),
                      row_spec(), row_spec()],
            out_specs=[row_spec(), row_spec(), tau_spec(), tau_spec()],
            out_shape=[
                jax.ShapeDtypeStruct((nb, _SUB, lanes), packed[0].dtype),
                jax.ShapeDtypeStruct((nb, _SUB, lanes), packed[0].dtype),
                jax.ShapeDtypeStruct((nb, T, _SUB, lanes),
                                     packed[0].dtype),
                jax.ShapeDtypeStruct((nb, T, _SUB, lanes),
                                     packed[0].dtype),
            ],
            interpret=interp,
        )(*packed, _pack_rows(ct, n_pad, lanes))
        doef = doef.reshape(n_pad)[:n]
        ddbv = ddbv.reshape(n_pad)[:n]
        dsig = dsig.transpose(0, 2, 3, 1).reshape(n_pad, T)[:n]
        dy = dy.transpose(0, 2, 3, 1).reshape(n_pad, T)[:n]
        return doef, ddbv, dsig, dy

    @flat_bwd.def_vmap
    def _flat_bwd_vmap(axis_size, in_batched, *args):
        outs = flat_bwd(*_fold_to_rows(axis_size, in_batched, args))
        return tuple(_unfold_rows(axis_size, o) for o in outs), (True,) * 4

    @jax.custom_vjp
    def rows(oef, dbv, y, sigma, mask):
        return flat_fwd(oef, dbv, y, sigma, mask)

    def rows_fwd(oef, dbv, y, sigma, mask):
        # Raw args as residuals; the backward repacks them, and inside
        # one jitted value_and_grad program XLA CSEs the fwd/bwd packing
        # into a single transpose (saving packed tensors instead would
        # break the trial-fold vmap rule, whose boundary must enclose
        # pack -> kernel -> unpack).
        return flat_fwd(oef, dbv, y, sigma, mask), (oef, dbv, y, sigma,
                                                    mask)

    def rows_bwd(res, ct):
        doef, ddbv, dsig, dy = flat_bwd(*res, ct)
        return (doef, ddbv, dy, dsig,
                jnp.zeros(res[4].shape, doef.dtype))

    rows.defvjp(rows_fwd, rows_bwd)
    return rows
