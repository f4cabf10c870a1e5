"""Deterministic posterior summarization by Gaussian quadrature.

Replaces the 200-sample Monte-Carlo estimator of the posterior
(OEF, DBV, R2') means/variances (reference: model.py:326-343, 790) with
numerical integration of the same expectations. The posterior is
logit-Normal: l0 = mu0 + s0*z0, l1 = mu1 + od*z0 + s1*z1 with
(z0, z1) iid N(0,1) (dist/logit_mvn.py::sample), so every summary is a
1-D or 2-D Gaussian integral of sigmoid powers:

* **1-D moments** E[sigmoid^k(m + s Z)] (OEF, and DBV through its exact
  Gaussian marginal std sqrt(od^2 + s1^2)) use a hybrid rule selected
  per voxel: Gauss-Hermite (16 nodes, probabilists') where s < 1.5 --
  exact to ~1e-7 there -- and, where s >= 1.5 (sigmoid step-like on the
  Gaussian scale, where global polynomial rules stall), an exact
  step-plus-correction split: sigmoid^k = H (Heaviside) + exponentially
  localized remainder, giving  Phi(m/s) + (1/s) * Gauss-Laguerre(16)
  applied to the remainder at the kink z* = -m/s. Worst-case absolute
  error over the full squashed parameter envelope (|m| <= 8,
  log-std in [-4, 2]): **6e-7** (vs ~3.5e-2 std error for 200-sample
  MC).
* **Cross moments** E[sigmoid^p(l0) sigmoid^q(l1)], needed only for the
  R2' = c*OEF*DBV moments, use a 16x16 tensor Gauss-Hermite grid with a
  control-variate correction J_pq := O_p*D_q + (J_grid - O_grid*D_grid)
  that replaces the grid's (inaccurate at saturated log-stds) implied
  marginals with the hybrid 1-D rules, leaving the grid to estimate
  only the correlation excess (bounded by |offdiag| <= e^-2; exactly
  zero -- and exactly cancelled -- in the diagonal case). Worst-case
  error over the full envelope incl. both log-stds saturated at e^2
  and maximal correlation: **1.8e-4** (~1e-3 of the R2' range), ~200x
  below the 200-sample MC estimator's standard error at the same
  voxels, and < 1e-5 everywhere stds < 1.5.

The result is deterministic (no PRNG, bit-stable across runs/backends),
at least as accurate as the 200-sample MC estimator everywhere and
~5 orders of magnitude more accurate in the trained-posterior regime,
for ~2.5x less transcendental work per voxel.

Two implementations share the math (and the rational-approximation
normal CDF, so they agree to float tolerance): a pure-jnp path
(``posterior_summaries_quadrature``) and a fused Pallas TPU kernel
(``quad_posterior_summaries``) with the same HBM contract as the MC
kernel in ops/pallas_summarize.py -- one read of the (N, 4|5) posterior
params, one write of means + variances, all node loops in
VMEM/registers. Gated against each other (exactly, both PRNG-free) and
against an fp64 oracle in tests/test_quadrature.py.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["posterior_summaries_quadrature", "quad_posterior_summaries",
           "QH", "QL", "SPLIT_THRESHOLD"]

QH = 16              # Gauss-Hermite nodes (probabilists')
QL = 16              # Gauss-Laguerre nodes for the split correction
SPLIT_THRESHOLD = 1.5   # s >= this -> step+Laguerre branch

_INV_SQRT_2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _hermegauss_norm(n: int):
    x, w = np.polynomial.hermite_e.hermegauss(n)
    return x.astype(np.float64), (w / np.sqrt(2.0 * np.pi)).astype(np.float64)


_XH64, _WH64 = _hermegauss_norm(QH)
_TL64, _WL64 = np.polynomial.laguerre.laggauss(QL)


def _sig64(x):
    return 1.0 / (1.0 + np.exp(-x))


# Split-branch constants: corr_k = sum_j [P_jk * N(z*+t_j/s)
#                                         + M_jk * N(z*-t_j/s)]
# with P_jk = w_j e^{t_j} (sig(t_j)^k - 1), M_jk = w_j e^{t_j} sig(-t_j)^k
# (the e^{t_j} un-weights Gauss-Laguerre's implicit e^{-t}).
_WE64 = _WL64 * np.exp(_TL64)
_P1_64 = _WE64 * (_sig64(_TL64) - 1.0)
_M1_64 = _WE64 * _sig64(-_TL64)
_P2_64 = _WE64 * (_sig64(_TL64) ** 2 - 1.0)
_M2_64 = _WE64 * _sig64(-_TL64) ** 2

XH = _XH64.astype(np.float32)
WH = _WH64.astype(np.float32)
TL = _TL64.astype(np.float32)
P1, M1 = _P1_64.astype(np.float32), _M1_64.astype(np.float32)
P2, M2 = _P2_64.astype(np.float32), _M2_64.astype(np.float32)


def _ndtr(x):
    """Standard normal CDF via the Abramowitz-Stegun 7.1.26 rational erf
    (max abs err 1.5e-7). Written in primitive jnp ops so the identical
    code runs inside Mosaic kernels and the jnp path."""
    z = x * (1.0 / math.sqrt(2.0))
    az = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * az)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    erf_abs = 1.0 - poly * jnp.exp(-az * az)
    erf = jnp.where(z < 0.0, -erf_abs, erf_abs)
    return 0.5 * (1.0 + erf)


def _npdf(z):
    return _INV_SQRT_2PI * jnp.exp(-0.5 * z * z)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _mom1d(m, s, unroll: bool, with_gh: bool = False):
    """(E[sig(m+sZ)], E[sig^2(m+sZ)]) elementwise over arrays m, s.

    Hybrid: 16-node Gauss-Hermite for s < SPLIT_THRESHOLD, exact
    step+Laguerre split elsewhere. Both branches are computed and
    selected with where() (vector code; no data-dependent control
    flow). With ``with_gh`` the raw GH-only moments are also returned —
    they are the 2-D grid's implied marginals, needed for the
    control-variate correction of the cross moments."""
    gh1 = jnp.zeros_like(m)
    gh2 = jnp.zeros_like(m)
    if unroll:
        for i in range(QH):
            sg = _sigmoid(m + s * float(XH[i]))
            gh1 = gh1 + float(WH[i]) * sg
            gh2 = gh2 + float(WH[i]) * sg * sg
    else:
        xh = jnp.asarray(XH)
        wh = jnp.asarray(WH)

        def body(i, acc):
            a1, a2 = acc
            sg = _sigmoid(m + s * xh[i])
            return a1 + wh[i] * sg, a2 + wh[i] * sg * sg

        gh1, gh2 = jax.lax.fori_loop(0, QH, body, (gh1, gh2))

    inv_s = 1.0 / s
    zs = -m * inv_s
    c1 = jnp.zeros_like(m)
    c2 = jnp.zeros_like(m)
    for j in range(QL):
        na = _npdf(zs + float(TL[j]) * inv_s)
        nb = _npdf(zs - float(TL[j]) * inv_s)
        c1 = c1 + float(P1[j]) * na + float(M1[j]) * nb
        c2 = c2 + float(P2[j]) * na + float(M2[j]) * nb
    phi = _ndtr(m * inv_s)
    sp1 = phi + c1 * inv_s
    sp2 = phi + c2 * inv_s

    use_gh = s < SPLIT_THRESHOLD
    h1 = jnp.where(use_gh, gh1, sp1)
    h2 = jnp.where(use_gh, gh2, sp2)
    if with_gh:
        return h1, h2, gh1, gh2
    return h1, h2


def _summaries_from_moments(O1, O2, D1, D2, J11, J12, J21, J22, *,
                            oef_range, min_oef, dbv_range, min_dbv,
                            dw_coeff):
    """Assemble (means, vars) of (OEF, DBV, R2') from sigmoid moments.

    oef = A + B sig0, dbv = C + D sig1, r2p = c * oef * dbv; variances
    are the biased E[x^2] - E[x]^2 form the reference uses
    (model.py:326-343)."""
    A, B, C, D = min_oef, oef_range, min_dbv, dbv_range
    mean_o = A + B * O1
    eo2 = A * A + 2.0 * A * B * O1 + B * B * O2
    mean_d = C + D * D1
    ed2 = C * C + 2.0 * C * D * D1 + D * D * D2
    er = (A * C + A * D * D1 + C * B * O1 + B * D * J11)
    er2 = (A * A * (C * C + 2.0 * C * D * D1 + D * D * D2)
           + 2.0 * A * B * (C * C * O1 + 2.0 * C * D * J11 + D * D * J12)
           + B * B * (C * C * O2 + 2.0 * C * D * J21 + D * D * J22))
    mean_r = dw_coeff * er
    var_o = jnp.maximum(eo2 - mean_o * mean_o, 0.0)
    var_d = jnp.maximum(ed2 - mean_d * mean_d, 0.0)
    var_r = jnp.maximum(dw_coeff * dw_coeff * er2 - mean_r * mean_r, 0.0)
    return (mean_o, mean_d, mean_r), (var_o, var_d, var_r)


def _cv_correct(O1, O2, O1g, O2g, D1, D2, raw):
    """Control-variate correction of the tensor-grid cross moments.

    The 16x16 grid's error is dominated by the error of its implied
    MARGINAL rules (GH-16 on the f axis, the w-weighted per-node inner
    sums on the g axis), which the hybrid 1-D rules evaluate ~exactly.
    Using the product of hybrid marginals as the control variate,
    J_pq := O_p*D_q + (J_grid_pq - O_grid_p * D_grid_q), cancels that
    marginal error, leaving only the grid's error on the correlation
    EXCESS (J - O*D), which is bounded by |od| <= e^-2. For od = 0 the
    grid factorizes exactly, so the correction makes J_pq == O_p*D_q
    (the diag case is exact by construction)."""
    J11, J12, J21, J22, Dg1, Dg2 = raw
    return (O1 * D1 + (J11 - O1g * Dg1),
            O1 * D2 + (J12 - O1g * Dg2),
            O2 * D1 + (J21 - O2g * Dg1),
            O2 * D2 + (J22 - O2g * Dg2))


def _quad_moments(mu0, ls0, mu1, ls1, od, unroll: bool):
    """All sigmoid moments needed for the summaries, from SQUASHED
    per-voxel posterior params (log-stds already tanh-transformed)."""
    s0 = jnp.exp(ls0)
    s1 = jnp.exp(ls1)
    sm1 = jnp.sqrt(od * od + s1 * s1)

    O1, O2, O1g, O2g = _mom1d(mu0, s0, unroll, with_gh=True)
    D1, D2 = _mom1d(mu1, sm1, unroll)

    zero = jnp.zeros_like(mu0)
    if unroll:
        J11 = J12 = J21 = J22 = Dg1 = Dg2 = zero
        for i in range(QH):
            f = _sigmoid(mu0 + s0 * float(XH[i]))
            base = mu1 + od * float(XH[i])
            g1 = jnp.zeros_like(mu0)
            g2 = jnp.zeros_like(mu0)
            for j in range(QH):
                g = _sigmoid(base + s1 * float(XH[j]))
                g1 = g1 + float(WH[j]) * g
                g2 = g2 + float(WH[j]) * g * g
            w_i = float(WH[i])
            wf = w_i * f
            wf2 = wf * f
            J11 = J11 + wf * g1
            J12 = J12 + wf * g2
            J21 = J21 + wf2 * g1
            J22 = J22 + wf2 * g2
            Dg1 = Dg1 + w_i * g1
            Dg2 = Dg2 + w_i * g2
        raw = (J11, J12, J21, J22, Dg1, Dg2)
    else:
        xh = jnp.asarray(XH)
        wh = jnp.asarray(WH)

        def outer(i, acc):
            j11, j12, j21, j22, dg1, dg2 = acc
            f = _sigmoid(mu0 + s0 * xh[i])
            base = mu1 + od * xh[i]

            def inner(j, a):
                g1, g2 = a
                g = _sigmoid(base + s1 * xh[j])
                return g1 + wh[j] * g, g2 + wh[j] * g * g

            g1, g2 = jax.lax.fori_loop(
                0, QH, inner, (jnp.zeros_like(mu0), jnp.zeros_like(mu0)))
            wf = wh[i] * f
            wf2 = wf * f
            return (j11 + wf * g1, j12 + wf * g2,
                    j21 + wf2 * g1, j22 + wf2 * g2,
                    dg1 + wh[i] * g1, dg2 + wh[i] * g2)

        raw = jax.lax.fori_loop(
            0, QH, outer, (zero,) * 6)

    J11, J12, J21, J22 = _cv_correct(O1, O2, O1g, O2g, D1, D2, raw)
    return O1, O2, D1, D2, J11, J12, J21, J22


def posterior_summaries_quadrature(params: jax.Array, *, mvg: bool = True,
                                   oef_range: float = 0.8,
                                   min_oef: float = 0.04,
                                   dbv_range: float = 0.2,
                                   min_dbv: float = 0.001,
                                   dw_coeff: float = 1.0):
    """jnp reference path: deterministic quadrature means/variances of
    (OEF, DBV, R2') per voxel.

    params: (..., 4|5) raw posterior head outputs. Returns
    (means (..., 3), vars (..., 3)), the same contract as
    pallas_summarize.mc_posterior_summaries (which it replaces as the
    default estimator; the MC path remains for reference-parity runs).
    """
    mu0 = params[..., 0]
    ls0 = jnp.tanh(params[..., 1]) * 3.0 - 1.0
    mu1 = params[..., 2]
    ls1 = jnp.tanh(params[..., 3]) * 3.0 - 1.0
    od = (jnp.tanh(params[..., 4]) * math.exp(-2.0) if mvg
          else jnp.zeros_like(mu0))

    moments = _quad_moments(mu0, ls0, mu1, ls1, od, unroll=False)
    means, variances = _summaries_from_moments(
        *moments, oef_range=oef_range, min_oef=min_oef,
        dbv_range=dbv_range, min_dbv=min_dbv, dw_coeff=dw_coeff)
    return jnp.stack(means, -1), jnp.stack(variances, -1)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

_SUB = 8
_LANES = 1024       # same tiling sweep as the MC kernel (pallas_summarize)


def _quad_kernel(nodes_ref, params_ref, mean_ref, var_ref, *, mvg: bool,
                 oef_range: float, min_oef: float, dbv_range: float,
                 min_dbv: float, dw_coeff: float):
    """nodes_ref: SMEM (2, QH) = stacked (XH, WH). The joint grid's outer
    loop is a fori_loop with dynamic scalar node loads -- a fully
    Python-unrolled 16x16 grid would put ~2.5k vector instructions in
    the kernel body, which is the instruction-count regime where remote
    Mosaic compiles of the ELBO host-noise kernels took >9 minutes. The
    1-D loops (16 + 16 iterations) stay unrolled with baked constants."""
    mu0 = params_ref[0]
    ls0 = jnp.tanh(params_ref[1]) * 3.0 - 1.0
    mu1 = params_ref[2]
    ls1 = jnp.tanh(params_ref[3]) * 3.0 - 1.0
    od = (jnp.tanh(params_ref[4]) * math.exp(-2.0) if mvg
          else jnp.zeros_like(mu0))
    s0 = jnp.exp(ls0)
    s1 = jnp.exp(ls1)
    sm1 = jnp.sqrt(od * od + s1 * s1)

    O1, O2, O1g, O2g = _mom1d(mu0, s0, unroll=True, with_gh=True)
    D1, D2 = _mom1d(mu1, sm1, unroll=True)

    zero = jnp.zeros_like(mu0)

    def outer(i, acc):
        j11, j12, j21, j22, dg1, dg2 = acc
        x_i = nodes_ref[0, i]
        w_i = nodes_ref[1, i]
        f = _sigmoid(mu0 + s0 * x_i)
        base = mu1 + od * x_i
        g1 = zero
        g2 = zero
        for j in range(QH):
            g = _sigmoid(base + s1 * float(XH[j]))
            g1 = g1 + float(WH[j]) * g
            g2 = g2 + float(WH[j]) * g * g
        wf = w_i * f
        wf2 = wf * f
        return (j11 + wf * g1, j12 + wf * g2,
                j21 + wf2 * g1, j22 + wf2 * g2,
                dg1 + w_i * g1, dg2 + w_i * g2)

    raw = jax.lax.fori_loop(0, QH, outer, (zero,) * 6)
    J11, J12, J21, J22 = _cv_correct(O1, O2, O1g, O2g, D1, D2, raw)

    means, variances = _summaries_from_moments(
        O1, O2, D1, D2, J11, J12, J21, J22,
        oef_range=oef_range, min_oef=min_oef,
        dbv_range=dbv_range, min_dbv=min_dbv, dw_coeff=dw_coeff)
    mean_ref[0], mean_ref[1], mean_ref[2] = means
    var_ref[0], var_ref[1], var_ref[2] = variances


@partial(jax.jit, static_argnames=("mvg", "oef_range", "min_oef",
                                   "dbv_range", "min_dbv", "dw_coeff",
                                   "interpret", "lanes"))
def quad_posterior_summaries(params: jax.Array, *, mvg: bool = True,
                             oef_range: float = 0.8, min_oef: float = 0.04,
                             dbv_range: float = 0.2, min_dbv: float = 0.001,
                             dw_coeff: float = 1.0,
                             interpret: bool = False, lanes: int = _LANES):
    """Fused deterministic quadrature summaries on TPU.

    params: (N, 4|5) raw posterior head outputs. Returns
    (means (N, 3), vars (N, 3)). PRNG-free: gated EXACTLY against
    posterior_summaries_quadrature (tests/test_quadrature.py), including
    on the real Mosaic compile.
    """
    n, k = params.shape
    blk = _SUB * lanes
    n_pad = ((n + blk - 1) // blk) * blk
    pt = jnp.zeros((5, n_pad), params.dtype)
    pt = pt.at[:k, :n].set(params.T)
    pt = pt.reshape(5, _SUB, n_pad // _SUB)

    grid = (n_pad // _SUB) // lanes
    kernel = partial(_quad_kernel, mvg=mvg, oef_range=oef_range,
                     min_oef=min_oef, dbv_range=dbv_range, min_dbv=min_dbv,
                     dw_coeff=dw_coeff)
    nodes = jnp.asarray(np.stack([XH, WH]))          # (2, QH) -> SMEM
    mean_t, var_t = pl.pallas_call(
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
            jax.ShapeDtypeStruct((3, _SUB, n_pad // _SUB), params.dtype),
            jax.ShapeDtypeStruct((3, _SUB, n_pad // _SUB), params.dtype),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(nodes, pt)
    mean = mean_t.reshape(3, n_pad)[:, :n].T
    var = var_t.reshape(3, n_pad)[:, :n].T
    return mean, var
