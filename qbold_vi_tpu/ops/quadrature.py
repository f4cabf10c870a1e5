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
  R2' = c*OEF*DBV moments, exploit the tanh squash bound
  |od| <= e^-2 ~ 0.135: writing the exact covariance decomposition
  J_pq = O_p*D_q + Cov(sig^p(l0), G_q(mu1 + od*z0)) with
  G_q(m) := E[sig^q(m + s1*Z)], the covariance is Taylor-expanded to
  third order in od,

      J_pq = O_p*D_q + od*E[f_p*z0]*G_q'
             + od^2/2*(E[f_p*z0^2]-O_p)*G_q'' + od^3/6*E[f_p*z0^3]*G_q'''

  where every factor is a 1-D hybrid integral: the weighted moments
  E[f_p*z0^j] extend the same step+Laguerre split with closed-form
  incomplete Gaussian moments for the step part and z^j-weighted node
  sums for the remainder (no new transcendentals), and the derivatives
  G_q^(n) are linear combinations of the plain moments
  E[sig^k(mu1 + s1*Z)], k = 1..5 (sig' = sig*(1-sig)). O_p uses std
  s0, D_q the exact Gaussian marginal std sqrt(od^2 + s1^2), so the
  marginals stay hybrid-exact and the diagonal case factorizes exactly
  (J_pq == O_p*D_q at od = 0). Worst-case error over the full envelope
  (|mu| <= 8, log-stds in [-4, 2], |od| <= e^-2, 10^4-point sweep vs a
  dense fp64 trapezoid oracle): **3.2e-6** -- vs 1.2e-3 for the 16x16
  tensor grid with control-variate marginal correction it replaced,
  with no 2-D grid at all and ~2.4x less total work.

The result is deterministic (no PRNG, bit-stable across runs/backends),
at least as accurate as the 200-sample MC estimator everywhere and
~5 orders of magnitude more accurate in the trained-posterior regime,
for ~10x less transcendental work per voxel (three 16-node 1-D hybrid
passes ~ 150 exp-class ops vs the MC kernel's ~1400).

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

# Tiling and the pack/unpack voxel layout are shared with the MC kernel --
# pallas_summarize.pack_params_tiled is the single owner of the layout
# both kernels are gated against.
from .pallas_summarize import (_LANES, _SUB, pack_params_tiled,
                               unpack_summaries_tiled)

__all__ = ["posterior_summaries_quadrature", "quad_posterior_summaries",
           "quad_posterior_summaries_packed", "QH", "QL", "SPLIT_THRESHOLD"]

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
# (the e^{t_j} un-weights Gauss-Laguerre's implicit e^{-t}). k = 1..5:
# k = 1, 2 for the marginal/weighted moments, 3..5 additionally for the
# G_q'/G_q''/G_q''' derivative combinations of the cross-moment Taylor
# terms.
_WE64 = _WL64 * np.exp(_TL64)
_PK64 = [_WE64 * (_sig64(_TL64) ** k - 1.0) for k in (1, 2, 3, 4, 5)]
_MK64 = [_WE64 * _sig64(-_TL64) ** k for k in (1, 2, 3, 4, 5)]

XH = _XH64.astype(np.float32)
WH = _WH64.astype(np.float32)
TL = _TL64.astype(np.float32)
P1, M1 = _PK64[0].astype(np.float32), _MK64[0].astype(np.float32)
P2, M2 = _PK64[1].astype(np.float32), _MK64[1].astype(np.float32)
P3, M3 = _PK64[2].astype(np.float32), _MK64[2].astype(np.float32)
P4, M4 = _PK64[3].astype(np.float32), _MK64[3].astype(np.float32)
P5, M5 = _PK64[4].astype(np.float32), _MK64[4].astype(np.float32)


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


def _mom1d(m, s, unroll: bool):
    """(E[sig(m+sZ)], E[sig^2(m+sZ)]) elementwise over arrays m, s.

    Hybrid: 16-node Gauss-Hermite for s < SPLIT_THRESHOLD, exact
    step+Laguerre split elsewhere. Both branches are computed and
    selected with where() (vector code; no data-dependent control
    flow)."""
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
    return jnp.where(use_gh, gh1, sp1), jnp.where(use_gh, gh2, sp2)


def _omom1d(m, s, unroll: bool):
    """Plain and z-weighted sigmoid moments E[sig^p(m+sZ) * Z^j] for
    p = 1, 2 and j = 0..3, elementwise (the l0/OEF-axis factors of the
    cross-moment Taylor expansion).

    Same hybrid as _mom1d. For the split branch the step part uses the
    closed-form incomplete Gaussian moments (zs = -m/s):
      E[Z^0; Z > zs] = Phi(m/s),
      E[Z^1; Z > zs] = phi(zs),
      E[Z^2; Z > zs] = Phi(m/s) + zs * phi(zs),
      E[Z^3; Z > zs] = (2 + zs^2) * phi(zs),
    and the Laguerre remainder sums carry (zs +- t_j/s)^j factors on
    the SAME pdf evaluations as j = 0 (no extra transcendentals).

    Returns the 8 moments ordered (p, j) = (1,0), (2,0), (1,1), (2,1),
    (1,2), (2,2), (1,3), (2,3)."""
    z8 = [jnp.zeros_like(m) for _ in range(8)]
    if unroll:
        gh = z8
        for i in range(QH):
            x_i = float(XH[i])
            sg = _sigmoid(m + s * x_i)
            w1 = float(WH[i]) * sg
            w2 = w1 * sg
            gh = [gh[0] + w1, gh[1] + w2,
                  gh[2] + w1 * x_i, gh[3] + w2 * x_i,
                  gh[4] + w1 * (x_i * x_i), gh[5] + w2 * (x_i * x_i),
                  gh[6] + w1 * (x_i * x_i * x_i),
                  gh[7] + w2 * (x_i * x_i * x_i)]
    else:
        xh = jnp.asarray(XH)
        wh = jnp.asarray(WH)

        def body(i, acc):
            sg = _sigmoid(m + s * xh[i])
            w1 = wh[i] * sg
            w2 = w1 * sg
            x_i = xh[i]
            x2 = x_i * x_i
            return (acc[0] + w1, acc[1] + w2,
                    acc[2] + w1 * x_i, acc[3] + w2 * x_i,
                    acc[4] + w1 * x2, acc[5] + w2 * x2,
                    acc[6] + w1 * x2 * x_i, acc[7] + w2 * x2 * x_i)

        gh = list(jax.lax.fori_loop(0, QH, body, tuple(z8)))

    inv_s = 1.0 / s
    zs = -m * inv_s
    c = [jnp.zeros_like(m) for _ in range(8)]
    for j in range(QL):
        za = zs + float(TL[j]) * inv_s
        zb = zs - float(TL[j]) * inv_s
        na = _npdf(za)
        nb = _npdf(zb)
        za2, zb2 = za * za, zb * zb
        p1a, m1b = float(P1[j]) * na, float(M1[j]) * nb
        p2a, m2b = float(P2[j]) * na, float(M2[j]) * nb
        c = [c[0] + p1a + m1b, c[1] + p2a + m2b,
             c[2] + p1a * za + m1b * zb, c[3] + p2a * za + m2b * zb,
             c[4] + p1a * za2 + m1b * zb2, c[5] + p2a * za2 + m2b * zb2,
             c[6] + p1a * za2 * za + m1b * zb2 * zb,
             c[7] + p2a * za2 * za + m2b * zb2 * zb]
    phi = _ndtr(m * inv_s)
    nm = _npdf(zs)
    s0m = phi
    s1m = nm
    s2m = phi + zs * nm
    s3m = (2.0 + zs * zs) * nm
    step = [s0m, s0m, s1m, s1m, s2m, s2m, s3m, s3m]
    sp = [step[k] + c[k] * inv_s for k in range(8)]

    use_gh = s < SPLIT_THRESHOLD
    return tuple(jnp.where(use_gh, gh[k], sp[k]) for k in range(8))


def _gmom1d(m, s, unroll: bool):
    """E[sig^k(m+sZ)] for k = 1..5 (hybrid), from which the cross-moment
    Taylor terms' derivatives follow via sig' = sig*(1-sig):
      G1'   = g1 - g2              G2'   = 2 (g2 - g3)
      G1''  = g1 - 3 g2 + 2 g3     G2''  = 2 (2 g2 - 5 g3 + 3 g4)
      G1''' = g1 - 7 g2 + 12 g3    G2''' = 2 (4 g2 - 19 g3 + 27 g4
                - 6 g4                       - 12 g5)."""
    z5 = [jnp.zeros_like(m) for _ in range(5)]
    if unroll:
        gh = z5
        for i in range(QH):
            sg = _sigmoid(m + s * float(XH[i]))
            w1 = float(WH[i]) * sg
            w2 = w1 * sg
            w3 = w2 * sg
            w4 = w3 * sg
            gh = [gh[0] + w1, gh[1] + w2, gh[2] + w3, gh[3] + w4,
                  gh[4] + w4 * sg]
    else:
        xh = jnp.asarray(XH)
        wh = jnp.asarray(WH)

        def body(i, acc):
            sg = _sigmoid(m + s * xh[i])
            w1 = wh[i] * sg
            w2 = w1 * sg
            w3 = w2 * sg
            w4 = w3 * sg
            return (acc[0] + w1, acc[1] + w2, acc[2] + w3, acc[3] + w4,
                    acc[4] + w4 * sg)

        gh = list(jax.lax.fori_loop(0, QH, body, tuple(z5)))

    inv_s = 1.0 / s
    zs = -m * inv_s
    c = [jnp.zeros_like(m) for _ in range(5)]
    for j in range(QL):
        na = _npdf(zs + float(TL[j]) * inv_s)
        nb = _npdf(zs - float(TL[j]) * inv_s)
        c = [c[0] + float(P1[j]) * na + float(M1[j]) * nb,
             c[1] + float(P2[j]) * na + float(M2[j]) * nb,
             c[2] + float(P3[j]) * na + float(M3[j]) * nb,
             c[3] + float(P4[j]) * na + float(M4[j]) * nb,
             c[4] + float(P5[j]) * na + float(M5[j]) * nb]
    phi = _ndtr(m * inv_s)
    sp = [phi + c[k] * inv_s for k in range(5)]

    use_gh = s < SPLIT_THRESHOLD
    return tuple(jnp.where(use_gh, gh[k], sp[k]) for k in range(5))


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


def _quad_moments(mu0, ls0, mu1, ls1, od, unroll: bool):
    """All sigmoid moments needed for the summaries, from SQUASHED
    per-voxel posterior params (log-stds already tanh-transformed).

    Cross moments via the exact covariance decomposition
    J_pq = O_p*D_q + Cov(sig^p(l0), G_q(mu1 + od*z0)) with the
    covariance Taylor-expanded to third order in od (|od| <= e^-2 by
    the tanh squash; worst-case error over the full envelope in the
    module docstring). Marginals O_p (std s0) and D_q (the exact
    Gaussian marginal std sqrt(od^2 + s1^2)) stay hybrid-exact; at
    od = 0 every Taylor term vanishes and J_pq == O_p*D_q exactly."""
    s0 = jnp.exp(ls0)
    s1 = jnp.exp(ls1)
    sm1 = jnp.sqrt(od * od + s1 * s1)

    O1, O2, U1, U2, V1, V2, W1, W2 = _omom1d(mu0, s0, unroll)
    D1, D2 = _mom1d(mu1, sm1, unroll)
    g1, g2, g3, g4, g5 = _gmom1d(mu1, s1, unroll)

    G1d1 = g1 - g2
    G1d2 = g1 - 3.0 * g2 + 2.0 * g3
    G1d3 = g1 - 7.0 * g2 + 12.0 * g3 - 6.0 * g4
    G2d1 = 2.0 * (g2 - g3)
    G2d2 = 2.0 * (2.0 * g2 - 5.0 * g3 + 3.0 * g4)
    G2d3 = 2.0 * (4.0 * g2 - 19.0 * g3 + 27.0 * g4 - 12.0 * g5)

    # Cov(f_p, G_q(mu1 + od z0)) = od E[f z] G' + od^2/2 (E[f z^2]-O) G''
    #   + od^3/6 E[f z^3] G''' + O(od^4)   (E[z^3] = 0, E[z^2] = 1)
    h2 = 0.5 * od * od
    h3 = h2 * od * (1.0 / 3.0)
    t1_1 = od * U1
    t1_2 = od * U2
    t2_1 = h2 * (V1 - O1)
    t2_2 = h2 * (V2 - O2)
    t3_1 = h3 * W1
    t3_2 = h3 * W2
    J11 = O1 * D1 + t1_1 * G1d1 + t2_1 * G1d2 + t3_1 * G1d3
    J12 = O1 * D2 + t1_1 * G2d1 + t2_1 * G2d2 + t3_1 * G2d3
    J21 = O2 * D1 + t1_2 * G1d1 + t2_2 * G1d2 + t3_2 * G1d3
    J22 = O2 * D2 + t1_2 * G2d1 + t2_2 * G2d2 + t3_2 * G2d3
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



def quad_tile_summaries(q0, q1, q2, q3, q4, *, mvg: bool,
                        oef_range: float, min_oef: float,
                        dbv_range: float, min_dbv: float,
                        dw_coeff: float, unroll: bool = True):
    """One tile of raw head rows -> (means 3-tuple, variances 3-tuple,
    squashed (ls0, ls1, od)). The single owner of the raw->squashed
    transforms + quadrature math shared by the standalone quadrature
    kernel and the merged encode+quadrature inference kernel
    (ops/pallas_infer.py) -- identical math to the jnp path, so all
    three agree to fp tolerance (gated exactly in tests)."""
    mu0 = q0
    ls0 = jnp.tanh(q1) * 3.0 - 1.0                 # dist transform_std
    mu1 = q2
    ls1 = jnp.tanh(q3) * 3.0 - 1.0
    od = (jnp.tanh(q4) * math.exp(-2.0) if mvg     # transform_offdiag
          else jnp.zeros_like(mu0))

    moments = _quad_moments(mu0, ls0, mu1, ls1, od, unroll=unroll)
    means, variances = _summaries_from_moments(
        *moments, oef_range=oef_range, min_oef=min_oef,
        dbv_range=dbv_range, min_dbv=min_dbv, dw_coeff=dw_coeff)
    return means, variances, (ls0, ls1, od)


def _quad_kernel(params_ref, mean_ref, var_ref, *, mvg: bool,
                 oef_range: float, min_oef: float, dbv_range: float,
                 min_dbv: float, dw_coeff: float):
    """All loops are Python-unrolled with baked constants: three
    16-node 1-D passes plus their 16-node Laguerre splits ~ a few
    hundred vector instructions -- far below the instruction-count
    regime where remote Mosaic compiles stall (the old 16x16 tensor
    grid needed a fori_loop with SMEM node loads for exactly that
    reason; the od-Taylor cross moments removed the grid)."""
    means, variances, _ = quad_tile_summaries(
        params_ref[0], params_ref[1], params_ref[2], params_ref[3],
        params_ref[4], mvg=mvg, oef_range=oef_range, min_oef=min_oef,
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
    n = params.shape[0]
    pt, n_pad, grid = pack_params_tiled(params, lanes)
    mean_t, var_t = _quad_call(pt, grid, mvg=mvg, oef_range=oef_range,
                               min_oef=min_oef, dbv_range=dbv_range,
                               min_dbv=min_dbv, dw_coeff=dw_coeff,
                               interpret=interpret, lanes=lanes)
    return unpack_summaries_tiled(mean_t, var_t, n, n_pad)


@partial(jax.jit, static_argnames=("mvg", "oef_range", "min_oef",
                                   "dbv_range", "min_dbv", "dw_coeff",
                                   "interpret", "lanes"))
def quad_posterior_summaries_packed(params_t: jax.Array, *, mvg: bool = True,
                                    oef_range: float = 0.8,
                                    min_oef: float = 0.04,
                                    dbv_range: float = 0.2,
                                    min_dbv: float = 0.001,
                                    dw_coeff: float = 1.0,
                                    interpret: bool = False,
                                    lanes: int = _LANES):
    """Packed channel-major entry: ``params_t (5, n_pad)`` with
    n_pad % (8 * lanes) == 0 (diag heads carry zeros in row 4), as
    emitted by the fused stream-1 encode kernel
    (ops/pallas_infer.py::encode_q1_packed). Returns channel-major
    (means_t (3, n_pad), vars_t (3, n_pad)) -- the caller slices off its
    pad. Skips pack_params_tiled's (N, 5) transpose: the (5, n_pad)
    layout's minor axis is already the voxel axis, so the tile reshape
    here is a cheap minor split with no padded-lane traffic. Same voxel
    bijection as pack/unpack_summaries_tiled (v = s * (n_pad/8) + l)."""
    n_pad = params_t.shape[1]
    if n_pad % (_SUB * lanes):
        raise ValueError(
            f"packed quadrature needs n_pad % {_SUB * lanes} == 0, "
            f"got {n_pad}")
    pt = params_t.reshape(5, _SUB, n_pad // _SUB)
    mean_t, var_t = _quad_call(pt, (n_pad // _SUB) // lanes, mvg=mvg,
                               oef_range=oef_range, min_oef=min_oef,
                               dbv_range=dbv_range, min_dbv=min_dbv,
                               dw_coeff=dw_coeff, interpret=interpret,
                               lanes=lanes)
    return mean_t.reshape(3, n_pad), var_t.reshape(3, n_pad)


def _quad_call(pt, grid, *, mvg, oef_range, min_oef, dbv_range, min_dbv,
               dw_coeff, interpret, lanes):
    n_pad = pt.shape[1] * pt.shape[2]
    kernel = partial(_quad_kernel, mvg=mvg, oef_range=oef_range,
                     min_oef=min_oef, dbv_range=dbv_range, min_dbv=min_dbv,
                     dw_coeff=dw_coeff)
    return pl.pallas_call(
        kernel,
        grid=(grid,),
        in_specs=[
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
        interpret=pltpu.InterpretParams() if interpret else False,
    )(pt)
