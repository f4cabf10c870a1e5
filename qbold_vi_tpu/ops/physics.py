"""The ASE qBOLD biophysical forward model as pure jnp functions.

TPU-native re-design of the reference ``SignalGenerationLayer``
(reference: signals.py:13-248). Everything here is stateless, fp32,
jit/vmap/grad-compatible and shaped for fusion by XLA: the quadrature is a
weighted inner product against precomputed Simpson weights, J0 is the
polynomial approximation in ``bessel.py`` (no host callbacks, no
tf.vectorized_map), and the per-voxel working set (n_taus x 129 quadrature
lattice) stays inside a single fusion / Pallas kernel rather than being
materialised in HBM.

Physics summary (with reference citations):
  delta_omega = (4/3) pi gamma B0 dchi hct oef         (signals.py:142-144)
  R2' = delta_omega * dbv                              (signals.py:149-150)
  tissue (full SDR model, signals.py:159-193):
      S_t = exp(-dbv * I(tau*dw)) * exp(-te*r2t)
      I(c) = int_0^1 (2+u) sqrt(1-u) (1 - J0(1.5 c u)) / (3 u^2) du
      (rules: "cheb" -- a degree-20 Chebyshev surrogate in (c/17)^2,
       |err| 5.3e-10 fp64 / ~3e-6 at the fp32 Clenshaw floor, selected
       automatically whenever the scan envelope fits; "gj16" -- 16-node
       Gauss-Jacobi matched to the sqrt(1-u) weight, |err| < 1.5e-6,
       the fallback for exotic protocols; reference_fp32_compat: the
       reference's 129-point Simpson lattice on [1e-5, 1], inherent
       |err| ~ 2.7e-3)
  tissue (asymptotic two-regime model, signals.py:196-207):
      |tau| <  1/dw : exp(-te*r2t) * exp(-0.3 (r2p tau)^2 / dbv)
      |tau| >= 1/dw : exp(-te*r2t) * exp(dbv - r2p tau)
  blood (Berman 2018 constants, signals.py:233-247)
  compartment mixing via steady-state magnetisation     (signals.py:100-114)
  acquisition noise from per-tau SNR profiles           (signals.py:116-128)
  slice misalignment augmentation                       (signals.py:80-96)
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ScanParams
from .bessel import bessel_j0, one_minus_j0

__all__ = [
    "N_QUAD",
    "quadrature_lattice",
    "delta_omega",
    "r2_prime",
    "sdr_integral_cheb",
    "cheb_abscissa",
    "select_quad_rule",
    "tissue_signal_full",
    "tissue_signal_asymptotic",
    "blood_signal",
    "blood_steady_state_weight",
    "ase_signal",
    "norm_snr_profile",
    "add_acquisition_noise",
    "misalign_params",
]

# 2**7 + 1 Simpson points, as in the reference (signals.py:168).
N_QUAD = 129
_U_LO = 1e-5   # lower integration limit; 0 is a removable singularity
_U_HI = 1.0


def quadrature_lattice(n_points: int = N_QUAD) -> tuple[np.ndarray, np.ndarray, float]:
    """Precompute (u grid, Simpson-weighted integrand prefactor g(u)*w(u),
    and the constant term int g(u) du under the same discretisation).

    The integrand of the SDR tissue integral factors as
        g(u) * (1 - J0(1.5 * tau * dw * u)),
        g(u) = (2 + u) sqrt(1 - u) / (3 u^2)
    so with Simpson weights w the integral becomes
        I(c) = sum_i g_i w_i - sum_i g_i w_i J0(c u_i)
    and only the J0 term depends on the voxel. Returns float64 for test
    fidelity; cast at use sites.
    """
    u = np.linspace(_U_LO, _U_HI, n_points, dtype=np.float64)
    h = (u[2] - u[0]) / 2.0
    w = np.ones(n_points, dtype=np.float64)
    w[1:-1:2] = 4.0
    w[2:-2:2] = 2.0
    w *= h / 3.0
    g = (2.0 + u) * np.sqrt(1.0 - u) / (3.0 * np.square(u))
    gw = g * w
    return u, gw, float(np.sum(gw))


# Module-level constants (small; baked into the compiled program as
# literals at trace time). Kept as NUMPY arrays deliberately: eager
# jnp.asarray at import would initialise a JAX backend as a side effect
# of `import qbold_vi_tpu`, before callers can configure platforms.
_U64, _GW64, _G_CONST64 = quadrature_lattice()
_U = _U64.astype(np.float32)
_GW = _GW64.astype(np.float32)
_G_CONST = np.float32(_G_CONST64)

# 16-node Gauss-Jacobi rule for the SDR integral, weight (1-u)^{1/2} on
# [0, 1] (scipy roots_jacobi(16, 0.5, 0), mapped from [-1, 1]); _GJ16_WG
# folds the full prefactor w * (2+u) / (3 u^2), so
#     I(c) ~= sum_i WG_i * (1 - J0(c * u_i)).
# The Jacobi weight absorbs the integrand's sqrt(1-u) endpoint factor
# exactly, so 16 nodes reach |err| < 1.5e-6 where the reference's
# 129-point Simpson lattice on [1e-5, 1] has an inherent discretisation
# error of ~2.7e-3 (measured against scipy.integrate.quad;
# tests/test_physics.py::oracle_tissue_full gates) -- 8x fewer Bessel
# evaluations AND ~3 orders of magnitude more accurate.
_GJ16_U64 = np.array([
    0.005143979307365376, 0.026905100186775777, 0.06525346129857601,
    0.11885287482812507, 0.18582445064904252, 0.26381943591394486,
    0.35010225532648365, 0.4416465851757409, 0.535241534755813,
    0.6276042793481131, 0.7154952094720111, 0.795831561890886,
    0.8657955482325908, 0.9229331891781755, 0.9652403878525269,
    0.9912332235069066,
], dtype=np.float64)
_GJ16_WG64 = np.array([
    332.02413861347264, 27.831404480423064, 7.228516842933007,
    2.8460723362510847, 1.3881432807018608, 0.7685944247606386,
    0.46080322251507605, 0.2903248434243377, 0.18808126289704707,
    0.1230191259787926, 0.0797948391919353, 0.050259822571288554,
    0.029843316315261624, 0.015881528927640064, 0.006794309437261243,
    0.0016610835166726576,
], dtype=np.float64)
_GJ16_U = _GJ16_U64.astype(np.float32)
_GJ16_WG = _GJ16_WG64.astype(np.float32)

# Chebyshev surrogate for the SDR integral: I(c) is a smooth EVEN 1-D
# function of c = tau * dw alone, so on the bounded physical envelope
# |c| <= 17 (|tau|_max 0.064 s x dw_coeff 887.3 x hct 0.34 x OEF <= 0.84
# -> c_max = 16.22 for every published protocol) a degree-20 expansion in
# t = (c/17)^2 captures it to 5.3e-10 in float64 -- the fp32 Clenshaw
# evaluation floor (~3e-6 absolute in I, <= 7e-7 in the decayed signal
# after the dbv <= 0.201 multiplication) is the only remaining error.
# One ~21-FMA Clenshaw replaces 16 rational J0 approximations per
# (voxel, tau): ~30x fewer VPU flops on the training hot path, and the
# backward pass uses the derivative TABLE of the same fit (exact
# derivative of the forward approximant, |dI/dc err| < 4e-8 vs the true
# integral). Generated by tools/gen_cheb_sdr.py; selection is
# envelope-gated per scan by select_quad_rule() with a Gauss-Jacobi
# fallback. (reference anchor: signals.py:159-193's Simpson lattice)
_CHEB_CMAX = 17.0
_CHEB_I64 = np.array([
    9.866915278212103,
    7.15178129173075,
    -1.3874029423862115,
    0.5684482848616327,
    -0.2964158056737435,
    0.17456105573999753,
    -0.1096504503323415,
    0.07033178965494045,
    -0.04642863188421036,
    0.030430483836097973,
    -0.01784883925686604,
    0.008692282817092277,
    -0.0034368251853911006,
    0.0011088814765485748,
    -0.0002960950562157371,
    6.645318461205073e-05,
    -1.271695220883571e-05,
    2.1015479405875626e-06,
    -3.0322440003633545e-07,
    3.856231220852574e-08,
    -4.319402330758407e-09,
], dtype=np.float64)
# Chebyshev coefficients of dI/dt on the same x = 2t - 1 grid (exact
# derivative of the fit; chain rule dI/dc = chebval(x, D) * 4 c / CMAX^2).
_CHEB_DI64 = np.polynomial.chebyshev.chebder(_CHEB_I64)
# fp32-rounded python-float tables: the SINGLE source of the surrogate's
# constants for both the jnp path below and the Pallas kernels
# (ops/pallas_decode.py bakes these same tuples into its trace), so the
# kernel-vs-jnp bit-exactness gates rest on one table, not two copies.
_CHEB_I32 = tuple(float(np.float32(a)) for a in _CHEB_I64)
_CHEB_DI32 = tuple(float(np.float32(a)) for a in _CHEB_DI64)
# The maximum OEF the DEFAULT configuration can produce: the logit forward
# transform's upper bound min_oef + oef_range (model.py:299-305) == 0.84;
# the synthetic sampler and the misalignment augmentation clip below it.
# Callers with a widened OEF configuration must pass their own bound to
# select_quad_rule/ase_signal or the envelope gate under-estimates c_max.
MAX_PHYSICAL_OEF = 0.84
# Clip range of the misalignment augmentation's perturbed OEF
# (misalign_params below; reference signals.py:90): data-generation paths
# fold the upper clip into their envelope bound.
MISALIGN_OEF_CLIP = (0.05, 0.8)


def _clenshaw(x, coef):
    """Chebyshev series at x via Clenshaw recurrence.

    ``coef``: python floats (already fp32-rounded, e.g. _CHEB_I32).
    Written as an explicit unrolled loop over python-float coefficients so
    the jnp path and the Pallas kernels (ops/pallas_decode.py) evaluate
    the IDENTICAL operation sequence."""
    b0, b1 = 0.0, 0.0
    for a in coef[::-1][:-1]:
        b0, b1 = 2.0 * x * b0 - b1 + a, b0
    return x * b0 - b1 + coef[0]


def cheb_abscissa(c):
    """Clenshaw abscissa of the surrogate: x = min(2 (c/cmax)^2 - 1, 1).

    Shared by sdr_integral_cheb and the Pallas kernels (one definition of
    the envelope mapping). Clamped at the +1 edge; pair any derivative
    with the (2t - 1 <= 1) indicator so the clamped region is flat."""
    return jnp.minimum(
        2.0 * (jnp.square(c) * (1.0 / _CHEB_CMAX ** 2)) - 1.0, 1.0)


@jax.custom_jvp
def sdr_integral_cheb(c):
    """I(c) on |c| <= _CHEB_CMAX via the Chebyshev surrogate (see table
    comment). Even in c; values beyond the envelope clamp to the edge
    (callers select this rule only when the scan envelope fits)."""
    return _clenshaw(cheb_abscissa(c), _CHEB_I32)


@sdr_integral_cheb.defjvp
def _sdr_integral_cheb_jvp(primals, tangents):
    (c,), (dc,) = primals, tangents
    raw = 2.0 * (jnp.square(c) * (1.0 / _CHEB_CMAX ** 2)) - 1.0
    x = jnp.minimum(raw, 1.0)
    d = _clenshaw(x, _CHEB_DI32) * (4.0 / _CHEB_CMAX ** 2) * c
    # The primal clamps to the envelope edge (constant beyond |c|=cmax);
    # the tangent must be zero there too, not the unclamped polynomial's.
    d = jnp.where(raw <= 1.0, d, 0.0)
    return _clenshaw(x, _CHEB_I32), d * dc


def select_quad_rule(scan: ScanParams, requested: str = "auto",
                     max_oef: float = MAX_PHYSICAL_OEF,
                     hct: float | None = None) -> str:
    """Resolve the SDR quadrature rule for a scan protocol (static).

    "auto" picks the Chebyshev surrogate whenever the scan's worst-case
    argument |tau|_max * dw_coeff * hct * max_oef fits the fitted
    envelope, else the 16-node Gauss-Jacobi rule. Explicit "cheb"/"gj16"
    force a rule (cheb outside the envelope clamps -- test/debug only)."""
    if requested in ("cheb", "gj16"):
        return requested
    if requested != "auto":
        raise ValueError(f"unknown quad_rule {requested!r}")
    c_max = float(np.max(np.abs(scan.taus()))) * scan.dw_coeff \
        * (scan.hct if hct is None else hct) * max_oef
    return "cheb" if c_max <= _CHEB_CMAX else "gj16"



def _align_tau(x, n_taus: int, per_tau: bool = False):
    """Broadcast a per-voxel quantity against the tau axis.

    ``per_tau`` must be set explicitly when ``x`` carries a trailing tau
    axis (misalignment augmentation makes parameters per-tau,
    signals.py:95-96); it is never inferred from the shape, because a
    per-voxel trailing dim can coincidentally equal n_taus (e.g. a volume
    with n_taus z-slices) and silent mis-broadcast would follow."""
    if jnp.ndim(x) == 0:
        return x
    if per_tau:
        if jnp.shape(x)[-1] != n_taus:
            raise ValueError(
                f"per-tau parameters must have trailing dim {n_taus}, "
                f"got shape {jnp.shape(x)}")
        return x
    return x[..., None]

def delta_omega(oef, hct, scan: ScanParams):
    """Characteristic frequency dw (reference: signals.py:142-144)."""
    return scan.dw_coeff * hct * oef


def r2_prime(oef, dbv, hct, scan: ScanParams):
    """Reversible relaxation rate R2' = dw * dbv (signals.py:149-150)."""
    return delta_omega(oef, hct, scan) * dbv


def tissue_signal_full(dw, dbv, taus, te: float, r2t: float,
                       reference_fp32_compat: bool = False,
                       per_tau: bool = False, quad_rule: str = "gj16"):
    """Full static-dephasing-regime tissue signal (signals.py:159-193).

    dw, dbv: (...,) per-voxel, or (..., n_taus) per-tau with ``per_tau``.
    taus:    (n_taus,) float32.
    Returns (..., n_taus).

    ``reference_fp32_compat``: the reference evaluates ``1 - J0(x)`` by
    direct fp32 subtraction (signals.py:170); near the u->0 quadrature
    nodes 1-J0 ~ x^2/4 is below fp32 epsilon and truncates to ZERO, while
    the integrand g(u)*(1-J0) there has the finite limit (1.5 tau dw)^2/6
    -- so the reference systematically underestimates the integral by up
    to ~1.5% at high tau*dw (up to ~5% relative in the decayed signal).
    The default uses a cancellation-free series for 1-J0 (bessel.py),
    which tests gate as strictly more accurate against a float64 oracle;
    compat mode reproduces the reference's truncation for bit-level
    parity runs (tests/test_parity_reference.py).
    """
    c = taus * _align_tau(dw, taus.shape[0], per_tau)   # (..., n_taus)
    if reference_fp32_compat:
        # reference lattice: 129-point Simpson on [1e-5, 1] with fp32
        # 1 - J0 subtraction (signals.py:166-171)
        x = 1.5 * c[..., None] * _U
        integral = jnp.sum(_GW * (1.0 - bessel_j0(x)), axis=-1)
    elif quad_rule == "cheb":
        # Chebyshev surrogate of I(c) on the scan envelope (see table
        # comment): one Clenshaw per (voxel, tau), no J0 lattice at all.
        integral = sdr_integral_cheb(c)
    elif quad_rule == "gj16":
        # default: 16-node Gauss-Jacobi (see table comment above), with a
        # cancellation-free 1-J0. (..., n_taus, P) lattice; XLA keeps it
        # inside one fusion.
        x = 1.5 * c[..., None] * _GJ16_U
        integral = jnp.sum(_GJ16_WG * one_minus_j0(x), axis=-1)
    else:
        # Explicit, so a typo'd rule fails identically on the jnp path
        # and the kernel path (pallas_decode._consts raises the same).
        raise ValueError(f"unknown quad_rule {quad_rule!r}")
    dbv_b = _align_tau(dbv, taus.shape[0], per_tau)
    return jnp.exp(-dbv_b * integral) * math.exp(-te * r2t)


def tissue_signal_asymptotic(dw, dbv, taus, te: float, r2t: float,
                             per_tau: bool = False):
    """Two-regime asymptotic tissue model (signals.py:196-207).

    Branch-free: both regimes are evaluated and blended by the
    |tau| < tc = 1/dw mask, exactly as the reference does "because it's
    much easier to parallelise" (signals.py:195-207).
    """
    n_taus = taus.shape[0]
    dbv_b = _align_tau(dbv, n_taus, per_tau)
    tc = _align_tau(1.0 / dw, n_taus, per_tau)
    r2p = _align_tau(dw, n_taus, per_tau) * dbv_b
    rt = r2p * taus                   # (..., n_taus)
    under = jnp.abs(taus) < tc
    s_short = jnp.exp(-(0.3 * jnp.square(rt)) / dbv_b)
    s_long = jnp.exp(dbv_b - rt)
    envelope = math.exp(-te * r2t)
    return envelope * jnp.where(under, s_short, s_long)


def blood_steady_state_weight(dbv, scan: ScanParams):
    """Blood compartment weight m_bld * nb * dbv (signals.py:100-107)."""
    m_bld = 1.0 - (2.0 - math.exp(-(scan.tr - scan.ti) / scan.t1b)) * math.exp(
        -scan.ti / scan.t1b
    )
    return m_bld * scan.nb * dbv


def blood_signal(oef, hct, taus, scan: ScanParams, per_tau: bool = False):
    """Venous blood signal, Berman et al. 2018 constants
    (reference: signals.py:233-247; the Golay-2001 variant at 217-231 is
    dead code behind ``if False`` and is deliberately not reproduced)."""
    r2b = 1.0 / 0.189
    td = (2.6 ** 2.0) / 2.0 * 1e-3
    te = scan.te
    g0 = (4.0 / 45.0) * hct * (1.0 - hct) * jnp.square(
        4.0 * math.pi * scan.b0 * scan.dchi * oef
    )
    # NB: the reference's active branch uses (te +/- tau)/td NOT squared
    # (signals.py:245-247); reproduced faithfully.
    phase = (
        (te / td)
        + jnp.sqrt(0.25 + (te / td))
        + 1.5
        - 2.0 * jnp.sqrt(0.25 + (te + taus) / td)
        - 2.0 * jnp.sqrt(0.25 + (te - taus) / td)
    )
    g0_b = _align_tau(g0, jnp.shape(taus)[0], per_tau)
    return math.exp(-r2b * te) * jnp.exp(
        -(0.5 * scan.gamma**2) * g0_b * (td**2) * phase
    )


def ase_signal(oef, dbv, scan: ScanParams, hct=None, *,
               full_model: bool = True, include_blood: bool = True,
               reference_fp32_compat: bool = False,
               per_tau_params: bool = False, quad_rule: str = "auto",
               max_oef: float | None = None):
    """Noise-free ASE signal for (OEF, DBV[, hct]) voxels
    (reference: signals.py:55-140 minus the noise/misalignment stages,
    which are separate pure functions here).

    oef, dbv: (...,) per-voxel, or (..., n_taus) per-tau maps (from
    misalignment augmentation) with ``per_tau_params=True`` -- explicit,
    never shape-inferred, so a per-voxel trailing dim that happens to
    equal n_taus cannot be mis-read. Returns (..., n_taus) float32.
    ``reference_fp32_compat``: see tissue_signal_full.
    ``max_oef``: static upper bound on the OEF values this call can see,
    used by the ``"auto"`` envelope gate; callers whose configuration
    widens the OEF range beyond the default transform bound MUST pass it
    (models/vi.py, infer.py and the synthetic generators do).

    Thin host wrapper: ``"auto"`` is resolved here, BEFORE the jit
    boundary, so any concrete scalar hct (python or numpy float,
    including the ``None`` -> scan constant default) gets the static
    envelope gate; only a genuinely traced per-voxel hct array -- which
    has no static bound -- conservatively keeps Gauss-Jacobi.
    """
    if quad_rule not in ("auto", "cheb", "gj16"):
        raise ValueError(f"unknown quad_rule {quad_rule!r}")
    if quad_rule == "auto":
        static_hct = None
        if hct is None:
            static_hct = float(scan.hct)
        elif isinstance(hct, (int, float, np.floating)) \
                and not isinstance(hct, bool):
            static_hct = float(hct)
        if static_hct is not None:
            quad_rule = select_quad_rule(
                scan, "auto",
                max_oef=MAX_PHYSICAL_OEF if max_oef is None else max_oef,
                hct=static_hct)
        else:
            quad_rule = "gj16"
    return _ase_signal_jit(
        oef, dbv, scan, hct, full_model=full_model,
        include_blood=include_blood,
        reference_fp32_compat=reference_fp32_compat,
        per_tau_params=per_tau_params, quad_rule=quad_rule)


@partial(jax.jit, static_argnames=("scan", "full_model", "include_blood",
                                   "reference_fp32_compat", "per_tau_params",
                                   "quad_rule"))
def _ase_signal_jit(oef, dbv, scan: ScanParams, hct, *,
                    full_model: bool, include_blood: bool,
                    reference_fp32_compat: bool, per_tau_params: bool,
                    quad_rule: str):
    """Compiled body of ase_signal; ``quad_rule`` arrives resolved."""
    taus = jnp.asarray(scan.taus())
    if hct is None:
        hct = scan.hct
    oef = jnp.asarray(oef, jnp.float32)
    dbv = jnp.asarray(dbv, jnp.float32)
    dw = delta_omega(oef, hct, scan)

    if full_model:
        tissue = tissue_signal_full(dw, dbv, taus, scan.te, scan.r2t,
                                    reference_fp32_compat=reference_fp32_compat,
                                    per_tau=per_tau_params,
                                    quad_rule=quad_rule)
    else:
        tissue = tissue_signal_asymptotic(dw, dbv, taus, scan.te, scan.r2t,
                                          per_tau=per_tau_params)

    dbv_b = _align_tau(dbv, scan.n_taus, per_tau_params)

    if include_blood:
        blood_weight = blood_steady_state_weight(dbv_b, scan)
        blood = blood_signal(oef, hct, taus, scan, per_tau=per_tau_params)
        blood = jnp.broadcast_to(blood, tissue.shape)
    else:
        blood_weight = dbv_b
        blood = jnp.zeros_like(tissue)

    tissue_weight = 1.0 - blood_weight
    return tissue_weight * tissue + blood_weight * blood


def norm_snr_profile(taus: np.ndarray) -> np.ndarray:
    """Per-tau normalised SNR profile (reference: signals.py:117-121).

    Defined for the 11-tau clinical and 24-tau streamlined protocols; for
    any other protocol the reference crashes (UnboundLocalError) -- we
    instead fall back to a flat profile and document the deviation.
    """
    n = len(taus)
    if n == 11:
        return np.array(
            [0.985, 1.00, 1.01, 1.0, 0.97, 0.95, 0.93, 0.90, 0.86, 0.83, 0.79],
            dtype=np.float32,
        )
    if n == 24:
        return (1.0 - np.abs(np.arange(-0.028, 0.065, 0.004)) * 3.0).astype(np.float32)
    return np.ones(n, dtype=np.float32)


def add_acquisition_noise(key: jax.Array, signal: jax.Array, taus: np.ndarray,
                          snr_low: float = 50.0, snr_high: float = 120.0):
    """SNR-profiled Gaussian acquisition noise (reference: signals.py:116-128).

    Per-image SNR ~ U(snr_low, snr_high) scaled by the per-tau profile;
    noise std is the batch-mean signal per tau divided by the SNR.
    """
    k1, k2 = jax.random.split(key)
    n = signal.shape[0]
    norm_snr = jnp.asarray(norm_snr_profile(np.asarray(taus)))
    snr = jax.random.uniform(k1, (n, 1), minval=snr_low, maxval=snr_high) * norm_snr[None, :]
    std_dev = jnp.mean(signal, axis=0, keepdims=True) / snr
    return signal + jax.random.normal(k2, signal.shape) * std_dev


def misalign_params(key: jax.Array, oef: jax.Array, dbv: jax.Array,
                    n_taus: int, prob: float):
    """Slice-misalignment augmentation (reference: signals.py:80-96).

    With probability ``prob`` per voxel, images acquired after a random
    index in [4, n_taus-1) see a perturbed (OEF, DBV). Input oef/dbv are
    (N,); output is (N, n_taus) per-tau parameter maps.
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = oef.shape[0]
    oef = oef[:, None]
    dbv = dbv[:, None]
    misaligned = jax.random.uniform(k1, (n, 1)) < prob
    from_idx = jax.random.randint(k2, (n, 1), 4, n_taus - 1)
    image_idx = jnp.arange(n_taus)[None, :]
    mask = jnp.logical_and(image_idx > from_idx, misaligned).astype(jnp.float32)
    mis_oef = jnp.clip(jax.random.normal(k3, (n, 1)) * 0.15 + oef, 0.05, 0.8)
    mis_dbv = jnp.clip(jax.random.normal(k4, (n, 1)) * 0.05 + dbv, 0.002, 0.3)
    oef_out = oef * (1.0 - mask) + mis_oef * mask
    dbv_out = dbv * (1.0 - mask) + mis_dbv * mask
    return oef_out, dbv_out
