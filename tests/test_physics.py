"""Golden-value tests of the ASE forward model vs independent float64
numpy/scipy implementations of the reference equations.

Independent oracle: the same physics (signals.py:100-247) recomputed here
in float64 with scipy.special.j0 and a hand-rolled Simpson rule -- NOT via
the framework's code paths -- so agreement validates both the math and the
fp32 numerics (SURVEY.md SS4 test strategy, gate (1)).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from qbold_vi_tpu.config import ScanParams
from qbold_vi_tpu.ops import physics

SCAN = ScanParams()


def oracle_tissue_full(oef, dbv, scan: ScanParams):
    """The TRUE static-dephasing integral (signals.py:159-172's
    mathematical definition) in float64 via adaptive quadrature -- not
    the reference's 129-point lattice, whose inherent discretisation
    error is ~2.7e-3 in I (our default Gauss-Jacobi rule is gated
    against the truth; the reference lattice itself is gated in
    tests/test_parity_reference.py compat mode)."""
    import scipy.integrate as spi

    taus = scan.taus().astype(np.float64)
    dw = (4.0 / 3.0) * math.pi * scan.gamma * scan.b0 * scan.dchi * scan.hct * oef
    integral = np.empty_like(taus)
    for i, tau in enumerate(taus):
        c = 1.5 * tau * dw
        integral[i] = spi.quad(
            lambda u: (2.0 + u) * np.sqrt(1.0 - u)
            * (1.0 - sps.j0(c * u)) / (3.0 * u * u),
            0.0, 1.0, limit=200)[0]
    return np.exp(-dbv * integral) * np.exp(-scan.te * scan.r2t)


def oracle_tissue_asymptotic(oef, dbv, scan: ScanParams):
    """Reference signals.py:196-207 in float64."""
    taus = scan.taus().astype(np.float64)
    dw = (4.0 / 3.0) * math.pi * scan.gamma * scan.b0 * scan.dchi * scan.hct * oef
    tc = 1.0 / dw
    r2p = dw * dbv
    s_short = np.exp(-scan.r2t * scan.te) * np.exp(-(0.3 * (r2p * taus) ** 2) / dbv)
    s_long = np.exp(-scan.r2t * scan.te) * np.exp(dbv - (r2p * taus))
    return np.where(np.abs(taus) < tc, s_short, s_long)


def oracle_blood(oef, scan: ScanParams):
    """Reference signals.py:233-247 in float64."""
    taus = scan.taus().astype(np.float64)
    hct = scan.hct
    te = scan.te
    r2b = 1.0 / 0.189
    td = (2.6**2.0) / 2.0 * 1e-3
    g0 = (4 / 45) * hct * (1 - hct) * (4.0 * math.pi * scan.b0 * scan.dchi * oef) ** 2
    return np.exp(-r2b * te) * np.exp(
        -(0.5 * scan.gamma**2)
        * g0
        * td**2
        * (
            (te / td)
            + np.sqrt(0.25 + te / td)
            + 1.5
            - 2.0 * np.sqrt(0.25 + (te + taus) / td)
            - 2.0 * np.sqrt(0.25 + (te - taus) / td)
        )
    )


def oracle_ase(oef, dbv, scan: ScanParams, full_model=True, include_blood=True):
    """Reference signals.py:98-114 compartment mixing in float64."""
    tissue = (
        oracle_tissue_full(oef, dbv, scan)
        if full_model
        else oracle_tissue_asymptotic(oef, dbv, scan)
    )
    if include_blood:
        nb = 0.775
        m_bld = 1 - (2 - math.exp(-(scan.tr - scan.ti) / scan.t1b)) * math.exp(
            -scan.ti / scan.t1b
        )
        blood_weight = m_bld * nb * dbv
        blood = oracle_blood(oef, scan)
    else:
        blood_weight = dbv
        blood = 0.0
    return (1 - blood_weight) * tissue + blood_weight * blood


PARAM_GRID = [
    (0.05, 0.003), (0.2, 0.025), (0.4, 0.03), (0.4, 0.12),
    (0.6, 0.08), (0.8, 0.195), (0.84, 0.2), (0.1, 0.15),
]


def test_dw_and_r2p():
    oef = jnp.asarray([0.2, 0.4, 0.8], jnp.float32)
    dbv = jnp.asarray([0.01, 0.05, 0.1], jnp.float32)
    dw = np.asarray(physics.delta_omega(oef, SCAN.hct, SCAN))
    expect = (4 / 3) * math.pi * SCAN.gamma * SCAN.b0 * SCAN.dchi * SCAN.hct * np.array(
        [0.2, 0.4, 0.8]
    )
    np.testing.assert_allclose(dw, expect, rtol=1e-6)
    r2p = np.asarray(physics.r2_prime(oef, dbv, SCAN.hct, SCAN))
    np.testing.assert_allclose(r2p, expect * np.array([0.01, 0.05, 0.1]), rtol=1e-6)


def test_tau_grid_matches_reference_protocol():
    taus = SCAN.taus()
    assert len(taus) == 11
    np.testing.assert_allclose(taus, np.arange(-0.016, 0.065, 0.008), atol=1e-7)
    assert SCAN.se_idx == 2
    assert abs(taus[SCAN.se_idx]) < 1e-9


def test_tissue_full_vs_oracle():
    for oef, dbv in PARAM_GRID:
        dw = physics.delta_omega(jnp.float32(oef), SCAN.hct, SCAN)
        ours = np.asarray(
            physics.tissue_signal_full(dw, jnp.float32(dbv),
                                       jnp.asarray(SCAN.taus()), SCAN.te, SCAN.r2t)
        )
        ref = oracle_tissue_full(oef, dbv, SCAN)
        np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=2e-5)


def test_tissue_asymptotic_vs_oracle():
    for oef, dbv in PARAM_GRID:
        dw = physics.delta_omega(jnp.float32(oef), SCAN.hct, SCAN)
        ours = np.asarray(
            physics.tissue_signal_asymptotic(dw, jnp.float32(dbv),
                                             jnp.asarray(SCAN.taus()), SCAN.te, SCAN.r2t)
        )
        ref = oracle_tissue_asymptotic(oef, dbv, SCAN)
        np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=2e-5)


def test_full_and_asymptotic_agree_at_long_tau():
    """For tau >> tc the full SDR integral approaches the linear-exponential
    regime (SURVEY.md SS4 gate: they must agree for tau >> tc)."""
    oef, dbv = 0.6, 0.05
    dw = float(physics.delta_omega(jnp.float32(oef), SCAN.hct, SCAN))
    tc = 1.0 / dw
    long_taus = jnp.asarray(np.linspace(6 * tc, 12 * tc, 7, dtype=np.float32))
    full = np.asarray(physics.tissue_signal_full(jnp.float32(dw), jnp.float32(dbv),
                                                 long_taus, SCAN.te, SCAN.r2t))
    asym = np.asarray(physics.tissue_signal_asymptotic(jnp.float32(dw), jnp.float32(dbv),
                                                       long_taus, SCAN.te, SCAN.r2t))
    np.testing.assert_allclose(full, asym, rtol=0.02)


def test_blood_vs_oracle():
    for oef, _ in PARAM_GRID:
        ours = np.asarray(
            physics.blood_signal(jnp.float32(oef), SCAN.hct,
                                 jnp.asarray(SCAN.taus()), SCAN)
        )
        ref = oracle_blood(oef, SCAN)
        np.testing.assert_allclose(ours, ref, atol=2e-6, rtol=2e-5)


def test_ase_signal_vs_oracle_all_variants():
    oefs = np.array([p[0] for p in PARAM_GRID], np.float32)
    dbvs = np.array([p[1] for p in PARAM_GRID], np.float32)
    for full_model in (True, False):
        for include_blood in (True, False):
            ours = np.asarray(
                physics.ase_signal(oefs, dbvs, SCAN,
                                   full_model=full_model,
                                   include_blood=include_blood)
            )
            ref = np.stack([
                oracle_ase(o, d, SCAN, full_model, include_blood)
                for o, d in PARAM_GRID
            ])
            np.testing.assert_allclose(ours, ref, atol=3e-6, rtol=3e-5)


def test_ase_signal_batch_shapes():
    # arbitrary leading shape -> (..., n_taus) (signals.py:62-77,136-138)
    oef = jnp.full((2, 3, 4), 0.4)
    dbv = jnp.full((2, 3, 4), 0.05)
    out = physics.ase_signal(oef, dbv, SCAN)
    assert out.shape == (2, 3, 4, 11)


def test_gradients_finite_and_descending():
    # gradient flows through the full model (reference dead gradient-check
    # block, signals.py:307-314, made into a real test)
    def loss(p):
        sig = physics.ase_signal(p[0], p[1], SCAN)
        return jnp.sum(sig)

    g = jax.grad(loss)(jnp.asarray([0.4, 0.12], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    # increasing OEF increases dephasing -> decreases total signal
    assert float(g[0]) < 0.0


def test_full_model_gradient_matches_numerical_diff():
    """AD (via the custom J1 JVP in bessel.py) against central finite
    differences of the fp64 true-integral oracle."""
    taus = jnp.asarray(SCAN.taus())
    dw0 = float(physics.delta_omega(jnp.float32(0.4), SCAN.hct, SCAN))
    dbv = 0.05

    def f(dw):
        return physics.tissue_signal_full(dw, jnp.float32(dbv), taus,
                                          SCAN.te, SCAN.r2t)

    auto = np.asarray(jax.jacfwd(f)(jnp.float32(dw0)))

    # numerical derivative of the true signal wrt dw (in oef units:
    # dw = k*oef, so d/d dw = (1/k) d/d oef)
    k = (4.0 / 3.0) * math.pi * SCAN.gamma * SCAN.b0 * SCAN.dchi * SCAN.hct
    eps = 1e-3  # in oef units
    oef0 = dw0 / k
    hi = oracle_tissue_full(oef0 + eps, dbv, SCAN)
    lo = oracle_tissue_full(oef0 - eps, dbv, SCAN)
    numeric = (hi - lo) / (2.0 * eps * k)
    np.testing.assert_allclose(auto, numeric, rtol=2e-3, atol=1e-6)


def test_misalignment_augmentation():
    key = jax.random.PRNGKey(0)
    n, n_taus = 512, 11
    oef = jnp.full((n,), 0.4)
    dbv = jnp.full((n,), 0.05)
    oef2, dbv2 = physics.misalign_params(key, oef, dbv, n_taus, prob=0.5)
    assert oef2.shape == (n, n_taus)
    # first 5 images never misaligned (index drawn from [4, n_taus-1),
    # mask requires image_idx > index, signals.py:84-88)
    np.testing.assert_allclose(np.asarray(oef2[:, :5]), 0.4, atol=0)
    # some later images perturbed, roughly at the requested rate
    changed = np.any(np.abs(np.asarray(oef2) - 0.4) > 1e-9, axis=1)
    assert 0.3 < changed.mean() < 0.7
    # prob=0 is the identity
    oef3, _ = physics.misalign_params(key, oef, dbv, n_taus, prob=0.0)
    np.testing.assert_allclose(np.asarray(oef3), 0.4, atol=0)


def test_acquisition_noise_statistics():
    key = jax.random.PRNGKey(1)
    n = 4096
    sig = physics.ase_signal(jnp.full((n,), 0.4), jnp.full((n,), 0.05), SCAN)
    noisy = physics.add_acquisition_noise(key, sig, SCAN.taus())
    assert noisy.shape == sig.shape
    resid = np.asarray(noisy - sig)
    # mean SNR = 85 * profile; check empirical noise std within 20%
    prof = physics.norm_snr_profile(SCAN.taus())
    mean_sig = np.asarray(sig).mean(0)
    expect_std = mean_sig / (85.0 * prof)
    ratio = resid.std(0) / expect_std
    assert np.all(ratio > 0.6) and np.all(ratio < 1.6)


def test_per_tau_parameters_supported():
    # after misalignment, oef/dbv are (N, n_taus); signal must still work
    key = jax.random.PRNGKey(2)
    oef, dbv = physics.misalign_params(key, jnp.full((16,), 0.4),
                                       jnp.full((16,), 0.05), 11, prob=1.0)
    out = physics.ase_signal(oef, dbv, SCAN, per_tau_params=True)
    assert out.shape == (16, 11)
    assert np.all(np.isfinite(np.asarray(out)))


def test_per_tau_is_explicit_never_inferred():
    # A per-voxel trailing dim that coincidentally equals n_taus must NOT
    # be treated as per-tau: 11 voxels on the 11-tau protocol give
    # (11, 11) signals, not (11,).
    oef = jnp.full((11,), 0.4)
    dbv = jnp.full((11,), 0.05)
    out = physics.ase_signal(oef, dbv, SCAN)
    assert out.shape == (11, SCAN.n_taus)
    # and a wrong-shaped per-tau input is rejected loudly
    import pytest as _pytest
    with _pytest.raises(ValueError):
        physics.ase_signal(jnp.zeros((4, 7)) + 0.4, jnp.zeros((4, 7)) + 0.05,
                           SCAN, per_tau_params=True)


# ---- Chebyshev surrogate of the SDR integral (quad_rule="cheb") ----------


def test_cheb_rule_selection():
    # every published protocol fits the fitted envelope
    assert physics.select_quad_rule(SCAN) == "cheb"
    scan24 = ScanParams(tau_start=-0.028, tau_step=0.004)
    assert physics.select_quad_rule(scan24) == "cheb"
    # outside the envelope (larger hct -> larger dw) falls back
    assert physics.select_quad_rule(ScanParams(hct=0.6)) == "gj16"
    assert physics.select_quad_rule(SCAN, hct=0.6) == "gj16"
    # explicit overrides are honoured
    assert physics.select_quad_rule(ScanParams(hct=0.6), "cheb") == "cheb"
    assert physics.select_quad_rule(SCAN, "gj16") == "gj16"
    import pytest as _pytest
    with _pytest.raises(ValueError):
        physics.select_quad_rule(SCAN, "simpson")


def test_cheb_tissue_vs_oracle():
    """The surrogate matches the TRUE fp64 integral to fp32 resolution on
    the decayed signal, over the full physical envelope and on both
    published tau protocols."""
    for scan in (SCAN, ScanParams(tau_start=-0.028, tau_step=0.004)):
        taus = jnp.asarray(scan.taus())
        for oef in (0.04, 0.21, 0.4, 0.64, 0.84):
            for dbv in (0.001, 0.05, 0.201):
                dw = physics.delta_omega(jnp.float32(oef), scan.hct, scan)
                got = physics.tissue_signal_full(dw, jnp.float32(dbv), taus,
                                                 scan.te, scan.r2t,
                                                 quad_rule="cheb")
                ref = oracle_tissue_full(oef, dbv, scan)
                np.testing.assert_allclose(np.asarray(got), ref, atol=5e-6,
                                           err_msg=f"oef={oef} dbv={dbv}")


def test_cheb_matches_gj16_values_and_grads():
    rng = np.random.default_rng(3)
    oef = jnp.asarray(rng.uniform(0.04, 0.84, 512).astype(np.float32))
    dbv = jnp.asarray(rng.uniform(0.001, 0.201, 512).astype(np.float32))

    s_c = physics.ase_signal(oef, dbv, SCAN, quad_rule="cheb")
    s_g = physics.ase_signal(oef, dbv, SCAN, quad_rule="gj16")
    np.testing.assert_allclose(np.asarray(s_c), np.asarray(s_g), atol=2e-6)

    def loss(o, d, rule):
        return jnp.sum(jnp.square(
            physics.ase_signal(o, d, SCAN, quad_rule=rule)))

    go_c, gd_c = jax.grad(loss, argnums=(0, 1))(oef, dbv, "cheb")
    go_g, gd_g = jax.grad(loss, argnums=(0, 1))(oef, dbv, "gj16")
    for a, b in ((go_c, go_g), (gd_c, gd_g)):
        scale = np.abs(np.asarray(b)).max()
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   atol=2e-5)


def test_auto_rule_resolution_in_ase_signal():
    oef = jnp.full((64,), 0.4)
    dbv = jnp.full((64,), 0.05)
    # auto == cheb bit-for-bit at the published protocol
    s_auto = physics.ase_signal(oef, dbv, SCAN)
    s_cheb = physics.ase_signal(oef, dbv, SCAN, quad_rule="cheb")
    np.testing.assert_array_equal(np.asarray(s_auto), np.asarray(s_cheb))
    # a traced per-voxel hct array has no static bound: auto -> gj16
    hct = jnp.full((64,), 0.34)
    s_auto_h = physics.ase_signal(oef, dbv, SCAN, hct)
    s_gj_h = physics.ase_signal(oef, dbv, SCAN, hct, quad_rule="gj16")
    np.testing.assert_array_equal(np.asarray(s_auto_h), np.asarray(s_gj_h))
    # a static out-of-envelope hct float also falls back
    s_auto_big = physics.ase_signal(oef, dbv, SCAN, 0.6)
    s_gj_big = physics.ase_signal(oef, dbv, SCAN, 0.6, quad_rule="gj16")
    np.testing.assert_array_equal(np.asarray(s_auto_big),
                                  np.asarray(s_gj_big))


def test_cheb_grad_zero_beyond_envelope():
    """The primal clamps to a constant beyond |c| = cmax, so the custom
    JVP must be exactly zero there (r3 review: the unclamped derivative
    polynomial previously leaked through, growing linearly in c)."""
    g = jax.grad(physics.sdr_integral_cheb)
    assert float(g(jnp.float32(20.0))) == 0.0
    assert float(g(jnp.float32(-40.0))) == 0.0
    # ... and stays the true derivative inside the envelope
    assert float(g(jnp.float32(8.0))) > 0.0


def test_auto_gate_respects_configured_max_oef():
    """select_quad_rule must honour a caller-supplied OEF bound: a
    widened-OEF configuration pushes c_max past the envelope and must
    fall back to Gauss-Jacobi instead of silently clamping."""
    assert physics.select_quad_rule(SCAN, max_oef=0.84) == "cheb"
    assert physics.select_quad_rule(SCAN, max_oef=2.0) == "gj16"
    oef = jnp.full((16,), 0.4)
    dbv = jnp.full((16,), 0.05)
    s_wide = physics.ase_signal(oef, dbv, SCAN, max_oef=2.0)
    s_gj = physics.ase_signal(oef, dbv, SCAN, quad_rule="gj16")
    np.testing.assert_array_equal(np.asarray(s_wide), np.asarray(s_gj))


def test_auto_gate_accepts_numpy_scalar_hct():
    """A concrete numpy-float hct is a static scalar: the envelope gate
    must resolve it (np.float32 is not a python float subclass -- the
    pre-jit wrapper handles it)."""
    oef = jnp.full((16,), 0.4)
    dbv = jnp.full((16,), 0.05)
    s32 = physics.ase_signal(oef, dbv, SCAN, np.float32(SCAN.hct))
    s_cheb = physics.ase_signal(oef, dbv, SCAN, SCAN.hct, quad_rule="cheb")
    np.testing.assert_array_equal(np.asarray(s32), np.asarray(s_cheb))


def test_ase_signal_rejects_unknown_rule():
    """A typo'd rule must raise on the jnp path too, not silently run
    gj16 (the kernel path already raised)."""
    import pytest
    with pytest.raises(ValueError, match="quad_rule"):
        physics.ase_signal(jnp.full((4,), 0.4), jnp.full((4,), 0.05),
                           SCAN, quad_rule="chebyshev")


def test_synth_generation_honours_quad_rule():
    """cfg quad_rule threads through to data generation, so forcing gj16
    reproduces pre-surrogate synthetic numerics (r3 review finding)."""
    import dataclasses

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.synth import create_synthetic_dataset, synth_oef_bound

    synth = dataclasses.replace(OPTIMAL.synth, sample_size=12,
                                misalign_prob=0.0)
    scan = dataclasses.replace(SCAN, simulate_noise=False)
    key = jax.random.PRNGKey(0)
    x_auto, _ = create_synthetic_dataset(key, scan, synth)
    x_cheb, _ = create_synthetic_dataset(key, scan, synth,
                                         quad_rule="cheb")
    x_gj, _ = create_synthetic_dataset(key, scan, synth, quad_rule="gj16")
    # auto == cheb at the published protocol, bit-for-bit
    np.testing.assert_array_equal(np.asarray(x_auto), np.asarray(x_cheb))
    # gj16 is a genuinely different lattice (fp32-visible, tiny)
    assert np.any(np.asarray(x_cheb) != np.asarray(x_gj))
    np.testing.assert_allclose(np.asarray(x_cheb), np.asarray(x_gj),
                               atol=2e-5)
    # the data path's envelope bound folds in the misalignment clip
    assert synth_oef_bound(synth) == synth.oef_end
    synth_mis = dataclasses.replace(synth, misalign_prob=0.5)
    assert synth_oef_bound(synth_mis) >= 0.8


def test_cheb_clamps_beyond_envelope():
    # values beyond the fitted range clamp to the edge and stay finite
    out = physics.sdr_integral_cheb(jnp.asarray([0.0, 17.0, 50.0]))
    edge = physics.sdr_integral_cheb(jnp.asarray(17.0))
    assert np.all(np.isfinite(np.asarray(out)))
    np.testing.assert_allclose(float(out[1]), float(edge))
    np.testing.assert_allclose(float(out[2]), float(edge))
    # even function: I(-c) == I(c)
    np.testing.assert_array_equal(
        np.asarray(physics.sdr_integral_cheb(jnp.asarray([-8.0, 8.0])))[0],
        np.asarray(physics.sdr_integral_cheb(jnp.asarray([-8.0, 8.0])))[1])
