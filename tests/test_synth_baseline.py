"""Tests for the synthetic generator and the WLS classical baseline."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.baseline import fit_wls
from qbold_vi_tpu.config import ScanParams, SynthParams
from qbold_vi_tpu.ops import physics
from qbold_vi_tpu.synth import create_synthetic_dataset, sample_population_params

SCAN = ScanParams(simulate_noise=False)
SCAN_NOISY = ScanParams(simulate_noise=True)
SYNTH = SynthParams(sample_size=16)


class TestSynth:
    def test_shapes_and_ranges(self):
        key = jax.random.PRNGKey(0)
        x, y = create_synthetic_dataset(key, SCAN, SYNTH)
        n = SYNTH.sample_size ** 2
        assert x.shape == (n, SCAN.n_taus)
        assert y.shape == (n, 3)
        # OEF/DBV inside the configured population ranges
        assert float(jnp.min(y[:, 0])) >= SYNTH.oef_start - 1e-6
        assert float(jnp.max(y[:, 0])) <= SYNTH.oef_end + 1e-6
        assert float(jnp.min(y[:, 1])) >= SYNTH.dbv_start - 1e-6
        assert float(jnp.max(y[:, 1])) <= SYNTH.dbv_end + 1e-6

    def test_r2p_label_consistency(self):
        key = jax.random.PRNGKey(1)
        _, y = create_synthetic_dataset(key, SCAN, SYNTH)
        r2p = physics.r2_prime(y[:, 0], y[:, 1], SCAN.hct, SCAN)
        np.testing.assert_allclose(np.asarray(r2p), np.asarray(y[:, 2]),
                                   rtol=1e-5)

    def test_signals_match_forward_model(self):
        """Noise-free x must be exactly the physics forward model of y."""
        key = jax.random.PRNGKey(2)
        x, y = create_synthetic_dataset(key, SCAN, SYNTH)
        sig = physics.ase_signal(y[:, 0], y[:, 1], SCAN)
        np.testing.assert_allclose(np.asarray(x), np.asarray(sig),
                                   rtol=2e-5, atol=2e-6)

    def test_noise_is_snr_scaled(self):
        key = jax.random.PRNGKey(3)
        x_clean, y = create_synthetic_dataset(key, SCAN, SYNTH)
        x_noisy, _ = create_synthetic_dataset(key, SCAN_NOISY, SYNTH)
        resid = np.asarray(x_noisy - x_clean)
        assert np.abs(resid).max() > 0
        # noise std per tau should be roughly mean/SNR with SNR in [50,120]
        rel = resid.std(0) / np.asarray(x_clean).mean(0)
        assert np.all(rel < 1.0 / 20.0)
        assert np.all(rel > 1.0 / 500.0)

    def test_population_mixture(self):
        oefs, dbvs = sample_population_params(
            jax.random.PRNGKey(4), SynthParams(sample_size=2000, uniform_prop=0.5))
        assert oefs.shape == (2000,)
        # with 50% uniform there should be mass near both range ends
        o = np.asarray(oefs)
        assert (o < 0.15).mean() > 0.01
        assert (o > 0.65).mean() > 0.01


class TestWLS:
    def test_matches_sklearn_style_wls_oracle(self, rng):
        """Closed-form moments must equal an explicit weighted lstsq."""
        taus = np.asarray(SCAN.taus())
        sel = taus > 0.016
        n_vox = 7
        sig = np.exp(rng.normal(size=(n_vox, SCAN.n_taus)).astype(np.float32) * 0.05)
        oef, dbv, r2p = fit_wls(jnp.asarray(sig), SCAN)

        ln_s = np.log(sig)
        w = 1.0 / taus[sel]
        X = np.stack([taus[sel], np.ones(sel.sum())], -1)
        for v in range(n_vox):
            # weighted least squares normal equations
            Wm = np.diag(w)
            beta = np.linalg.solve(X.T @ Wm @ X, X.T @ Wm @ ln_s[v, sel])
            slope, intercept = beta
            np.testing.assert_allclose(float(r2p[v, 0]),
                                       np.clip(-slope, 1e-2, 100.0), rtol=2e-4)

    def test_recovers_r2p_on_asymptotic_signals(self):
        """On noiseless long-tau asymptotic-model signals (no blood), the
        log-linear fit must recover R2' accurately (the model IS log-linear
        there: ln S = dbv - r2p*tau - te*r2t)."""
        oef = jnp.asarray([0.3, 0.4, 0.5], jnp.float32)
        dbv = jnp.asarray([0.03, 0.05, 0.08], jnp.float32)
        sig = physics.ase_signal(oef, dbv, SCAN, full_model=False,
                                 include_blood=False)
        # remove the compartment weighting to isolate the pure tissue decay
        dbv_w = 1.0 - dbv[:, None]
        sig = sig / dbv_w
        _, dbv_est, r2p_est = fit_wls(sig, SCAN)
        r2p_true = physics.r2_prime(oef, dbv, SCAN.hct, SCAN)
        np.testing.assert_allclose(np.asarray(r2p_est[:, 0]),
                                   np.asarray(r2p_true), rtol=5e-3)
        np.testing.assert_allclose(np.asarray(dbv_est[:, 0]),
                                   np.asarray(dbv), rtol=5e-2)

    def test_clipping(self):
        sig = jnp.ones((4, SCAN.n_taus))  # flat signal -> degenerate fit
        oef, dbv, r2p = fit_wls(sig, SCAN)
        assert np.all(np.asarray(oef) >= 0.01) and np.all(np.asarray(oef) <= 0.8)
        assert np.all(np.asarray(dbv) >= 0.002) and np.all(np.asarray(dbv) <= 0.25)
        assert np.all(np.asarray(r2p) >= 1e-2) and np.all(np.asarray(r2p) <= 100.0)


class TestHostDataset:
    def test_host_matches_device_distributionally(self):
        """create_synthetic_dataset_host (NumPy randomness + jitted
        physics decode) must match create_synthetic_dataset in
        distribution -- streams differ by design (the RNG-parity stance);
        it exists because XLA-compiling the RNG/shuffle program for a
        fixed host dataset costs ~190 s on tunneled-TPU backends."""
        from qbold_vi_tpu.synth import (create_synthetic_dataset,
                                        create_synthetic_dataset_host)

        scan = ScanParams()
        sp = SynthParams(sample_size=120, uniform_prop=0.2,
                         misalign_prob=0.1)
        xh, yh = create_synthetic_dataset_host(jax.random.PRNGKey(0),
                                               scan, sp)
        xd, yd = create_synthetic_dataset(jax.random.PRNGKey(0), scan, sp)
        xd, yd = np.asarray(xd), np.asarray(yd)
        assert xh.shape == xd.shape and yh.shape == yd.shape
        assert xh.dtype == np.float32 and yh.dtype == np.float32
        # population moments agree within sampling error of a 120-draw
        # population (seeded, deterministic -- no flake)
        for i in range(3):
            assert abs(yh[:, i].mean() - yd[:, i].mean()) < 0.15 * (
                1.0 + abs(yd[:, i].mean()))
        np.testing.assert_allclose(xh.mean(), xd.mean(), rtol=0.05)
        np.testing.assert_allclose(xh.std(), xd.std(), rtol=0.25)
        # y relationship: r2p = dw*hct*oef*dbv exactly
        np.testing.assert_allclose(
            yh[:, 2], scan.dw_coeff * scan.hct * yh[:, 0] * yh[:, 1],
            rtol=1e-5)

    def test_host_noiseless_signals_exact(self):
        """With noise and misalignment off, the host path's signals are
        EXACTLY physics.ase_signal of its own (oef, dbv) draws."""
        from qbold_vi_tpu.ops import physics
        from qbold_vi_tpu.synth import create_synthetic_dataset_host

        scan = ScanParams(simulate_noise=False)
        sp = SynthParams(sample_size=20)
        x, y = create_synthetic_dataset_host(jax.random.PRNGKey(3), scan, sp)
        expect = np.asarray(physics.ase_signal(y[:, 0], y[:, 1], scan))
        np.testing.assert_allclose(x, expect, rtol=1e-6, atol=1e-7)


class TestPopulationCounts:
    def test_mixture_counts_sum_to_sample_size(self):
        """Two independent round() calls summed to n-1 for half-integer
        splits (banker's rounding); n_norm is now the complement, and
        device/host dataset sizes agree for any (n, uniform_prop)."""
        import jax

        from qbold_vi_tpu.config import SynthParams
        from qbold_vi_tpu.synth import sample_population_params

        for n, prop in ((101, 0.5), (40, 0.5), (7, 0.3), (100, 0.665)):
            oefs, dbvs = sample_population_params(
                jax.random.PRNGKey(0),
                SynthParams(sample_size=n, uniform_prop=prop))
            assert oefs.shape == (n,), (n, prop)
            assert dbvs.shape == (n,), (n, prop)
