"""Numeric parity gates against the ACTUAL reference implementation.

BASELINE.md's north-star includes OEF/DBV parity <= 1e-5 vs the reference
on synthetic tau-sweeps. The reference physics layer (signals.py) is pure
TensorFlow and importable here, so the forward model -- the foundation
every loss/posterior quantity is built on -- is gated directly against
the upstream code executed as an oracle (nothing is copied; the reference
tree is imported read-only). The VI layers (model.py, logit_mvn.py) need
tensorflow_probability, which is not installed; those are gated against
scipy oracles in test_dist.py / test_losses.py instead.
"""

import sys

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax.numpy as jnp  # noqa: E402

from qbold_vi_tpu.config import ScanParams  # noqa: E402
from qbold_vi_tpu.ops import physics  # noqa: E402

REFERENCE_DIR = "/root/reference"


@pytest.fixture(scope="module")
def ref_signals():
    sys.path.insert(0, REFERENCE_DIR)
    try:
        import signals as ref
    finally:
        sys.path.remove(REFERENCE_DIR)
    return ref


def _ref_params(scan: ScanParams, simulate_noise=False):
    """configparser-style string params for the reference layer
    (reference: signals.py:16-53 reads everything via float()/bool-ish)."""
    return {
        "tr": str(scan.tr), "ti": str(scan.ti), "te": str(scan.te),
        "tau_start": str(scan.tau_start), "tau_end": str(scan.tau_end),
        "tau_step": str(scan.tau_step), "dchi": str(scan.dchi),
        "gamma": str(scan.gamma), "b0": str(scan.b0), "t1b": str(scan.t1b),
        "r2t": str(scan.r2t), "hct": str(scan.hct),
        "simulate_noise": "True" if simulate_noise else "False",
        "snr": str(int(scan.snr)),  # upstream parses snr with int()
        # read but never used upstream (signals.py:42 is its only mention)
        "tau_weighted": "False",
    }


def _param_grid():
    oef, dbv = np.meshgrid(np.linspace(0.05, 0.8, 12),
                           np.linspace(0.002, 0.2, 12), indexing="ij")
    return (oef.reshape(-1).astype(np.float32),
            dbv.reshape(-1).astype(np.float32))


SCAN = ScanParams(simulate_noise=False)
SCAN24 = ScanParams(simulate_noise=False, tau_start=-0.028, tau_step=0.004)


class TestForwardModelParity:
    @pytest.mark.parametrize("scan", [SCAN, SCAN24], ids=["11tau", "24tau"])
    @pytest.mark.parametrize("full_model", [True, False],
                             ids=["full", "asymptotic"])
    @pytest.mark.parametrize("use_blood", [True, False],
                             ids=["blood", "noblood"])
    def test_signal_parity(self, ref_signals, scan, full_model, use_blood):
        oef, dbv = _param_grid()
        layer = ref_signals.SignalGenerationLayer(
            _ref_params(scan), full_model, use_blood)
        ref = layer(tf.stack([oef, dbv], -1)).numpy()
        # Full model: parity is gated in reference_fp32_compat mode, which
        # reproduces the reference's fp32 truncation of 1-J0 near u->0
        # (see physics.tissue_signal_full docstring). The DEFAULT mode is
        # deliberately more accurate -- proven against a float64 oracle in
        # test_full_model_closer_to_fp64_oracle.
        ours = np.asarray(physics.ase_signal(
            jnp.asarray(oef), jnp.asarray(dbv), scan,
            full_model=full_model, include_blood=use_blood,
            reference_fp32_compat=full_model))
        assert ref.shape == ours.shape
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    def test_full_model_closer_to_fp64_oracle(self, ref_signals):
        """Against the TRUE static-dephasing integral (float64 adaptive
        quadrature + scipy J0), our default fp32 full-model signal must
        be much more accurate than the reference's (129-point Simpson
        lattice with fp32 1-J0 cancellation)."""
        import scipy.integrate as spi
        import scipy.special as sps

        # coarse grid (adaptive quad per voxel per tau is slow)
        oef, dbv = np.meshgrid(np.linspace(0.05, 0.8, 5),
                               np.linspace(0.002, 0.2, 5), indexing="ij")
        oef = oef.reshape(-1).astype(np.float32)
        dbv = dbv.reshape(-1).astype(np.float32)
        scan = SCAN
        taus = scan.taus().astype(np.float64)
        dw = scan.dw_coeff * scan.hct * oef.astype(np.float64)
        integral = np.empty((len(oef), len(taus)))
        for i, dwi in enumerate(dw):
            for j, tau in enumerate(taus):
                c = 1.5 * tau * dwi
                integral[i, j] = spi.quad(
                    lambda u: (2.0 + u) * np.sqrt(1.0 - u)
                    * (1.0 - sps.j0(c * u)) / (3.0 * u * u),
                    0.0, 1.0, limit=200)[0]
        oracle = (np.exp(-dbv.astype(np.float64)[:, None] * integral)
                  * np.exp(-scan.te * scan.r2t))

        layer = ref_signals.SignalGenerationLayer(_ref_params(scan), True, False)
        ref = layer(tf.stack([oef, dbv], -1)).numpy().astype(np.float64)
        ref /= (1.0 - dbv.astype(np.float64))[:, None]   # undo weighting
        ours = np.asarray(physics.tissue_signal_full(
            jnp.asarray(dw, jnp.float32), jnp.asarray(dbv),
            jnp.asarray(scan.taus()), scan.te, scan.r2t)).astype(np.float64)

        err_ours = np.abs(ours - oracle).max()
        err_ref = np.abs(ref - oracle).max()
        assert err_ours < err_ref / 10.0, (err_ours, err_ref)
        assert err_ours < 5e-6

    def test_dw_and_r2p_parity(self, ref_signals):
        oef, dbv = _param_grid()
        layer = ref_signals.SignalGenerationLayer(
            _ref_params(SCAN), True, True)
        ref_dw = layer.calculate_dw(oef, SCAN.hct).numpy() \
            if hasattr(layer.calculate_dw(oef, SCAN.hct), "numpy") \
            else np.asarray(layer.calculate_dw(oef, SCAN.hct))
        ours_dw = np.asarray(physics.delta_omega(jnp.asarray(oef),
                                                 SCAN.hct, SCAN))
        np.testing.assert_allclose(ours_dw, ref_dw, rtol=1e-6)

        ref_r2p = np.asarray(layer.calculate_r2p(oef, dbv, SCAN.hct))
        ours_r2p = np.asarray(physics.r2_prime(jnp.asarray(oef),
                                               jnp.asarray(dbv),
                                               SCAN.hct, SCAN))
        np.testing.assert_allclose(ours_r2p, ref_r2p, rtol=1e-6)

    def test_tau_grid_parity(self, ref_signals):
        layer = ref_signals.SignalGenerationLayer(_ref_params(SCAN), True, True)
        np.testing.assert_allclose(np.asarray(layer._taus), SCAN.taus(),
                                   atol=1e-7)

    def test_wls_recovers_on_reference_signals(self, ref_signals):
        """Cross-check: our jitted WLS fit applied to signals generated by
        the REFERENCE layer recovers R2' (long-tau regime), tying the
        classical baseline to the upstream physics."""
        from qbold_vi_tpu.baseline import fit_wls

        oef = np.asarray([0.35, 0.5], np.float32)
        dbv = np.asarray([0.05, 0.08], np.float32)
        layer = ref_signals.SignalGenerationLayer(
            _ref_params(SCAN24), False, False)
        sig = layer(tf.stack([oef, dbv], -1)).numpy()
        sig = sig / (1.0 - dbv[:, None])  # undo compartment weighting
        _, _, r2p_est = fit_wls(jnp.asarray(sig), SCAN24)
        r2p_true = np.asarray(physics.r2_prime(
            jnp.asarray(oef), jnp.asarray(dbv), SCAN24.hct, SCAN24))
        np.testing.assert_allclose(np.asarray(r2p_est[:, 0]), r2p_true,
                                   rtol=5e-3)
