"""Tests for the typed config system and its reference-compat loaders."""

import dataclasses
import math

import numpy as np
import pytest

from qbold_vi_tpu.config import (OPTIMAL, QBoldConfig, ScanParams,
                                 apply_flat_overrides, load_ini_scan_params,
                                 load_yaml_config)


class TestScanParams:
    def test_default_tau_grid_matches_reference(self):
        """11-tau clinical protocol (reference: config:12-14)."""
        s = ScanParams()
        taus = s.taus()
        assert s.n_taus == 11
        np.testing.assert_allclose(taus[0], -0.016, atol=1e-7)
        np.testing.assert_allclose(taus[-1], 0.064, atol=1e-7)
        np.testing.assert_allclose(np.diff(taus), 0.008, atol=1e-6)
        assert s.se_idx == 2
        assert abs(taus[s.se_idx]) < 1e-7

    def test_streamlined_24_tau_protocol(self):
        """24-tau streamlined protocol (reference: loglinear.py:149-152)."""
        s = ScanParams(tau_start=-0.028, tau_step=0.004)
        assert s.n_taus == 24
        assert s.se_idx == 7

    def test_se_idx_rounds_fp_ratio(self):
        """Text-parsed grids carry fp error: 0.009/0.003 = 2.9999...;
        truncation gave se_idx=2 (a nonzero-tau image) and silently
        mis-normalised every consumer. se_idx must index tau==0."""
        for start, step in ((-0.009, 0.003), (-0.018, 0.006),
                            (-0.075, 0.025), (-0.016, 0.008)):
            s = ScanParams(tau_start=start, tau_step=step)
            assert abs(s.taus()[s.se_idx]) < 1e-7, (start, step, s.se_idx)

    def test_dw_coeff(self):
        s = ScanParams()
        expect = (4.0 / 3.0) * math.pi * s.gamma * s.b0 * s.dchi
        np.testing.assert_allclose(s.dw_coeff, expect)

    def test_hashable_for_jit_static(self):
        assert hash(ScanParams()) == hash(ScanParams())
        assert ScanParams() != ScanParams(b0=7.0)


class TestOverrides:
    def test_flat_key_routing(self):
        cfg = apply_flat_overrides(QBoldConfig(), {
            "no_units": 42, "pt_lr": 1e-4, "use_mvg": True,
            "uniform_prop": 0.3, "tau_step": 0.004,
        })
        assert cfg.model.no_units == 42
        assert cfg.train.pt_lr == pytest.approx(1e-4)
        assert cfg.model.use_mvg is True
        assert cfg.synth.uniform_prop == pytest.approx(0.3)
        assert cfg.scan.tau_step == pytest.approx(0.004)

    def test_string_coercion(self):
        """YAML/CLI strings coerce to the default's type; string booleans
        parse correctly (documented deviation from the reference's
        bool('False') is True quirk, utils.py:112-116)."""
        cfg = apply_flat_overrides(QBoldConfig(), {
            "no_units": "17", "pt_lr": "0.01", "use_mvg": "False",
            "channelwise_gating": "true",
        })
        assert cfg.model.no_units == 17
        assert cfg.train.pt_lr == pytest.approx(0.01)
        assert cfg.model.use_mvg is False
        assert cfg.model.channelwise_gating is True

    def test_floors_enforced(self):
        """no_units/no_intermediate_layers >= 1 (reference: train.py:431-432)."""
        cfg = apply_flat_overrides(QBoldConfig(), {
            "no_units": 0, "no_intermediate_layers": -3})
        assert cfg.model.no_units == 1
        assert cfg.model.no_intermediate_layers == 1

    def test_unknown_key_raises_with_did_you_mean(self):
        """A typo'd override must fail loudly (the reference silently
        stores unknowns, utils.py:109-116 -- a deviation that loses
        safety: a typo'd --set or sweep dimension would no-op while the
        run 'tunes' noise)."""
        from qbold_vi_tpu.config import UnknownConfigKeyError

        with pytest.raises(UnknownConfigKeyError, match="bogus_key"):
            apply_flat_overrides(QBoldConfig(), {"bogus_key": 7})
        # did-you-mean hint for a near-miss
        with pytest.raises(UnknownConfigKeyError, match="pt_lr"):
            apply_flat_overrides(QBoldConfig(), {"pt_lrr": 1e-3})

    def test_unknown_keys_ignored_when_not_strict(self):
        """strict=False keeps the permissive behaviour (forward-compat
        YAML escape), with a warning."""
        with pytest.warns(UserWarning, match="bogus_key"):
            cfg = apply_flat_overrides(QBoldConfig(), {"bogus_key": 7},
                                       strict=False)
        assert cfg == QBoldConfig()

    def test_known_flat_keys_cover_reference_and_fields(self):
        from qbold_vi_tpu.config import known_flat_keys

        keys = known_flat_keys()
        for k in ("no_units", "pt_lr", "tau_start", "sample_size",
                  "fused_elbo", "d", "name"):
            assert k in keys


class TestReferenceDefaultsParity:
    def test_defaults_match_reference_get_defaults(self):
        """Our dataclass defaults must match the reference's own
        utils.get_defaults(), executed as an oracle -- except the
        documented divergence: the reference itself disagrees with
        itself on use_population_prior (utils.py:68 says True,
        train.py:171 says False; we follow train.py, the published-run
        path), and the 'd'/'f' path args are environment-specific."""
        import sys
        sys.path.insert(0, "/root/reference")
        try:
            from utils import get_defaults
        finally:
            sys.path.remove("/root/reference")

        ref = get_defaults()
        cfg = QBoldConfig()
        ours = {
            **{k: getattr(cfg.model, k) for k in (
                "no_units", "no_intermediate_layers", "student_t_df",
                "dropout_rate", "im_loss_sigma", "use_layer_norm",
                "activation", "multi_image_normalisation",
                "channelwise_gating", "infer_inv_gamma", "use_mvg",
                "gate_offset", "resid_init_std", "predict_log_data")},
            **{k: getattr(cfg.train, k) for k in (
                "pt_lr", "ft_lr", "kl_weight", "smoothness_weight",
                "no_pt_epochs", "no_ft_epochs", "crop_size", "use_r2p_loss",
                "full_model", "use_blood", "inv_gamma_alpha",
                "inv_gamma_beta", "use_swa", "adamw_decay",
                "pt_adamw_decay", "wandb_project")},
            "misalign_prob": cfg.synth.misalign_prob,
            "uniform_prop": cfg.synth.uniform_prop,
        }
        skip = {"use_population_prior"}
        for key, ref_val in ref.items():
            if key in skip:
                continue
            assert key in ours, f"reference default {key} unmapped"
            assert ours[key] == pytest.approx(ref_val), (
                f"{key}: ours={ours[key]} reference={ref_val}")


class TestLoaders:
    def test_yaml_matches_builtin_optimal(self):
        cfg = load_yaml_config("configurations/optimal.yaml")
        assert cfg.model.no_units == OPTIMAL.model.no_units
        assert cfg.model.gate_offset == OPTIMAL.model.gate_offset
        assert cfg.train.smoothness_weight == OPTIMAL.train.smoothness_weight
        assert cfg.model.use_mvg == OPTIMAL.model.use_mvg
        assert cfg.train.no_pt_epochs == OPTIMAL.train.no_pt_epochs

    def test_ini_loader(self, tmp_path):
        p = tmp_path / "config"
        p.write_text(
            "[DEFAULT]\ntr = 3.0\nti = 1.21\nte = 0.074\n"
            "tau_start = -0.016\ntau_end = 0.065\ntau_step = 0.008\n"
            "dchi = 2.64e-7\ngamma = 2.67513e8\nb0 = 3.0\nt1b = 1.58\n"
            "r2t = 11.5\nhct = 0.34\nsimulate_noise = False\nsnr = 100\n")
        s = load_ini_scan_params(str(p))
        assert s.n_taus == 11
        assert s.simulate_noise is False
        assert s.snr == pytest.approx(100.0)

    def test_ini_synth_section_roundtrip_reference_config(self):
        """Lossless INI migration: the reference's OWN `config` file's
        synthetic-population section (reference config:48-61, consumed
        by signals.py:255-268) must survive the load -- round 3's
        scan-only loader silently reverted it to defaults."""
        from qbold_vi_tpu.config import load_ini_config, load_ini_synth_params

        sp = load_ini_synth_params("/root/reference/config")
        assert sp.oef_start == pytest.approx(0.05)
        assert sp.oef_end == pytest.approx(0.8)
        assert sp.oef_mean == pytest.approx(0.4)
        assert sp.oef_std == pytest.approx(0.2)
        assert sp.dbv_start == pytest.approx(0.003)
        assert sp.dbv_end == pytest.approx(0.195)
        assert sp.dbv_mean == pytest.approx(0.025)
        assert sp.dbv_std == pytest.approx(0.02)
        assert sp.sample_size == 2500
        # function-argument keys the INI does not carry keep base values
        assert sp.uniform_prop == pytest.approx(0.1)

        cfg = load_ini_config("/root/reference/config")
        assert cfg.scan.n_taus == 11
        assert cfg.synth.sample_size == 2500

    def test_ini_synth_missing_keys_keep_base(self, tmp_path):
        import dataclasses

        from qbold_vi_tpu.config import SynthParams, load_ini_synth_params

        p = tmp_path / "config"
        p.write_text("[DEFAULT]\noef_mean = 0.5\n")
        base = dataclasses.replace(SynthParams(), sample_size=99)
        sp = load_ini_synth_params(str(p), base)
        assert sp.oef_mean == pytest.approx(0.5)
        assert sp.sample_size == 99
        assert sp.dbv_mean == pytest.approx(base.dbv_mean)

    def test_optimal_preset_values(self):
        """Spot-check the published optimal hyperparameters
        (reference: configurations/optimal.yaml:1-32)."""
        m, t = OPTIMAL.model, OPTIMAL.train
        assert (m.no_units, m.no_intermediate_layers) == (60, 2)
        assert m.student_t_df == 200
        assert m.gate_offset == pytest.approx(-3.0)
        assert m.use_mvg and m.channelwise_gating
        assert not m.use_population_prior
        assert t.pt_lr == pytest.approx(2e-3)
        assert t.smoothness_weight == pytest.approx(5.0)
        assert t.crop_size == 25
