"""Tests for profiling utilities and the FSL/preprocess subprocess
adapters (commands verified by capture, no FSL needed)."""

import os

import numpy as np
import pytest

from qbold_vi_tpu.utils.profiling import StepTimer, check_finite, sync


class TestProfiling:
    def test_step_timer_stats(self):
        t = StepTimer(warmup=1)
        for _ in range(4):
            t.start()
            t.stop()
        s = t.summary()
        assert set(s) >= {"step_time_mean_s", "steps_per_sec"}
        assert s["steps_per_sec"] > 0

    def test_check_finite_raises(self):
        check_finite({"a": 1.0})
        with pytest.raises(FloatingPointError):
            check_finite({"a": float("nan")}, where="test")

    def test_sync_handles_pytrees(self):
        import jax.numpy as jnp
        sync({"x": jnp.ones((3, 2)), "y": None})
        sync(jnp.float32(1.0))


class TestFslAdapter:
    def test_have_fsl_false_here(self):
        from qbold_vi_tpu.io import fsl
        assert fsl.have_fsl() is False

    def test_applywarp_command_construction(self, monkeypatch):
        from qbold_vi_tpu.io import fsl
        captured = []
        monkeypatch.setattr(fsl, "_run", lambda cmd: captured.append(list(cmd)))
        fsl.applywarp("in.nii", "out.nii", "warp.nii", "ref.nii")
        assert captured == [["applywarp", "--in=in.nii", "--out=out.nii",
                             "--warp=warp.nii", "--ref=ref.nii"]]
        fsl.fslmerge("merged", ["a", "b"])
        assert captured[1] == ["fslmerge", "-t", "merged", "a", "b"]


class TestPrepareImage:
    def test_pipeline_commands_and_stacking(self, monkeypatch, tmp_path):
        """prepare_image runs mcflirt/fslmaths/bet (cached on existence)
        and concatenates gm+brain mask channels
        (reference: data_preprocessing.py:180-267)."""
        from qbold_vi_tpu import preprocess
        from qbold_vi_tpu.io import nifti

        d = tmp_path / "subj"
        d.mkdir()
        src = str(d / "ase.nii.gz")
        rng = np.random.default_rng(0)
        vol = np.abs(rng.normal(size=(6, 5, 2, 11))).astype(np.float32)
        nifti._write_nifti1(vol, src)

        calls = []

        def fake_run(cmd):
            calls.append(cmd[0])
            # produce the outputs the pipeline expects
            if cmd[0] == "mcflirt":
                nifti._write_nifti1(vol, str(d / "mc_ase.nii.gz"))
            elif cmd[0] == "fslmaths":
                nifti._write_nifti1(vol.mean(-1), str(d / "tmean_ase.nii.gz"))
            elif cmd[0] == "bet":
                nifti._write_nifti1(np.ones((6, 5, 2), np.float32),
                                    str(d / "mask_ase_mask.nii.gz"))

        monkeypatch.setattr(preprocess, "_run", fake_run)

        # our built-in reader stands in for nibabel here
        import types

        class FakeImg:
            def __init__(self, p):
                self._d = nifti._read_nifti1(p)

            def get_fdata(self):
                return self._d

        fake_nib = types.SimpleNamespace(load=lambda p: FakeImg(p))
        import sys
        monkeypatch.setitem(sys.modules, "nibabel", fake_nib)

        out = preprocess.prepare_image(src)
        assert calls == ["mcflirt", "fslmaths", "bet"]
        assert out.shape == (6, 5, 2, 13)  # 11 taus + gm + brain
        np.testing.assert_array_equal(out[..., -1], 1.0)
        # gm falls back to the brain mask when absent (dp.py:261-264)
        np.testing.assert_array_equal(out[..., -2], out[..., -1])

        # second call: everything cached, no subprocesses
        calls.clear()
        out2 = preprocess.prepare_image(src)
        assert calls == []
        np.testing.assert_array_equal(out, out2)
