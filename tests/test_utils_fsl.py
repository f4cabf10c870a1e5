"""Tests for profiling utilities and the FSL/preprocess subprocess
adapters (commands verified by capture, no FSL needed)."""

import os
import sys

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

    def test_run_keeps_stdout_clean(self, capfd):
        """Subprocess chatter must reach stderr, never stdout: `serve`
        speaks a JSON-lines ack protocol on stdout, and FSL tools print
        warnings to their stdout mid-export."""
        import subprocess

        from qbold_vi_tpu.io import fsl

        fsl._run([sys.executable, "-c", "print('tool chatter')"])
        out, err = capfd.readouterr()
        assert out == ""
        assert "tool chatter" in err

        with pytest.raises(subprocess.CalledProcessError):
            fsl._run([sys.executable, "-c",
                      "import sys; print('x'); sys.exit(3)"])
        out, err = capfd.readouterr()
        assert out == "" and "x" in err


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


class TestRegistrationChain:
    """Command-sequence parity of the full T1/MNI registration chain --
    SPM/VDM fieldmap averaging, T1_orig2roi concat, WM+GM segmentation,
    warped-mean QA -- against the reference
    (data_preprocessing.py:66-177), via a mocked subprocess runner."""

    def _subject(self, tmp_path, base="baseline_ase"):
        d = tmp_path / "subj"
        (d / "VDM").mkdir(parents=True)
        # SPM fieldmaps for both acquisitions (reference :129-132)
        for name in ("vdm5_B1.nii", "vdm5_B2.nii",
                     "vdm5_H1.nii", "vdm5_H2.nii"):
            (d / "VDM" / name).touch()
        (d / "T1.nii").touch()
        (d / "c1T1.nii").touch()
        (d / "c2T1.nii").touch()
        return d, str(d / f"{base}.nii.gz")

    def test_full_chain_command_sequence(self, monkeypatch, tmp_path):
        from qbold_vi_tpu import preprocess

        d, src = self._subject(tmp_path)
        calls = []
        monkeypatch.setattr(preprocess, "_run",
                            lambda cmd: calls.append(list(cmd)))
        warp, gm = preprocess.register_to_t1(src)

        dn = str(d)
        anat = f"{dn}/T1_2mm.anat/"
        progs = [c[0] for c in calls]
        assert progs == [
            "fslmaths", "fslmaths", "fslmaths",        # T1_2mm + masks
            "fsl_anat",                                 # MNI nonlin field
            "flirt", "convert_xfm",                     # ASE->T1 + roi concat
            "fslmaths",                                 # VDM average
            "convertwarp", "applywarp",                 # warp_to_std + QA
            "convert_xfm", "flirt", "flirt", "fslmaths",  # WM+GM seg
            "convertwarp", "invwarp", "applywarp", "fslmaths",  # ase_gm
        ]
        # T1_orig2roi concat (reference :123-125)
        assert calls[5] == ["convert_xfm", "-omat",
                            f"{dn}/baseline_asetoT1_roi.mat", "-concat",
                            f"{anat}T1_orig2roi.mat",
                            f"{dn}/baseline_asetoT1.mat"]
        # VDM average uses the 'B' (baseline) maps (reference :129-136)
        assert calls[6][0] == "fslmaths" and calls[6][2] == "-add"
        assert "vdm5_B" in calls[6][1] and "vdm5_B" in calls[6][3]
        assert calls[6][4:] == ["-mul", "0.5", f"{dn}/baseline_aseave_shift"]
        # combined warp includes the shift map (reference :138-140)
        assert calls[7] == ["convertwarp", "-r",
                            f"{anat}T1_to_MNI_nonlin.nii.gz",
                            "-o", f"{dn}/baseline_ase_warp_to_std.nii.gz",
                            "-w", f"{anat}T1_to_MNI_nonlin_field.nii.gz",
                            "-m", f"{dn}/baseline_asetoT1_roi.mat",
                            "-s", f"{dn}/baseline_aseave_shift"]
        # warped-mean QA image (reference :142-145)
        assert calls[8] == ["applywarp", "-i",
                            f"{dn}/tmean_baseline_ase.nii.gz",
                            "-w", f"{dn}/baseline_ase_warp_to_std.nii.gz",
                            "-o", f"{dn}/tmean_warpedbaseline_ase.nii.gz",
                            "-r", f"{anat}T1_to_MNI_nonlin.nii.gz"]
        # WM+GM segmentation union (reference :147-162)
        assert calls[10][0:2] == ["flirt", "-in"]
        assert calls[10][2] == f"{dn}/c1T1.nii"
        assert "-applyxfm" in calls[10]
        assert calls[12] == ["fslmaths", f"{dn}/baseline_ase_c1T1", "-add",
                             f"{dn}/baseline_ase_c2T1", "-thr", "0.5",
                             "-bin", f"{dn}/baseline_asewm_gm"]
        # ase_gm through the distortion-corrected inverse warp
        # (reference :164-175), masked by the brain mask
        assert calls[13] == ["convertwarp", "-r", f"{dn}/T1_2mm.nii.gz",
                             "-o", f"{dn}/baseline_ase_to_t1_field.nii.gz",
                             "-s", f"{dn}/baseline_aseave_shift",
                             "-m", f"{dn}/baseline_asetoT1.mat"]
        assert calls[16] == ["fslmaths", f"{dn}/baseline_ase_gm.nii.gz",
                             "-mas", f"{dn}/mask_baseline_ase_mask.nii.gz",
                             "-thr", "0.5", f"{dn}/baseline_ase_gm.nii.gz"]
        assert warp == f"{dn}/baseline_ase_warp_to_std.nii.gz"
        assert gm == f"{dn}/baseline_ase_gm.nii.gz"

    def test_hyperv_uses_h_fieldmaps(self, monkeypatch, tmp_path):
        from qbold_vi_tpu import preprocess

        d, src = self._subject(tmp_path, base="hyperv_ase")
        calls = []
        monkeypatch.setattr(preprocess, "_run",
                            lambda cmd: calls.append(list(cmd)))
        preprocess.register_to_t1(src)
        vdm_call = [c for c in calls if c[0] == "fslmaths" and "-add" in c
                    and "VDM" in c[1]][0]
        assert "vdm5_H" in vdm_call[1] and "vdm5_H" in vdm_call[3]

    def test_caching_skips_completed_blocks(self, monkeypatch, tmp_path):
        """Blocks are cached on output existence exactly like the
        reference (if not path.exists guards)."""
        from qbold_vi_tpu import preprocess

        d, src = self._subject(tmp_path)
        dn = str(d)
        # pre-create every block's sentinel output
        (d / "T1_2mm_mask.nii.gz").touch()
        anat = d / "T1_2mm.anat"
        anat.mkdir()
        (anat / "T1_to_MNI_nonlin_field.nii.gz").touch()
        (d / "tmean_warpedbaseline_ase.nii.gz").touch()
        (d / "baseline_asewm_gm.nii.gz").touch()
        (d / "baseline_ase_gm.nii.gz").touch()
        calls = []
        monkeypatch.setattr(preprocess, "_run",
                            lambda cmd: calls.append(list(cmd)))
        preprocess.register_to_t1(src)
        assert calls == []

    def test_missing_fieldmaps_raise(self, monkeypatch, tmp_path):
        from qbold_vi_tpu import preprocess

        d = tmp_path / "s2"
        (d / "VDM").mkdir(parents=True)
        with pytest.raises(FileNotFoundError):
            preprocess.average_fieldmaps(str(d / "VDM"), "B",
                                         str(d / "shift"))


class TestPrepareDataSubjectSkip:
    def test_shape_mismatch_excluded_from_every_artifact(
            self, monkeypatch, tmp_path):
        """A shape-mismatched subject used to be dropped from the
        stacked .npy but still tarred its warp as nonlin<glob-idx> and
        merged its GM mask -- pairing npy subject i with the WRONG
        nonlin<i>/gm volume downstream. It must now be excluded from
        all three, with warp indices following the stacked order."""
        import tarfile

        from qbold_vi_tpu import preprocess

        base = tmp_path / "study"
        base.mkdir()
        shapes = {"s1": (4, 4, 2, 3), "s2": (6, 6, 2, 3), "s3": (4, 4, 2, 3)}
        for name in shapes:
            d = tmp_path / f"study{name}"
            d.mkdir()
            (d / "ase.nii.gz").write_bytes(b"")

        def fake_prepare_image(path, **kw):
            sub = [k for k in shapes if f"study{k}/" in path][0]
            return np.zeros(shapes[sub], np.float32)

        nonlin = tmp_path / "nonlin_src.nii.gz"
        nonlin.write_bytes(b"warp")
        calls = {"gm": None}

        def fake_register(path, **kw):
            return str(nonlin), path + "_gm"

        def fake_fslmerge(out, paths):
            calls["gm"] = list(paths)

        monkeypatch.setattr(preprocess, "prepare_image", fake_prepare_image)
        monkeypatch.setattr(preprocess, "register_to_t1", fake_register)
        from qbold_vi_tpu.io import fsl as fsl_mod
        monkeypatch.setattr(fsl_mod, "fslmerge", fake_fslmerge)

        with pytest.warns(UserWarning, match="EXCLUDED"):
            stacked = preprocess.prepare_data(
                str(tmp_path / "study"), "ase", include_warp=True)
        # s2 (mismatched) dropped from the stack...
        assert stacked.shape[0] == 2
        # ...and from the warp tar: exactly nonlin0/nonlin1 (stack order)
        with tarfile.open(str(tmp_path / "study" / "warp_infoase.tar.gz")) as t:
            names = sorted(t.getnames())
        assert names == ["nonlin0.nii.gz", "nonlin1.nii.gz"]
        # ...and from the GM merge (2 paths, s1 and s3)
        assert calls["gm"] is not None and len(calls["gm"]) == 2
        assert not any("s2" in p for p in calls["gm"])
