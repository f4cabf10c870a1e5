"""Optional FSL shell-out adapter (MNI-space export).

The reference calls FSL binaries directly with ``os.system`` strings
scattered through the model code (reference: model.py:849-879,
loglinear.py:34-52, data_preprocessing.py:97-204). Here the shell-outs
are isolated behind one small adapter: everything degrades gracefully
when FSL is absent (``have_fsl()``), and the training/inference path
never depends on it.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
from typing import Sequence

import numpy as np

__all__ = ["have_fsl", "applywarp", "fslmerge", "warp_maps_to_mni"]


def have_fsl() -> bool:
    return shutil.which("applywarp") is not None


def _run(cmd: Sequence[str]) -> None:
    # Redirect the tools' output to OUR stderr LIVE (no buffering):
    # `serve` speaks a JSON-lines ack protocol on stdout, so FSL chatter
    # must never interleave with it -- but long-running tools (fsl_anat
    # runs minutes) should still show progress as it happens, with
    # stdout/stderr interleaving preserved by sharing one stream.
    try:
        sys.stderr.flush()
        stderr_fd = sys.stderr.fileno()
    except (OSError, ValueError, AttributeError):
        # sys.stderr replaced by a fd-less object (capture wrappers):
        # fall back to buffered capture + replay
        res = subprocess.run(list(cmd), capture_output=True, text=True)
        if res.stdout:
            print(res.stdout, end="", file=sys.stderr)
        if res.stderr:
            print(res.stderr, end="", file=sys.stderr)
        if res.returncode:
            raise subprocess.CalledProcessError(
                res.returncode, list(cmd), res.stdout, res.stderr)
        return
    res = subprocess.run(list(cmd), stdout=stderr_fd,
                         stderr=subprocess.STDOUT)
    if res.returncode:
        raise subprocess.CalledProcessError(res.returncode, list(cmd))


def applywarp(in_path: str, out_path: str, warp: str, ref: str) -> None:
    _run(["applywarp", f"--in={in_path}", f"--out={out_path}",
          f"--warp={warp}", f"--ref={ref}"])


def fslmerge(out_path: str, in_paths: Sequence[str]) -> None:
    _run(["fslmerge", "-t", out_path, *in_paths])


def warp_maps_to_mni(oef: np.ndarray, dbv: np.ndarray, r2p: np.ndarray,
                     filename: str, transform_directory: str) -> None:
    """Per-subject nonlinear warp of (OEF, DBV, R2') maps to MNI space,
    merged and re-split per map type (reference: model.py:849-879).

    Expects ``nonlin<i>.nii.gz`` warps and ``MNI152_T1_2mm.nii.gz`` in
    ``transform_directory``, like the reference.
    """
    from . import nifti

    if not nifti.have_nibabel():
        # The built-in NIfTI writer carries identity affines; applywarp
        # would run on them and produce silently mis-oriented MNI maps,
        # and the merged read-back needs real headers. Refuse up front
        # (before any FSL command runs) rather than fail mid-export.
        raise RuntimeError(
            "MNI-space export requires nibabel (the built-in NIfTI "
            "fallback cannot carry the affine/orientation metadata "
            "applywarp needs)")

    ref_image = os.path.join(transform_directory, "MNI152_T1_2mm.nii.gz")
    merged = filename + "_merged.nii.gz"
    mni_parts = []
    for i in range(oef.shape[0]):
        warp = os.path.join(transform_directory, f"nonlin{i}.nii.gz")
        subj_ims = np.stack([oef[i], dbv[i], r2p[i]], 0)
        subj_im = f"{filename}_subj{i}"
        nifti.save_im_data(subj_ims, subj_im,
                           transform_directory=transform_directory)
        applywarp(subj_im, subj_im + "mni", warp, ref_image)
        mni_parts.append(subj_im + "mni")
    fslmerge(merged, mni_parts)

    import nibabel as nib
    merged_nib = nib.load(merged)
    merged_data = merged_nib.get_fdata()
    for t_idx, t in enumerate(["_oef_mni", "_dbv_mni", "_r2p_mni"]):
        t_data = merged_data[:, :, :, t_idx::3]
        nifti.save_nifti(t_data, filename + t + ".nii.gz",
                         header=merged_nib.header.copy())
