"""Offline data preprocessing: raw ASE NIfTI -> the framework's 5-D
``[subject, X, Y, Z, taus + gm_mask + brain_mask]`` ``.npy`` contract.

Re-design of the reference ``data_preprocessing.py`` (reference:
data_preprocessing.py:10-367), which shells out to FSL with ad-hoc
``os.system`` strings and *executes its pipeline at import time*
(:350-367). Here:

* all FSL invocations (mcflirt / fslmaths / bet / flirt / fsl_anat /
  convert_xfm / convertwarp / fslmerge) go through explicit
  ``subprocess.run`` argument lists, are cached on output existence just
  like the reference, and are gated on ``io.fsl.have_fsl()``;
* the numeric steps (SNR-profile estimation, slice averaging, stacking)
  are pure numpy functions, unit-testable without FSL;
* nothing runs on import.
"""

from __future__ import annotations

import os
import subprocess
import tarfile
from glob import glob
from os import path
from typing import Optional, Sequence

import numpy as np

__all__ = [
    "estimate_norm_snr",
    "average_slices",
    "prepare_image",
    "prepare_data",
    "reslice_images",
]


# ---- pure-numpy numeric steps ----------------------------------------------------


def estimate_norm_snr(data: np.ndarray, mask: np.ndarray,
                      se_idx: int = 3, corner: int = 12) -> np.ndarray:
    """Per-tau normalised SNR profile from image-corner noise
    (reference: data_preprocessing.py:10-63 -- the source of the
    hard-coded profile at signals.py:119).

    data: (X, Y, Z, n_taus) magnitudes; mask: (X, Y, Z) brain mask.
    SNR(tau) = mean within-mask signal / corner-noise std, normalised by
    the value at ``se_idx``.
    """
    n_taus = data.shape[-1]
    within = data.reshape(-1, n_taus)[mask.reshape(-1) > 0]
    corners = np.concatenate([
        data[1:corner, 1:corner],
        data[-corner:-1, -corner:-1],
        data[-corner:-1, 1:corner],
        data[1:corner, -corner:-1],
    ], 0).reshape(-1, n_taus)
    snr = within.mean(0) / corners.std(0)
    return snr / snr[se_idx]


def average_slices(image_data: np.ndarray, n: int,
                   mask_channels: int = 2) -> np.ndarray:
    """Average groups of ``n`` z-slices; masks re-binarised at 0.5
    (reference: data_preprocessing.py:310-313)."""
    if n <= 1:
        return image_data
    x, y = image_data.shape[0], image_data.shape[1]
    c = image_data.shape[-1]
    out = image_data.reshape((x, y, -1, n, c)).mean(3)
    masks = (out[..., -mask_channels:] >= 0.5).astype(out.dtype)
    return np.concatenate([out[..., :-mask_channels], masks], -1)


# ---- FSL-backed per-subject steps ------------------------------------------------


def _run(cmd: Sequence[str]) -> None:
    subprocess.run(list(cmd), check=True)


def prepare_image(image_filename: str) -> np.ndarray:
    """Motion-correct, mean, brain-extract one ASE series and return it
    with [gm_mask, brain_mask] channels appended
    (reference: data_preprocessing.py:180-267). Steps are cached on
    output-file existence exactly like the reference."""
    import nibabel as nib

    dir_name = path.dirname(image_filename)
    basename = path.basename(image_filename).split(".")[0]
    mean_image = f"{dir_name}/tmean_{basename}.nii.gz"
    brain_mask = f"{dir_name}/mask_{basename}_mask.nii.gz"
    mc_images = f"{dir_name}/mc_{basename}.nii.gz"
    ase_gm = f"{dir_name}/{basename}_gm.nii.gz"

    if not path.exists(mc_images):
        _run(["mcflirt", "-in", image_filename, "-out", mc_images,
              "-refvol", "2", "-stages", "4", "-sinc_final"])
    if not path.exists(mean_image):
        _run(["fslmaths", mc_images, "-Tmean", mean_image])
    if not path.exists(brain_mask):
        _run(["bet", mean_image, f"{dir_name}/mask_{basename}.nii.gz",
              "-R", "-Z", "-m", "-n"])

    img_data = nib.load(mc_images).get_fdata()
    mask_img = nib.load(brain_mask)
    gm_img = nib.load(ase_gm) if path.isfile(ase_gm) else mask_img
    return np.concatenate([
        img_data,
        np.expand_dims(gm_img.get_fdata(), -1),
        np.expand_dims(mask_img.get_fdata(), -1),
    ], -1)


def register_to_t1(image_filename: str) -> tuple:
    """T1/MNI registration chain producing the per-subject nonlinear warp
    and GM mask (reference: data_preprocessing.py:66-177). Requires T1.nii
    next to the ASE series and a full FSL install; returns
    (warp_path, gm_mask_path)."""
    dir_name = path.dirname(image_filename)
    basename = path.basename(image_filename).split(".")[0]
    mean_image = f"{dir_name}/tmean_{basename}.nii.gz"
    brain_mask = f"{dir_name}/mask_{basename}_mask.nii.gz"
    t1 = f"{dir_name}/T1.nii"
    t1_2mm = f"{dir_name}/T1_2mm.nii.gz"
    t1_2mm_mask = f"{dir_name}/T1_2mm_mask.nii.gz"
    t1_2mm_invmask = f"{dir_name}/T1_2mm_invmask.nii.gz"
    transform_matrix = f"{dir_name}/{basename}toT1.mat"
    transform_matrix_inv = f"{dir_name}/T1to{basename}.mat"
    warp_to_std = f"{dir_name}/{basename}_warp_to_std.nii.gz"
    anat_dir = f"{dir_name}/T1_2mm.anat/"
    warped_mean_image = f"{dir_name}/tmean_warped{basename}.nii.gz"
    t1_to_ase_field = f"{dir_name}/{basename}_from_t1_field.nii.gz"
    ase_gm = f"{dir_name}/{basename}_gm.nii.gz"

    if not path.exists(t1_2mm_mask):
        _run(["fslmaths", t1, "-subsamp2", t1_2mm])
        _run(["fslmaths", t1_2mm, "-bin", "-kernel", "box", "25", "-ero",
              t1_2mm_mask])
        _run(["fslmaths", t1_2mm, "-bin", "-sub", "1", "-mul", "-1",
              t1_2mm_invmask])
    if not path.exists(anat_dir + "T1_to_MNI_nonlin_field.nii.gz"):
        _run(["fsl_anat", "-i", t1_2mm, "-m", t1_2mm_invmask, "--clobber",
              "--nobet"])
    if not path.exists(warped_mean_image):
        _run(["flirt", "-in", mean_image, "-ref", t1_2mm, "-dof", "7",
              "-inweight", brain_mask, "-omat", transform_matrix,
              "-searchrx", "-20", "20", "-searchry", "-20", "20",
              "-searchrz", "-20", "20", "-finesearch", "2",
              "-refweight", t1_2mm_mask])
        _run(["convert_xfm", "-omat", transform_matrix_inv, "-inverse",
              transform_matrix])
    if not path.exists(warp_to_std):
        _run(["convertwarp", f"--ref={anat_dir}/T1_to_MNI_nonlin.nii.gz",
              f"--premat={transform_matrix}",
              f"--warp1={anat_dir}/T1_to_MNI_nonlin_field.nii.gz",
              f"--out={warp_to_std}"])
    if not path.exists(ase_gm):
        _run(["invwarp", "-w", f"{anat_dir}/T1_to_MNI_nonlin_field.nii.gz",
              "-o", t1_to_ase_field, "-r", mean_image])
        _run(["applywarp", f"--in={anat_dir}/T1_fast_pve_1.nii.gz",
              f"--ref={mean_image}", f"--out={ase_gm}",
              f"--warp={t1_to_ase_field}",
              f"--postmat={transform_matrix_inv}"])
        _run(["fslmaths", ase_gm, "-thr", "0.5", "-bin", ase_gm])
    return warp_to_std, ase_gm


def prepare_data(directory: str, orig_filebasename: str, *,
                 include_warp: bool = True, save_name: Optional[str] = None,
                 average_n_slices: int = 1) -> Optional[np.ndarray]:
    """Stack all subjects under ``directory`` into one 5-D ``.npy``
    (reference: data_preprocessing.py:270-345): per subject
    ``prepare_image`` (+ optional warp registration, tarred as
    ``nonlin<i>``), slice averaging, and fslmerge'd tmean/mask summaries.
    Returns the stacked array (also written to ``<save_name>.npy``)."""
    from .io.fsl import fslmerge

    save_name = save_name or orig_filebasename
    results = sorted(glob(f"{directory}*/{orig_filebasename}.nii*"))
    shape = None
    data = []

    tar = None
    gm_paths = []
    if include_warp:
        tar_file = f"{directory}/warp_info{orig_filebasename}.tar.gz"
        if path.exists(tar_file):
            os.remove(tar_file)
        tar = tarfile.open(tar_file, "x:gz")

    for idx, im_filename in enumerate(results):
        image_data = prepare_image(im_filename)
        if include_warp:
            nonlin, gm_im = register_to_t1(im_filename)
            gm_paths.append(gm_im)
            tar.add(nonlin, arcname=f"nonlin{idx}.nii.gz")
        if shape is None:
            shape = image_data.shape
        if shape == image_data.shape:
            data.append(average_slices(image_data, average_n_slices))
    if tar is not None:
        tar.close()
        if gm_paths:
            fslmerge(f"{directory}/{orig_filebasename}_gm", gm_paths)

    stacked = None
    if data:
        stacked = np.stack(data, 0)
        np.save(f"{directory}/{save_name}.npy", stacked)

    for kind, prefix in (("tmean", "tmean_"), ("mask", "mask_")):
        pat = (f"{directory}*/{prefix}{orig_filebasename}_mask.nii*"
               if kind == "mask" else
               f"{directory}*/{prefix}{orig_filebasename}.nii*")
        found = sorted(glob(pat))
        if found:
            fslmerge(f"{directory}/{save_name}_{kind}", found)
    return stacked


def reslice_images(filename: str, binarise: bool = False, n: int = 4) -> None:
    """In-place z-averaging of a merged NIfTI
    (reference: data_preprocessing.py:353-363)."""
    import nibabel as nib

    img = nib.load(filename)
    data = img.get_fdata()
    s = data.shape
    new = data.reshape((s[0], s[1], -1, n, s[-1])).mean(-2)
    if binarise:
        new = (new >= 0.5).astype(data.dtype)
    nib.save(nib.Nifti1Image(new, None, header=img.header.copy()), filename)
