"""NIfTI import/export utilities.

Mirrors the reference's artifact layout (reference: model.py:792-802,
loglinear.py:53-65): per-map ``<name>_oef/_dbv/_r2p/_logstds/...`` NIfTI
files where the subject axis is folded into the last (volume) dimension.
nibabel is imported lazily so the compute path has no hard dependency.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

__all__ = ["save_im_data", "load_nifti", "save_nifti"]


def _nib():
    import nibabel as nib
    return nib


def load_nifti(path: str) -> np.ndarray:
    return np.asarray(_nib().load(path).get_fdata())


def save_nifti(data: np.ndarray, path: str, header=None) -> None:
    nib = _nib()
    img = nib.Nifti1Image(data, affine=None, header=header)
    nib.save(img, path)


def save_im_data(im_data: np.ndarray, filename: str,
                 transform_directory: Optional[str] = None) -> None:
    """Save a (S, X, Y, Z, C) map as ``<filename>.nii.gz`` with subjects
    folded into the last axis (reference: model.py:792-802). When a
    transform directory is given, the header is copied from its
    ``example.nii.gz``."""
    nib = _nib()
    images = np.split(np.asarray(im_data), im_data.shape[0], axis=0)
    images = np.squeeze(np.concatenate(images, axis=-1), 0)
    header = None
    if transform_directory is not None:
        example = os.path.join(transform_directory, "example.nii.gz")
        header = nib.load(example).header.copy()
    save_nifti(images, filename + ".nii.gz", header=header)
