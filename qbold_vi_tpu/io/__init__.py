from . import fsl, nifti
from .nifti import load_nifti, save_im_data, save_nifti

__all__ = ["fsl", "nifti", "load_nifti", "save_im_data", "save_nifti"]
