"""qbold_vi_tpu: TPU-native amortized variational inference for qBOLD MRI.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference wearepal/qBOLD-VI codebase (TF2+TFP): biophysical ASE forward
model, synthetic pretraining, MC-ELBO fine-tuning on real volumes,
classical WLS baseline, NIfTI IO, and first-class data parallelism over
TPU meshes.
"""

__version__ = "0.1.0"

from .config import (OPTIMAL, ModelConfig, QBoldConfig, ScanParams,
                     SynthParams, TrainConfig, load_ini_scan_params,
                     load_yaml_config)
from .dist.logit_mvn import LogitMVN

__all__ = [
    "OPTIMAL",
    "ModelConfig",
    "QBoldConfig",
    "ScanParams",
    "SynthParams",
    "TrainConfig",
    "LogitMVN",
    "load_ini_scan_params",
    "load_yaml_config",
    "__version__",
]
