"""Serving example: train, export a StableHLO artifact, serve volumes.

Demonstrates the deployment story (io/export_model.py): the inference
program -- in-model normalisation, encoder, deterministic quadrature
posterior summaries -- is serialized once with the trained weights
baked in, then driven from a "serving host" that needs only jax and the
blob (no qbold_vi_tpu, flax, or checkpoint machinery on that side; here
the same process plays both roles). The artifact is shape-polymorphic:
one export serves any volume geometry.

    python examples/serving.py

Runs on CPU by default so it works anywhere; pass --platforms tpu,cpu
to produce a multi-platform artifact.
"""

import argparse
import sys
import tempfile

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,  # noqa: E402
                                 SynthParams, TrainConfig)
from qbold_vi_tpu.io.export_model import (export_inference,  # noqa: E402
                                          load_exported, save_exported)
from qbold_vi_tpu.train.trainer import Trainer  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platforms", default="cpu")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as tmp:
        # --- training side: a tiny pretrain, then export ----------------
        cfg = QBoldConfig(
            scan=ScanParams(simulate_noise=False),
            synth=SynthParams(sample_size=60),
            model=ModelConfig(no_units=8, no_intermediate_layers=1,
                              use_mvg=True, student_t_df=200.0,
                              predict_log_data=False),
            train=TrainConfig(no_pt_epochs=2, pt_batch_size=64,
                              save_directory=tmp),
        )
        trainer = Trainer(cfg)
        trainer.pretrain()
        exp = export_inference(
            trainer.tuner, trainer.state.params,
            platforms=[p.strip() for p in args.platforms.split(",")])
        path = f"{tmp}/model.stablehlo"
        n = save_exported(exp, path)
        print(f"exported {n} bytes for platforms {exp.platforms}, "
              f"input shape {exp.in_avals[0].shape}")

        # --- serving side: jax + the blob, nothing else ------------------
        served = load_exported(path)
        rng = np.random.default_rng(0)
        for shape in [(1, 16, 16, 4), (2, 12, 10, 8)]:  # one artifact,
            vol = np.abs(rng.normal(size=shape + (cfg.scan.n_taus + 1,))
                         ).astype(np.float32) * 50 + 100  # any geometry
            vol[..., -1] = 1.0
            maps = served.call(vol)
            print(f"served {shape}: OEF mean "
                  f"{float(np.mean(np.asarray(maps['oef']))):.3f}, "
                  f"DBV mean "
                  f"{float(np.mean(np.asarray(maps['dbv']))):.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
