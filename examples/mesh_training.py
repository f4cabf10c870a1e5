"""Multi-chip end-to-end example: train + infer over a device mesh.

Runs the full two-phase pipeline data-parallel over every available
device -- streaming synthetic pretraining (each device generates its own
sub-batch on device), shard_map fine-tune epochs (per-device crop
sampling, exact pad-and-mask global batches, psum-summed grads), and
sharded full-brain posterior export.
Works identically on an 8-virtual-device CPU mesh (set below for
machines without multi-chip hardware) and a real TPU pod slice; on a
pod slice, call parallel.initialize_distributed(...) first.

    python examples/mesh_training.py
"""

import dataclasses
import sys

import jax

# Virtual 8-device CPU mesh for demonstration; delete these two lines on
# real multi-chip hardware. Must run before first backend use.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402

sys.path.insert(0, ".")

from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,  # noqa: E402
                                 SynthParams, TrainConfig)
from qbold_vi_tpu.infer import save_predictions  # noqa: E402
from qbold_vi_tpu.parallel import make_mesh  # noqa: E402
from qbold_vi_tpu.train.trainer import Trainer  # noqa: E402


def main():
    cfg = QBoldConfig(
        scan=ScanParams(simulate_noise=True),
        synth=SynthParams(sample_size=400),
        model=ModelConfig(no_units=16, no_intermediate_layers=1,
                          use_mvg=True, channelwise_gating=True,
                          gate_offset=-3.0, student_t_df=200.0,
                          predict_log_data=False),
        train=TrainConfig(pt_lr=2e-3, ft_lr=1e-3,
                          no_pt_epochs=6, no_ft_epochs=2,
                          ft_steps_per_epoch=10, pt_batch_size=64,
                          ft_batch_size=8, crop_size=12,
                          pt_on_device_synth=True,   # per-device generation
                          checkpoint_every_epochs=1,  # crash recovery
                          save_directory="/tmp/mesh_example"),
    )
    mesh = make_mesh()
    print(f"mesh: {mesh.devices.size} x {jax.devices()[0].platform}")

    trainer = Trainer(cfg, mesh=mesh)
    trainer.pretrain()

    # fake study volumes at the acquisition size the reference's
    # blank-crop margins assume (swap in your preprocessed .npy stack)
    rng = np.random.default_rng(0)
    vols = np.abs(rng.normal(size=(8, 64, 48, 4, cfg.scan.n_taus + 1))
                  ).astype(np.float32) * 50 + 100
    vols[..., -1] = 1.0
    trainer.finetune(vols)

    maps = save_predictions(
        trainer.tuner, cfg, trainer.state.params, vols,
        "/tmp/mesh_example/out", jax.random.PRNGKey(0),
        use_first_op=False, mesh=mesh)
    print("posterior maps:", {k: v.shape for k, v in maps.items()})
    print("done -- maps written under /tmp/mesh_example/")


if __name__ == "__main__":
    main()
