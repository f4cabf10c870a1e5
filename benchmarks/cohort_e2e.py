"""The ~1M-voxel cohort protocol: 14 subjects x 96x96x8, end to end.

The recurring RESULTS.md benchmark (rounds 1-3): physically-generated
fake brains at full-brain geometry, streaming pretrain (30 epochs),
the published 40x100 fine-tune, then full-cohort posterior maps twice:

* stream-1 (``use_first_op=True``): ``save_predictions``'s default and
  the reference's PRETRAIN-export semantics (model.py:776 +
  train.py:248-250) -- on TPU this runs the fused inference kernels,
  so this line is the cohort PERF measurement;
* stream-2 (``use_first_op=False``): the reference's FINE-TUNED-export
  semantics (train.py:272-278 passes ``use_first_op=False``) -- the
  maps the fine-tune phase directly optimises, so this line is the
  cohort QUALITY measurement (matches validate_finetune.py's).

Reports wall per stage and masked posterior-mean quality vs the
generating truth for both streams.

    python benchmarks/cohort_e2e.py [--outdir DIR] [--ft-epochs N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

import os

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from validate_finetune import (clean_checkpoints,  # noqa: E402
                               make_subjects)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/qbold_cohort")
    ap.add_argument("--ft-epochs", type=int, default=40)
    ap.add_argument("--subjects", type=int, default=14)
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args()

    if not args.resume:
        clean_checkpoints(args.outdir)

    import dataclasses

    import jax

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.infer import posterior_maps
    from qbold_vi_tpu.train.trainer import Trainer

    cfg = dataclasses.replace(
        OPTIMAL,
        train=dataclasses.replace(
            OPTIMAL.train, pt_on_device_synth=True, no_pt_epochs=30,
            no_ft_epochs=args.ft_epochs, save_directory=args.outdir),
        scan=dataclasses.replace(OPTIMAL.scan, simulate_noise=True),
    )
    data, oef_true, dbv_true, mask = make_subjects(
        cfg.scan, n=args.subjects, x=96, y=96, z=8)
    n_vox = int(np.prod(data.shape[:-1]))
    print(f"cohort: {data.shape[0]} subjects, {n_vox} voxels")

    t0 = time.time()
    tr = Trainer(cfg)
    tr.pretrain()
    print(f"pretrain (30 epochs, streaming): {time.time() - t0:.1f}s")

    t0 = time.time()
    tr.finetune(data, study_data=data[:2])
    print(f"finetune ({args.ft_epochs} x {cfg.train.ft_steps_per_epoch}): "
          f"{time.time() - t0:.1f}s")

    t0 = time.time()
    maps1 = posterior_maps(tr.tuner, tr.state.params, data,
                           jax.random.PRNGKey(9))
    dt = time.time() - t0
    print(f"full-cohort posterior maps (stream-1/fused): {dt:.1f}s "
          f"({n_vox / dt / 1e6:.1f} M voxel/s incl. host transfer)")

    t0 = time.time()
    maps2 = posterior_maps(tr.tuner, tr.state.params, data,
                           jax.random.PRNGKey(9), use_first_op=False)
    print(f"full-cohort posterior maps (stream-2, the reference's "
          f"fine-tuned-export head): {time.time() - t0:.1f}s")

    m = mask > 0
    for label, maps in (("stream-1", maps1), ("stream-2", maps2)):
        for name, got, true in (("OEF", maps["oef"][..., 0], oef_true),
                                ("DBV", maps["dbv"][..., 0], dbv_true)):
            err = np.abs(got - true)[m].mean()
            corr = np.corrcoef(got[m], true[m])[0, 1]
            print(f"{label} {name}: |err|={err:.4f} corr={corr:.3f}")


if __name__ == "__main__":
    main()
