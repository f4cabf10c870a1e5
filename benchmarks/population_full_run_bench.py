"""Wall-clock the vmapped-population TWO-PHASE sweep objective
(sweep.population_full_run, round-4) against serial execution of the
identical algorithm -- the round-3 verdict #4 done criterion (10-trial
full_run wall <= ~3x one serial trial on one chip).

Workload: the reference sweep's fixed architecture (sweep_prior.yaml:
30 units / 1 block) over 10 pt_lr/ft_lr proposals, a shortened but
real schedule (2 pretrain epochs at sample_size 2500, 2 x 100 fine-tune
steps at batch 38 / crop 16) on generated 6x96x96x8 volumes + 2 study
subjects. Run on the TPU chip:

    python benchmarks/population_full_run_bench.py [n_trials]

Each timed wall INCLUDES its own compiles (what a sweep user pays);
remote-compile variance is noted in the output.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_data_dir(scan) -> str:
    rng = np.random.default_rng(0)
    d = tempfile.mkdtemp(prefix="qbold_popsweep_")
    vols = np.abs(rng.normal(size=(6, 96, 96, 8, scan.n_taus + 1))
                  ).astype(np.float32) * 50 + 100
    vols[..., -1] = 1.0
    np.save(os.path.join(d, "ASE_scan.npy"), vols)
    study = np.abs(rng.normal(size=(2, 64, 64, 8, scan.n_taus + 2))
                   ).astype(np.float32) * 50 + 100
    study[..., -2:] = 1.0
    np.save(os.path.join(d, "hyperv_ase.npy"), study)
    np.save(os.path.join(d, "baseline_ase.npy"), study + 1.0)
    return d


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from qbold_vi_tpu.config import QBoldConfig, apply_flat_overrides
    from qbold_vi_tpu.sweep import population_full_run

    cfg = apply_flat_overrides(QBoldConfig(), dict(
        no_units=30, no_intermediate_layers=1, student_t_df=200.0,
        use_mvg=True, predict_log_data=False, multi_image_normalisation=True,
        no_pt_epochs=2, no_ft_epochs=2, ft_steps_per_epoch=100,
        ft_batch_size=38, crop_size=16, pt_batch_size=512,
        sample_size=2500, simulate_noise=False,
    ))
    d = _make_data_dir(cfg.scan)
    cfg = apply_flat_overrides(cfg, {"d": d})

    rng = np.random.default_rng(3)
    trials = [{"pt_lr": float(10 ** rng.uniform(-4, -2.5)),
               "ft_lr": float(10 ** rng.uniform(-3.5, -2))}
              for _ in range(n_trials)]

    t0 = time.time()
    ser1 = population_full_run(cfg, trials[:1], serial=True)
    wall_serial_1 = time.time() - t0
    print(f"serial, 1 trial:        {wall_serial_1:7.1f} s "
          f"(val_elbo={ser1[0]['val_elbo']:.3f})", flush=True)

    t0 = time.time()
    pop = population_full_run(cfg, trials)
    wall_pop = time.time() - t0
    best = min(r["val_elbo"] for r in pop)
    print(f"population, {n_trials} trials: {wall_pop:7.1f} s "
          f"(best val_elbo={best:.3f})", flush=True)
    print(f"population {n_trials}-trial wall / serial 1-trial wall: "
          f"{wall_pop / wall_serial_1:.2f}x "
          f"(criterion: <= ~3x; both walls include their own remote "
          f"compiles, which vary across a day)")

    # Round-5 A/B: the fused Pallas ELBO kernel now BATCHES under vmap
    # (custom_vmap trial-fold, ops/pallas_elbo.py), so the population
    # above already ran it in-kernel (fused_elbo auto = on-chip PRNG on
    # TPU backends). Re-run the identical population with the kernels
    # forced OFF -- the round-4 behaviour -- for the measured delta.
    import dataclasses

    cfg_off = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, fused_elbo="off", fused_decode_nll="off"))
    t0 = time.time()
    pop_off = population_full_run(cfg_off, trials)
    wall_off = time.time() - t0
    best_off = min(r["val_elbo"] for r in pop_off)
    print(f"population, kernels OFF: {wall_off:7.1f} s "
          f"(best val_elbo={best_off:.3f})", flush=True)
    print(f"fused-in-population wall vs round-4 (kernels off): "
          f"{wall_pop:.1f} s vs {wall_off:.1f} s "
          f"({wall_off / wall_pop:.2f}x; same-session compiles on both "
          f"sides)")


if __name__ == "__main__":
    main()
