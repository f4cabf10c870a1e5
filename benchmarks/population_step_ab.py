"""Steady-state A/B of the VMAPPED population fine-tune gradient step:
fused Pallas ELBO kernel (in-vmap via the round-5 trial-fold batching
rules) vs the jnp path (what populations were forced onto before).

The wall-clock population bench (population_full_run_bench.py) is
compile-dominated at its shortened schedule -- the real sweep schedule
runs 4000 fine-tune steps per trial, where THIS number is what
accumulates. Workload: 10 trials x the published 38x25x25x8 crop batch,
sweep-architecture encoder (30 units / 1 block, sweep_prior.yaml),
value_and_grad of the full fine-tune loss vmapped over the trial axis.

Run on the TPU chip: python benchmarks/population_step_ab.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qbold_vi_tpu.config import QBoldConfig, apply_flat_overrides
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.train.steps import _finetune_terms
from qbold_vi_tpu.utils.profiling import sync


def main() -> None:
    p_n = 10
    base = apply_flat_overrides(QBoldConfig(), dict(
        no_units=30, no_intermediate_layers=1, student_t_df=200.0,
        use_mvg=True, predict_log_data=False,
        multi_image_normalisation=True, simulate_noise=False))
    scan = base.scan
    rng = np.random.default_rng(1)
    b, cx, cy, cz = 38, 25, 25, 8
    mask = (rng.uniform(size=(p_n, b, cx, cy, cz, 1)) > 0.2
            ).astype(np.float32)
    batch = {
        "images": jnp.asarray(np.abs(rng.normal(
            size=(p_n, b, cx, cy, cz, scan.n_taus))).astype(np.float32)
            * 50 + 100) * mask,
        "mask": jnp.asarray(mask),
        "priors": jnp.asarray(rng.normal(
            size=(p_n, b, cx, cy, cz, 5)).astype(np.float32) * 0.3),
    }
    n_vox = int(np.prod(mask.shape[:-1]))

    results = {}
    for label, fused in (("fused-in-vmap", "auto"), ("jnp path", "off")):
        cfg = dataclasses.replace(base, train=dataclasses.replace(
            base.train, fused_elbo=fused, fused_decode_nll=fused))
        tuner = FineTuner(cfg.model, scan, full_model=cfg.train.full_model,
                          use_blood=cfg.train.use_blood)
        p0 = jax.jit(tuner.init)(jax.random.PRNGKey(2),
                                 batch["images"][0, :1])
        params = jax.tree_util.tree_map(
            lambda x: jnp.stack([x] * p_n), p0)
        keys = jax.random.split(jax.random.PRNGKey(0), p_n)

        def trial_grad(p, k, bt):
            def loss(pp):
                total, _ = _finetune_terms(pp, k, bt, tuner, cfg)
                return total
            return jax.value_and_grad(loss)(p)

        step = jax.jit(jax.vmap(trial_grad))

        def run(p):
            loss, grads = step(p, keys, batch)
            # chain: params nudged by the loss so reps serialize
            eps = (1e-20 * jnp.sum(loss)).astype(jnp.float32)
            return jax.tree_util.tree_map(lambda x: x + eps, p), loss

        p = params
        for _ in range(2):
            p, loss = run(p)
        sync(loss)
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            p, loss = run(p)
        sync(loss)
        dt = (time.perf_counter() - t0) / reps
        results[label] = dt
        print(f"{label}: {dt*1e3:8.2f} ms / population step "
              f"({n_vox / dt / 1e6:7.1f} M voxels/s over {p_n} trials)",
              flush=True)

    speedup = results["jnp path"] / results["fused-in-vmap"]
    print(f"fused-in-vmap speedup: {speedup:.2f}x")
    print(json.dumps({
        "workload": f"population_grad_step_{p_n}x38x25x25x8",
        "fused_ms": results["fused-in-vmap"] * 1e3,
        "jnp_ms": results["jnp path"] * 1e3,
        "speedup_x": speedup,
    }))


if __name__ == "__main__":
    main()
