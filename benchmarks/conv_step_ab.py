"""A/B the full fine-tune step with the Pallas trunk conv ON vs OFF
(ops/pallas_conv.py; round-5 encoder hot path) at the published
workload -- the integration-level number that decides the auto default.

Runs the bf16 trunk (the production TPU configuration, compute_dtype
auto) with fused_elbo auto. Run on the TPU chip:

    python benchmarks/conv_step_ab.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qbold_vi_tpu.config import OPTIMAL
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.train import optim as qoptim
from qbold_vi_tpu.train import steps as qsteps
from qbold_vi_tpu.utils.profiling import steady_state_step_time


def main() -> None:
    scan = OPTIMAL.scan
    rng = np.random.default_rng(1)
    b, cx, cy, cz = OPTIMAL.train.ft_batch_size, 25, 25, 8
    mask = (rng.uniform(size=(b, cx, cy, cz, 1)) > 0.2).astype(np.float32)
    batch = {
        "images": jnp.asarray(np.abs(rng.normal(
            size=(b, cx, cy, cz, scan.n_taus))).astype(np.float32)
            * 50 + 100) * mask,
        "mask": jnp.asarray(mask),
        "priors": jnp.asarray(rng.normal(
            size=(b, cx, cy, cz, 5)).astype(np.float32) * 0.3),
    }
    n_vox = int(np.prod(mask.shape[:-1]))
    key = jax.random.PRNGKey(0)

    results = {}
    for label, fused_conv in (("pallas conv", "on"), ("xla conv", "off")):
        cfg = dataclasses.replace(
            OPTIMAL, model=dataclasses.replace(OPTIMAL.model,
                                               fused_conv=fused_conv))
        tuner = FineTuner(cfg.model, scan,
                          full_model=cfg.train.full_model,
                          use_blood=cfg.train.use_blood)
        params = jax.jit(tuner.init)(jax.random.PRNGKey(2),
                                     batch["images"][:1])
        optimizer = qoptim.make_finetune_optimizer(cfg.train)
        state = qsteps.TrainState(params, optimizer.init(params), None,
                                  jnp.zeros([], jnp.int32))
        step_fn = qsteps.make_finetune_step(tuner, cfg, optimizer)
        dt = steady_state_step_time(step_fn, state, key, batch)
        results[label] = dt
        print(f"{label}: {dt * 1e3:.2f} ms/step "
              f"({n_vox / dt / 1e6:.1f} M voxels/s)", flush=True)

    speedup = results["xla conv"] / results["pallas conv"]
    print(f"speedup: {speedup:.2f}x")
    print(json.dumps({
        "workload": "ft_step_38x25x25x8_mvg_bf16",
        "pallas_conv_ms": results["pallas conv"] * 1e3,
        "xla_conv_ms": results["xla conv"] * 1e3,
        "speedup_x": speedup,
    }))


if __name__ == "__main__":
    main()
