"""Hyperparameter sweeps.

Reproduces the reference's manual grid sweep (reference:
wandb_sweep.py:36-49 -- layers x units x seeds, each a fresh run) without
hard-wiring wandb; the declarative search-space of
configurations/sweep_prior.yaml is mirrored by ``random_search`` so
sweeps run anywhere (wandb attaches via TrainConfig.wandb_project).
"""

from __future__ import annotations

import dataclasses
import itertools
from typing import Callable, Optional, Sequence

import numpy as np

from .config import QBoldConfig, apply_flat_overrides

__all__ = ["run_grid_sweep", "random_search"]


def _default_run(cfg: QBoldConfig) -> dict:
    from .train.trainer import Trainer

    trainer = Trainer(cfg)
    trainer.pretrain()
    return {"status": trainer.status.name}


def run_grid_sweep(cfg: QBoldConfig,
                   layers: Sequence[int] = (2, 4, 6, 8, 10),
                   units: Sequence[int] = (2, 4, 6, 8, 10),
                   seeds: int = 3,
                   run_fn: Optional[Callable[[QBoldConfig], dict]] = None) -> list:
    """layers x units x seeds grid (reference: wandb_sweep.py:36-49)."""
    run_fn = run_fn or _default_run
    results = []
    for nl, nu, seed in itertools.product(layers, units, range(seeds)):
        run_cfg = apply_flat_overrides(cfg, {
            "no_intermediate_layers": nl,
            "no_units": nu,
            "save_directory": f"{cfg.train.save_directory}/l{nl}_u{nu}_s{seed}",
        })
        run_cfg = dataclasses.replace(
            run_cfg, train=dataclasses.replace(run_cfg.train, seed=seed),
            name=f"{nl}_layers_{nu}_units_{seed}")
        out = run_fn(run_cfg)
        out.update(layers=nl, units=nu, seed=seed)
        results.append(out)
    return results


def random_search(cfg: QBoldConfig, space: dict, n_trials: int,
                  run_fn: Optional[Callable[[QBoldConfig], dict]] = None,
                  metric: str = "val_elbo", seed: int = 0) -> list:
    """Random search over a {key: (low, high) | [choices]} space,
    covering the role of the reference's wandb Bayesian sweep config
    (reference: configurations/sweep_prior.yaml:2-25)."""
    run_fn = run_fn or _default_run
    rng = np.random.default_rng(seed)
    results = []
    for trial in range(n_trials):
        overrides = {}
        for k, spec in space.items():
            if isinstance(spec, (list, tuple)) and len(spec) == 2 and all(
                    isinstance(v, (int, float)) for v in spec):
                lo, hi = spec
                val = rng.uniform(lo, hi)
                overrides[k] = type(lo)(val) if isinstance(lo, int) else float(val)
            else:
                overrides[k] = spec[rng.integers(len(spec))]
        overrides["save_directory"] = f"{cfg.train.save_directory}/trial{trial}"
        run_cfg = apply_flat_overrides(cfg, overrides)
        out = run_fn(run_cfg)
        out.update(trial=trial, overrides=overrides)
        results.append(out)
    results.sort(key=lambda r: r.get(metric, float("inf")))
    return results
