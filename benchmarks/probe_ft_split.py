"""Probe: where does the fine-tune step's time go -- encoder fwd+bwd vs
the fused ELBO op? (round-4 verdict #5: decide whether a fused
TRAINING-path encode kernel is worth building; fused_infer covers
forward/inference only.)

Times three programs at the published workload (38 crops of 25x25x8,
MVG optimal config, fused ELBO on):

  * full        -- the production fine-tune step (encode + fused ELBO +
                   smoothness + optimiser), steady state;
  * encoder_vg  -- value_and_grad of a sum over the encoder outputs
                   (q, sigma): the encoder fwd+bwd cost alone;
  * elbo_vg     -- value_and_grad of the fused ELBO rows on
                   precomputed (q, p, y, sigma): kernel + packing alone.

encoder share = encoder_vg / full. If the share is below the 15%
decision threshold, a training-path encode kernel cannot buy a
meaningful step reduction and the decision is NO-BUILD (recorded in
benchmarks/RESULTS.md either way).

Run on the TPU chip: python benchmarks/probe_ft_split.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from qbold_vi_tpu.config import OPTIMAL
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.train import optim as qoptim
from qbold_vi_tpu.train import steps as qsteps
from qbold_vi_tpu.utils.profiling import steady_state_step_time, sync


def timed_chained(fn, perturb, x0, reps=50, warmup=2):
    """bench.py-style chained timing for pure fns (CLAUDE.md recipe:
    block_until_ready does not sync through the tunnel)."""
    x = x0
    for _ in range(warmup):
        x = perturb(fn(x), x0)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = perturb(fn(x), x0)
    sync(x)
    return (time.perf_counter() - t0) / reps


def main() -> None:
    cfg = OPTIMAL
    scan = cfg.scan
    rng = np.random.default_rng(1)
    b, cx, cy, cz = cfg.train.ft_batch_size, 25, 25, 8
    mask = (rng.uniform(size=(b, cx, cy, cz, 1)) > 0.2).astype(np.float32)
    images = jnp.asarray(np.abs(rng.normal(
        size=(b, cx, cy, cz, scan.n_taus))).astype(np.float32) * 50 + 100)
    batch = {
        "images": images * mask,
        "mask": jnp.asarray(mask),
        "priors": jnp.asarray(rng.normal(
            size=(b, cx, cy, cz, 5)).astype(np.float32) * 0.3),
    }
    key = jax.random.PRNGKey(0)
    tuner = FineTuner(cfg.model, scan, full_model=cfg.train.full_model,
                      use_blood=cfg.train.use_blood)
    params = jax.jit(tuner.init)(jax.random.PRNGKey(2),
                                 batch["images"][:1])

    # ---- full production step -------------------------------------------
    optimizer = qoptim.make_finetune_optimizer(cfg.train)
    state = qsteps.TrainState(params, optimizer.init(params), None,
                              jnp.zeros([], jnp.int32))
    step_fn = qsteps.make_finetune_step(tuner, cfg, optimizer)
    t_full = steady_state_step_time(step_fn, state, key, batch)
    print(f"full step:        {t_full*1e3:8.2f} ms", flush=True)

    # ---- encoder fwd+bwd alone ------------------------------------------
    @jax.jit
    def encoder_vg(p, images):
        def loss(pp):
            _, q, sigma = tuner.encode(pp, images)
            return jnp.sum(q) + jnp.sum(sigma)
        return jax.grad(loss)(p)

    def perturb_p(g, p0):
        # chain: params shifted by a tiny multiple of the grad leaf sums
        eps = 1e-20 * sum(jnp.sum(l) for l in jax.tree_util.tree_leaves(g))
        return jax.tree_util.tree_map(lambda x: x + eps, p0)

    t_enc = timed_chained(lambda p: encoder_vg(p, batch["images"]),
                          perturb_p, params)
    print(f"encoder fwd+bwd:  {t_enc*1e3:8.2f} ms "
          f"({100*t_enc/t_full:5.1f}% of step)", flush=True)

    # ---- fused ELBO op alone --------------------------------------------
    from qbold_vi_tpu.ops import pallas_elbo

    fused = pallas_elbo.make_fused_elbo(
        cfg.model, scan, use_blood=cfg.train.use_blood,
        s_nll=cfg.model.no_samples, s_kl=70, noise="device")
    n = int(np.prod(mask.shape[:-1]))
    t_ch = scan.n_taus
    q0 = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.3)
    p0 = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.3)
    y0 = jnp.asarray(np.abs(rng.normal(size=(n, t_ch))).astype(np.float32)
                     + 0.4)
    s0 = jnp.full((n, t_ch), 0.08, jnp.float32)
    m0 = jnp.asarray(mask.reshape(-1))

    @jax.jit
    def elbo_vg(q):
        def loss(qq):
            nll, kl = fused(qq, p0, y0, s0, m0, jnp.int32(7))
            return jnp.sum(nll) + jnp.sum(kl)
        return jax.grad(loss)(q)

    t_elbo = timed_chained(elbo_vg, lambda g, q: q0 + 1e-20 * jnp.sum(g),
                           q0)
    print(f"fused ELBO op:    {t_elbo*1e3:8.2f} ms "
          f"({100*t_elbo/t_full:5.1f}% of step)", flush=True)

    share = t_enc / t_full
    decision = ("BUILD candidate (>=15% encoder share)"
                if share >= 0.15 else
                "NO-BUILD (encoder share below the 15% threshold)")
    print(decision)
    print(json.dumps({
        "workload": "ft_step_38x25x25x8_mvg_fused",
        "full_step_ms": t_full * 1e3,
        "encoder_vg_ms": t_enc * 1e3,
        "fused_elbo_vg_ms": t_elbo * 1e3,
        "encoder_share": share,
        "decision": decision,
    }))


if __name__ == "__main__":
    main()
