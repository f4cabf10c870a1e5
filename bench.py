"""Benchmark: full-brain amortized VI inference throughput on TPU.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Headline metric: voxels/sec of full-brain amortized posterior inference
(encoder pass + 200-sample MC posterior summaries per voxel -- the
reference's ``save_predictions`` hot path, model.py:772-803) on ~1M
masked voxels at the published "optimal" architecture (60 units,
2 blocks, MVG head).

``vs_baseline``: the reference publishes no inference timing; its only
quantitative perf statement is the classical WLS baseline at ~1 min per
volume (reference loglinear.py:75; a 96x96x8 volume -> ~1229 voxels/s).
vs_baseline is therefore voxels_per_sec / 1229 -- how much faster the
amortized TPU inference is than the reference's classical per-voxel fit,
the comparison the method paper itself makes.

Also printed (informational, stderr): jitted WLS throughput and
fine-tune train-step throughput.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

VOLUME_SHAPE = (96, 96, 8)          # a typical ASE volume
WLS_BASELINE_VOXELS_PER_SEC = int(np.prod(VOLUME_SHAPE)) / 60.0  # ~1229


def main() -> None:
    import jax
    import jax.numpy as jnp

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.infer import _summarize
    from qbold_vi_tpu.models.vi import FineTuner
    from qbold_vi_tpu.baseline import fit_wls

    cfg = OPTIMAL
    scan = cfg.scan
    tuner = FineTuner(cfg.model, scan, full_model=cfg.train.full_model,
                      use_blood=cfg.train.use_blood)

    # ~1M voxels: 14 subjects x 96x96x8 = 1,032,192
    n_subj = 14
    rng = np.random.default_rng(0)
    data = (np.abs(rng.normal(size=(n_subj, *VOLUME_SHAPE, scan.n_taus)))
            .astype(np.float32) * 50.0 + 100.0)
    n_voxels = int(np.prod(data.shape[:-1]))

    key = jax.random.PRNGKey(0)
    params = tuner.init(key, jnp.asarray(data[:1, :8, :8, :1]))

    images = jax.device_put(jnp.asarray(data))

    def run():
        out = _summarize(tuner, params, key, images, no_samples=200)
        jax.block_until_ready(out)
        return out

    run()  # compile
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    vps = n_voxels / dt

    # Informational: jitted WLS throughput (same volumes).
    wls = jax.jit(lambda x: fit_wls(x, scan))
    jax.block_until_ready(wls(images))
    t0 = time.perf_counter()
    jax.block_until_ready(wls(images))
    wls_dt = time.perf_counter() - t0
    print(f"[bench] infer: {n_voxels} voxels in {dt * 1e3:.1f} ms "
          f"({vps / 1e6:.2f} M voxels/s); wls: {n_voxels / wls_dt / 1e6:.2f} "
          f"M voxels/s; device={jax.devices()[0].platform}", file=sys.stderr)

    print(json.dumps({
        "metric": "full_brain_infer_voxels_per_sec",
        "value": round(vps, 1),
        "unit": "voxels/s",
        "vs_baseline": round(vps / WLS_BASELINE_VOXELS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
