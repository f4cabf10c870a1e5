"""Interleaved A/B: fp32 vs bfloat16 serving inputs to the merged kernel.

The merged encode+quadrature inference kernel is DMA-bound (RESULTS.md:
the pure channel-major block read is ~0.7 ms of the ~1.6 ms kernel at
1.03M voxels). The (T+1, N) input is the dominant HBM stream; feeding
it bfloat16 halves those bytes while all in-kernel math stays fp32
(the kernel casts right after the masked read). This probe measures
the wall win and the map-level error cost at full-brain scale.

Usage: python benchmarks/probe_bf16_input.py [--reps R] [--blocks B]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from breakdown import timed_chained  # noqa: E402 (shared timing recipe)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=80)
    ap.add_argument("--blocks", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qbold_vi_tpu.config import OPTIMAL, ScanParams
    from qbold_vi_tpu.infer import _fused_posterior_summaries, to_channel_major
    from qbold_vi_tpu.models.vi import FineTuner
    from qbold_vi_tpu.utils.profiling import sync

    scan = ScanParams(simulate_noise=False)
    tuner = FineTuner(OPTIMAL.model, scan)
    rng = np.random.default_rng(0)
    shape = (14, 96, 96, 8)
    n_vox = int(np.prod(shape))
    vol = np.abs(rng.normal(size=shape + (scan.n_taus + 1,))
                 ).astype(np.float32) * 50 + 100
    vol[..., -1] = 1.0
    print(f"{n_vox} voxels, {shape}")

    params = jax.jit(tuner.init)(jax.random.PRNGKey(0),
                                 jnp.asarray(vol[:1, :8, :8, :1, :-1]))
    cm32 = jax.device_put(jnp.asarray(to_channel_major(vol)))
    # numpy has no bfloat16: cast on host via jnp, then put
    cm16 = jax.device_put(jnp.asarray(to_channel_major(vol),
                                      dtype=jnp.bfloat16))

    # ONE jitted pair reused across every block/dtype -- rebuilding
    # jit(lambda) wrappers per block discards their caches and re-pays
    # tracing each iteration
    f = jax.jit(lambda d: _fused_posterior_summaries(
        tuner, params, d, input_layout="channel", mask_channel=True)[0])
    chain = jax.jit(lambda out, base: (
        base + (out[0, :1][None] * 1e-9).astype(base.dtype)))

    # map-level error first (one dispatch each)
    m32 = np.asarray(jax.device_get(f(cm32)))[:, :n_vox]
    m16 = np.asarray(jax.device_get(f(cm16)))[:, :n_vox]
    err = np.abs(m16 - m32)
    for i, name in enumerate(("oef", "dbv", "r2p")):
        scalem = np.abs(m32[i]).mean()
        print(f"{name}: max|d|={err[i].max():.3e} mean|d|={err[i].mean():.3e}"
              f" (mean|{name}|={scalem:.3f})")

    for blk in range(args.blocks):
        out = {}
        for name, x0 in (("fp32", cm32), ("bf16", cm16)):
            dt = timed_chained(f, chain, x0, sync, args.reps)
            out[name] = dt
            print(f"block {blk} {name}: {dt*1e3:7.3f} ms "
                  f"({n_vox/dt/1e6:7.1f} M voxel/s)")
        print(f"block {blk} speedup: {out['fp32']/out['bf16']:.3f}x")


if __name__ == "__main__":
    main()
