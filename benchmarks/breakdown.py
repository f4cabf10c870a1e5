"""Component-level TPU timing breakdown (diagnostic; bench.py stays the
single-line driver contract).

Times, with tunnel-safe chained sync (see bench.py):
  * encoder forward (1M voxels)
  * MC posterior summarization, jnp streamed vs Pallas kernel
  * WLS classical fit
  * pretrain + fine-tune train steps at published batch shapes

Usage: python benchmarks/breakdown.py [--subjects N] [--samples S]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed(fn, sync, reps=50, warmup=2):
    """For STATEFUL fns (train steps chaining through holder state)."""
    for _ in range(warmup):
        out = fn()
    sync(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    sync(out)
    return (time.perf_counter() - t0) / reps


def timed_chained(fn, perturb, x0, sync, reps=50, warmup=2):
    """bench.py-style chained timing for PURE fns: each rep's input
    carries a data dependency on the previous rep's output, so the
    tunneled runtime cannot overlap or dead-code independent identical
    dispatches (jax.block_until_ready does not sync through the axon
    tunnel -- CLAUDE.md timing recipe)."""
    x = x0
    for _ in range(warmup):
        x = perturb(fn(x), x0)
    sync(x)
    t0 = time.perf_counter()
    for _ in range(reps):
        x = perturb(fn(x), x0)
    sync(x)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subjects", type=int, default=14)
    ap.add_argument("--samples", type=int, default=200)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qbold_vi_tpu.baseline import fit_wls
    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.models.vi import FineTuner
    from qbold_vi_tpu.ops.pallas_summarize import mc_posterior_summaries
    from qbold_vi_tpu.train import optim as qoptim
    from qbold_vi_tpu.train import steps as qsteps

    def sync(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "shape")]
        x = leaves[0]
        jax.device_get(x[(0,) * x.ndim] if x.ndim else x)

    cfg = OPTIMAL
    scan = cfg.scan
    tuner = FineTuner(cfg.model, scan, full_model=cfg.train.full_model,
                      use_blood=cfg.train.use_blood)
    dist = tuner.dist
    dwc = scan.dw_coeff * scan.hct

    rng = np.random.default_rng(0)
    shape = (args.subjects, 96, 96, 8)
    n_vox = int(np.prod(shape))
    data = jnp.asarray(np.abs(rng.normal(size=shape + (scan.n_taus,))
                              ).astype(np.float32) * 50 + 100)
    key = jax.random.PRNGKey(0)
    # jit the inits: eager flax init costs a tunnel roundtrip PER OP
    # on the remote backend (CLAUDE.md; minutes of invisible wall)
    jinit = jax.jit(tuner.init)
    params = jinit(key, data[:1, :8, :8, :1])

    dev = jax.devices()[0].platform
    print(f"device={dev} voxels={n_vox} samples={args.samples}")

    encode = jax.jit(lambda im: tuner.encode(params, im)[1])
    q = encode(data)
    chain_im = jax.jit(lambda out, base: base + out[..., :1] * 1e-9)
    dt = timed_chained(encode, chain_im, data, sync)
    print(f"encode:            {dt*1e3:8.2f} ms  ({n_vox/dt/1e6:8.1f} M voxel/s)")

    import dataclasses
    tuner16 = FineTuner(dataclasses.replace(cfg.model,
                                            compute_dtype="bfloat16"),
                        scan, full_model=cfg.train.full_model,
                        use_blood=cfg.train.use_blood)
    encode16 = jax.jit(lambda im: tuner16.encode(params, im)[1])
    dt = timed_chained(encode16, chain_im, data, sync)
    print(f"encode (bf16):     {dt*1e3:8.2f} ms  ({n_vox/dt/1e6:8.1f} M voxel/s)")

    qf = q.reshape(-1, q.shape[-1])

    summ_jnp = jax.jit(lambda qq: dist.posterior_means_streamed(
        key, qq, cfg.model.use_mvg, no_samples=args.samples,
        r2p_fn=lambda o, d: dwc * o * d))
    chain_q = jax.jit(lambda out, base: base + out[0][..., :1] * 1e-9)
    dt = timed_chained(summ_jnp, chain_q, qf, sync)
    print(f"summarize (jnp):   {dt*1e3:8.2f} ms  ({n_vox/dt/1e6:8.1f} M voxel/s)")

    if dev in ("tpu", "axon"):
        dt = timed_chained(
            lambda qq: mc_posterior_summaries(
                qq, jnp.int32(7), no_samples=args.samples,
                mvg=cfg.model.use_mvg, dw_coeff=float(dwc)),
            chain_q, qf, sync)
        print(f"summarize (pallas):{dt*1e3:8.2f} ms  ({n_vox/dt/1e6:8.1f} M voxel/s)")

    if dev in ("tpu", "axon"):
        # the production inference path: ONE fused kernel (stream-1
        # encode + quadrature summaries), channel-major serving layout
        from qbold_vi_tpu.infer import (_fused_posterior_summaries,
                                        to_channel_major)

        # include the fused mask row: the production program reads
        # (T+1, N) and zeroes in-kernel (posterior_maps' contract)
        vol = np.concatenate([np.asarray(data),
                              np.ones(shape + (1,), np.float32)], -1)
        data_cm = jax.device_put(jnp.asarray(to_channel_major(vol)))
        fused = jax.jit(lambda x: _fused_posterior_summaries(
            tuner, params, x, input_layout="channel",
            mask_channel=True)[0])
        chain_cm = jax.jit(lambda out, base: base + out[0, :1][None] * 1e-9)
        dt = timed_chained(fused, chain_cm, data_cm, sync)
        print(f"fused enc+quad:    {dt*1e3:8.2f} ms  "
              f"({n_vox/dt/1e6:8.1f} M voxel/s)")

    wls = jax.jit(lambda x: fit_wls(x, scan))
    chain_wls = jax.jit(lambda out, base: base + out[0] * 1e-9)
    dt = timed_chained(wls, chain_wls, data, sync)
    print(f"wls:               {dt*1e3:8.2f} ms  ({n_vox/dt/1e6:8.1f} M voxel/s)")

    # train steps
    b, cx, cy, cz = cfg.train.ft_batch_size, 25, 25, 8
    mask = (rng.uniform(size=(b, cx, cy, cz, 1)) > 0.2).astype(np.float32)
    batch = {
        "images": jnp.asarray(np.abs(rng.normal(
            size=(b, cx, cy, cz, scan.n_taus))).astype(np.float32) * 50 + 100),
        "mask": jnp.asarray(mask),
        "priors": jnp.asarray(rng.normal(
            size=(b, cx, cy, cz, 5)).astype(np.float32) * 0.3),
    }
    opt = qoptim.make_finetune_optimizer(cfg.train)
    st = qsteps.TrainState(params, opt.init(params), None,
                           jnp.zeros([], jnp.int32))
    step = qsteps.make_finetune_step(tuner, cfg, opt)
    holder = {"st": st}

    def ft():
        holder["st"], m = step(holder["st"], key, batch)
        return holder["st"]

    dt = timed(ft, sync)
    ft_vox = int(np.prod(batch["images"].shape[:-1]))
    print(f"finetune step:     {dt*1e3:8.2f} ms  ({ft_vox/dt/1e6:8.1f} M voxel/s)")

    pb = {
        "x": jnp.asarray(np.abs(rng.normal(
            size=(cfg.train.pt_batch_size, 10, 10, 5, scan.n_taus))
        ).astype(np.float32) + 0.5),
        "y": jnp.asarray(np.concatenate([
            rng.uniform(0.1, 0.7, size=(cfg.train.pt_batch_size, 10, 10, 5, 1)),
            rng.uniform(0.005, 0.18, size=(cfg.train.pt_batch_size, 10, 10, 5, 1)),
            rng.uniform(1, 10, size=(cfg.train.pt_batch_size, 10, 10, 5, 1)),
        ], -1).astype(np.float32)),
    }
    # fresh params: the fine-tune step above donated its state buffers
    params2 = jinit(jax.random.PRNGKey(3), data[:1, :8, :8, :1])
    popt = qoptim.make_pretrain_optimizer(cfg.train)
    pst = qsteps.TrainState(params2, popt.init(params2),
                            qoptim.swa_init(params2), jnp.zeros([], jnp.int32))
    pstep = qsteps.make_pretrain_step(tuner, cfg, popt)
    pholder = {"st": pst}

    def pt():
        pholder["st"], m = pstep(pholder["st"], key, pb)
        return pholder["st"]

    dt = timed(pt, sync)
    pt_vox = int(np.prod(pb["x"].shape[:-1]))
    print(f"pretrain step:     {dt*1e3:8.2f} ms  ({pt_vox/dt/1e6:8.1f} M voxel/s)")

    # streaming pretrain step (on-device synth gen, zero host transfer)
    params3 = jinit(jax.random.PRNGKey(4), data[:1, :8, :8, :1])
    sst = qsteps.TrainState(params3, popt.init(params3),
                            qoptim.swa_init(params3), jnp.zeros([], jnp.int32))
    sstep = qsteps.make_pretrain_stream_step(tuner, cfg, popt)
    sholder = {"st": sst}

    def spt():
        sholder["st"], m = sstep(sholder["st"], key)
        return sholder["st"]

    dt = timed(spt, sync)
    print(f"pretrain stream:   {dt*1e3:8.2f} ms  ({pt_vox/dt/1e6:8.1f} M voxel/s)")

    # whole-epoch scan (10 fine-tune steps in one dispatch)
    T = 10
    ebatches = {k: jnp.broadcast_to(v, (T,) + v.shape) for k, v in batch.items()}
    params4 = jinit(jax.random.PRNGKey(5), data[:1, :8, :8, :1])
    est = qsteps.TrainState(params4, opt.init(params4), None,
                            jnp.zeros([], jnp.int32))
    efn = qsteps.make_finetune_epoch(tuner, cfg, opt)
    eholder = {"st": est}

    def ep():
        eholder["st"], m = efn(eholder["st"], key, ebatches)
        return eholder["st"]

    dt = timed(ep, sync, reps=3)
    print(f"ft epoch scan/step:{dt/T*1e3:8.2f} ms  ({ft_vox*T/dt/1e6:8.1f} M voxel/s)")


if __name__ == "__main__":
    main()
