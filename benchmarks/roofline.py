"""Roofline / MFU analysis of the training and inference hot paths.

For each timed program the script reports the XLA-counted FLOPs and HBM
bytes (compiled.cost_analysis()), the measured wall time (tunnel-safe
chained sync, see bench.py), and the resulting achieved TFLOP/s / GB/s
as a fraction of the chip's peaks -- the quantitative backing for
"where the fine-tune step sits on the roofline" (VERDICT r1 #4).

Peaks default to TPU v5e (the benched chip): 197 TFLOP/s bf16 MXU,
819 GB/s HBM (public spec, scaling-book numbers). fp32 work runs
through the MXU as multi-pass bf16 (~1/4 rate) or on the VPU; the fp32
ceiling column uses peak/4 as the conventional bound.

Usage: python benchmarks/roofline.py [--samples N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

PEAK_BF16_TFLOPS = 197.0
PEAK_FP32_TFLOPS = PEAK_BF16_TFLOPS / 4.0
PEAK_HBM_GBS = 819.0


def timed(fn, sync, reps=50, blocks=3, warmup=2):
    """For STATEFUL fns (train steps chaining through holder state)."""
    for _ in range(warmup):
        out = fn()
    sync(out)
    per = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        per.append((time.perf_counter() - t0) / reps)
    return float(np.median(per))


def timed_chained(fn, perturb, x0, sync, reps=50, blocks=3, warmup=2):
    """bench.py-style chained timing for PURE fns: each rep's input
    depends on the previous output so the tunneled runtime cannot
    overlap/collapse independent identical dispatches (CLAUDE.md:
    block_until_ready does not sync through the axon tunnel)."""
    x = x0
    for _ in range(warmup):
        x = perturb(fn(x), x0)
    sync(x)
    per = []
    for _ in range(blocks):
        t0 = time.perf_counter()
        for _ in range(reps):
            x = perturb(fn(x), x0)
        sync(x)
        per.append((time.perf_counter() - t0) / reps)
    return float(np.median(per))


def cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0))
    except Exception:
        return 0.0, 0.0


def report(name, dt, flops, bytes_, n_vox, fp32=True):
    tflops = flops / dt / 1e12
    gbs = bytes_ / dt / 1e9
    peak = PEAK_FP32_TFLOPS if fp32 else PEAK_BF16_TFLOPS
    intensity = flops / bytes_ if bytes_ else float("inf")
    ridge = (PEAK_FP32_TFLOPS if fp32 else PEAK_BF16_TFLOPS) * 1e3 \
        / PEAK_HBM_GBS
    bound = "compute" if intensity > ridge else "memory"
    print(f"{name:26s} {dt*1e3:8.2f} ms  {flops/1e9:9.2f} GF "
          f"{tflops:7.2f} TF/s ({100*tflops/peak:5.1f}% of "
          f"{'fp32' if fp32 else 'bf16'} peak)  "
          f"{gbs:7.1f} GB/s ({100*gbs/PEAK_HBM_GBS:5.1f}% HBM)  "
          f"AI={intensity:6.1f} F/B [{bound}-bound]  "
          f"{n_vox/dt/1e6:7.2f} Mvox/s")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=200)
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.models.vi import FineTuner
    from qbold_vi_tpu.train import optim as qoptim
    from qbold_vi_tpu.train import steps as qsteps

    def sync(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "shape")]
        x = leaves[0]
        jax.device_get(x[(0,) * x.ndim] if x.ndim else x)

    cfg = OPTIMAL
    scan = cfg.scan
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    print(f"device={jax.devices()[0].platform}  peaks: "
          f"{PEAK_BF16_TFLOPS:.0f} TF/s bf16, {PEAK_FP32_TFLOPS:.0f} TF/s "
          f"fp32(=bf16/4), {PEAK_HBM_GBS:.0f} GB/s HBM")

    # ---- fine-tune step at the published workload (batch 38 crops of
    # 25x25x8x11, reference train.py:68,376), fp32 vs bf16 trunk --------
    b, cx, cy, cz = cfg.train.ft_batch_size, 25, 25, 8
    mask = (rng.uniform(size=(b, cx, cy, cz, 1)) > 0.2).astype(np.float32)
    batch = {
        "images": jnp.asarray(np.abs(rng.normal(
            size=(b, cx, cy, cz, scan.n_taus))).astype(np.float32) * 50 + 100),
        "mask": jnp.asarray(mask),
        "priors": jnp.asarray(rng.normal(
            size=(b, cx, cy, cz, 5)).astype(np.float32) * 0.3),
    }
    ft_vox = int(np.prod(batch["images"].shape[:-1]))
    opt = qoptim.make_finetune_optimizer(cfg.train)

    for dtype in ("float32", "bfloat16"):
        mcfg = dataclasses.replace(cfg.model, compute_dtype=dtype)
        rcfg = dataclasses.replace(cfg, model=mcfg)
        tuner = FineTuner(mcfg, scan, full_model=cfg.train.full_model,
                          use_blood=cfg.train.use_blood)
        params = jax.jit(tuner.init)(
            jax.random.PRNGKey(1), batch["images"][:1, :8, :8, :2])
        st = qsteps.TrainState(params, opt.init(params), None,
                               jnp.zeros([], jnp.int32))
        step = qsteps.make_finetune_step(tuner, rcfg, opt)
        # time the AOT executable itself: calling step() after
        # lower().compile() would compile the SAME program a second time
        # (the AOT path does not populate the jit dispatch cache --
        # minutes per program through the remote compile service)
        compiled = step.lower(st, key, batch).compile()
        flops, bytes_ = cost(compiled)
        holder = {"st": st}

        def ft():
            holder["st"], _ = compiled(holder["st"], key, batch)
            return holder["st"]

        dt = timed(ft, sync)
        report(f"ft step ({dtype})", dt, flops, bytes_, ft_vox,
               fp32=dtype == "float32")

    # ---- term-by-term cost attribution (fp32) --------------------------
    tuner = FineTuner(cfg.model, scan, full_model=cfg.train.full_model,
                      use_blood=cfg.train.use_blood)
    params = jax.jit(tuner.init)(jax.random.PRNGKey(1),
                                 batch["images"][:1, :8, :8, :2])
    from qbold_vi_tpu.train.steps import _finetune_terms

    def make_grad(terms):
        def loss(p, k, bt):
            total, aux = _finetune_terms(p, k, bt, tuner, cfg)
            return {"nll": aux["nll"],
                    "nll+kl": aux["nll"] + aux["kl"],
                    "full": total}[terms]
        return jax.jit(jax.grad(loss))

    for terms in ("nll", "nll+kl", "full"):
        g = make_grad(terms)
        compiled = g.lower(params, key, batch).compile()
        flops, bytes_ = cost(compiled)
        chain_p = jax.jit(lambda grads, base: jax.tree_util.tree_map(
            lambda b, gr: b + gr * 1e-12, base, grads))
        dt = timed_chained(lambda p: compiled(p, key, batch), chain_p,
                           params, sync)
        report(f"grad[{terms}]", dt, flops, bytes_, ft_vox)

    # ---- streaming pretrain step ---------------------------------------
    popt = qoptim.make_pretrain_optimizer(cfg.train)
    p3 = jax.jit(tuner.init)(jax.random.PRNGKey(3),
                             batch["images"][:1, :8, :8, :2])
    sst = qsteps.TrainState(p3, popt.init(p3), qoptim.swa_init(p3),
                            jnp.zeros([], jnp.int32))
    sstep = qsteps.make_pretrain_stream_step(tuner, cfg, popt)
    compiled = sstep.lower(sst, key).compile()
    flops, bytes_ = cost(compiled)
    sholder = {"st": sst}

    def spt():
        sholder["st"], _ = compiled(sholder["st"], key)
        return sholder["st"]

    dt = timed(spt, sync)
    report("pretrain stream step", dt, flops, bytes_,
           cfg.train.pt_batch_size * 500)

    # ---- inference: encoder + Pallas summarize (1M voxels) -------------
    shape = (14, 96, 96, 8)
    n_vox = int(np.prod(shape))
    data = jnp.asarray(np.abs(rng.normal(size=shape + (scan.n_taus,))
                              ).astype(np.float32) * 50 + 100)
    encode = jax.jit(lambda im: tuner.encode(params, im)[1])
    compiled = encode.lower(data).compile()
    flops, bytes_ = cost(compiled)
    chain_im = jax.jit(lambda out, base: base + out[..., :1] * 1e-9)
    dt = timed_chained(compiled, chain_im, data, sync)
    report("encode 1M voxels", dt, flops, bytes_, n_vox)

    if jax.devices()[0].platform in ("tpu", "axon"):
        from qbold_vi_tpu.ops.pallas_summarize import mc_posterior_summaries

        q = encode(data).reshape(-1, 5)
        dwc = float(scan.dw_coeff * scan.hct)
        summ = jax.jit(lambda qq: mc_posterior_summaries(
            qq, jnp.int32(7), no_samples=args.samples, mvg=True,
            dw_coeff=dwc))
        compiled = summ.lower(q).compile()
        flops, bytes_ = cost(compiled)
        chain_q = jax.jit(lambda out, base: base + out[0][..., :1] * 1e-9)
        dt = timed_chained(compiled, chain_q, q, sync)
        # XLA cannot count FLOPs inside a custom (Pallas) call; derive the
        # analytic count: per voxel per sample ~ 2 normals (Box-Muller
        # ~12 flops each incl. log/cos/sin) + 2 sigmoids (~8) + r2p (2)
        # + 6 accumulator FMAs -> ~50 flops, antithetic halves the PRNG.
        if flops == 0.0:
            flops = q.shape[0] * args.samples * 44.0
            print("  (Pallas call: analytic FLOP estimate)")
        report(f"mc summarize S={args.samples}", dt, flops,
               max(bytes_, q.nbytes + 2 * q.shape[0] * 3 * 4), n_vox)


if __name__ == "__main__":
    main()
