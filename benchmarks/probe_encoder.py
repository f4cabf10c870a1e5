"""Sub-stage timing of the inference path: where does the encoder pass go?

breakdown.py shows the production inference pipeline (encode -> fused
quadrature summaries) is ENCODER-dominated on chip. This probe times the
encoder's constituent stages at the full-brain shape to locate the cost:

  * normalise           (clip / se-mean divide / log, 11 channels)
  * embed               (normalise + first 11->60 Dense + act)
  * fold/unfold         (the one hoisted z-fold transpose pair)
  * trunk (folded)      (2 gated res blocks at [B*Z, X, Y, 60])
  * conv3x3 x4 (bf16)   (just the four 60->60 convs, folded layout)
  * dense x6 (bf16)     (just the six 60->60 Dense ops)
  * heads               (fp32 final/ sigma Dense + exp + unfold)
  * encode (full)       (the whole thing, = breakdown.py's number)
  * quad kernel         (fused quadrature posterior summaries)
  * encode+quad         (the bench.py composite program)

Chained-dependency timing per CLAUDE.md tunnel rules (block_until_ready
does not sync through the axon tunnel; >=50 reps amortise the ~35-40 ms
per-block round-trip).

Usage: python benchmarks/probe_encoder.py [--subjects N] [--reps R]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def timed_chained(fn, perturb, x0, sync, reps=50, warmup=2):
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
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from qbold_vi_tpu.config import OPTIMAL
    from qbold_vi_tpu.models.encoder import normalise_data
    from qbold_vi_tpu.models.vi import FineTuner
    from qbold_vi_tpu.ops.quadrature import quad_posterior_summaries

    cfg = OPTIMAL
    scan = cfg.scan
    tuner = FineTuner(cfg.model, scan, full_model=cfg.train.full_model,
                      use_blood=cfg.train.use_blood)
    enc = tuner.encoder
    dwc = float(scan.dw_coeff * scan.hct)

    rng = np.random.default_rng(0)
    shape = (args.subjects, 96, 96, 8)
    n_vox = int(np.prod(shape))
    data = jnp.asarray(np.abs(rng.normal(size=shape + (scan.n_taus,))
                              ).astype(np.float32) * 50 + 100)
    key = jax.random.PRNGKey(0)
    variables = {"params": jax.jit(tuner.init)(
        key, data[:1, :8, :8, :1])["encoder"]}

    def sync(tree):
        leaves = [x for x in jax.tree_util.tree_leaves(tree)
                  if hasattr(x, "shape")]
        x = leaves[0]
        jax.device_get(x[(0,) * x.ndim] if x.ndim else x)

    chain_im = jax.jit(lambda out, base: base + (
        jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)[..., :1]
        .reshape((-1,) + (1,) * (base.ndim - 1))[:1] * 1e-9
    ).astype(base.dtype))

    dev = jax.devices()[0].platform
    print(f"device={dev} voxels={n_vox} reps={args.reps}")

    def report(name, fn, x0):
        dt = timed_chained(fn, chain_im, x0, sync, reps=args.reps)
        print(f"{name:<18s}{dt*1e3:8.2f} ms  ({n_vox/dt/1e6:8.1f} M voxel/s)",
              flush=True)
        return dt

    # --- stages on the image input ------------------------------------
    norm = jax.jit(lambda im: normalise_data(
        im, scan.se_idx, cfg.model.multi_image_normalisation))
    report("normalise", norm, data)

    embed = jax.jit(lambda im: enc.apply(variables, im, method="embed"))
    report("embed", embed, data)

    encode = jax.jit(
        lambda im: tuner.encode({"encoder": variables["params"]}, im)[1])
    report("encode (full)", encode, data)

    # --- folded-layout stages -----------------------------------------
    b, h, w, d = shape
    feats = jax.device_put(embed(data))
    folded = jnp.moveaxis(feats, 3, 1).reshape(b * d, h, w, feats.shape[-1])
    dt16 = folded.astype(jnp.bfloat16)

    fold = jax.jit(lambda f: jnp.moveaxis(
        jnp.moveaxis(f, 3, 1).reshape(b * d, h, w, f.shape[-1]).reshape(
            b, d, h, w, f.shape[-1]), 1, 3))
    report("fold+unfold", fold, feats)

    def trunk_fn(mod, f):
        net1 = net2 = f
        for blk in mod.blocks:
            net1, net2 = blk(net1, net2, deterministic=True)
        return net2

    trunk = jax.jit(lambda f: enc.apply(variables, f, method=trunk_fn))
    report("trunk (folded)", trunk, folded)

    # --- isolated op classes at the folded shape ----------------------
    kconv = jax.random.normal(key, (3, 3, 60, 60), jnp.bfloat16) * 0.05
    kdense = jax.random.normal(key, (60, 60), jnp.bfloat16) * 0.05

    @jax.jit
    def conv4(f):
        y = f
        for _ in range(4):
            y = jax.lax.conv_general_dilated(
                y, kconv, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return y

    report("conv3x3 x4 bf16", conv4, dt16)

    @jax.jit
    def dense6(f):
        y = f
        for _ in range(6):
            y = jnp.einsum("bhwc,cd->bhwd", y, kdense,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.bfloat16)
        return y

    report("dense x6 bf16", dense6, dt16)

    def heads_fn(mod, f):
        net = f.astype(jnp.float32)
        o = mod.final(net)
        s = jnp.exp(mod.sigma_head(net))
        return o, s

    heads = jax.jit(lambda f: enc.apply(variables, f, method=heads_fn))
    report("heads (fp32)", heads, folded)

    # --- stream-1-only path (use_first_op=True: the pretrained-checkpoint
    # inference path, bench.py's headline program -- NO convs: q1 is a
    # pure voxelwise dense chain, XLA DCEs stream 2) ---------------------
    from qbold_vi_tpu.infer import _encode_q

    params_d = {"encoder": variables["params"]}
    enc1 = jax.jit(lambda im: _encode_q(tuner, params_d, im,
                                        use_first_op=True)[0])
    report("encode q1 (s1)", enc1, data)

    # --- summaries (fused kernel: TPU only) -----------------------------
    if dev not in ("tpu", "axon"):
        return
    q = jax.device_put(encode(data))
    qf = q.reshape(-1, q.shape[-1])
    quad = jax.jit(lambda qq: quad_posterior_summaries(
        qq, mvg=cfg.model.use_mvg, dw_coeff=dwc))
    report("quad kernel", quad, qf)

    @jax.jit
    def composite(im):
        qq = tuner.encode({"encoder": variables["params"]}, im)[1]
        means, _ = quad_posterior_summaries(
            qq.reshape(-1, qq.shape[-1]), mvg=cfg.model.use_mvg, dw_coeff=dwc)
        return means

    report("encode+quad", composite, data)

    @jax.jit
    def composite1(im):
        qq = _encode_q(tuner, params_d, im, use_first_op=True)[0]
        means, _ = quad_posterior_summaries(
            qq.reshape(-1, qq.shape[-1]), mvg=cfg.model.use_mvg, dw_coeff=dwc)
        return means

    report("encode1+quad", composite1, data)

    # --- fused stream-1 kernel (ops/pallas_infer.py), both layouts ------
    from qbold_vi_tpu.infer import _fused_posterior_summaries
    from qbold_vi_tpu.models.encoder import _dtype_of
    from qbold_vi_tpu.ops.pallas_infer import encode_q1_packed

    trunk = ("bfloat16" if _dtype_of(cfg.model) == jnp.bfloat16
             else "float32")
    enc_kw = dict(se_idx=scan.se_idx,
                  multi_image=cfg.model.multi_image_normalisation,
                  activation=cfg.model.activation,
                  n_blocks=cfg.model.no_intermediate_layers, trunk=trunk)

    fenc = jax.jit(lambda im: encode_q1_packed(
        im, variables["params"], **enc_kw))
    report("fused encode", fenc, data)

    ffull = jax.jit(lambda im: _fused_posterior_summaries(
        tuner, params_d, im)[0])
    report("fused enc+quad", ffull, data)

    # the production serving layout (posterior_maps uploads chunks
    # channel-major; the padded voxel-major tiles DMA at ~1/3 the rate)
    from qbold_vi_tpu.infer import to_channel_major

    data_cm = jax.device_put(jnp.asarray(to_channel_major(np.asarray(data))))

    fenc_cm = jax.jit(lambda im: encode_q1_packed(
        im, variables["params"], input_layout="channel", **enc_kw))
    report("fused encode cm", fenc_cm, data_cm)

    ffull_cm = jax.jit(lambda im: _fused_posterior_summaries(
        tuner, params_d, im, input_layout="channel")[0])
    report("fused e+q cm", ffull_cm, data_cm)


if __name__ == "__main__":
    main()
