"""Probe: 3x3 conv formulations at the fine-tune crop shape (TPU).

The fused ELBO kernel + cheb surrogate left the encoder's conv
backward as the fine-tune step's dominant term (benchmarks/RESULTS.md
round-3 sessions 3-5). Earlier probes showed the conv FORWARD at the
25x25 crop shape is bound by window/layout handling, not MXU rate.
This probe times, fwd and fwd+bwd, at the folded crop shape
(B*z, 25, 25, C):

  a. lax.conv_general_dilated (what flax nn.Conv emits today)
  b. 9-shift: pad + 9 shifted (N*H*W, C) x (C, C) matmuls, accumulated
  c. im2col: one (N*H*W, 9C) x (9C, C) matmul (contraction dim 540
     fills MXU tiles that K=60 leaves 53% empty)

All three are algebraically the same conv (gated to 1e-2 in bf16 /
1e-5 fp32 before timing). Steady-state timing per CLAUDE.md tunnel
rules: chained deps, one device_get per block, >=50 reps, interleaved
A/B blocks so tunnel drift cannot masquerade as a formulation delta.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

B, H, W, C = 38 * 8, 25, 25, 60
DTYPE = jnp.bfloat16
REPS = 50
BLOCKS = 3


def conv_lax(x, w):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def conv_shift9(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = None
    for di in range(3):
        for dj in range(3):
            xs = jax.lax.dynamic_slice(xp, (0, di, dj, 0), (B, H, W, C))
            term = jnp.einsum("nhwc,cd->nhwd", xs, w[di, dj])
            acc = term if acc is None else acc + term
    return acc


def conv_im2col(x, w):
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    cols = jnp.concatenate(
        [jax.lax.dynamic_slice(xp, (0, di, dj, 0), (B, H, W, C))
         for di in range(3) for dj in range(3)], axis=-1)  # (B,H,W,9C)
    wf = w.reshape(9 * C, C)
    return jnp.einsum("nhwk,kd->nhwd", cols, wf)


def timed(fn, x, w, grad):
    if grad:
        f = jax.jit(jax.grad(lambda xx, ww: jnp.sum(
            jnp.square(fn(xx, ww).astype(jnp.float32))), argnums=(0, 1)))

        def step(xx):
            gx, gw = f(xx, w)
            return xx + 1e-7 * gx.astype(xx.dtype)
    else:
        f = jax.jit(fn)

        def step(xx):
            return xx + 1e-7 * f(xx, w)
    xx = x
    xx = step(xx)
    xx = step(xx)
    jax.device_get(xx.reshape(-1)[:1])
    out = []
    for _ in range(BLOCKS):
        t0 = time.perf_counter()
        for _ in range(REPS):
            xx = step(xx)
        jax.device_get(xx.reshape(-1)[:1])
        out.append((time.perf_counter() - t0) / REPS)
    return out


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, H, W, C)), DTYPE)
    w = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, DTYPE)

    ra = np.asarray(conv_lax(x, w), np.float32)
    for name, fn in (("shift9", conv_shift9), ("im2col", conv_im2col)):
        rb = np.asarray(fn(x, w), np.float32)
        err = np.max(np.abs(ra - rb)) / max(np.max(np.abs(ra)), 1e-6)
        print(f"parity {name}: rel err {err:.2e}")
        assert err < (3e-2 if DTYPE == jnp.bfloat16 else 1e-5)

    fns = [("lax   ", conv_lax), ("shift9", conv_shift9),
           ("im2col", conv_im2col)]
    for grad in (False, True):
        tag = "fwd+bwd" if grad else "fwd    "
        # interleave: one block each, repeated, so tunnel drift averages
        results = {n: [] for n, _ in fns}
        for _ in range(BLOCKS):
            for n, fn in fns:
                results[n].extend(timed(fn, x, w, grad)[:1])
        for n, _ in fns:
            ms = np.median(results[n]) * 1e3
            print(f"{tag} {n}: {ms:.3f} ms/conv (median of "
                  f"{len(results[n])} interleaved blocks)")


if __name__ == "__main__":
    main()
