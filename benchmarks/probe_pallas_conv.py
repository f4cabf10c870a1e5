"""A/B the Pallas 3x3 conv (ops/pallas_conv.py) against XLA's native
conv at the published folded trunk shape (304, 25, 25, 60), bf16 and
fp32, fwd and fwd+bwd -- the round-5 BUILD decision's measurement
(RESULTS.md "Fine-tune step split probe").

Run on the TPU chip: python benchmarks/probe_pallas_conv.py
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

from qbold_vi_tpu.ops.pallas_conv import make_conv3x3
from qbold_vi_tpu.utils.profiling import sync


def timed_chained(fn, perturb, x0, reps=50, warmup=2):
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
    N, H, W, C = 304, 25, 25, 60
    rng = np.random.default_rng(0)
    out = {}
    for dt_name, dt in (("bf16", jnp.bfloat16), ("fp32", jnp.float32)):
        x0 = jnp.asarray(rng.normal(size=(N, H, W, C)), dtype=dt)
        k = jnp.asarray(rng.normal(size=(3, 3, C, C)) * 0.05, dtype=dt)
        b = jnp.zeros((C,), dt)
        conv_p = make_conv3x3(H, W, C, C)

        @jax.jit
        def f_pallas(x):
            return conv_p(x, k, b)

        @jax.jit
        def f_xla(x):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32).astype(dt) + b

        @jax.jit
        def g_pallas(x):
            return jax.grad(
                lambda xx: jnp.sum(conv_p(xx, k, b).astype(jnp.float32)))(x)

        @jax.jit
        def g_xla(x):
            # no preferred_element_type: its VJP feeds an fp32 cotangent
            # into a bf16 transpose-conv and conv_general_dilated rejects
            # the mixed dtypes; XLA accumulates f32 internally anyway
            return jax.grad(lambda xx: jnp.sum(jax.lax.conv_general_dilated(
                xx, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")).astype(
                    jnp.float32)))(x)

        @jax.jit
        def vg_pallas(x):
            def loss(kk, bb):
                return jnp.sum(conv_p(x, kk, bb).astype(jnp.float32))
            return jax.grad(loss, argnums=(0, 1))(k, b)

        def pert(y, x_0):
            return x_0 + 1e-12 * jnp.sum(y[0] if isinstance(y, tuple)
                                         else y).astype(dt)

        for label, fn in (("fwd_pallas", f_pallas), ("fwd_xla", f_xla),
                          ("dx_pallas", g_pallas), ("dx_xla", g_xla),
                          ("dw_pallas", vg_pallas)):
            try:
                t = timed_chained(fn, pert, x0)
                out[f"{label}_{dt_name}_ms"] = t * 1e3
                print(f"{label} {dt_name}: {t*1e3:7.3f} ms", flush=True)
            except Exception as e:   # noqa: BLE001 - probe must report
                out[f"{label}_{dt_name}_ms"] = None
                print(f"{label} {dt_name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:500]}", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
