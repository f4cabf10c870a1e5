"""Gate the Pallas 3x3 trunk conv (ops/pallas_conv.py) against nn.Conv.

The kernel is PRNG-free, so value AND closed-form-VJP gradients are
gated on CPU through the Mosaic interpreter -- standalone op, under
vmap (shared and per-trial weights, the population-sweep modes), and
at the encoder level (fused_conv='interpret' vs 'off' over the whole
FineTuner.encode pass and a fine-tune loss grad).
"""

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import ModelConfig, QBoldConfig, ScanParams, TrainConfig
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.ops.pallas_conv import conv3x3_available, make_conv3x3

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="Mosaic interpreter mode unavailable on remote TPU backends")

SCAN = ScanParams(simulate_noise=False)


def _ref(x, k, b):
    mod = nn.Conv(k.shape[-1], (3, 3), padding="SAME")
    return mod.apply({"params": {"kernel": k, "bias": b}}, x)


def _data(rng, n=5, h=7, w=6, ci=4, co=3):
    x = jnp.asarray(rng.normal(size=(n, h, w, ci)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(3, 3, ci, co)).astype(np.float32)
                    * 0.2)
    b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
    return x, k, b


def test_value_and_grads_match_nn_conv(rng):
    x, k, b = _data(rng)
    conv = make_conv3x3(7, 6, 4, 3, interpret=True)
    np.testing.assert_allclose(np.asarray(conv(x, k, b)),
                               np.asarray(_ref(x, k, b)),
                               rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.normal(size=(5, 7, 6, 3)).astype(np.float32))
    g_p = jax.grad(lambda *a: jnp.sum(conv(*a) * ct), argnums=(0, 1, 2))(
        x, k, b)
    g_r = jax.grad(lambda *a: jnp.sum(_ref(*a) * ct), argnums=(0, 1, 2))(
        x, k, b)
    for a, r, name in zip(g_p, g_r, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=1e-4, atol=1e-5, err_msg=name)


def test_plane_blocking_ragged_and_single(rng):
    """N not a multiple of _FWD_PLANES (the zero-padded tail planes are
    sliced off) and N=1 both match."""
    for n in (1, 5, 9):
        x, k, b = _data(rng, n=n)
        conv = make_conv3x3(7, 6, 4, 3, interpret=True)
        np.testing.assert_allclose(np.asarray(conv(x, k, b)),
                                   np.asarray(_ref(x, k, b)),
                                   rtol=1e-5, atol=1e-5, err_msg=str(n))


def test_vmap_shared_and_per_trial_weights(rng):
    """Population-sweep batching: a leading trial axis folds into the
    plane axis (shared weights) or the kernel's group grid axis
    (per-trial weights); gradients match vmapped nn.Conv in both."""
    p_n = 3
    conv = make_conv3x3(7, 6, 4, 3, interpret=True)
    xs = jnp.stack([_data(rng)[0] for _ in range(p_n)])
    ks = jnp.stack([_data(rng)[1] for _ in range(p_n)])
    bs = jnp.stack([_data(rng)[2] for _ in range(p_n)])
    cts = jnp.asarray(rng.normal(size=(p_n, 5, 7, 6, 3)).astype(np.float32))

    def lp(x, k, b, c):
        return jnp.sum(conv(x, k, b) * c)

    def lr(x, k, b, c):
        return jnp.sum(_ref(x, k, b) * c)

    g_p = jax.jit(jax.vmap(jax.grad(lp, argnums=(0, 1, 2))))(
        xs, ks, bs, cts)
    g_r = jax.jit(jax.vmap(jax.grad(lr, argnums=(0, 1, 2))))(
        xs, ks, bs, cts)
    for a, r, name in zip(g_p, g_r, ("dx", "dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=1e-4, err_msg=name)

    # shared weights: grads THROUGH the vmap sum over trials
    k0, b0 = ks[0], bs[0]

    def sum_p(k, b):
        return jnp.sum(jax.vmap(
            lambda xx, cc: jnp.sum(conv(xx, k, b) * cc))(xs, cts))

    def sum_r(k, b):
        return jnp.sum(jax.vmap(
            lambda xx, cc: jnp.sum(_ref(xx, k, b) * cc))(xs, cts))

    gw_p = jax.jit(jax.grad(sum_p, argnums=(0, 1)))(k0, b0)
    gw_r = jax.jit(jax.grad(sum_r, argnums=(0, 1)))(k0, b0)
    # rtol 2e-3: the plane-block fp32 accumulators sum in a different
    # order than XLA's conv-transpose reduction
    for a, r, name in zip(gw_p, gw_r, ("dw", "db")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(r),
                                   rtol=2e-3, atol=1e-4, err_msg=name)

    # vmap-of-GRAD with shared weights: each element must receive ITS
    # OWN dw, not the cross-trial sum (review finding, round 5 -- the
    # fold-shared shortcut returned the summed dw to every element)
    gk_p = jax.jit(jax.vmap(lambda x, c: jax.grad(
        lambda kk: jnp.sum(conv(x, kk, b0) * c))(k0)))(xs, cts)
    gk_r = jax.jit(jax.vmap(lambda x, c: jax.grad(
        lambda kk: jnp.sum(_ref(x, kk, b0) * c))(k0)))(xs, cts)
    np.testing.assert_allclose(np.asarray(gk_p), np.asarray(gk_r),
                               rtol=2e-3, atol=1e-4,
                               err_msg="per-element dw under shared-k "
                                       "vmap-of-grad")


def test_availability_and_forced_raises():
    assert conv3x3_available(3, 3) and conv3x3_available(25, 25)
    assert not conv3x3_available(2, 5) and not conv3x3_available(5, 2)
    cfg = ModelConfig(no_units=4, no_intermediate_layers=1,
                      fused_conv="bogus")
    tuner = FineTuner(cfg, SCAN)
    with pytest.raises(ValueError, match="fused_conv"):
        tuner.init(jax.random.PRNGKey(0),
                   jnp.zeros((1, 6, 6, 2, SCAN.n_taus)))


def test_encoder_level_equality_and_loss_grads(rng):
    """fused_conv='interpret' vs 'off' over FineTuner.encode AND a full
    fine-tune loss gradient: same params (the trees are identical by
    construction -- _ConvImpl subclasses nn.Conv under the same name),
    matching outputs and parameter gradients."""
    from qbold_vi_tpu.train.steps import _finetune_terms

    mk = dict(no_units=4, no_intermediate_layers=2, use_mvg=True,
              student_t_df=200.0, predict_log_data=False)
    cfg_o = QBoldConfig(scan=SCAN, model=ModelConfig(**mk),
                        train=TrainConfig())
    cfg_f = QBoldConfig(
        scan=SCAN, model=ModelConfig(fused_conv="interpret", **mk),
        train=TrainConfig())
    t_o = FineTuner(cfg_o.model, SCAN)
    t_f = FineTuner(cfg_f.model, SCAN)
    img = jnp.asarray((np.abs(rng.normal(size=(2, 8, 6, 2, SCAN.n_taus)))
                       * 50 + 100).astype(np.float32))
    mask = jnp.ones((2, 8, 6, 2, 1), jnp.float32)
    priors = jnp.asarray(rng.normal(size=(2, 8, 6, 2, 5)
                                    ).astype(np.float32) * 0.3)
    params = t_o.init(jax.random.PRNGKey(1), img[:1])

    for a, b in zip(t_o.encode(params, img), t_f.encode(params, img)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)

    batch = {"images": img * mask, "mask": mask, "priors": priors}
    key = jax.random.PRNGKey(3)

    def loss(cfg, tuner):
        def f(p):
            total, _ = _finetune_terms(p, key, batch, tuner, cfg,
                                       kl_samples=4)
            return total
        return f

    v_o, g_o = jax.value_and_grad(loss(cfg_o, t_o))(params)
    v_f, g_f = jax.value_and_grad(loss(cfg_f, t_f))(params)
    np.testing.assert_allclose(float(v_f), float(v_o), rtol=2e-5)
    for (kp, a), (_, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_o)[0],
            jax.tree_util.tree_flatten_with_path(g_f)[0]):
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale,
                                   rtol=5e-5, atol=5e-5,
                                   err_msg=jax.tree_util.keystr(kp))


def test_small_plane_falls_back_to_xla(rng):
    """A 2-wide plane (smaller than the window) silently uses nn.Conv
    under auto/on -- only forced 'interpret' raises."""
    cfg = ModelConfig(no_units=4, no_intermediate_layers=1,
                      fused_conv="on")
    tuner = FineTuner(cfg, SCAN)
    img = jnp.asarray((np.abs(rng.normal(size=(1, 2, 2, 1, SCAN.n_taus)))
                       + 0.5).astype(np.float32))
    params = tuner.init(jax.random.PRNGKey(0), img)
    out = tuner.encode(params, img)
    assert all(np.all(np.isfinite(np.asarray(o))) for o in out)
