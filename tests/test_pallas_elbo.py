"""Gate the fused ELBO kernel (sample + decode + NLL + KL) against the
jnp path.

In ``noise='host'`` mode the kernel consumes the SAME normals the jnp
path draws (identical key-split structure), so the full fine-tune loss
-- value AND gradients w.r.t. every parameter leaf, the prior map and
sigma -- is gated exactly through the Mosaic interpreter on CPU. The
on-chip-PRNG production mode shares its generator with the summarize
kernel and is gated statistically here and end-to-end on chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import ModelConfig, QBoldConfig, ScanParams, TrainConfig
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.ops.pallas_elbo import fused_elbo_available, make_fused_elbo
from qbold_vi_tpu.train.steps import _finetune_terms

pytestmark = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="Mosaic interpreter mode unavailable on remote TPU backends")

SCAN = ScanParams(simulate_noise=False)


def _cfg(no_samples=1, **model_kw):
    model_kw.setdefault("student_t_df", 200.0)
    model_kw.setdefault("predict_log_data", False)
    model_kw.setdefault("multi_image_normalisation", False)
    model_kw.setdefault("use_mvg", True)
    return QBoldConfig(
        scan=SCAN,
        model=ModelConfig(no_units=4, no_intermediate_layers=1,
                          no_samples=no_samples, **model_kw),
        train=TrainConfig())


def _batch(rng, b=1, x=8, y=4, z=1, holes=True, k=5):
    img = jnp.asarray((np.abs(rng.normal(size=(b, x, y, z, SCAN.n_taus)))
                       * 50 + 100).astype(np.float32))
    if holes:
        mask = jnp.asarray((rng.uniform(size=(b, x, y, z, 1)) > 0.2
                            ).astype(np.float32))
    else:
        mask = jnp.ones((b, x, y, z, 1), jnp.float32)
    priors = jnp.asarray(rng.normal(size=(b, x, y, z, k)
                                    ).astype(np.float32) * 0.3)
    return {"images": img * mask, "mask": mask, "priors": priors}


def _terms(cfg, tuner, params, key, batch, mode, kl_samples=8):
    c = QBoldConfig(scan=cfg.scan, synth=cfg.synth, model=cfg.model,
                    train=TrainConfig(fused_elbo=mode,
                                      fused_decode_nll="off"))
    return _finetune_terms(params, key, batch, tuner, c,
                           kl_samples=kl_samples)


# the cases cover every kernel branch (interpret mode costs ~1 min per
# case, so variants are combined): published optimal; Student-t +
# multi-image window + S>1; log-domain + learned population prior;
# DIAGONAL posterior (analytic in-kernel KL, round-4 extension) plain
# and with Student-t + S>1
@pytest.mark.parametrize("kw", [
    dict(),                                             # published optimal
    dict(student_t_df=2.0, multi_image_normalisation=True, no_samples=2),
    dict(predict_log_data=True, use_population_prior=True),
    dict(use_mvg=False),                                # diagonal
    dict(use_mvg=False, student_t_df=2.0, no_samples=2),
])
def test_host_noise_full_loss_exact(rng, kw):
    """The fused ELBO total and ALL parameter gradients (encoder +
    pop_prior when present) match the pure-jnp path bit-compatibly."""
    s = kw.pop("no_samples", 1)
    cfg = _cfg(no_samples=s, **kw)
    tuner = FineTuner(cfg.model, SCAN)
    assert fused_elbo_available(cfg.model, SCAN, True, True)
    batch = _batch(rng, k=5 if cfg.model.use_mvg else 4)
    params = tuner.init(jax.random.PRNGKey(7), batch["images"][:1])
    key = jax.random.PRNGKey(3)

    def loss(p, mode):
        return _terms(cfg, tuner, p, key, batch, mode)[0]

    v_ref, g_ref = jax.value_and_grad(loss)(params, "off")
    v_fus, g_fus = jax.value_and_grad(loss)(params, "host-interpret")
    np.testing.assert_allclose(float(v_fus), float(v_ref),
                               rtol=1e-5, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                    jax.tree_util.tree_leaves(g_ref)):
        scale = np.abs(np.asarray(b)).max() + 1e-8
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=5e-4, atol=5e-5)


def test_host_noise_aux_terms_match(rng):
    """nll / kl / sigma aux terms individually match the jnp path."""
    cfg = _cfg()
    tuner = FineTuner(cfg.model, SCAN)
    batch = _batch(rng)
    params = tuner.init(jax.random.PRNGKey(1), batch["images"][:1])
    key = jax.random.PRNGKey(11)
    _, aux_ref = _terms(cfg, tuner, params, key, batch, "off")
    _, aux_fus = _terms(cfg, tuner, params, key, batch, "host-interpret")
    for k in ("nll", "kl", "smoothness", "sigma"):
        np.testing.assert_allclose(float(aux_fus[k]), float(aux_ref[k]),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"aux term {k}")


def test_kl_rows_match_streamed_kl(rng):
    """Direct row-level gate: the kernel's per-voxel KL rows equal
    dist.mvg_kl_samples (streamed custom-VJP form) given the same key
    stream, in value and in q/p gradients."""
    cfg = _cfg()
    dist = FineTuner(cfg.model, SCAN).dist
    n, s_kl = 64, 4
    q = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.5)
    p = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.5)
    y = jnp.asarray((np.abs(rng.normal(size=(n, SCAN.n_taus))) + 0.4
                     ).astype(np.float32))
    sig = jnp.full((n, SCAN.n_taus), 0.08, jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    key = jax.random.PRNGKey(5)
    z_kl = jax.vmap(lambda k: jax.random.normal(k, (n, 2)))(
        jax.random.split(key, s_kl))
    z_nll = jax.random.normal(jax.random.PRNGKey(9), (1, n, 2))

    fused = make_fused_elbo(cfg.model, SCAN, s_nll=1, s_kl=s_kl,
                            noise="host", interpret=True, lanes=128)

    def kern_kl(qq, pp):
        _, kl_rows = fused(qq, pp, y, sig, mask, z_nll, z_kl)
        return kl_rows

    def jnp_kl(qq, pp):
        return dist.mvg_kl_samples(key, qq, pp, no_samples=s_kl)

    np.testing.assert_allclose(np.asarray(kern_kl(q, p)),
                               np.asarray(jnp_kl(q, p)),
                               rtol=2e-5, atol=2e-6)
    gk = jax.grad(lambda qq, pp: jnp.sum(kern_kl(qq, pp)), argnums=(0, 1))(q, p)
    gj = jax.grad(lambda qq, pp: jnp.sum(jnp_kl(qq, pp)), argnums=(0, 1))(q, p)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_diag_kl_rows_match_analytic(rng):
    """Diagonal kernel variant: the per-voxel KL rows equal
    dist.diag_kl (the analytic logit-Normal KL, reference
    model.py:692-710) exactly, in value and in q/p gradients."""
    cfg = _cfg(use_mvg=False)
    dist = FineTuner(cfg.model, SCAN).dist
    n = 64
    q = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32) * 0.5)
    p = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32) * 0.5)
    y = jnp.asarray((np.abs(rng.normal(size=(n, SCAN.n_taus))) + 0.4
                     ).astype(np.float32))
    sig = jnp.full((n, SCAN.n_taus), 0.08, jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    z_nll = jax.random.normal(jax.random.PRNGKey(9), (1, n, 2))

    fused = make_fused_elbo(cfg.model, SCAN, s_nll=1, s_kl=8,
                            noise="host", interpret=True, lanes=128)

    def kern_kl(qq, pp):
        _, kl_rows = fused(qq, pp, y, sig, mask, z_nll)
        return kl_rows

    def jnp_kl(qq, pp):
        return dist.diag_kl(qq, pp)

    np.testing.assert_allclose(np.asarray(kern_kl(q, p)),
                               np.asarray(jnp_kl(q, p)),
                               rtol=2e-5, atol=2e-6)
    gk = jax.grad(lambda qq, pp: jnp.sum(kern_kl(qq, pp)),
                  argnums=(0, 1))(q, p)
    gj = jax.grad(lambda qq, pp: jnp.sum(jnp_kl(qq, pp)),
                  argnums=(0, 1))(q, p)
    for a, b in zip(gk, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


def test_device_noise_smoke(rng):
    """On-chip-PRNG mode through the interpreter: parses, lowers and
    executes with finite outputs/grads. (The interpreter STUBS the TPU
    PRNG -- prng_random_bits returns zeros -- so the statistical gate
    against the jnp sampled KL runs on the real chip,
    tests/test_pallas.py::test_elbo_kernel_device_noise_statistical.)"""
    cfg = _cfg()
    n, s_kl = 64, 4
    q = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.5)
    p = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.5)
    y = jnp.asarray((np.abs(rng.normal(size=(n, SCAN.n_taus))) + 0.4
                     ).astype(np.float32))
    sig = jnp.full((n, SCAN.n_taus), 0.08, jnp.float32)
    mask = jnp.ones((n,), jnp.float32)

    fused = make_fused_elbo(cfg.model, SCAN, s_nll=1, s_kl=s_kl,
                            noise="device", interpret=True, lanes=128)
    nll_rows, kl_rows = fused(q, p, y, sig, mask, jnp.int32(123))
    assert np.all(np.isfinite(np.asarray(nll_rows)))
    assert np.all(np.isfinite(np.asarray(kl_rows)))
    g = jax.grad(lambda qq: jnp.sum(fused(qq, p, y, sig, mask,
                                          jnp.int32(7))[0] +
                                    fused(qq, p, y, sig, mask,
                                          jnp.int32(7))[1]))(q)
    assert np.all(np.isfinite(np.asarray(g)))


def test_masked_rows_are_zero(rng):
    """Both output rows are exactly zero at masked voxels and padding
    never leaks NaN into real rows."""
    cfg = _cfg()
    n = 40
    q = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32))
    y = jnp.asarray((np.abs(rng.normal(size=(n, SCAN.n_taus))) + 0.4
                     ).astype(np.float32))
    sig = jnp.full((n, SCAN.n_taus), 0.08, jnp.float32)
    mask = jnp.asarray((rng.uniform(size=n) > 0.5).astype(np.float32))
    fused = make_fused_elbo(cfg.model, SCAN, s_nll=2, s_kl=4,
                            noise="host", interpret=True, lanes=128)
    z_nll = jax.random.normal(jax.random.PRNGKey(0), (2, n, 2))
    z_kl = jax.random.normal(jax.random.PRNGKey(1), (4, n, 2))
    nll_rows, kl_rows = fused(q, p, y, sig, mask, z_nll, z_kl)
    nll_rows, kl_rows = np.asarray(nll_rows), np.asarray(kl_rows)
    assert np.all(np.isfinite(nll_rows)) and np.all(np.isfinite(kl_rows))
    off = np.asarray(mask) == 0
    assert np.all(nll_rows[off] == 0.0) and np.all(kl_rows[off] == 0.0)


@pytest.mark.parametrize("mvg", [True, False])
def test_vmap_trial_fold_bit_exact(rng, mvg):
    """Population support (round-4 verdict #1): under jax.vmap the
    custom-VJP fwd/bwd fire their custom_vmap rules, folding the trial
    axis into the flat voxel-row axis and running ONE (P*N)-row kernel.
    The kernel is row-local, so in host-noise mode every trial's value
    AND gradients must be BIT-equal to the serial per-trial calls."""
    cfg = _cfg(use_mvg=mvg)
    p_n, n, s_kl = 3, 40, 4
    k = 5 if mvg else 4
    q = jnp.asarray(rng.normal(size=(p_n, n, k)).astype(np.float32) * 0.3)
    p = jnp.asarray(rng.normal(size=(p_n, n, k)).astype(np.float32) * 0.3)
    y = jnp.asarray((np.abs(rng.normal(size=(p_n, n, SCAN.n_taus))) + 0.4
                     ).astype(np.float32))
    sig = jnp.full((p_n, n, SCAN.n_taus), 0.08, jnp.float32)
    mask = jnp.asarray((rng.uniform(size=(p_n, n)) > 0.2
                        ).astype(np.float32))
    zn = jnp.asarray(rng.normal(size=(p_n, 1, n, 2)).astype(np.float32))
    zk = jnp.asarray(rng.normal(size=(p_n, s_kl, n, 2)).astype(np.float32))

    fused = make_fused_elbo(cfg.model, SCAN, s_nll=1, s_kl=s_kl,
                            noise="host", interpret=True, lanes=128)
    zs = (zn, zk) if mvg else (zn,)

    def loss(q, p, y, sig, mask, *zs):
        nll, kl = fused(q, p, y, sig, mask, *zs)
        return jnp.sum(nll) + 0.7 * jnp.sum(kl)

    vg = jax.jit(jax.vmap(jax.value_and_grad(loss, argnums=(0, 1, 2, 3))))
    v_b, g_b = vg(q, p, y, sig, mask, *zs)
    sg = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2, 3)))
    for i in range(p_n):
        v_i, g_i = sg(q[i], p[i], y[i], sig[i], mask[i],
                      *(z[i] for z in zs))
        np.testing.assert_array_equal(np.asarray(v_b)[i], np.asarray(v_i))
        for a, b, name in zip(g_b, g_i, ("q", "p", "y", "sigma")):
            np.testing.assert_array_equal(np.asarray(a)[i], np.asarray(b),
                                          err_msg=name)


def test_vmap_trial_fold_device_noise_and_shared_args(rng):
    """Device-noise fold: per-trial seeds mix into one stream seed
    (noise stays per-row independent); value/grads finite. Also checks
    partial batching -- y/sigma/mask shared across trials broadcast
    inside the fold rule."""
    cfg = _cfg()
    p_n, n, s_kl = 2, 32, 3
    q = jnp.asarray(rng.normal(size=(p_n, n, 5)).astype(np.float32) * 0.3)
    p = jnp.asarray(rng.normal(size=(p_n, n, 5)).astype(np.float32) * 0.3)
    y = jnp.asarray((np.abs(rng.normal(size=(n, SCAN.n_taus))) + 0.4
                     ).astype(np.float32))
    sig = jnp.full((n, SCAN.n_taus), 0.08, jnp.float32)
    mask = jnp.ones((n,), jnp.float32)
    seeds = jnp.arange(p_n, dtype=jnp.int32) + 17

    fused = make_fused_elbo(cfg.model, SCAN, s_nll=1, s_kl=s_kl,
                            noise="device", interpret=True, lanes=128)

    def loss(q, p, y, sig, mask, seed):
        nll, kl = fused(q, p, y, sig, mask, seed)
        return jnp.sum(nll) + jnp.sum(kl)

    v, g = jax.jit(jax.vmap(jax.value_and_grad(loss, argnums=(0, 1)),
                            in_axes=(0, 0, None, None, None, 0)))(
        q, p, y, sig, mask, seeds)
    assert v.shape == (p_n,) and np.all(np.isfinite(np.asarray(v)))
    for a in g:
        assert a.shape[0] == p_n and np.all(np.isfinite(np.asarray(a)))


def test_forced_on_uncovered_config_raises():
    # diagonal + population prior: the one remaining exclusion (its KL
    # adds a whole-map hyperprior cost, model.py:712-716 -- not a
    # per-voxel row); plain diagonal is covered since round 4
    cfg = QBoldConfig(
        scan=SCAN,
        model=ModelConfig(use_mvg=False, use_population_prior=True),
        train=TrainConfig(fused_elbo="on"))
    tuner = FineTuner(cfg.model, SCAN)
    from qbold_vi_tpu.train.steps import _fused_elbo_fn
    with pytest.raises(ValueError, match="not covered"):
        _fused_elbo_fn(tuner, cfg, 1, 8)
    assert not fused_elbo_available(cfg.model, SCAN, True, True)
    assert fused_elbo_available(ModelConfig(use_mvg=False), SCAN, True, True)
    cfg2 = QBoldConfig(scan=SCAN, model=ModelConfig(use_mvg=True),
                       train=TrainConfig(fused_elbo="bogus"))
    with pytest.raises(ValueError, match="fused_elbo must be"):
        _fused_elbo_fn(FineTuner(cfg2.model, SCAN), cfg2, 1, 8)
