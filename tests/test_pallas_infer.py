"""Gate the fused stream-1 inference encode kernel (ops/pallas_infer.py).

Interpret-mode gates run on every backend: the kernel's q output against
the flax encoder (infer._encode_q), the fully fused composition
(_fused_posterior_summaries) against the jnp quadrature path, the
posterior_maps integration, and the shard_map composition on the
8-virtual-device CPU mesh. The on-chip gates (real Mosaic compile)
live at the bottom behind tpu_only.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import OPTIMAL, ModelConfig, ScanParams
from qbold_vi_tpu.infer import (_encode_q, _fused_posterior_summaries,
                                _resolve_fused_infer, _summarize,
                                posterior_maps)
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.ops.pallas_infer import encode_q1_packed

tpu_only = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="real Mosaic compile",
)
# Mosaic interpreter mode is unavailable under the remote TPU backend
# (same stance as tests/test_pallas_elbo.py / test_pallas_decode.py).
cpu_only = pytest.mark.skipif(
    jax.default_backend() in ("tpu", "axon"),
    reason="Mosaic interpreter mode unavailable on remote TPU backends",
)

SCAN = ScanParams(simulate_noise=False)


def _images(rng, shape=(2, 5, 6, 3), scan=SCAN):
    return jnp.asarray(
        np.abs(rng.normal(size=shape + (scan.n_taus,))).astype(np.float32)
        * 50.0 + 100.0)


def _fused_q(images, params, cfg, scan, trunk="float32"):
    q_t = encode_q1_packed(
        images, params["encoder"], se_idx=scan.se_idx,
        multi_image=cfg.multi_image_normalisation,
        activation=cfg.activation, n_blocks=cfg.no_intermediate_layers,
        trunk=trunk, rows=64, pad_multiple=64, interpret=True)
    n = int(np.prod(images.shape[:-1]))
    return np.asarray(q_t[:, :n]).T.reshape(images.shape[:-1] + (5,))


@cpu_only
@pytest.mark.parametrize("mvg,multi,act,units,blocks", [
    (True, False, "relu", 60, 2),      # the published OPTIMAL shape
    (True, True, "relu", 60, 2),
    (False, True, "gelu", 30, 1),
    (True, False, "tanh", 12, 3),      # units not a multiple of 8
    (True, False, "relu", 128, 3),     # sublane-filling wide model
])
def test_encode_kernel_matches_flax(rng, mvg, multi, act, units, blocks):
    cfg = ModelConfig(use_mvg=mvg, multi_image_normalisation=multi,
                      activation=act, no_units=units,
                      no_intermediate_layers=blocks,
                      compute_dtype="float32")
    tuner = FineTuner(cfg, SCAN)
    images = _images(rng)
    params = tuner.init(jax.random.PRNGKey(0), images)
    q_ref, _ = _encode_q(tuner, params, images)
    got = _fused_q(images, params, cfg, SCAN)
    k = q_ref.shape[-1]
    np.testing.assert_allclose(got[..., :k], np.asarray(q_ref),
                               rtol=1e-5, atol=2e-5)
    if k == 4:
        assert np.all(got[..., 4] == 0.0)


@cpu_only
def test_merged_kernel_multi_tile_bijection(rng):
    """The merged kernel's per-tile (5, R) -> (5, 8, R/8) voxel re-split
    and the wrapper's inverting reshape must agree ACROSS grid tiles:
    gate a ragged N spanning several small tiles against the jnp path
    voxel by voxel (a bijection bug that only scrambles across tile
    boundaries would pass any single-tile test)."""
    from qbold_vi_tpu.ops.pallas_infer import encode_quad_fused
    from qbold_vi_tpu.ops.quadrature import posterior_summaries_quadrature

    cfg = dataclasses.replace(OPTIMAL.model, compute_dtype="float32")
    tuner = FineTuner(cfg, SCAN)
    images = _images(rng, shape=(1, 19, 17, 1))   # N=323 over 64-row tiles
    params = tuner.init(jax.random.PRNGKey(12), images)
    dwc = float(SCAN.dw_coeff * SCAN.hct)
    m_t, v_t, _ = encode_quad_fused(
        images, params["encoder"], se_idx=SCAN.se_idx,
        multi_image=cfg.multi_image_normalisation,
        activation=cfg.activation, n_blocks=cfg.no_intermediate_layers,
        trunk="float32", mvg=cfg.use_mvg, oef_range=cfg.oef_range,
        min_oef=cfg.min_oef, dbv_range=cfg.dbv_range,
        min_dbv=cfg.min_dbv, dw_coeff=dwc, rows=64, interpret=True)
    q_ref, _ = _encode_q(tuner, params, images)
    means_ref, vars_ref = posterior_summaries_quadrature(
        q_ref, mvg=cfg.use_mvg, oef_range=cfg.oef_range,
        min_oef=cfg.min_oef, dbv_range=cfg.dbv_range,
        min_dbv=cfg.min_dbv, dw_coeff=dwc)
    n = int(np.prod(images.shape[:-1]))
    np.testing.assert_allclose(
        np.asarray(m_t)[:, :n].T,
        np.asarray(means_ref).reshape(-1, 3), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(
        np.asarray(v_t)[:, :n].T,
        np.asarray(vars_ref).reshape(-1, 3), rtol=1e-3, atol=3e-5)


@cpu_only
def test_encode_kernel_24tau_protocol(rng):
    """The streamlined 24-tau protocol (reference loglinear.py:149-152):
    a wider tau axis with a different spin-echo index."""
    scan = ScanParams(tau_start=-0.028, tau_end=0.065, tau_step=0.004,
                      simulate_noise=False)
    assert scan.n_taus == 24 and scan.se_idx == 7
    cfg = ModelConfig(use_mvg=True, multi_image_normalisation=True,
                      activation="relu", no_units=24,
                      no_intermediate_layers=2, compute_dtype="float32")
    tuner = FineTuner(cfg, scan)
    images = _images(rng, scan=scan)
    params = tuner.init(jax.random.PRNGKey(11), images)
    q_ref, _ = _encode_q(tuner, params, images)
    got = _fused_q(images, params, cfg, scan)
    np.testing.assert_allclose(got[..., :5], np.asarray(q_ref),
                               rtol=1e-5, atol=2e-5)


@cpu_only
def test_encode_kernel_ragged_n_and_se0(rng):
    """Voxel counts that don't divide the tile, and the se_idx=0 grid
    edge (tau grid starting at 0: the 3-image window clamps to [0:2],
    same guard as normalise_data)."""
    scan = ScanParams(tau_start=0.0, tau_end=0.065, tau_step=0.008,
                      simulate_noise=False)
    assert scan.se_idx == 0
    cfg = ModelConfig(use_mvg=True, multi_image_normalisation=True,
                      activation="relu", no_units=16,
                      no_intermediate_layers=1, compute_dtype="float32")
    tuner = FineTuner(cfg, scan)
    images = _images(rng, shape=(1, 7, 5, 3), scan=scan)   # N=105 ragged
    params = tuner.init(jax.random.PRNGKey(1), images)
    q_ref, _ = _encode_q(tuner, params, images)
    got = _fused_q(images, params, cfg, scan)
    np.testing.assert_allclose(got[..., :5], np.asarray(q_ref),
                               rtol=1e-5, atol=2e-5)


@cpu_only
def test_encode_kernel_inv_gamma_and_layer_norm(rng):
    """infer_inv_gamma appends constant channels that _encode_q strips;
    use_layer_norm/dropout touch only stream 2 -- the kernel covers both
    without special cases."""
    cfg = dataclasses.replace(OPTIMAL.model, infer_inv_gamma=True,
                              use_layer_norm=True, dropout_rate=0.1,
                              compute_dtype="float32")
    tuner = FineTuner(cfg, SCAN)
    images = _images(rng)
    params = tuner.init(jax.random.PRNGKey(2), images)
    q_ref, _ = _encode_q(tuner, params, images)   # hyper channels stripped
    got = _fused_q(images, params, cfg, SCAN)
    np.testing.assert_allclose(got, np.asarray(q_ref),
                               rtol=1e-5, atol=2e-5)


@cpu_only
def test_encode_kernel_channel_major_input(rng):
    """The serving layout: images uploaded channel-major (T, N) (the
    posterior_maps fused path) produce the same q as the voxel-major
    entry, with and without a fused mask row."""
    cfg = dataclasses.replace(OPTIMAL.model, compute_dtype="float32")
    tuner = FineTuner(cfg, SCAN)
    images = _images(rng, shape=(1, 7, 5, 3))   # ragged N=105
    params = tuner.init(jax.random.PRNGKey(9), images)
    ref = _fused_q(images, params, cfg, SCAN)
    kw = dict(se_idx=SCAN.se_idx,
              multi_image=cfg.multi_image_normalisation,
              activation=cfg.activation,
              n_blocks=cfg.no_intermediate_layers, trunk="float32",
              rows=64, pad_multiple=64, interpret=True)
    n = int(np.prod(images.shape[:-1]))
    cm = jnp.asarray(np.ascontiguousarray(
        np.asarray(images).reshape(-1, SCAN.n_taus).T))
    got = encode_q1_packed(cm, params["encoder"], input_layout="channel",
                           **kw)
    got = np.asarray(got[:, :n]).T.reshape(images.shape[:-1] + (5,))
    np.testing.assert_array_equal(got, ref)

    mask = (rng.uniform(size=images.shape[:-1] + (1,)) > 0.3
            ).astype(np.float32)
    masked = np.asarray(images) * mask
    ref_m = _fused_q(jnp.asarray(masked), params, cfg, SCAN)
    cm_m = jnp.asarray(np.ascontiguousarray(np.concatenate(
        [np.asarray(images), mask], -1).reshape(-1, SCAN.n_taus + 1).T))
    got_m = encode_q1_packed(cm_m, params["encoder"],
                             input_layout="channel", mask_channel=True,
                             **kw)
    got_m = np.asarray(got_m[:, :n]).T.reshape(images.shape[:-1] + (5,))
    np.testing.assert_array_equal(got_m, ref_m)


@cpu_only
def test_encode_kernel_bf16_trunk(rng):
    cfg = dataclasses.replace(OPTIMAL.model, compute_dtype="bfloat16")
    tuner = FineTuner(cfg, SCAN)
    images = _images(rng)
    params = tuner.init(jax.random.PRNGKey(3), images)
    q_ref, _ = _encode_q(tuner, params, images)
    got = _fused_q(images, params, cfg, SCAN, trunk="bfloat16")
    # both trunks are bf16; small differences from rounding-point order
    np.testing.assert_allclose(got, np.asarray(q_ref), rtol=0.05, atol=0.03)


@cpu_only
def test_fused_summaries_match_jnp_quadrature(rng):
    cfg = dataclasses.replace(OPTIMAL.model, compute_dtype="float32")
    tuner = FineTuner(cfg, SCAN)
    images = _images(rng)
    params = tuner.init(jax.random.PRNGKey(4), images)
    ref = _summarize(tuner, params, jax.random.PRNGKey(0), images,
                     method="quadrature")
    m_t, v_t, r_t = _fused_posterior_summaries(tuner, params, images,
                                               interpret=True)
    shape = images.shape[:-1]
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(m_t), 0, -1).reshape(shape + (3,)),
        np.asarray(ref["means"]), rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(v_t), 0, -1).reshape(shape + (3,)),
        np.asarray(ref["stds"]), rtol=1e-3, atol=2e-5)
    np.testing.assert_allclose(
        np.moveaxis(np.asarray(r_t), 0, -1).reshape(shape + (3,)),
        np.asarray(ref["raw_log_stds"]), rtol=1e-5, atol=2e-5)


@cpu_only
def test_posterior_maps_fused_integration(rng):
    """posterior_maps with fused_infer='interpret' == the jnp path, for
    masked multi-chunk volumes (exercises padding + mask + chunk
    slicing)."""
    cfg = dataclasses.replace(
        OPTIMAL, model=dataclasses.replace(OPTIMAL.model,
                                           compute_dtype="float32"))
    tuner = FineTuner(cfg.model, SCAN)
    data = np.abs(rng.normal(size=(3, 6, 5, 2, SCAN.n_taus + 1))
                  ).astype(np.float32) * 50.0 + 100.0
    data[..., -1] = (rng.uniform(size=data.shape[:-1]) > 0.3)
    params = jax.jit(tuner.init)(jax.random.PRNGKey(5),
                                 jnp.asarray(data[:1, ..., :-1]))
    ref = posterior_maps(tuner, params, data, jax.random.PRNGKey(0),
                         use_pallas=False, chunk=2)

    cfg_f = dataclasses.replace(cfg.model, fused_infer="interpret")
    tuner_f = FineTuner(cfg_f, SCAN)
    assert _resolve_fused_infer(cfg_f) is True
    got = posterior_maps(tuner_f, params, data, jax.random.PRNGKey(0),
                         use_pallas=False, chunk=2)
    for key in ("oef", "dbv", "r2p", "stds", "raw_log_stds"):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-3,
                                   atol=3e-5, err_msg=key)


@cpu_only
def test_posterior_maps_fused_mc_smoke(rng):
    """method='mc' also routes through the fused encode kernel (packed
    MC summarize): means agree with the deterministic quadrature path
    within Monte-Carlo error at S=200 (the documented RNG stance:
    distributions, not streams)."""
    cfg_f = dataclasses.replace(OPTIMAL.model, fused_infer="interpret",
                                compute_dtype="float32")
    tuner = FineTuner(cfg_f, SCAN)
    data = np.abs(rng.normal(size=(1, 4, 4, 2, SCAN.n_taus + 1))
                  ).astype(np.float32) * 50.0 + 100.0
    data[..., -1] = 1.0
    params = jax.jit(tuner.init)(jax.random.PRNGKey(10),
                                 jnp.asarray(data[:1, ..., :-1]))
    got = posterior_maps(tuner, params, data, jax.random.PRNGKey(0),
                         use_pallas=False, method="mc")
    ref = posterior_maps(tuner, params, data, jax.random.PRNGKey(0),
                         use_pallas=False, method="quadrature")
    for key, atol, rtol in (("oef", 0.08, 0), ("dbv", 0.03, 0),
                            ("r2p", 0, 0.35)):
        assert np.all(np.isfinite(got[key])), key
        # untrained heads have near-saturated stds: r2p (an unbounded
        # product) carries large per-sample variance, so it gets a
        # relative MC tolerance
        np.testing.assert_allclose(got[key], ref[key], atol=atol,
                                   rtol=rtol, err_msg=key)

    # the packed MC entry is the SAME kernel/tiling as the (N, 5) entry:
    # with one seed and matching pad sizes the summaries are bit-equal
    from qbold_vi_tpu.ops.pallas_summarize import (
        mc_posterior_summaries, mc_posterior_summaries_packed,
        pack_params_tiled)

    q = jnp.asarray(rng.normal(size=(96, 5)).astype(np.float32) * 0.5)
    seed = jnp.int32(1234)
    m_ref, v_ref = mc_posterior_summaries(q, seed, no_samples=16,
                                          interpret=True, lanes=8)
    pt, n_pad, _ = pack_params_tiled(q, 8)
    m_t, v_t = mc_posterior_summaries_packed(
        pt.reshape(5, n_pad), seed, no_samples=16, interpret=True, lanes=8)
    np.testing.assert_array_equal(np.asarray(m_t)[:, :96].T, m_ref)
    np.testing.assert_array_equal(np.asarray(v_t)[:, :96].T, v_ref)


@cpu_only
def test_posterior_maps_sharded_fused(rng):
    """Pallas (interpret) inside shard_map on the 8-virtual-device CPU
    mesh: the fused sharded path == the unsharded jnp path for a subject
    count that does not divide the mesh."""
    from qbold_vi_tpu.infer import posterior_maps_sharded
    from qbold_vi_tpu.parallel import mesh as pmesh

    if jax.device_count() < 2:
        pytest.skip("needs the multi-device CPU mesh")
    cfg_f = dataclasses.replace(OPTIMAL.model, fused_infer="interpret",
                                compute_dtype="float32")
    tuner = FineTuner(cfg_f, SCAN)
    data = np.abs(rng.normal(size=(3, 6, 5, 2, SCAN.n_taus + 1))
                  ).astype(np.float32) * 50.0 + 100.0
    data[..., -1] = (rng.uniform(size=data.shape[:-1]) > 0.3)
    params = jax.jit(tuner.init)(jax.random.PRNGKey(6),
                                 jnp.asarray(data[:1, ..., :-1]))
    ref = posterior_maps(tuner, params, data, jax.random.PRNGKey(0),
                         use_pallas=False)
    mesh = pmesh.make_mesh()
    got = posterior_maps_sharded(tuner, params, data, jax.random.PRNGKey(0),
                                 mesh, use_pallas=False)
    for key in ("oef", "dbv", "r2p", "stds", "raw_log_stds"):
        np.testing.assert_allclose(got[key], ref[key], rtol=1e-3,
                                   atol=3e-5, err_msg=key)


def test_resolve_fused_infer_modes():
    cfg = OPTIMAL.model
    on_tpu = jax.default_backend() in ("tpu", "axon")
    assert _resolve_fused_infer(cfg) is (False if on_tpu else None)
    assert _resolve_fused_infer(
        dataclasses.replace(cfg, fused_infer="off")) is None
    assert _resolve_fused_infer(
        dataclasses.replace(cfg, fused_infer="interpret")) is True
    with pytest.raises(ValueError, match="auto|on|off|interpret"):
        _resolve_fused_infer(dataclasses.replace(cfg, fused_infer="maybe"))
    with pytest.raises(ValueError, match="Mosaic-safe"):
        _resolve_fused_infer(dataclasses.replace(
            cfg, fused_infer="on", activation="selu"))


# ---------------------------------------------------------------------------
# On-chip gates (real Mosaic compile)
# ---------------------------------------------------------------------------


@tpu_only
def test_encode_kernel_on_chip(rng):
    """Real Mosaic compile at production tile sizes vs the jnp encoder,
    fp32 trunk (tight) and the default auto->bf16 trunk (loose)."""
    images = _images(rng, shape=(2, 24, 24, 4))
    for dtype, rtol, atol in (("float32", 1e-4, 1e-4),
                              ("auto", 0.05, 0.03)):
        cfg = dataclasses.replace(OPTIMAL.model, compute_dtype=dtype)
        tuner = FineTuner(cfg, SCAN)
        params = jax.jit(tuner.init)(jax.random.PRNGKey(7), images)
        q_ref, _ = _encode_q(tuner, params, images)
        from qbold_vi_tpu.models.encoder import _dtype_of

        trunk = ("bfloat16" if _dtype_of(cfg) == jnp.bfloat16
                 else "float32")
        q_t = encode_q1_packed(
            images, params["encoder"], se_idx=SCAN.se_idx,
            multi_image=cfg.multi_image_normalisation,
            activation=cfg.activation,
            n_blocks=cfg.no_intermediate_layers, trunk=trunk)
        n = int(np.prod(images.shape[:-1]))
        got = np.asarray(q_t[:, :n]).T.reshape(images.shape[:-1] + (5,))
        np.testing.assert_allclose(got, np.asarray(q_ref),
                                   rtol=rtol, atol=atol)


@tpu_only
@pytest.mark.parametrize("method,atol", [("quadrature", 5e-3),
                                         ("mc", 0.05)])
def test_fused_posterior_maps_on_chip(rng, method, atol):
    """End to end on chip: posterior_maps via the fused kernels (the
    auto default on TPU) vs the unfused Pallas path, both estimators
    (MC within Monte-Carlo error at S=200; the PRNG streams differ)."""
    cfg = OPTIMAL.model
    tuner = FineTuner(cfg, SCAN)
    data = np.abs(rng.normal(size=(2, 24, 24, 4, SCAN.n_taus + 1))
                  ).astype(np.float32) * 50.0 + 100.0
    data[..., -1] = 1.0
    params = jax.jit(tuner.init)(jax.random.PRNGKey(8),
                                 jnp.asarray(data[:1, ..., :-1]))
    assert _resolve_fused_infer(cfg) is False
    got = posterior_maps(tuner, params, data, jax.random.PRNGKey(0),
                         method=method)
    cfg_off = dataclasses.replace(cfg, fused_infer="off")
    ref = posterior_maps(FineTuner(cfg_off, SCAN), params, data,
                         jax.random.PRNGKey(0), method=method)
    for key in ("oef", "dbv", "r2p"):
        np.testing.assert_allclose(got[key], ref[key], rtol=5e-3,
                                   atol=atol, err_msg=key)
