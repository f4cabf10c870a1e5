"""Serving-artifact tests: jax.export round-trips of the inference
program (io/export_model.py). The reference has no deployment story
beyond re-loading final_model.h5 into its own Keras graph
(reference model.py:772-887); these gate the framework's replacement --
a self-contained, shape-polymorphic StableHLO artifact."""

import jax
import jax.numpy as jnp
import numpy as np

from qbold_vi_tpu.config import ModelConfig, QBoldConfig, ScanParams
from qbold_vi_tpu.io.export_model import (export_inference, load_exported,
                                          make_serving_fn, save_exported)
from qbold_vi_tpu.models.vi import FineTuner

SCAN = ScanParams(simulate_noise=False)
# The roundtrip tests EXECUTE the blob in-process, so it must be lowered
# for whatever backend this suite runs on (CPU in CI; the real chip
# under QBOLD_TEST_TPU=1 -- a cpu-only blob cannot run there).
RUN_PLATFORMS = (("tpu", "cpu")
                 if jax.default_backend() in ("tpu", "axon") else ("cpu",))
CFG = QBoldConfig(scan=SCAN,
                  model=ModelConfig(no_units=4, no_intermediate_layers=1,
                                    use_mvg=True, student_t_df=200.0,
                                    predict_log_data=False))


def _setup(rng, s=1, x=6, y=6, z=2):
    tuner = FineTuner(CFG.model, SCAN)
    key = jax.random.PRNGKey(0)
    vol = np.abs(rng.normal(size=(s, x, y, z, SCAN.n_taus + 1))
                 ).astype(np.float32) * 50 + 100
    vol[..., -1] = 1.0
    params = tuner.init(key, jnp.asarray(vol[:1, ..., :-1]))
    return tuner, params, vol


class TestExportRoundtrip:
    def test_polymorphic_roundtrip_multiple_shapes(self, rng, tmp_path):
        """One polymorphic artifact must serve DIFFERENT volume
        geometries and agree with the in-process program exactly."""
        tuner, params, _ = _setup(rng)
        exp = export_inference(tuner, params, platforms=RUN_PLATFORMS)
        path = str(tmp_path / "model.stablehlo")
        n_bytes = save_exported(exp, path)
        assert n_bytes > 0
        rt = load_exported(path)
        serve = jax.jit(make_serving_fn(tuner, params))
        for shape in [(1, 6, 6, 2), (2, 8, 5, 3)]:
            vol = np.abs(rng.normal(size=shape + (SCAN.n_taus + 1,))
                         ).astype(np.float32) * 50 + 100
            vol[..., -1] = 1.0
            got = rt.call(vol)
            want = serve(jnp.asarray(vol))
            assert set(got) == set(want)
            for k in want:
                assert got[k].shape == want[k].shape, k
                np.testing.assert_allclose(np.asarray(got[k]),
                                           np.asarray(want[k]),
                                           rtol=1e-5, atol=1e-6, err_msg=k)

    def test_matches_posterior_maps_quadrature(self, rng):
        """The exported program computes the SAME maps as
        infer.posterior_maps's default (quadrature) path."""
        from qbold_vi_tpu.infer import posterior_maps

        tuner, params, vol = _setup(rng, s=2)
        serve = jax.jit(make_serving_fn(tuner, params))
        got = serve(jnp.asarray(vol))
        want = posterior_maps(tuner, params, vol, jax.random.PRNGKey(0),
                              method="quadrature", use_pallas=False)
        for k in ("oef", "dbv", "r2p", "stds", "raw_log_stds"):
            np.testing.assert_allclose(np.asarray(got[k]),
                                       np.asarray(want[k]),
                                       rtol=1e-5, atol=1e-6, err_msg=k)

    def test_static_shape_export(self, rng):
        tuner, params, vol = _setup(rng, s=1, x=6, y=6, z=2)
        exp = export_inference(tuner, params, platforms=RUN_PLATFORMS,
                               polymorphic=False,
                               example_shape=(1, 6, 6, 2))
        rt = jax.export.deserialize(exp.serialize())
        out = rt.call(vol)
        assert out["oef"].shape == (1, 6, 6, 2, 1)
        assert np.all(np.isfinite(np.asarray(out["oef"])))

    def test_artifact_declares_platforms(self, rng):
        tuner, params, _ = _setup(rng)
        exp = export_inference(tuner, params, platforms=("cpu",))
        assert tuple(exp.platforms) == ("cpu",)


class TestFusedExport:
    """The TPU fused-kernel serving blob (Pallas stream-1 encode +
    packed quadrature; channel-major contract). Cross-lowered for the
    tpu platform even from a CPU host (Mosaic lowering is
    compile-time); execution equality is gated on chip."""

    def test_fused_export_roundtrip(self, rng, tmp_path):
        import pytest

        tuner, params, _ = _setup(rng)
        exp = export_inference(tuner, params, platforms=("tpu",),
                               fused=True, example_shape=(1, 8, 8, 2))
        assert tuple(exp.platforms) == ("tpu",)
        n = 1 * 8 * 8 * 2
        assert tuple(exp.in_avals[0].shape) == (SCAN.n_taus + 1, n)
        path = str(tmp_path / "fused.stablehlo")
        assert save_exported(exp, path) > 0
        rt = load_exported(path)
        assert tuple(rt.in_avals[0].shape) == (SCAN.n_taus + 1, n)

        with pytest.raises(ValueError, match="tpu"):
            export_inference(tuner, params, platforms=("tpu", "cpu"),
                             fused=True)
        with pytest.raises(ValueError, match="stream-1"):
            export_inference(tuner, params, platforms=("tpu",),
                             fused=True, use_first_op=False)

    def test_fused_blob_executes_on_chip(self, rng, tmp_path):
        import pytest

        if jax.default_backend() not in ("tpu", "axon"):
            pytest.skip("needs the real chip to execute a tpu blob")
        from qbold_vi_tpu.infer import _fused_posterior_summaries

        tuner, params, vol = _setup(rng, s=1, x=8, y=8, z=2)
        exp = export_inference(tuner, params, platforms=("tpu",),
                               fused=True, example_shape=(1, 8, 8, 2))
        path = str(tmp_path / "fused.stablehlo")
        save_exported(exp, path)
        rt = load_exported(path)
        cm = jnp.asarray(np.ascontiguousarray(
            vol.reshape(-1, SCAN.n_taus + 1).T))
        got = rt.call(cm)
        m, v, r = _fused_posterior_summaries(tuner, params, cm,
                                             mask_channel=True,
                                             input_layout="channel")
        np.testing.assert_allclose(np.asarray(got["means"]),
                                   np.asarray(m), rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["stds"]),
                                   np.asarray(v), rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got["raw_log_stds"]),
                                   np.asarray(r), rtol=1e-5, atol=1e-6)
