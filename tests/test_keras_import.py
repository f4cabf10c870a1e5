"""Reference-weight import: converted Keras encoder weights must
reproduce the reference model's outputs through OUR encoder."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qbold_vi_tpu.config import ModelConfig, ScanParams  # noqa: E402
from qbold_vi_tpu.io.keras_import import (build_reference_encoder,  # noqa: E402
                                          params_from_reference_encoder)
from qbold_vi_tpu.models.encoder import Encoder  # noqa: E402

SCAN = ScanParams(simulate_noise=False)
CFG = ModelConfig(no_units=8, no_intermediate_layers=2, use_mvg=True,
                  channelwise_gating=True, gate_offset=-3.0,
                  multi_image_normalisation=False, im_loss_sigma=0.05,
                  resid_init_std=0.05, student_t_df=200.0,
                  predict_log_data=False)


@pytest.fixture(scope="module")
def converted():
    ref = build_reference_encoder(CFG, SCAN, "/root/reference")
    params = params_from_reference_encoder(ref, CFG)
    return ref, params


def test_outputs_match_reference_model(converted, rng):
    ref, params = converted
    images = (np.abs(rng.normal(size=(2, 6, 5, 3, SCAN.n_taus)))
              .astype(np.float32) * 50 + 100)

    ref_q1, ref_q2, ref_sigma = [np.asarray(o) for o in ref(images)]

    enc = Encoder(CFG, n_taus=SCAN.n_taus, se_idx=SCAN.se_idx)
    ours = enc.apply({"params": params["encoder"]}, jnp.asarray(images))
    our_q1, our_q2, our_sigma = [np.asarray(o) for o in ours]

    np.testing.assert_allclose(our_q1, ref_q1, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(our_q2, ref_q2, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(our_sigma, ref_sigma, rtol=2e-4, atol=2e-6)


def test_legacy_h5_parser_roundtrip(converted, tmp_path):
    """A hand-built Keras-2 legacy weights file (root attr layer_names,
    per-layer attr weight_names -- the format the reference's TF2.x
    wrote) parses to the same pytree as the live-model conversion."""
    import h5py

    from qbold_vi_tpu.io.keras_import import (_iter_convs,
                                              params_from_legacy_h5)

    ref, params = converted
    path = str(tmp_path / "legacy.h5")
    convs = _iter_convs(ref)
    with h5py.File(path, "w") as f:
        names = []
        for i, layer in enumerate(convs):
            lname = "conv3d" if i == 0 else f"conv3d_{i}"
            names.append(lname.encode())
            g = f.create_group(lname)
            kname = f"{lname}/kernel:0"
            bname = f"{lname}/bias:0"
            g.attrs["weight_names"] = [kname.encode(), bname.encode()]
            g.create_dataset(kname, data=np.asarray(layer.kernel))
            g.create_dataset(bname, data=np.asarray(layer.bias))
        f.attrs["layer_names"] = names

    legacy = params_from_legacy_h5(path, CFG)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(legacy)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_shapes_and_structure(converted):
    _, params = converted
    enc = params["encoder"]
    assert enc["first_conv"]["kernel"].shape == (SCAN.n_taus, CFG.no_units)
    assert enc["final"]["kernel"].shape == (CFG.no_units, 5)
    assert enc["sigma_head"]["kernel"].shape == (CFG.no_units, SCAN.n_taus)
    for i in range(CFG.no_intermediate_layers):
        blk = enc[f"block_{i}"]
        assert blk["ConvXY_0"]["Conv_0"]["kernel"].shape == (
            3, 3, CFG.no_units, CFG.no_units)
        assert blk["Dense_1"]["kernel"].shape == (CFG.no_units, CFG.no_units)


def test_nested_model_h5_with_finetuner_extras(converted, tmp_path):
    """The realistic final_model.h5 layout: the whole encoder nests under
    ONE top-level layer group whose weight_names are full sub-paths
    ('conv3d_3/kernel:0'), plus tfp VariableLayer extras for the learned
    population prior (5,) and trainable sigma (1,)
    (reference model.py:252-281). The parser must recurse the sub-paths
    (not collapse them by basename, ADVICE r1) and map the extras."""
    import dataclasses

    import h5py

    from qbold_vi_tpu.io.keras_import import (_iter_convs,
                                              params_from_legacy_h5)

    ref, params = converted
    cfg = dataclasses.replace(CFG, use_population_prior=True,
                              heteroscedastic_noise=False)
    pop = np.asarray([-0.9, 0.3, -1.2, 0.5, 0.05], np.float32)
    log_sigma = np.asarray([np.log(0.07)], np.float32)

    path = str(tmp_path / "final_model.h5")
    convs = _iter_convs(ref)
    with h5py.File(path, "w") as f:
        # nested encoder: one group, full-path weight names
        g = f.create_group("model")
        wnames = []
        for i, layer in enumerate(convs):
            lname = "conv3d" if i == 0 else f"conv3d_{i}"
            for var, arr in (("kernel", np.asarray(layer.kernel)),
                             ("bias", np.asarray(layer.bias))):
                wn = f"{lname}/{var}:0"
                wnames.append(wn.encode())
                g.create_dataset(wn, data=arr)
        g.attrs["weight_names"] = wnames
        # VariableLayer extras as separate top-level layer groups
        names = [b"model"]
        for lname, arr in (("variable", pop), ("variable_1", log_sigma)):
            vg = f.create_group(lname)
            wn = f"{lname}/Variable:0"
            vg.attrs["weight_names"] = [wn.encode()]
            vg.create_dataset(wn, data=arr)
            names.append(lname.encode())
        f.attrs["layer_names"] = names

    out = params_from_legacy_h5(path, cfg)
    # encoder identical to the live-model conversion
    flat_a = jax.tree_util.tree_leaves(params["encoder"])
    flat_b = jax.tree_util.tree_leaves(out["encoder"])
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # extras mapped onto the FineTuner param leaves
    np.testing.assert_array_equal(out["pop_prior"], pop)
    np.testing.assert_allclose(float(out["log_sigma"]), float(log_sigma[0]))

    # and the imported pytree drives the fine-tuner directly
    from qbold_vi_tpu.models.vi import FineTuner

    tuner = FineTuner(cfg, SCAN)
    fwd = tuner.apply(out, jax.random.PRNGKey(0),
                      jnp.abs(jnp.ones((1, 4, 4, 2, SCAN.n_taus))) * 100.0,
                      no_samples=2)
    assert np.all(np.isfinite(np.asarray(fwd["predicted_images"])))
    prior = tuner.prior_params(out, fwd["predictions"])
    np.testing.assert_array_equal(np.asarray(prior)[0, 0, 0, 0], pop)


def test_extras_ignored_when_config_disables_them(converted, tmp_path):
    """A final_model.h5 with extras imported under a config without a
    population prior / with heteroscedastic noise keeps only the
    encoder (shape-gated mapping, no stray leaves)."""
    import h5py

    from qbold_vi_tpu.io.keras_import import extras_from_legacy

    extras = [("variable", "Variable", np.zeros(5, np.float32)),
              ("variable_1", "Variable", np.zeros(1, np.float32))]
    out = extras_from_legacy(extras, CFG)  # CFG: no pop prior, hetero on
    assert out == {}


def test_imported_checkpoint_save_predictions_parity(converted, tmp_path, rng):
    """End-to-end migration gate (round-2 verdict #8): an imported
    reference checkpoint driven through OUR full export path
    (save_predictions) must produce posterior-mean maps that agree with
    the REFERENCE's own summarization math (model.py:318-343
    calculate_means: correlated logit-normal sampling + sigmoid-range
    transform, 200-draw means) evaluated on the reference encoder's own
    q -- within Monte-Carlo tolerance."""
    from qbold_vi_tpu.config import QBoldConfig
    from qbold_vi_tpu.infer import save_predictions
    from qbold_vi_tpu.models.vi import FineTuner

    ref, params = converted
    s, x, y, z = 1, 6, 6, 3
    data = (np.abs(rng.normal(size=(s, x, y, z, SCAN.n_taus + 1)))
            .astype(np.float32) * 50 + 100)
    data[..., -1] = (rng.uniform(size=data.shape[:-1]) > 0.2)

    qcfg = QBoldConfig(scan=SCAN, model=CFG)
    tuner = FineTuner(CFG, SCAN)
    key = jax.random.PRNGKey(0)
    maps = save_predictions(tuner, qcfg, params, data,
                            str(tmp_path / "pred"), key)

    # --- reference summarization math, numpy, on the REFERENCE q ------
    masked = data[..., :-1] * data[..., -1:]
    q_ref = np.asarray(ref(masked)[0])           # outer model, head 1
    mu0 = q_ref[..., 0]
    ls0 = np.tanh(q_ref[..., 1]) * 3.0 - 1.0     # transform_std
    mu1 = q_ref[..., 2]
    ls1 = np.tanh(q_ref[..., 3]) * 3.0 - 1.0
    od = np.tanh(q_ref[..., 4]) * np.exp(-2.0)   # transform_offdiag

    nprng = np.random.default_rng(7)
    n_mc = 20000
    z0 = nprng.standard_normal((n_mc,) + mu0.shape).astype(np.float64)
    z1 = nprng.standard_normal((n_mc,) + mu0.shape).astype(np.float64)
    l0 = mu0 + z0 * np.exp(ls0)
    l1 = mu1 + z0 * od + z1 * np.exp(ls1)        # correlated MVG draw
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    oef_s = sig(l0) * CFG.oef_range + CFG.min_oef
    dbv_s = sig(l1) * CFG.dbv_range + CFG.min_dbv
    dwc = SCAN.dw_coeff * SCAN.hct
    oracle = {
        "oef": oef_s.mean(0), "dbv": dbv_s.mean(0),
        "r2p": (dwc * oef_s * dbv_s).mean(0),
    }
    stds = {"oef": oef_s.std(0), "dbv": dbv_s.std(0),
            "r2p": (dwc * oef_s * dbv_s).std(0)}

    # our maps use 200 draws: tolerate 8 MC standard errors per voxel
    for name in ("oef", "dbv", "r2p"):
        ours = maps[name][..., 0]
        tol = 8.0 * stds[name] / np.sqrt(200) + 1e-4
        assert np.all(np.abs(ours - oracle[name]) < tol), (
            name, np.abs(ours - oracle[name]).max(), tol.mean())
    # artifacts written
    import os
    for suffix in ("_oef", "_dbv", "_r2p", "_logstds"):
        assert os.path.isfile(str(tmp_path / f"pred{suffix}.nii.gz"))
