"""Mesh-sharded full-brain inference on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from qbold_vi_tpu.config import ModelConfig, ScanParams
from qbold_vi_tpu.infer import posterior_maps, posterior_maps_sharded
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.parallel import make_mesh

SCAN = ScanParams(simulate_noise=False)
CFG = ModelConfig(no_units=4, no_intermediate_layers=1, use_mvg=True)


def test_sharded_matches_single_device_within_mc_error(rng):
    assert jax.device_count() == 8
    tuner = FineTuner(CFG, SCAN)
    key = jax.random.PRNGKey(0)
    data = np.abs(rng.normal(size=(8, 6, 6, 2, SCAN.n_taus + 1))
                  ).astype(np.float32) * 50 + 100
    data[..., -1] = 1.0
    params = tuner.init(key, jnp.asarray(data[:1, ..., :-1]))
    mesh = make_mesh()

    sharded = posterior_maps_sharded(tuner, params, data, key, mesh,
                                     no_samples=256, use_pallas=False)
    single = posterior_maps(tuner, params, data, key, no_samples=256,
                            use_pallas=False, chunk=8)

    for k in ("oef", "dbv", "r2p"):
        assert sharded[k].shape == single[k].shape
        # different RNG streams per shard: compare within MC tolerance
        std = np.sqrt(np.maximum(single["stds"][..., {"oef": 0, "dbv": 1,
                                                      "r2p": 2}[k]], 1e-12))
        tol = 8.0 * std[..., None] / np.sqrt(256) + 1e-4
        assert np.all(np.abs(sharded[k] - single[k]) < tol), k
    # deterministic parts must agree exactly
    np.testing.assert_allclose(sharded["raw_log_stds"],
                               single["raw_log_stds"], rtol=1e-5, atol=1e-6)
