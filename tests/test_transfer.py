"""Tests for tau-protocol transfer (11-tau -> 24-tau retargeting)."""

import jax
import jax.numpy as jnp
import numpy as np

from qbold_vi_tpu.config import ModelConfig, ScanParams
from qbold_vi_tpu.models.transfer import transfer_params
from qbold_vi_tpu.models.vi import FineTuner

CFG = ModelConfig(no_units=6, no_intermediate_layers=1, use_mvg=True)
SCAN_11 = ScanParams(simulate_noise=False)
SCAN_24 = ScanParams(simulate_noise=False, tau_start=-0.028, tau_step=0.004)


def test_transfer_keeps_trunk_and_retargets_protocol_layers(rng):
    key = jax.random.PRNGKey(0)
    tuner11 = FineTuner(CFG, SCAN_11)
    img11 = jnp.asarray(
        np.abs(rng.normal(size=(1, 4, 4, 2, SCAN_11.n_taus))).astype(np.float32) + 1)
    params11 = tuner11.init(key, img11)

    img24 = jnp.asarray(
        np.abs(rng.normal(size=(1, 4, 4, 2, SCAN_24.n_taus))).astype(np.float32) + 1)
    params24 = transfer_params(jax.random.PRNGKey(1), params11, CFG,
                               SCAN_24, img24)

    # trunk (block + final head) weights are shared
    a = jax.tree_util.tree_leaves(params11["encoder"]["block_0"])
    b = jax.tree_util.tree_leaves(params24["encoder"]["block_0"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    np.testing.assert_array_equal(
        np.asarray(params11["encoder"]["final"]["kernel"]),
        np.asarray(params24["encoder"]["final"]["kernel"]))

    # protocol layers have the new tau dimensionality
    assert params24["encoder"]["first_conv"]["kernel"].shape[0] == 24
    assert params24["encoder"]["sigma_head"]["kernel"].shape[-1] == 24

    # and the retargeted model runs on 24-tau data
    tuner24 = FineTuner(CFG, SCAN_24)
    out = tuner24.apply(params24, key, img24 * 100.0, no_samples=1)
    assert out["predicted_images"].shape == (1,) + img24.shape
    assert np.all(np.isfinite(np.asarray(out["predicted_images"])))
