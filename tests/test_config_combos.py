"""Configuration-combination robustness: every supported model-option
combination must run one pretrain step AND one fine-tune step to a
finite loss. Catches interplay bugs (e.g. hyperprior channels x MVG,
MoG x population prior) that single-feature tests miss."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qbold_vi_tpu.config import (ModelConfig, QBoldConfig, ScanParams,
                                 SynthParams, TrainConfig)
from qbold_vi_tpu.models.vi import FineTuner
from qbold_vi_tpu.train import optim, steps

SCAN = ScanParams(simulate_noise=False)

COMBOS = [
    dict(use_mvg=True),
    dict(use_mvg=False),
    dict(use_mvg=True, infer_inv_gamma=True),
    dict(use_mvg=False, infer_inv_gamma=True),
    dict(use_mvg=True, use_population_prior=True),
    dict(use_mvg=False, use_population_prior=True),
    dict(use_mvg=False, use_population_prior=True, mog_components=3),
    dict(use_mvg=True, heteroscedastic_noise=False),
    dict(use_mvg=True, dropout_rate=0.3),
    dict(use_mvg=False, use_layer_norm=True),
    dict(use_mvg=True, student_t_df=2.0, predict_log_data=True),
    dict(use_mvg=True, no_samples=3),
    dict(use_mvg=True, compute_dtype="bfloat16"),
]


def _cfg(**model_kw):
    return QBoldConfig(
        scan=SCAN,
        synth=SynthParams(sample_size=10),
        model=ModelConfig(no_units=4, no_intermediate_layers=1,
                          student_t_df=model_kw.pop("student_t_df", 200.0),
                          predict_log_data=model_kw.pop("predict_log_data",
                                                        False),
                          **model_kw),
        train=TrainConfig(use_r2p_loss=True, inv_gamma_alpha=2.0,
                          inv_gamma_beta=0.5),
    )


@pytest.mark.parametrize("combo", COMBOS,
                         ids=[str(sorted(c.items())) for c in COMBOS])
def test_both_phases_run_finite(combo, rng):
    cfg = _cfg(**dict(combo))
    tuner = FineTuner(cfg.model, cfg.scan)
    key = jax.random.PRNGKey(0)
    img = jnp.asarray(
        np.abs(rng.normal(size=(2, 4, 4, 2, SCAN.n_taus))).astype(np.float32)
        * 50 + 100)
    params = tuner.init(key, img)

    # pretrain step
    popt = optim.make_pretrain_optimizer(cfg.train)
    pstate = steps.TrainState(params, popt.init(params), None,
                              jnp.zeros([], jnp.int32))
    pstep = steps.make_pretrain_step(tuner, cfg, popt)
    oef = rng.uniform(0.1, 0.7, size=(2, 4, 4, 2, 1)).astype(np.float32)
    dbv = rng.uniform(0.005, 0.18, size=(2, 4, 4, 2, 1)).astype(np.float32)
    r2p = np.float32(SCAN.dw_coeff * SCAN.hct) * oef * dbv
    pbatch = {"x": np.asarray(img),
              "y": np.concatenate([oef, dbv, r2p], -1)}
    pstate, pm = pstep(pstate, key, pbatch)
    assert np.isfinite(float(pm["loss"])), combo

    # fine-tune step
    fopt = optim.make_finetune_optimizer(cfg.train)
    fstate = steps.TrainState(pstate.params, fopt.init(pstate.params), None,
                              jnp.zeros([], jnp.int32))
    fstep = steps.make_finetune_step(tuner, cfg, fopt)
    k_prior = 5 if cfg.model.use_mvg else 4
    mask = (rng.uniform(size=(2, 4, 4, 2, 1)) > 0.2).astype(np.float32)
    fbatch = {
        "images": np.asarray(img) * mask,
        "mask": mask,
        "priors": rng.normal(size=(2, 4, 4, 2, k_prior)).astype(np.float32) * 0.3,
    }
    fstate, fm = fstep(fstate, key, fbatch)
    assert np.isfinite(float(fm["loss"])), combo
