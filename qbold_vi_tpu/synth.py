"""Synthetic qBOLD training-data generation, TPU-native.

Replaces the reference's ``create_synthetic_dataset`` (reference:
signals.py:251-300) with a single jit-compiled, explicitly-keyed JAX
program. Differences from the reference are idiomatic, not behavioural:

* explicit ``jax.random`` keys instead of global TF RNG state;
* the whole pipeline (parameter sampling -> meshgrid cross-product ->
  shuffle -> forward model -> noise) is one XLA program -- no 10-chunk
  Python loop (signals.py:281-287), XLA streams the voxel batch through
  fused kernels without materialising intermediates in HBM;
* truncated-normal sampling via inverse-CDF on a uniform draw (same
  distribution as tfp.distributions.TruncatedNormal, signals.py:265-267).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import ScanParams, SynthParams
from .ops import physics

__all__ = ["sample_population_params", "create_synthetic_dataset",
           "create_synthetic_dataset_host", "truncated_normal",
           "synth_oef_bound"]


def truncated_normal(key, shape, loc, scale, low, high, dtype=jnp.float32):
    """Truncated-normal sample matching tfp.distributions.TruncatedNormal
    (reference: signals.py:265-267): N(loc, scale) conditioned on [low, high]."""
    a = (low - loc) / scale
    b = (high - loc) / scale
    z = jax.random.truncated_normal(key, a, b, shape, dtype)
    return z * scale + loc


def sample_population_params(key: jax.Array, synth: SynthParams):
    """Draw the 1-D OEF and DBV population samples (signals.py:255-268).

    OEF: ``uniform_prop`` fraction uniform on [oef_start, oef_end], rest
    clipped N(oef_mean, oef_std). DBV: same mixing, but the normal
    component is a *truncated* normal (the reference clips OEF but
    truncates DBV; reproduced).
    Returns (oefs, dbvs), each (sample_size,) float32.
    """
    k_ou, k_on, k_du, k_dn = jax.random.split(key, 4)
    n = synth.sample_size
    n_uni = round(n * synth.uniform_prop)
    # complement, NOT a second round(): two banker's-rounded halves can
    # sum to n-1 (e.g. n=101, prop=0.5), silently shrinking the dataset
    # and diverging from create_synthetic_dataset_host's counts
    n_norm = n - n_uni

    oef_u = jax.random.uniform(k_ou, (n_uni,), minval=synth.oef_start,
                               maxval=synth.oef_end)
    oef_n = jax.random.normal(k_on, (n_norm,)) * synth.oef_std + synth.oef_mean
    oef_n = jnp.clip(oef_n, synth.oef_start, synth.oef_end)
    oefs = jnp.concatenate([oef_u, oef_n], 0)

    dbv_u = jax.random.uniform(k_du, (n_uni,), minval=synth.dbv_start,
                               maxval=synth.dbv_end)
    dbv_n = truncated_normal(k_dn, (n_norm,), synth.dbv_mean, synth.dbv_std,
                             synth.dbv_start, synth.dbv_end)
    dbvs = jnp.concatenate([dbv_u, dbv_n], 0)
    return oefs, dbvs


def sample_batch_params(key: jax.Array, synth: SynthParams, n: int):
    """IID draw of n (OEF, DBV) pairs from the population mixture.

    Used by the on-device streaming pretraining path: instead of a fixed
    meshgrid cross-product dataset (signals.py:270-271) regenerated on
    host and shipped over PCIe/DCN every epoch, each train step draws a
    fresh iid batch directly on device. Marginals match the reference's;
    the cross-product's pairing structure (every OEF with every DBV) is
    a superset of iid pairing and carries no extra information for a
    voxelwise regressor.
    """
    k_sel_o, k_sel_d, k_ou, k_on, k_du, k_dn = jax.random.split(key, 6)
    oef_u = jax.random.uniform(k_ou, (n,), minval=synth.oef_start,
                               maxval=synth.oef_end)
    oef_n = jnp.clip(jax.random.normal(k_on, (n,)) * synth.oef_std
                     + synth.oef_mean, synth.oef_start, synth.oef_end)
    oef = jnp.where(jax.random.uniform(k_sel_o, (n,)) < synth.uniform_prop,
                    oef_u, oef_n)
    dbv_u = jax.random.uniform(k_du, (n,), minval=synth.dbv_start,
                               maxval=synth.dbv_end)
    dbv_n = truncated_normal(k_dn, (n,), synth.dbv_mean, synth.dbv_std,
                             synth.dbv_start, synth.dbv_end)
    dbv = jnp.where(jax.random.uniform(k_sel_d, (n,)) < synth.uniform_prop,
                    dbv_u, dbv_n)
    return oef, dbv


def synth_oef_bound(synth: SynthParams) -> float:
    """Static OEF upper bound of the synthetic-generation path: the
    samplers clip/truncate to oef_end, and the misalignment augmentation
    can push perturbed voxels up to its own clip (signals.py:90). Passed
    as ``max_oef`` so the quadrature envelope gate sees the data path's
    REAL bound, not the decode transforms' default."""
    hi = float(synth.oef_end)
    if synth.misalign_prob > 0.0:
        hi = max(hi, physics.MISALIGN_OEF_CLIP[1])
    return hi


@partial(jax.jit, static_argnames=("scan", "synth", "full_model", "use_blood",
                                   "quad_rule"))
def create_synthetic_dataset(key: jax.Array, scan: ScanParams, synth: SynthParams,
                             *, full_model: bool = True, use_blood: bool = True,
                             quad_rule: str = "auto"):
    """Full synthetic dataset: (train_x [N, n_taus], train_y [N, 3]).

    N = sample_size**2 from the meshgrid cross-product of the OEF and DBV
    population samples (signals.py:270-271); y = (oef, dbv, r2p)
    (signals.py:292-299). Optional constant-hct channel behaviour
    (variable_hct, signals.py:273-276) collapses to the scan constant --
    the reference draws hct ~ U(0.34, 0.34), i.e. a constant; we document
    that and use scan.hct directly.
    """
    k_pop, k_shuf, k_mis, k_noise = jax.random.split(key, 4)
    oefs, dbvs = sample_population_params(k_pop, synth)

    xx, yy = jnp.meshgrid(oefs, dbvs, indexing="ij")
    oef = jnp.reshape(xx, (-1,))
    dbv = jnp.reshape(yy, (-1,))

    # Remove ordering (signals.py:279); one permutation applied to both.
    perm = jax.random.permutation(k_shuf, oef.shape[0])
    oef = oef[perm]
    dbv = dbv[perm]

    # R2' labels use the *pre-misalignment* parameters, as in the reference
    # (signals.py:294-296 computes r2p from train_y, while misalignment is
    # internal to the signal layer).
    r2p = physics.r2_prime(oef, dbv, scan.hct, scan)
    train_y = jnp.stack([oef, dbv, r2p], axis=-1)

    sig_oef, sig_dbv = oef, dbv
    per_tau = synth.misalign_prob > 0.0
    if per_tau:
        sig_oef, sig_dbv = physics.misalign_params(
            k_mis, oef, dbv, scan.n_taus, synth.misalign_prob)

    train_x = physics.ase_signal(sig_oef, sig_dbv, scan,
                                 full_model=full_model, include_blood=use_blood,
                                 per_tau_params=per_tau, quad_rule=quad_rule,
                                 max_oef=synth_oef_bound(synth))
    if scan.simulate_noise:
        train_x = physics.add_acquisition_noise(k_noise, train_x, scan.taus())
    return train_x, train_y


def create_synthetic_dataset_host(key: jax.Array, scan: ScanParams,
                                  synth: SynthParams, *,
                                  full_model: bool = True,
                                  use_blood: bool = True,
                                  quad_rule: str = "auto"):
    """create_synthetic_dataset with all RANDOMNESS on the host (NumPy),
    reusing the jitted device physics only for the signal decode.
    Returns numpy (x [N, n_taus], y [N, 3]).

    Why: fixed host datasets (host-fed pretraining sets, validation
    sets) are input-pipeline work, but generating them through
    ``create_synthetic_dataset`` costs a full XLA compile of the RNG +
    shuffle + noise program -- measured at ~190 s through the
    tunneled-TPU link (and CPU-targeted threefry compiles hang outright
    in remote-compile environments), dwarfing the milliseconds of
    actual compute. NumPy sampling is distribution-identical (streams
    differ -- the documented RNG-parity stance, SURVEY.md); the only
    jitted program left is the pure physics decode, which executes on
    the default backend. The on-device STREAMING path
    (steps.stream_synthetic_batch) is the one that belongs on the
    accelerator, inside the train step.
    """
    try:  # typed key arrays vs legacy uint32 keys
        key_bits = jax.random.key_data(key)
    except TypeError:
        key_bits = key
    seed = int(np.asarray(key_bits).reshape(-1)[-1])
    rng = np.random.default_rng(seed)
    n = synth.sample_size

    def mixture(n_total, lo, hi, mean, std, truncated):
        n_uni = round(n_total * synth.uniform_prop)
        n_norm = n_total - n_uni
        uni = rng.uniform(lo, hi, size=n_uni)
        if truncated:
            # inverse-CDF truncated normal (same law as
            # tfp/TruncatedNormal; scipy for the normal CDF/PPF)
            import scipy.special as sps
            a = (lo - mean) / std
            b = (hi - mean) / std
            ca, cb = sps.ndtr(a), sps.ndtr(b)
            u = rng.uniform(ca, cb, size=n_norm)
            norm = sps.ndtri(u) * std + mean
        else:
            norm = np.clip(rng.normal(mean, std, size=n_norm), lo, hi)
        return np.concatenate([uni, norm]).astype(np.float32)

    oefs = mixture(n, synth.oef_start, synth.oef_end, synth.oef_mean,
                   synth.oef_std, truncated=False)
    dbvs = mixture(n, synth.dbv_start, synth.dbv_end, synth.dbv_mean,
                   synth.dbv_std, truncated=True)
    oef, dbv = [a.reshape(-1) for a in np.meshgrid(oefs, dbvs,
                                                   indexing="ij")]
    perm = rng.permutation(oef.shape[0])
    oef, dbv = oef[perm], dbv[perm]

    r2p = scan.dw_coeff * scan.hct * oef * dbv
    y = np.stack([oef, dbv, r2p], -1).astype(np.float32)

    sig_oef, sig_dbv = oef, dbv
    per_tau = synth.misalign_prob > 0.0
    if per_tau:
        # numpy port of physics.misalign_params (signals.py:80-96)
        n_vox = oef.shape[0]
        mis = rng.uniform(size=(n_vox, 1)) < synth.misalign_prob
        from_idx = rng.integers(4, scan.n_taus - 1, size=(n_vox, 1))
        m = np.logical_and(np.arange(scan.n_taus)[None, :] > from_idx, mis)
        mis_oef = np.clip(rng.normal(size=(n_vox, 1)) * 0.15
                          + oef[:, None], 0.05, 0.8)
        mis_dbv = np.clip(rng.normal(size=(n_vox, 1)) * 0.05
                          + dbv[:, None], 0.002, 0.3)
        sig_oef = np.where(m, mis_oef, oef[:, None]).astype(np.float32)
        sig_dbv = np.where(m, mis_dbv, dbv[:, None]).astype(np.float32)

    x = np.asarray(physics.ase_signal(
        sig_oef, sig_dbv, scan, full_model=full_model,
        include_blood=use_blood, per_tau_params=per_tau,
        quad_rule=quad_rule, max_oef=synth_oef_bound(synth)))

    if scan.simulate_noise:
        taus = scan.taus()
        prof = physics.norm_snr_profile(taus)
        snr = rng.uniform(50.0, 120.0, size=(x.shape[0], 1)) * prof[None, :]
        std = x.mean(0, keepdims=True) / snr
        x = (x + rng.normal(size=x.shape) * std).astype(np.float32)
    return x, y
