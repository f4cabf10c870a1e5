"""Classical log-linear WLS baseline, vectorised for TPU.

The reference fits per-voxel weighted least squares with sklearn inside a
quadruple-nested Python loop -- "takes roughly 1 min per volume"
(reference: loglinear.py:68-105, comment at :75). The TPU-native design
collapses the whole fit to two closed-form weighted moments per voxel:

    slope     = cov_w(tau, ln S) / var_w(tau)
    intercept = mean_w(ln S) - slope * mean_w(tau)

over the long-tau subset tau > 0.016 s with weights 1/tau -- exactly the
normal equations sklearn solves -- expressed as two masked reductions over
the tau axis. XLA fuses this into a single pass over the volume: every
voxel is independent, so the same jit function runs on one chip or
sharded over a mesh unchanged. Expected speedup vs the reference loop is
4-5 orders of magnitude.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .config import ScanParams

__all__ = ["fit_wls", "wls_maps"]


@partial(jax.jit, static_argnames=("scan",))
def fit_wls(signals: jax.Array, scan: ScanParams):
    """Log-linear WLS estimate of (OEF, DBV, R2') per voxel.

    signals: (..., n_taus) ASE magnitudes on the scan's tau grid.
    Returns (oef, dbv, r2p), each (..., 1), clipped to the reference's
    ranges (loglinear.py:102-104).

    Matches reference semantics:
      * ln S with NaN/Inf zeroed (loglinear.py:69-71);
      * fit restricted to tau > 0.016 (linear long-tau regime, :77);
      * sample weights 1/tau (:78);
      * R2' = -slope, c = intercept, DBV = c - ln S(tau=0),
        OEF = R2' / (DBV * gamma * (4/3) pi * dchi * hct * B0) (:92-99).
    """
    taus = jnp.asarray(scan.taus())
    ln_s = jnp.log(signals)
    ln_s = jnp.where(jnp.isfinite(ln_s), ln_s, 0.0)

    w = jnp.where(taus > 0.016, 1.0 / jnp.where(taus > 0.016, taus, 1.0), 0.0)

    # Weighted first/second moments over the tau axis (the WLS normal
    # equations for y = a*tau + b).
    sw = jnp.sum(w)
    mean_t = jnp.sum(w * taus) / sw
    var_t = jnp.sum(w * jnp.square(taus - mean_t)) / sw
    mean_y = jnp.sum(w * ln_s, axis=-1, keepdims=True) / sw
    cov_ty = jnp.sum(w * (taus - mean_t) * ln_s, axis=-1, keepdims=True) / sw

    slope = cov_ty / var_t
    intercept = mean_y - slope * mean_t

    se_idx = int(np.argmin(np.abs(np.asarray(scan.taus()))))
    r2p = -slope
    dbv = intercept - ln_s[..., se_idx:se_idx + 1]
    oef = r2p / (dbv * scan.dw_coeff * scan.hct)

    # Deliberate robustness deviation: degenerate fits (dbv == 0 -> 0/0)
    # yield NaN in the reference (np.clip passes NaN through); here they
    # are sanitised before clipping so downstream maps are always finite.
    oef = jnp.clip(jnp.nan_to_num(oef), 0.01, 0.8)
    dbv = jnp.clip(jnp.nan_to_num(dbv), 0.002, 0.25)
    r2p = jnp.clip(jnp.nan_to_num(r2p), 1e-2, 100.0)
    return oef, dbv, r2p


def wls_maps(signals: np.ndarray, scan: ScanParams) -> np.ndarray:
    """Convenience wrapper returning a stacked (..., 3) [oef, dbv, r2p]
    array on host, mirroring the reference CLI's output triplet
    (loglinear.py:143-157)."""
    oef, dbv, r2p = fit_wls(jnp.asarray(signals), scan)
    return np.concatenate([np.asarray(oef), np.asarray(dbv), np.asarray(r2p)], axis=-1)
