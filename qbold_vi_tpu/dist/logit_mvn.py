"""Logit-Normal / logit-MVN distribution toolkit.

The single, properly decoupled home for the distribution math that the
reference duplicates between ``logit_mvn.py`` and ``EncoderTrainer``
(reference: logit_mvn.py:13-101, model.py:288-316/376-447; README.md:10
notes the decoupling was "in progress" upstream -- it is complete here).

Parameterisation convention (the encoder's raw head outputs):
    diag (K=4): [oef_mu, oef_logstd_raw, dbv_mu, dbv_logstd_raw]
    mvg  (K=5): [... , offdiag_raw]
Raw log-stds are squashed with tanh*3-1 (logit_mvn.py:91-93); the raw
Cholesky off-diagonal with tanh*e^-2 (logit_mvn.py:95-97). Distribution
means live in logit space; ``forward_transform`` maps logit draws to
physical OEF in [0.04, 0.84] and DBV in [0.001, 0.201]
(logit_mvn.py:14-18, 72-89).

Everything is shape-agnostic over leading axes and pure jnp, so it runs
under jit/vmap/grad, inside shard_map, and inside Pallas kernels.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LogitMVN", "logit"]

_LOG_2PI = math.log(2.0 * math.pi)


def logit(x):
    """Inverse sigmoid (reference: logit_mvn.py:9-11)."""
    return jnp.log(x / (1.0 - x))


def _clip_preserve_gradient(x, lo, hi):
    """Value-clip with a straight-through gradient, mirroring
    tfp.math.clip_by_value_preserve_gradient (reference: logit_mvn.py:65)."""
    return x + jax.lax.stop_gradient(jnp.clip(x, lo, hi) - x)


# ---- streaming sampled KL (custom VJP) ----------------------------------------------
#
# The materialised sampled KL builds (S, ...) tensors for the draws,
# logits and whitened residuals, and AD stores matching residuals for
# the backward pass -- at the published fine-tune workload that is the
# single largest HBM consumer of the training step (benchmarks/
# roofline.py: the KL adds ~6 ms of the 28 ms step). This variant
# streams the S samples through a fori_loop with O(voxels) state and
# RECOMPUTES each draw from its PRNG key in the backward pass, where the
# per-sample gradient is accumulated in closed form. Exact in value and
# gradient vs mvg_kl_samples (same key stream, same straight-through
# clip, same stop-gradient placement; gated in tests/test_dist.py).

_KL_BOUND = math.log((1.0 - 1e-6) / 1e-6)


def _kl_draw(q, keys, s):
    q_mu0, q_ls0, q_mu1, q_ls1, q_od = q
    z = jax.random.normal(keys[s], q_mu0.shape + (2,), q_mu0.dtype)
    z0, z1 = z[..., 0], z[..., 1]
    l0 = jnp.clip(q_mu0 + z0 * jnp.exp(q_ls0), -_KL_BOUND, _KL_BOUND)
    l1 = jnp.clip(q_mu1 + z0 * q_od + z1 * jnp.exp(q_ls1),
                  -_KL_BOUND, _KL_BOUND)
    return z0, z1, l0, l1


def _whiten_factors(ls0, ls1, od):
    """(inv_tl, inv_br, inv_bl) of the inverse Cholesky factor. Depends
    only on the distribution parameters, NOT on the draw -- callers that
    whiten many draws against one distribution (the sampled-KL loops
    here and in ops/pallas_elbo.py) hoist this out of the loop: 3 exps
    once instead of per draw."""
    inv_tl = jnp.exp(-ls0)
    inv_br = jnp.exp(-ls1)
    inv_bl = -jnp.exp(-ls0 - ls1) * od
    return inv_tl, inv_br, inv_bl


def _whiten_apply(l0, l1, mu0, mu1, factors):
    """(r0, r1, w0, w1): residuals and whitened residuals of a draw
    under hoisted `_whiten_factors` -- pure FMAs, no transcendentals."""
    inv_tl, inv_br, inv_bl = factors
    r0 = l0 - mu0
    r1 = l1 - mu1
    w0 = r0 * inv_tl
    w1 = r1 * inv_br + r0 * inv_bl
    return r0, r1, w0, w1


def _whiten(l0, l1, mu0, ls0, mu1, ls1, od):
    """(r0, r1, w0, w1, inv_tl, inv_br, inv_bl) of the Cholesky whitening
    (see squared_whitened_residual)."""
    factors = _whiten_factors(ls0, ls1, od)
    return _whiten_apply(l0, l1, mu0, mu1, factors) + factors


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(3,))
def _mvg_kl_streamed(q, p, keys, no_samples: int):
    """mean_s 0.5 (swr_p(l_s) - swr_q(l_s)) + (ls_p0 + ls_p1) - (ls_q0
    + ls_q1), with q/p = (mu0, ls0, mu1, ls1, od) squashed tuples and
    l_s drawn from q via keys[s] -- the reduced sampled KL of
    mvg_kl_samples as a streaming loop."""
    q_mu0, q_ls0, q_mu1, q_ls1, q_od = q
    p_mu0, p_ls0, p_mu1, p_ls1, p_od = p

    def body(s, acc):
        _z0, _z1, l0, l1 = _kl_draw(q, keys, s)
        *_rp, wp0, wp1, _, _, _ = _whiten(l0, l1, p_mu0, p_ls0, p_mu1,
                                          p_ls1, p_od)
        *_rq, wq0, wq1, _, _, _ = _whiten(l0, l1, q_mu0, q_ls0, q_mu1,
                                          q_ls1, q_od)
        return acc + 0.5 * ((wp0 * wp0 + wp1 * wp1)
                            - (wq0 * wq0 + wq1 * wq1))

    acc = jax.lax.fori_loop(0, no_samples, body, jnp.zeros_like(q_mu0))
    det = (p_ls0 + p_ls1) - (q_ls0 + q_ls1)
    return acc / float(no_samples) + det


def _mvg_kl_streamed_fwd(q, p, keys, no_samples: int):
    return _mvg_kl_streamed(q, p, keys, no_samples), (q, p, keys)


def _mvg_kl_streamed_bwd(no_samples: int, res, g):
    q, p, keys = res
    q_mu0, q_ls0, q_mu1, q_ls1, q_od = q
    p_mu0, p_ls0, p_mu1, p_ls1, p_od = p
    zero = jnp.zeros_like(q_mu0)

    def body(s, acc):
        (g_qm0, g_qls0, g_qm1, g_qls1, g_qod,
         g_pm0, g_pls0, g_pm1, g_pls1, g_pod) = acc
        z0, z1, l0, l1 = _kl_draw(q, keys, s)
        rp0, _rp1, wp0, wp1, p_itl, p_ibr, p_ibl = _whiten(
            l0, l1, p_mu0, p_ls0, p_mu1, p_ls1, p_od)
        rq0, _rq1, wq0, wq1, q_itl, q_ibr, q_ibl = _whiten(
            l0, l1, q_mu0, q_ls0, q_mu1, q_ls1, q_od)

        # d(0.5 swr)/dl for each distribution's whitening
        dp_l0 = wp0 * p_itl + wp1 * p_ibl
        dp_l1 = wp1 * p_ibr
        dq_l0 = wq0 * q_itl + wq1 * q_ibl
        dq_l1 = wq1 * q_ibr
        # pathwise derivative through l_s (clip is straight-through);
        # q's own params are stop-gradiented inside swr_q, so only the
        # l-dependence contributes there
        dl0 = dp_l0 - dq_l0
        dl1 = dp_l1 - dq_l1
        g_qm0 = g_qm0 + dl0
        g_qls0 = g_qls0 + dl0 * z0 * jnp.exp(q_ls0)
        g_qm1 = g_qm1 + dl1
        g_qod = g_qod + dl1 * z0
        g_qls1 = g_qls1 + dl1 * z1 * jnp.exp(q_ls1)
        # direct derivatives of 0.5 swr_p w.r.t. p's parameters
        g_pm0 = g_pm0 - dp_l0
        g_pm1 = g_pm1 - dp_l1
        g_pls0 = g_pls0 - (wp0 * wp0 + wp1 * rp0 * p_ibl)
        g_pls1 = g_pls1 - wp1 * wp1
        g_pod = g_pod - wp1 * rp0 * jnp.exp(-p_ls0 - p_ls1)
        return (g_qm0, g_qls0, g_qm1, g_qls1, g_qod,
                g_pm0, g_pls0, g_pm1, g_pls1, g_pod)

    acc = jax.lax.fori_loop(0, no_samples, body, (zero,) * 10)
    inv_n = 1.0 / float(no_samples)
    (g_qm0, g_qls0, g_qm1, g_qls1, g_qod,
     g_pm0, g_pls0, g_pm1, g_pls1, g_pod) = [a * inv_n for a in acc]
    # det term: + (ls_p0 + ls_p1), q side stop-gradiented
    g_pls0 = g_pls0 + 1.0
    g_pls1 = g_pls1 + 1.0
    gq = (g * g_qm0, g * g_qls0, g * g_qm1, g * g_qls1, g * g_qod)
    gp = (g * g_pm0, g * g_pls0, g * g_pm1, g * g_pls1, g * g_pod)
    keys_ct = np.zeros(keys.shape, dtype=jax.dtypes.float0)
    return gq, gp, keys_ct


_mvg_kl_streamed.defvjp(_mvg_kl_streamed_fwd, _mvg_kl_streamed_bwd)


@dataclass(frozen=True)
class LogitMVN:
    """Bivariate (OEF, DBV) logit-Normal with optional full covariance."""

    oef_range: float = 0.8
    min_oef: float = 0.04
    dbv_range: float = 0.2
    min_dbv: float = 0.001

    # ---- squashing transforms -------------------------------------------------

    def transform_std(self, raw):
        """Raw head output -> log-std in (-4, 2) (logit_mvn.py:91-93)."""
        return jnp.tanh(raw) * 3.0 - 1.0

    def inv_transform_std(self, log_std):
        """Inverse of transform_std (logit_mvn.py:99-100)."""
        return jnp.arctanh((log_std + 1.0) / 3.0)

    def transform_offdiag(self, raw):
        """Raw head output -> Cholesky off-diagonal in (-e^-2, e^-2)
        (logit_mvn.py:95-97)."""
        return jnp.tanh(raw) * math.exp(-2.0)

    def scale_uncertainty(self, q_params, factor, mvg: bool):
        """Scale a raw parameter map's posterior spread by ``factor``
        (reference: model.py:225-237, used to avoid taking massive
        samples): log-std channels get +log(factor) pre-squash offset and
        the MVG off-diagonal channel is multiplied by ``factor``."""
        lf = jnp.log(factor)
        if mvg:
            offset = jnp.asarray([0.0, lf, 0.0, lf, 0.0], q_params.dtype)
            scale = jnp.asarray([1.0, 1.0, 1.0, 1.0, factor], q_params.dtype)
            return (q_params + offset) * scale
        offset = jnp.asarray([0.0, lf, 0.0, lf], q_params.dtype)
        return q_params + offset

    # ---- physical <-> logit space ---------------------------------------------

    def forward_transform(self, logits):
        """Logit-space draws -> physical (OEF, DBV) (logit_mvn.py:72-78).

        logits: (..., 2). Returns (..., 2).
        """
        oef = jax.nn.sigmoid(logits[..., 0:1]) * self.oef_range + self.min_oef
        dbv = jax.nn.sigmoid(logits[..., 1:2]) * self.dbv_range + self.min_dbv
        return jnp.concatenate([oef, dbv], axis=-1)

    def backwards_transform(self, signal, include_logit: bool):
        """Physical (OEF, DBV) -> unit interval (and optionally logit)
        (logit_mvn.py:80-89)."""
        oef = (signal[..., 0:1] - self.min_oef) / self.oef_range
        dbv = (signal[..., 1:2] - self.min_dbv) / self.dbv_range
        out = jnp.concatenate([oef, dbv], axis=-1)
        if include_logit:
            out = logit(out)
        return out

    # ---- unpacking -------------------------------------------------------------

    def unpack(self, params, mvg: bool):
        """Split a (..., 4|5) head output into named, squashed pieces."""
        oef_mu = params[..., 0]
        oef_log_std = self.transform_std(params[..., 1])
        dbv_mu = params[..., 2]
        dbv_log_std = self.transform_std(params[..., 3])
        offdiag = self.transform_offdiag(params[..., 4]) if mvg else jnp.zeros_like(oef_mu)
        return oef_mu, oef_log_std, dbv_mu, dbv_log_std, offdiag

    # ---- densities --------------------------------------------------------------

    @staticmethod
    def squared_whitened_residual(obs, mean, oef_log_std, dbv_log_std, offdiag):
        """||L^{-1}(obs - mean)||^2 for the lower-triangular Cholesky
        L = [[e^a, 0], [c, e^b]] (reference: logit_mvn.py:20-38).

        obs, mean: (..., 2); the rest (...,). Returns (...,).
        """
        inv_tl = jnp.exp(-oef_log_std)
        inv_br = jnp.exp(-dbv_log_std)
        inv_bl = -jnp.exp(-oef_log_std - dbv_log_std) * offdiag
        r0 = obs[..., 0] - mean[..., 0]
        r1 = obs[..., 1] - mean[..., 1]
        w0 = r0 * inv_tl
        w1 = r1 * inv_br + r0 * inv_bl
        return jnp.square(w0) + jnp.square(w1)

    @staticmethod
    def log_chol_det(oef_log_std, dbv_log_std):
        """log|Sigma| = 2(log-diag sum) (reference: logit_mvn.py:40-44)."""
        return 2.0 * (oef_log_std + dbv_log_std)

    def logit_gaussian_mvg_log_prob(self, observations, params):
        """Negative log-density of physical (OEF, DBV) observations under
        the full-covariance logit-Normal (reference: logit_mvn.py:46-70).

        NB: like the reference, this returns the NEGATIVE log prob (an NLL
        despite the name); callers rely on that sign convention
        (model.py:596-597 negates it again for the KL).

        observations: (..., 2) physical space. params: (..., 5) raw head.
        Returns (...,).
        """
        oef_mu, oef_ls, dbv_mu, dbv_ls, offd = self.unpack(params, mvg=True)
        x = self.backwards_transform(observations[..., 0:2], include_logit=False)
        eps = 1e-6
        x = _clip_preserve_gradient(x, eps, 1.0 - eps)
        mean = jnp.stack([oef_mu, dbv_mu], axis=-1)
        swr = self.squared_whitened_residual(logit(x), mean, oef_ls, dbv_ls, offd)
        log_det = self.log_chol_det(oef_ls, dbv_ls)
        nll = _LOG_2PI + 0.5 * log_det + 0.5 * swr
        # logit-Jacobian: + sum log x(1-x) (logit_mvn.py:68)
        nll = nll + jnp.sum(jnp.log(x) + jnp.log(1.0 - x), axis=-1)
        return nll

    @staticmethod
    def gaussian_nll(obs, mean, log_std):
        """Unnormalised diagonal Gaussian NLL (reference: model.py:402-404,
        which drops the log(2 pi)/2 constant; reproduced)."""
        return log_std + 0.5 * jnp.square((obs - mean) / jnp.exp(log_std))

    def logit_gaussian_log_prob(self, observations, params):
        """Diagonal counterpart of logit_gaussian_mvg_log_prob
        (reference: model.py:406-421; same negative-log-prob convention,
        same dropped constant as gaussian_nll)."""
        oef_mu, oef_ls, dbv_mu, dbv_ls, _ = self.unpack(params, mvg=False)
        x = self.backwards_transform(observations[..., 0:2], include_logit=False)
        # Same support clip as the MVG path: an observation exactly at a
        # range bound (e.g. synth oef_start == min_oef puts the clipped-
        # normal atom at x=0) would otherwise logit to +-inf and poison
        # the whole loss/gradient with NaN.
        eps = 1e-6
        x = _clip_preserve_gradient(x, eps, 1.0 - eps)
        lx = logit(x)
        nll = self.gaussian_nll(lx[..., 0], oef_mu, oef_ls)
        nll = nll + self.gaussian_nll(lx[..., 1], dbv_mu, dbv_ls)
        return nll + jnp.sum(jnp.log(x * (1.0 - x)), axis=-1)

    # ---- sampling ----------------------------------------------------------------

    def sample(self, key, params, mvg: bool):
        """Reparameterised draw -> physical (OEF, DBV), (..., 2)
        (reference: model.py:15-50).

        MVG path correlates the DBV draw with the OEF one through the
        Cholesky off-diagonal (shared z0, model.py:24-31).
        """
        oef_mu, oef_ls, dbv_mu, dbv_ls, offd = self.unpack(params, mvg)
        z = jax.random.normal(key, oef_mu.shape + (2,), dtype=params.dtype)
        oef_sample = oef_mu + z[..., 0] * jnp.exp(oef_ls)
        if mvg:
            dbv_sample = dbv_mu + z[..., 0] * offd + z[..., 1] * jnp.exp(dbv_ls)
        else:
            dbv_sample = dbv_mu + z[..., 1] * jnp.exp(dbv_ls)
        return self.forward_transform(jnp.stack([oef_sample, dbv_sample], axis=-1))

    def sample_many(self, key, params, mvg: bool, no_samples: int):
        """S independent draws, stacked on axis 0: (S, ..., 2)
        (reference: model.py:318-324 create_samples, samples stacked last;
        leading here for cheaper TPU layout)."""
        keys = jax.random.split(key, no_samples)
        return jax.vmap(lambda k: self.sample(k, params, mvg))(keys)

    # ---- KL divergences ------------------------------------------------------------

    @staticmethod
    def normal_kl(q_mu, q_log_std, p_mu, p_log_std):
        """KL(N_q || N_p), univariate. Also the exact KL between the
        corresponding LogitNormals (KL is bijector-invariant), matching
        tfp.LogitNormal.kl_divergence (reference: model.py:695-698)."""
        var_ratio = jnp.exp(2.0 * (q_log_std - p_log_std))
        t1 = jnp.square(q_mu - p_mu) * jnp.exp(-2.0 * p_log_std)
        return 0.5 * (var_ratio + t1 - 1.0) + p_log_std - q_log_std

    def diag_kl(self, q_params, p_params):
        """Analytic KL for the diagonal posterior/prior pair, summed over
        OEF and DBV (reference: model.py:692-710). (..., 4) inputs."""
        q_oef_mu, q_oef_ls, q_dbv_mu, q_dbv_ls, _ = self.unpack(q_params, mvg=False)
        p_oef_mu, p_oef_ls, p_dbv_mu, p_dbv_ls, _ = self.unpack(p_params, mvg=False)
        return (self.normal_kl(q_oef_mu, q_oef_ls, p_oef_mu, p_oef_ls)
                + self.normal_kl(q_dbv_mu, q_dbv_ls, p_dbv_mu, p_dbv_ls))

    def mvg_kl_analytic_marginals(self, q_params, p_params):
        """Marginal-matched analytic KL for the MVG parameterisation: each
        marginal's std absorbs the Cholesky off-diagonal,
        std_dbv = sqrt(e^{2b} + c^2) (reference: model.py:570-590)."""
        q_oef_mu, q_oef_ls, q_dbv_mu, q_dbv_ls, q_od = self.unpack(q_params, mvg=True)
        p_oef_mu, p_oef_ls, p_dbv_mu, p_dbv_ls, p_od = self.unpack(p_params, mvg=True)
        q_dbv_std = jnp.sqrt(jnp.exp(q_dbv_ls) ** 2 + q_od**2)
        p_dbv_std = jnp.sqrt(jnp.exp(p_dbv_ls) ** 2 + p_od**2)
        return (self.normal_kl(q_oef_mu, q_oef_ls, p_oef_mu, p_oef_ls)
                + self.normal_kl(q_dbv_mu, jnp.log(q_dbv_std),
                                 p_dbv_mu, jnp.log(p_dbv_std)))

    def mvg_kl_closed_form(self, q_params, p_params):
        """Exact closed-form KL between two full-covariance 2x2 Gaussians
        in Cholesky parameterisation (reference: model.py:612-652).

        KL = 0.5 [ tr(P^-1 Q) + (mu_p-mu_q)^T P^-1 (mu_p-mu_q)
                   + log|P| - log|Q| - 2 ]

        Documented deviation: the reference's (train-path-unused) variant
        assembles the trace term with L^-1 L^-T = (L^T L)^-1 instead of the
        true precision P^-1 = L^-T L^-1 (model.py:637-648), which is wrong
        whenever the prior has a nonzero off-diagonal. We compute
        tr(P^-1 Q) = ||L_p^-1 L_q||_F^2 exactly; gated against a scipy
        oracle in tests/test_dist.py.
        """
        q_oef_mu, q_oef_ls, q_dbv_mu, q_dbv_ls, q_od = self.unpack(q_params, mvg=True)
        p_oef_mu, p_oef_ls, p_dbv_mu, p_dbv_ls, p_od = self.unpack(p_params, mvg=True)

        det_term = self.log_chol_det(p_oef_ls, p_dbv_ls) - self.log_chol_det(q_oef_ls, q_dbv_ls)

        p_mu = jnp.stack([p_oef_mu, p_dbv_mu], -1)
        q_mu = jnp.stack([q_oef_mu, q_dbv_mu], -1)
        swr = self.squared_whitened_residual(p_mu, q_mu, p_oef_ls, p_dbv_ls, p_od)

        # tr(P^-1 Q) = ||L_p^-1 L_q||_F^2 with both factors lower-triangular:
        # L_p^-1 = [[e^-a_p, 0], [-c_p e^{-a_p-b_p}, e^-b_p]]
        it = jnp.exp(-p_oef_ls)
        ir = jnp.exp(-p_dbv_ls)
        ib = -p_od * jnp.exp(-p_oef_ls - p_dbv_ls)
        la = jnp.exp(q_oef_ls)
        lb = jnp.exp(q_dbv_ls)
        m00 = it * la
        m10 = ib * la + ir * q_od
        m11 = ir * lb
        trace = jnp.square(m00) + jnp.square(m10) + jnp.square(m11)

        return 0.5 * (trace + swr + det_term - 2.0)

    def mvg_kl_samples_reference(self, key, q_params, p_params,
                                 no_samples: int = 50):
        """Direct transcription of the reference Monte-Carlo KL
        (reference: model.py:592-610): physical-space samples, two full
        logit-Normal log-prob evaluations per sample, stop-gradient on q's
        parameters inside log q. Kept as the oracle for
        ``mvg_kl_samples`` (tests/test_dist.py)."""
        samples = self.sample_many(key, q_params, mvg=True, no_samples=no_samples)
        q_sg = jax.lax.stop_gradient(q_params)

        def one(s):
            # logit_gaussian_mvg_log_prob returns a NEGATIVE log prob
            log_q = -self.logit_gaussian_mvg_log_prob(s, q_sg)
            log_p = -self.logit_gaussian_mvg_log_prob(s, p_params)
            return log_q - log_p

        kl = jax.vmap(one)(samples)          # (S, ...)
        return jnp.mean(kl, axis=0)

    def mvg_kl_samples(self, key, q_params, p_params, no_samples: int = 50,
                       streamed: bool = True):
        """Monte-Carlo KL(q || p) = E_q[log q - log p] for the full-cov
        logit-Normal -- algebraically reduced form of the reference
        computation (model.py:592-610), exact in value AND gradient.

        ``streamed`` (default): the S samples run through a fori_loop
        with O(voxels) state and an analytic custom VJP that recomputes
        each draw from its key -- no (S, ...) tensors in HBM on either
        pass (the materialised form was the training step's largest HBM
        consumer, benchmarks/roofline.py). streamed=False keeps the
        materialised einsum form; the two are gated for exact value and
        gradient agreement in tests/test_dist.py.

        Original reduction notes:

        Both log-probs are evaluated at the SAME sample, so the logit-
        Jacobian terms sum log u(1-u) and the log(2 pi) normalisers cancel
        identically (including their derivatives w.r.t. the sample), and
        the physical-space round-trip logit(clip(sigmoid(l))) collapses to
        a straight-through clamp of the logit draw. What remains per
        sample is two squared whitened residuals:

            kl_s = 0.5 (swr_p(l_s) - swr_q(l_s))
                   + 0.5 (logdet_p - sg(logdet_q))

        Gradient semantics match the reference exactly: q's parameters
        are stop-gradiented inside the q terms (model.py:596), so only
        the pathwise derivative through l_s remains. ~3x fewer
        transcendentals per sample than the direct form; gated against
        ``mvg_kl_samples_reference`` in tests.

        Returns (...,): mean KL over samples.
        """
        if streamed:
            q = self.unpack(q_params, mvg=True)
            p = self.unpack(p_params, mvg=True)
            keys = jax.random.split(key, no_samples)
            return _mvg_kl_streamed(q, p, keys, no_samples)

        q_mu0, q_ls0, q_mu1, q_ls1, q_od = self.unpack(q_params, mvg=True)
        # Same key-split + draw order as sample_many -> sample, so the
        # sample stream (and hence the MC estimate) matches the reference
        # path bit-for-bit.
        keys = jax.random.split(key, no_samples)
        z = jax.vmap(lambda k: jax.random.normal(
            k, q_mu0.shape + (2,), q_params.dtype))(keys)
        l0 = q_mu0 + z[..., 0] * jnp.exp(q_ls0)
        l1 = q_mu1 + z[..., 0] * q_od + z[..., 1] * jnp.exp(q_ls1)

        # The reference clips u = sigmoid(l) to [eps, 1-eps] with a
        # straight-through gradient (model.py:394-395); in logit space
        # that is a straight-through clamp at logit(eps).
        eps = 1e-6
        bound = math.log((1.0 - eps) / eps)
        l0 = _clip_preserve_gradient(l0, -bound, bound)
        l1 = _clip_preserve_gradient(l1, -bound, bound)
        l = jnp.stack([l0, l1], axis=-1)

        sg = jax.lax.stop_gradient
        q_mean = sg(jnp.stack([q_mu0, q_mu1], -1))
        swr_q = self.squared_whitened_residual(
            l, q_mean, sg(q_ls0), sg(q_ls1), sg(q_od))

        p_mu0, p_ls0, p_mu1, p_ls1, p_od = self.unpack(p_params, mvg=True)
        p_mean = jnp.stack([p_mu0, p_mu1], -1)
        swr_p = self.squared_whitened_residual(l, p_mean, p_ls0, p_ls1, p_od)

        det_term = (self.log_chol_det(p_ls0, p_ls1)
                    - sg(self.log_chol_det(q_ls0, q_ls1)))
        return jnp.mean(0.5 * (swr_p - swr_q), axis=0) + 0.5 * det_term

    # ---- summaries --------------------------------------------------------------

    def posterior_means_streamed(self, key, params, mvg: bool,
                                 no_samples: int = 200, r2p_fn=None):
        """Streaming MC posterior means/variances: accumulates sum and
        sum-of-squares over samples with ``lax.fori_loop`` so the (S, ...)
        sample tensor is never materialised in HBM -- at S=200 over a
        ~1M-voxel brain that saves ~1.6 GB of HBM traffic vs the vmapped
        path. Matches ``posterior_means(return_stds=True)`` (the
        reference's biased 1/N variance, model.py:326-343) to fp32
        accumulation order.

        Returns (means (..., 2|3), vars (..., 2|3)).
        """
        keys = jax.random.split(key, no_samples)
        zeros2 = jnp.zeros(params.shape[:-1] + (2,), params.dtype)
        zeros1 = jnp.zeros(params.shape[:-1], params.dtype)

        def body(i, acc):
            s1, s2, r1, r2 = acc
            s = self.sample(keys[i], params, mvg)
            s1 = s1 + s
            s2 = s2 + jnp.square(s)
            if r2p_fn is not None:
                r = r2p_fn(s[..., 0], s[..., 1])
                r1 = r1 + r
                r2 = r2 + jnp.square(r)
            return (s1, s2, r1, r2)

        s1, s2, r1, r2 = jax.lax.fori_loop(
            0, no_samples, body, (zeros2, zeros2, zeros1, zeros1))
        n = float(no_samples)
        mean = s1 / n
        var = s2 / n - jnp.square(mean)
        if r2p_fn is not None:
            r_mean = r1 / n
            r_var = r2 / n - jnp.square(r_mean)
            mean = jnp.concatenate([mean, r_mean[..., None]], -1)
            var = jnp.concatenate([var, r_var[..., None]], -1)
        return mean, jnp.maximum(var, 0.0)

    def posterior_means(self, key, params, mvg: bool, no_samples: int = 20,
                        return_stds: bool = False, r2p_fn=None):
        """MC posterior means (and biased variances, matching the
        reference's 1/N convention) of physical OEF/DBV and optionally R2'
        (reference: model.py:326-343 calculate_means).

        r2p_fn: optional callable (oef, dbv) -> r2p appended as 3rd channel.
        Returns (..., 2|3) means [, same-shape stds].
        """
        samples = self.sample_many(key, params, mvg, no_samples)  # (S, ..., 2)
        means = jnp.mean(samples, axis=0)
        outs = [means]
        if return_stds:
            stds = jnp.mean(jnp.square(samples - means[None]), axis=0)
            outs.append(stds)
        if r2p_fn is not None:
            r2ps = r2p_fn(samples[..., 0], samples[..., 1])       # (S, ...)
            r2p_mean = jnp.mean(r2ps, axis=0)[..., None]
            outs[0] = jnp.concatenate([outs[0], r2p_mean], axis=-1)
            if return_stds:
                r2p_var = jnp.mean(jnp.square(r2ps - r2p_mean[None, ..., 0]), axis=0)
                outs[1] = jnp.concatenate([outs[1], r2p_var[..., None]], axis=-1)
        return tuple(outs) if return_stds else outs[0]
