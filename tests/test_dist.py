"""Property tests for the LogitMVN distribution toolkit.

Strategy (SURVEY.md SS4, gate (2)): the reference implements the MVG KL
twice -- sampled (model.py:592-610) and closed-form (model.py:612-652) --
which gives an internal cross-check we replicate; densities are checked
against scipy's multivariate normal plus an explicit logit-Jacobian.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats as st

from qbold_vi_tpu.dist.logit_mvn import LogitMVN, logit

D = LogitMVN()


def make_params(rng, shape, mvg=True):
    k = 5 if mvg else 4
    p = rng.normal(size=shape + (k,)).astype(np.float32)
    return jnp.asarray(p)


def chol_cov(oef_ls, dbv_ls, offd):
    L = np.array([[math.exp(oef_ls), 0.0], [offd, math.exp(dbv_ls)]])
    return L @ L.T


def test_transform_roundtrip():
    x = jnp.asarray([[0.3, 0.05], [0.7, 0.15]], jnp.float32)
    back = D.backwards_transform(x, include_logit=True)
    fwd = D.forward_transform(back)
    np.testing.assert_allclose(np.asarray(fwd), np.asarray(x), atol=5e-6)


def test_std_transform_range_and_inverse():
    raw = jnp.linspace(-5, 5, 41)
    ls = D.transform_std(raw)
    assert np.all(np.asarray(ls) > -4.0) and np.all(np.asarray(ls) < 2.0)
    mid = jnp.linspace(-2.0, 0.9, 11)
    np.testing.assert_allclose(np.asarray(D.transform_std(D.inv_transform_std(mid))),
                               np.asarray(mid), atol=2e-4)
    od = D.transform_offdiag(raw)
    assert np.all(np.abs(np.asarray(od)) < math.exp(-2.0) + 1e-7)


def test_mvg_log_prob_vs_scipy(rng):
    params = make_params(rng, (50,))
    obs_unit = rng.uniform(0.1, 0.9, size=(50, 2)).astype(np.float32)
    oef = obs_unit[:, 0] * D.oef_range + D.min_oef
    dbv = obs_unit[:, 1] * D.dbv_range + D.min_dbv
    obs = jnp.asarray(np.stack([oef, dbv], -1))

    ours = np.asarray(D.logit_gaussian_mvg_log_prob(obs, params))

    p = np.asarray(params, np.float64)
    for i in range(50):
        mu = np.array([p[i, 0], p[i, 2]])
        oef_ls = math.tanh(p[i, 1]) * 3 - 1
        dbv_ls = math.tanh(p[i, 3]) * 3 - 1
        offd = math.tanh(p[i, 4]) * math.exp(-2)
        cov = chol_cov(oef_ls, dbv_ls, offd)
        x = obs_unit[i].astype(np.float64)
        lp = st.multivariate_normal(mu, cov).logpdf(np.log(x / (1 - x)))
        # density of the logit-normal adds -sum log x(1-x); reference returns
        # the NEGATIVE log prob (logit_mvn.py:60-69)
        expect = -(lp - np.sum(np.log(x) + np.log(1 - x)))
        assert abs(ours[i] - expect) < 5e-3 * max(1.0, abs(expect)), (i, ours[i], expect)


def test_diag_log_prob_consistent_with_mvg_at_zero_offdiag(rng):
    params4 = make_params(rng, (30,), mvg=False)
    # force the off-diagonal raw to 0 -> same distribution
    params5 = jnp.concatenate([params4, jnp.zeros((30, 1))], -1)
    obs_unit = rng.uniform(0.2, 0.8, size=(30, 2)).astype(np.float32)
    oef = obs_unit[:, 0] * D.oef_range + D.min_oef
    dbv = obs_unit[:, 1] * D.dbv_range + D.min_dbv
    obs = jnp.asarray(np.stack([oef, dbv], -1))
    mvg = np.asarray(D.logit_gaussian_mvg_log_prob(obs, params5))
    diag = np.asarray(D.logit_gaussian_log_prob(obs, params4))
    # diag drops the log(2 pi) constant (model.py:402-404): difference is
    # exactly log(2 pi)
    np.testing.assert_allclose(mvg - diag, math.log(2 * math.pi), atol=0.02)


def test_sample_statistics_match_parameters(rng):
    # moderate stds so the sigmoid is near-linear around the mean
    params = jnp.asarray([[0.2, -10.0, -1.0, -10.0, 100.0]], jnp.float32)
    # raw -10 -> log_std ~ -4 (tiny); offdiag raw 100 -> e^-2 * tanh(100) ~ 0.135
    key = jax.random.PRNGKey(0)
    s = D.sample_many(key, params, mvg=True, no_samples=4000)[:, 0, :]
    s = np.asarray(s)
    # invert the forward transform to inspect the logit-space draws
    lo = np.log(((s[:, 0] - D.min_oef) / D.oef_range) / (1 - (s[:, 0] - D.min_oef) / D.oef_range))
    ld = np.log(((s[:, 1] - D.min_dbv) / D.dbv_range) / (1 - (s[:, 1] - D.min_dbv) / D.dbv_range))
    assert abs(lo.mean() - 0.2) < 5e-3
    assert abs(ld.mean() - (-1.0)) < 5e-3
    # correlated: dbv logit driven by z0 through the off-diagonal
    corr = np.corrcoef(lo, ld)[0, 1]
    assert corr > 0.95  # offdiag dominates the tiny diagonal stds


def test_sampled_kl_matches_closed_form(rng):
    # Realistic posterior/prior regime: moderate means and stds, so the
    # estimator's variance is bounded and the saturating sigmoid clip in
    # the log-prob (logit_mvn.py:64-65) never engages. With wildly
    # mismatched q/p the MC estimator is heavy-tailed by construction.
    def draw(n):
        mu = rng.normal(size=(n, 2)) * 0.4
        ls_raw = rng.normal(size=(n, 2)) * 0.3    # log_std ~ -1 +- 0.9
        od_raw = rng.normal(size=(n, 1))
        return jnp.asarray(np.concatenate(
            [mu[:, :1], ls_raw[:, :1], mu[:, 1:], ls_raw[:, 1:], od_raw], -1
        ).astype(np.float32))

    q, p = draw(20), draw(20)
    key = jax.random.PRNGKey(3)
    kl_mc = np.asarray(D.mvg_kl_samples(key, q, p, no_samples=4000))
    kl_cf = np.asarray(D.mvg_kl_closed_form(q, p))
    np.testing.assert_allclose(kl_mc, kl_cf, rtol=0.15, atol=0.08)


def test_fast_sampled_kl_equals_reference_form(rng):
    """The algebraically-reduced sampled KL (Jacobian/normaliser terms
    cancelled, logit-space clamp) must equal the direct two-log-prob
    reference transcription in value AND gradient for the same key."""
    q = make_params(rng, (12,)) * 0.5
    p = make_params(rng, (12,)) * 0.5
    key = jax.random.PRNGKey(5)
    fast = D.mvg_kl_samples(key, q, p, no_samples=32)
    ref = D.mvg_kl_samples_reference(key, q, p, no_samples=32)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)

    g_fast = jax.grad(lambda a, b: jnp.sum(D.mvg_kl_samples(
        key, a, b, no_samples=32)), argnums=(0, 1))(q, p)
    g_ref = jax.grad(lambda a, b: jnp.sum(D.mvg_kl_samples_reference(
        key, a, b, no_samples=32)), argnums=(0, 1))(q, p)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_closed_form_kl_vs_scipy(rng):
    q = make_params(rng, (10,))
    p = make_params(rng, (10,))
    ours = np.asarray(D.mvg_kl_closed_form(q, p), np.float64)
    qn = np.asarray(q, np.float64)
    pn = np.asarray(p, np.float64)
    for i in range(10):
        def cov_of(row):
            ls0 = math.tanh(row[1]) * 3 - 1
            ls1 = math.tanh(row[3]) * 3 - 1
            od = math.tanh(row[4]) * math.exp(-2)
            return chol_cov(ls0, ls1, od)
        Sq, Sp = cov_of(qn[i]), cov_of(pn[i])
        mq = np.array([qn[i, 0], qn[i, 2]])
        mp = np.array([pn[i, 0], pn[i, 2]])
        iSp = np.linalg.inv(Sp)
        kl = 0.5 * (np.trace(iSp @ Sq) + (mp - mq) @ iSp @ (mp - mq)
                    - 2 + math.log(np.linalg.det(Sp) / np.linalg.det(Sq)))
        assert abs(ours[i] - kl) < 1e-3 * max(1.0, abs(kl))


def test_diag_kl_zero_for_identical():
    params = jnp.asarray([[0.1, 0.3, -0.5, 0.2]], jnp.float32)
    kl = float(D.diag_kl(params, params)[0])
    assert abs(kl) < 1e-6


def test_diag_kl_vs_mc(rng):
    q = make_params(rng, (1,), mvg=False) * 0.5
    p = make_params(rng, (1,), mvg=False) * 0.5
    analytic = float(D.diag_kl(q, p)[0])
    # brute-force MC in logit space with numpy
    qn = np.asarray(q, np.float64)[0]
    pn = np.asarray(p, np.float64)[0]
    mu_q = np.array([qn[0], qn[2]])
    sd_q = np.exp(np.tanh([qn[1], qn[3]]) * 3 - 1)
    mu_p = np.array([pn[0], pn[2]])
    sd_p = np.exp(np.tanh([pn[1], pn[3]]) * 3 - 1)
    z = rng.normal(size=(200000, 2)) * sd_q + mu_q
    lq = st.norm(mu_q, sd_q).logpdf(z).sum(-1)
    lp = st.norm(mu_p, sd_p).logpdf(z).sum(-1)
    mc = (lq - lp).mean()
    assert abs(analytic - mc) < 0.05 * max(1.0, abs(mc))


def test_kl_stop_gradient_semantics():
    """Gradient of the sampled KL wrt q must exclude the score-function
    term (stop_gradient on q inside log q, model.py:596): at q == p the
    pathwise gradient of E_q[log q - log p] vanishes in expectation but a
    naive estimator (no stop_gradient) has nonzero per-sample gradient
    through log q's params. We check our gradient matches the pathwise
    estimator computed manually."""
    q = jnp.asarray([[0.2, 0.1, -0.4, -0.2, 0.3]], jnp.float32)
    p = jax.lax.stop_gradient(q) + 0.1
    key = jax.random.PRNGKey(7)

    g = jax.grad(lambda qq: jnp.sum(D.mvg_kl_samples(key, qq, p, no_samples=64)))(q)
    assert np.all(np.isfinite(np.asarray(g)))

    # manual pathwise estimator: same samples, same stop-gradient placement
    def manual(qq):
        samples = D.sample_many(key, qq, mvg=True, no_samples=64)
        lq = -jax.vmap(lambda s: D.logit_gaussian_mvg_log_prob(s, jax.lax.stop_gradient(qq)))(samples)
        lp = -jax.vmap(lambda s: D.logit_gaussian_mvg_log_prob(s, p))(samples)
        return jnp.sum(jnp.mean(lq - lp, 0))

    g2 = jax.grad(manual)(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-5, atol=1e-6)


def test_scale_uncertainty(rng):
    """Scaling the spread by f multiplies sample std by ~f without moving
    the mean (reference: model.py:225-237)."""
    q = jnp.asarray([[0.1, -0.3, -0.6, -0.2, 0.4]], jnp.float32)
    f = 0.25
    scaled = D.scale_uncertainty(q, f, mvg=True)
    # means untouched
    np.testing.assert_allclose(np.asarray(scaled[0, [0, 2]]),
                               np.asarray(q[0, [0, 2]]))
    key = jax.random.PRNGKey(0)
    s_orig = np.asarray(D.sample_many(key, q, True, 2000))[:, 0, :]
    s_scal = np.asarray(D.sample_many(key, scaled, True, 2000))[:, 0, :]
    # compare in logit space (sigmoid is monotone; use moderate stds)
    lo = lambda s, i, r, m: np.log(((s[:, i] - m) / r) / (1 - (s[:, i] - m) / r))
    for i, r, m in ((0, D.oef_range, D.min_oef), (1, D.dbv_range, D.min_dbv)):
        ratio = lo(s_scal, i, r, m).std() / lo(s_orig, i, r, m).std()
        # the tanh squash makes the scaling approximate away from the
        # linear region; it must still shrink markedly toward f
        assert ratio < 0.55, (i, ratio)

    q4 = q[:, :4]
    scaled4 = D.scale_uncertainty(q4, f, mvg=False)
    assert scaled4.shape == q4.shape


def test_posterior_means_and_r2p(rng):
    params = jnp.asarray(rng.normal(size=(4, 4, 5)).astype(np.float32) * 0.3)
    key = jax.random.PRNGKey(11)

    def r2p_fn(oef, dbv):
        return 301.7 * oef * dbv

    means, stds = D.posterior_means(key, params, mvg=True, no_samples=50,
                                    return_stds=True, r2p_fn=r2p_fn)
    assert means.shape == (4, 4, 3)
    assert stds.shape == (4, 4, 3)
    m = np.asarray(means)
    assert np.all(m[..., 0] > D.min_oef) and np.all(m[..., 0] < D.min_oef + D.oef_range)
    assert np.all(m[..., 1] > D.min_dbv) and np.all(m[..., 1] < D.min_dbv + D.dbv_range)
    np.testing.assert_allclose(m[..., 2], 301.7 * 0 + m[..., 2])  # finite
    assert np.all(np.isfinite(np.asarray(stds)))


class TestStreamedKL:
    """The streaming custom-VJP sampled KL must match the materialised
    form exactly (same key stream) in value AND gradient -- it replaces
    (S, ...) HBM tensors with a PRNG-recompute fori_loop on both passes
    (benchmarks/roofline.py motivated this: the KL was the training
    step's largest HBM consumer)."""

    def _params(self, rng, n=64):
        q = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.4)
        p = jnp.asarray(rng.normal(size=(n, 5)).astype(np.float32) * 0.4)
        return q, p

    def test_value_matches_materialised(self, rng):
        q, p = self._params(rng)
        key = jax.random.PRNGKey(3)
        a = D.mvg_kl_samples(key, q, p, no_samples=32, streamed=False)
        b = D.mvg_kl_samples(key, q, p, no_samples=32, streamed=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-6, atol=2e-5)

    def test_gradients_match_materialised(self, rng):
        """Exact analytic VJP: grads w.r.t. BOTH raw param tensors agree
        with AD through the materialised form, including the tanh squash
        chains, the straight-through clip, and the stop-gradient
        placement on q inside log q."""
        q, p = self._params(rng)
        key = jax.random.PRNGKey(5)
        w = jnp.asarray(np.linspace(0.5, 2.0, q.shape[0]), jnp.float32)

        def loss(streamed):
            return lambda qq, pp: jnp.sum(w * D.mvg_kl_samples(
                key, qq, pp, no_samples=16, streamed=streamed))

        ga = jax.grad(loss(False), argnums=(0, 1))(q, p)
        gb = jax.grad(loss(True), argnums=(0, 1))(q, p)
        for a, b in zip(ga, gb):
            scale = np.abs(np.asarray(a)).max() + 1.0
            np.testing.assert_allclose(np.asarray(a) / scale,
                                       np.asarray(b) / scale,
                                       rtol=1e-5, atol=1e-6)

    def test_streamed_under_jit_and_vmap(self, rng):
        q, p = self._params(rng, n=8)
        key = jax.random.PRNGKey(7)

        @jax.jit
        def f(qq, pp):
            return D.mvg_kl_samples(key, qq, pp, no_samples=8)

        out = f(q, p)
        assert out.shape == (8,)
        assert np.all(np.isfinite(np.asarray(out)))
        # and inside a grad-of-jit (the training-step usage)
        g = jax.jit(jax.grad(lambda qq: jnp.sum(f(qq, p))))(q)
        assert np.all(np.isfinite(np.asarray(g)))


class TestSupportBoundary:
    def test_diagonal_log_prob_finite_at_range_bounds(self):
        """Observations exactly at the OEF/DBV support bounds (e.g. the
        clipped-normal atom when oef_start == min_oef) must not logit to
        +-inf: the diagonal path now clips like the MVG path."""
        import jax.numpy as jnp
        import numpy as np

        from qbold_vi_tpu.dist import LogitMVN

        d = LogitMVN()
        obs = jnp.asarray([[d.min_oef, d.min_dbv],
                           [d.min_oef + d.oef_range,
                            d.min_dbv + d.dbv_range]], jnp.float32)
        params = jnp.zeros((2, 4), jnp.float32)
        nll = d.logit_gaussian_log_prob(obs, params)
        assert np.all(np.isfinite(np.asarray(nll)))
        mvg = d.logit_gaussian_mvg_log_prob(obs, jnp.zeros((2, 5)))
        assert np.all(np.isfinite(np.asarray(mvg)))
