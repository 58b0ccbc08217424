"""Property tests for the model layer (SURVEY.md §4 plan #3).

- The whitened conditional equals the dense GP predictive computed naively.
- The collapsed q(U) posterior mean minimizes the UNCOLLAPSED nll over U
  (analytic-collapse consistency; conditionals_multi_output.py:206-257 vs
  dgp_model.py:289-297).
- Priors match closed forms.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ffvd_tpu.model import priors
from ffvd_tpu.model.conditionals import (collapsed_u_posterior, kernel_precal,
                                         whitened_conditional)
from ffvd_tpu.model.elbo import elbo_terms, negative_elbo
from ffvd_tpu.model.params import GPSSMParams, SSMData
from ffvd_tpu.ops.kernels import KernelParams, se_cross, se_gram

rng = np.random.RandomState(7)


def small_model(n=20, m=6, d=2, u_dim=1):
    din = d + u_dim
    params = GPSSMParams(
        x=jnp.asarray(0.5 * rng.randn(n + 1, d)),
        u=jnp.asarray(rng.randn(m, d)),
        z=jnp.asarray(rng.randn(m, din)),
        kernel=KernelParams(
            log_variance=jnp.asarray(np.log(rng.rand(d) + 0.2)),
            log_lengthscales=jnp.asarray(np.log(rng.rand(d, din) + 0.5))),
        log_q=jnp.asarray(np.log(rng.rand(d) * 0.2 + 0.05)),
        c=jnp.asarray(rng.randn(d, 1)),
        d=jnp.asarray(rng.randn(1)),
        log_rchol=jnp.asarray([[np.log(0.3)]]))
    data = SSMData(y=jnp.asarray(rng.randn(n, 1)),
                   control=jnp.asarray(rng.randn(2 * n, u_dim)))
    return params, data


def test_whitened_conditional_vs_dense():
    params, _ = small_model()
    xq = jnp.asarray(rng.randn(5, 3))
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    mu, var = whitened_conditional("SquaredExponential", params.kernel, pre,
                                   params.z, params.u, xq)
    kmm = np.asarray(se_gram(params.kernel, params.z)) \
        + 1e-5 * np.eye(params.z.shape[0])
    knm = np.asarray(se_cross(params.kernel, xq, params.z))
    for d in range(2):
        lm = np.linalg.cholesky(kmm[d])
        a = np.linalg.solve(lm, knm[d].T)                  # (M, Nq)
        mu_d = a.T @ np.asarray(params.u[:, d])
        var_d = np.exp(params.kernel.log_variance[d]) - np.sum(a * a, axis=0)
        np.testing.assert_allclose(np.asarray(mu[:, d]), mu_d, rtol=1e-8)
        np.testing.assert_allclose(np.asarray(var[:, d]), var_d, rtol=1e-7,
                                   atol=1e-12)


def test_conditional_q_sqrt_adds_posterior_variance():
    params, _ = small_model()
    m = params.z.shape[0]
    xq = jnp.asarray(rng.randn(4, 3))
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    # random PD covariance factors per dim
    ls = np.stack([np.linalg.cholesky(
        (lambda b: b @ b.T + np.eye(m))(rng.randn(m, m))) for _ in range(2)])
    _, var0 = whitened_conditional("SquaredExponential", params.kernel, pre,
                                   params.z, params.u, xq)
    _, var1 = whitened_conditional("SquaredExponential", params.kernel, pre,
                                   params.z, params.u, xq,
                                   q_sqrt=jnp.asarray(ls))
    kmm = np.asarray(se_gram(params.kernel, params.z)) + 1e-5 * np.eye(m)
    knm = np.asarray(se_cross(params.kernel, xq, params.z))
    for d in range(2):
        lm = np.linalg.cholesky(kmm[d])
        a = np.linalg.solve(lm, knm[d].T)
        extra = np.sum((ls[d].T @ a) ** 2, axis=0)
        np.testing.assert_allclose(np.asarray(var1[:, d] - var0[:, d]), extra,
                                   rtol=1e-7, atol=1e-10)


@pytest.mark.slow
def test_collapsed_posterior_minimizes_uncollapsed_nll():
    """∂nll_uncollapsed/∂U = 0 at U = collapsed posterior mean."""
    params, data = small_model()
    n = params.n_transitions
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    xc = jnp.concatenate([params.x[:n], data.control[:n]], axis=1)
    u_star, _ = collapsed_u_posterior("SquaredExponential", params.kernel,
                                      pre, params.z, params.x, xc, params.q)
    import dataclasses
    p_star = dataclasses.replace(params, u=u_star)
    g = jax.grad(negative_elbo)(p_star, data, u_collapse=False)
    np.testing.assert_allclose(np.asarray(g.u), 0.0, atol=1e-10)


@pytest.mark.slow
def test_collapsed_vs_point_estimate_gap_is_logdet():
    """At the optimal point estimate U* = H⁻¹a the quadratic pieces cancel
    and nll_uncollapsed(U*) − nll_collapsed = −½Σ_d log|H_d|/Y_N — the
    collapsed bound pays exactly the posterior-uncertainty logdet that the
    point estimate ignores."""
    params, data = small_model()
    n = params.n_transitions
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    xc = jnp.concatenate([params.x[:n], data.control[:n]], axis=1)
    u_star, _ = collapsed_u_posterior("SquaredExponential", params.kernel,
                                      pre, params.z, params.x, xc, params.q)
    import dataclasses
    t_col = elbo_terms(params, data, u_collapse=True)
    t_unc = elbo_terms(dataclasses.replace(params, u=u_star), data,
                       u_collapse=False)
    gap = float(t_unc["nll"] - t_col["nll"])
    np.testing.assert_allclose(gap, -float(t_col["later_term1"]), rtol=1e-8)


def test_priors_closed_form():
    z = jnp.asarray(rng.randn(5, 3))
    kp = KernelParams(log_variance=jnp.asarray([0.1, -0.2]),
                      log_lengthscales=jnp.asarray(rng.randn(2, 3)))
    assert float(priors.prior_z("uniform", "SquaredExponential", kp, z)) == 0.0
    np.testing.assert_allclose(
        float(priors.prior_z("normal", "SquaredExponential", kp, z)),
        -0.5 * np.sum(np.asarray(z) ** 2), rtol=1e-12)
    ph = float(priors.prior_hyper("SquaredExponential", kp))
    expected = (-0.5 * np.sum(np.asarray(kp.log_lengthscales) ** 2)
                - 0.5 * np.sum((np.asarray(kp.log_variance)
                                - np.log(0.05)) ** 2))
    np.testing.assert_allclose(ph, expected, rtol=1e-12)


def test_strauss_counts_pairs():
    z = jnp.asarray([[0.0, 0.0], [0.1, 0.0], [5.0, 5.0]])
    # one pair within R=0.5 → logp = 1 · log 0.5
    np.testing.assert_allclose(float(priors.strauss_logp(z)), np.log(0.5),
                               rtol=1e-9)


def test_determinantal_prior_logdet():
    params, _ = small_model()
    val = float(priors.prior_z("determinantal", "SquaredExponential",
                               params.kernel, params.z))
    kmm = np.asarray(se_gram(params.kernel, params.z)) \
        + 1e-7 * np.eye(params.z.shape[0])
    expected = sum(np.linalg.slogdet(kmm[d])[1] for d in range(2))
    np.testing.assert_allclose(val, expected, rtol=1e-8)


def test_full_cov_conditional_diag_matches_diag_variant():
    from ffvd_tpu.model.conditionals import (kernel_precal,
                                             whitened_conditional,
                                             whitened_conditional_full_cov)
    params, _ = small_model()
    xq = jnp.asarray(rng.randn(5, 3))
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    m = params.z.shape[0]
    ls = np.stack([np.tril(rng.rand(m, m) * 0.3 + 0.1 * np.eye(m))
                   for _ in range(2)])
    for qs in (None, jnp.asarray(ls)):
        mu_d, var_d = whitened_conditional("SquaredExponential",
                                           params.kernel, pre, params.z,
                                           params.u, xq, q_sqrt=qs)
        mu_f, cov_f = whitened_conditional_full_cov(
            "SquaredExponential", params.kernel, pre, params.z, params.u,
            xq, q_sqrt=qs)
        np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_d),
                                   rtol=1e-10)
        diag = np.stack([np.diagonal(np.asarray(cov_f[d]))
                         for d in range(2)]).T
        np.testing.assert_allclose(diag, np.asarray(var_d), rtol=1e-7,
                                   atol=1e-12)
        # covariance is symmetric PSD-ish
        np.testing.assert_allclose(np.asarray(cov_f),
                                   np.asarray(cov_f).transpose(0, 2, 1),
                                   atol=1e-10)
