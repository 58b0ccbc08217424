"""Emission likelihoods.

``emission_mean`` is the linear-Gaussian observation model y = x·C + d
(likelihoods.py:76-79).  ``Bernoulli`` reproduces the probit-Bernoulli
likelihood with Gauss-Hermite fallback (likelihoods.py:129-186) for API
parity; it is not used by the main GPSSM path.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ffvd_tpu.ops.quadrature import ndiagquad


def emission_mean(x: jnp.ndarray, c: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """ŷ = x C + d; x: (..., D), c: (D, P), d: (P,) → (..., P)."""
    return x @ c + d


def use_full_r(emission_noise: str, p_dim: int) -> bool:
    """Does this emission mode use the full lower-Cholesky R?  The single
    source of truth for the "auto" rule (full iff P > 1) — shared by the
    ELBO, the windowed ELBO, particle-Gibbs weights, and eval."""
    return emission_noise == "full" or (emission_noise == "auto"
                                        and p_dim > 1)


def emission_log_lik_rows(params, y: jnp.ndarray, y_mean: jnp.ndarray,
                          emission_noise: str) -> jnp.ndarray:
    """Row-wise emission log density under the configured noise model:
    full-Cholesky (reference logdensity_norm, likelihoods.py:114-127) or
    diagonal (logdensity_norm_diag, :96-111).  (N, P) → (N,)."""
    from ffvd_tpu.ops.densities import logdensity_norm, logdensity_norm_diag
    if use_full_r(emission_noise, params.c.shape[1]):
        return logdensity_norm(y, y_mean, params.rchol)
    return logdensity_norm_diag(y, y_mean, params.rchol_diag)


def inv_probit(x: jnp.ndarray) -> jnp.ndarray:
    """Probit link with 1e-3 jitter (likelihoods.py:129-131)."""
    jitter = 1e-3
    return 0.5 * (1.0 + jax.scipy.special.erf(x / math.sqrt(2.0))) \
        * (1 - 2 * jitter) + jitter


class Bernoulli:
    """Probit-Bernoulli likelihood (likelihoods.py:134-186)."""

    def __init__(self, num_gauss_hermite_points: int = 20):
        self.num_gauss_hermite_points = num_gauss_hermite_points

    def logdensity(self, x, p):
        return jnp.log(jnp.where(x == 1, p, 1 - p))

    def logp(self, f, y):
        return self.logdensity(y, inv_probit(f))

    def conditional_mean(self, f):
        return inv_probit(f)

    def conditional_variance(self, f):
        p = self.conditional_mean(f)
        return p - jnp.square(p)

    def predict_mean_and_var(self, fmu, fvar):
        p = inv_probit(fmu / jnp.sqrt(1 + fvar))
        return p, p - jnp.square(p)

    def predict_density(self, fmu, fvar, y):
        p = self.predict_mean_and_var(fmu, fvar)[0]
        return self.logdensity(y, p)

    def variational_expectations(self, fmu, fvar, y):
        """∫ log p(y|f) N(f; fmu, fvar) df via Gauss-Hermite
        (likelihoods.py:169-185)."""
        return ndiagquad(lambda f, Y: self.logp(f, Y),
                         self.num_gauss_hermite_points, fmu, fvar, Y=y)
