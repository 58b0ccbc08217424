"""Gaussian log-density trio.

IMPORTANT parity note: like the reference (likelihoods.py:89-127), these
densities OMIT the -0.5·log(2π) constant per dimension.  The free-form ELBO is
assembled from these un-normalized log densities, so golden values only match
if the constant stays out.  ``LOG_2PI_HALF`` is exported for consumers that
need properly normalized densities (e.g. test-NLL evaluation uses scipy's
normalized logpdf semantics, base_model.py:629/:903).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

LOG_2PI_HALF = 0.5 * math.log(2.0 * math.pi)


def logdensity_norm_diag_nonvec(y: jnp.ndarray, ymean: jnp.ndarray,
                                rchol_diag: jnp.ndarray) -> jnp.ndarray:
    """Elementwise un-normalized Normal log density (likelihoods.py:89-93).

    y, ymean: (..., D); rchol_diag: (D,) std-devs. Returns (..., D):
    ``-((y-μ)/σ)²/2 - log σ`` per element.
    """
    z = (y - ymean) / rchol_diag
    return -0.5 * z * z - jnp.log(rchol_diag)


def logdensity_norm_diag(y: jnp.ndarray, ymean: jnp.ndarray,
                         rchol_diag: jnp.ndarray) -> jnp.ndarray:
    """Row-wise un-normalized diagonal-Normal log density
    (likelihoods.py:96-111).  y, ymean: (N, D); rchol_diag: (D,) → (N,)."""
    z = (y - ymean) / rchol_diag
    return -0.5 * jnp.sum(z * z, axis=-1) - jnp.sum(jnp.log(rchol_diag))


def logdensity_norm(y: jnp.ndarray, ymean: jnp.ndarray,
                    rchol: jnp.ndarray) -> jnp.ndarray:
    """Row-wise un-normalized full-covariance Normal log density with lower
    Cholesky ``rchol`` (likelihoods.py:114-127).  y broadcastable to ymean
    (N, D); rchol (D, D) → (N,)."""
    from jax.scipy.linalg import solve_triangular
    diff = (y - ymean)                                   # (N, D)
    # solve L a = diffᵀ  → a = L⁻¹ diffᵀ (triangular, not LU)
    a = solve_triangular(jnp.tril(rchol), diff.T.astype(rchol.dtype),
                         lower=True)                      # (D, N)
    exp_term = -0.5 * jnp.sum(a * a, axis=0)
    logdet = -jnp.sum(jnp.log(jnp.diagonal(rchol)))
    return exp_term + logdet
