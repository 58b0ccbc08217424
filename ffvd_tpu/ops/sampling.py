"""Reparameterized Gaussian sampling — rebuild of ``vfegpssm/utils.py``.

``get_rand`` (utils.py:4-11): draw from N(mean, var) given either a diagonal
variance (N, D) or a full covariance (D, N, N), with the reference's 1e-7
Cholesky jitter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ffvd_tpu.ops.chol import psd_cholesky


def get_rand(key: jax.Array, mean: jnp.ndarray, var: jnp.ndarray,
             full_cov: bool = False) -> jnp.ndarray:
    """mean (N, D); var (N, D) diagonal or (D, N, N) full covariance."""
    if full_cov:
        n = mean.shape[0]
        eye = jnp.eye(n, dtype=mean.dtype)
        chol = psd_cholesky(var + 1e-7 * eye)
        eps = jax.random.normal(key, (var.shape[0], n), mean.dtype)
        rnd = jnp.einsum("dnm,dm->nd", chol, eps,
                         preferred_element_type=mean.dtype)
        return mean + rnd
    eps = jax.random.normal(key, mean.shape, mean.dtype)
    return mean + eps * jnp.sqrt(var)
