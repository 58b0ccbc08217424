"""Batched Cholesky / triangular-solve helpers with PSD-jitter escalation.

The reference wraps graph *construction* of ``tf.linalg.cholesky`` in
try/except with a 1e-4 fallback jitter (conditionals_multi_output.py:27-30,
161-164) — which never actually guards runtime failures (SURVEY.md §2.7).
Here the retry is a real runtime repair: if any Cholesky in the batch produces
NaNs, the factorization is redone with an escalated jitter, selected with
``jnp.where`` so the whole thing stays jit-compatible and branch-free on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def psd_cholesky(mat: jnp.ndarray, retry_jitter: float = 1e-4) -> jnp.ndarray:
    """Cholesky of a batch of PSD matrices ``(..., M, M)`` with a single
    escalated-jitter retry (mirrors the intent of the reference's 1e-4
    fallback, conditionals_multi_output.py:30)."""
    chol = jnp.linalg.cholesky(mat)
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
    # Per-matrix failure mask: any non-finite entry in that factor.
    bad = jnp.any(~jnp.isfinite(chol), axis=(-2, -1), keepdims=True)
    retry = jnp.linalg.cholesky(mat + retry_jitter * eye)
    return jnp.where(bad, retry, chol)


def tri_solve(chol: jnp.ndarray, rhs: jnp.ndarray, *, lower: bool = True,
              trans: bool = False) -> jnp.ndarray:
    """Batched triangular solve; thin wrapper so call sites read like the
    math.  chol: (..., M, M), rhs: (..., M, K)."""
    return solve_triangular(chol, rhs, lower=lower,
                            trans=1 if trans else 0)


def chol_logdet(chol: jnp.ndarray) -> jnp.ndarray:
    """log|A| from chol(A): 2 Σ log diag(L).  (..., M, M) → (...)."""
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1)


def chol_solve(chol: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """A⁻¹ rhs from chol(A) via two triangular solves."""
    y = solve_triangular(chol, rhs, lower=True)
    return solve_triangular(chol, y, lower=True, trans=1)
