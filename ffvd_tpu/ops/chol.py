"""Batched Cholesky / triangular-solve helpers with PSD-jitter escalation.

The reference wraps graph *construction* of ``tf.linalg.cholesky`` in
try/except with a 1e-4 fallback jitter (conditionals_multi_output.py:27-30,
161-164) — which never actually guards runtime failures (SURVEY.md §2.7).
Here the retry is a real runtime repair: if any Cholesky in the batch produces
NaNs, the factorization is redone with an escalated jitter, selected with
``jnp.where`` so the whole thing stays jit-compatible and branch-free on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def _phi(x: jnp.ndarray) -> jnp.ndarray:
    """tril with halved diagonal — the Φ of the cholesky differential
    (Murray 2016, arXiv:1602.07527)."""
    return jnp.tril(x) / (1.0 + jnp.eye(x.shape[-1], dtype=x.dtype))


def _psd_cholesky_impl(mat: jnp.ndarray, retry_jitter: float) -> jnp.ndarray:
    """Factorize with up-to-two escalated-jitter retries.  The retries hide
    behind lax.cond, so the common path pays exactly ONE factorization.

    The first retry is the reference's ABSOLUTE 1e-4 jitter
    (conditionals_multi_output.py:30).  The second is RELATIVE to each
    matrix's diagonal scale: the collapsed H = F̃ᵀF̃/Q + I can reach ~1e20
    when sampled hyperparameters are extreme, where any absolute jitter is
    below fp32 rounding and a rank-deficient block yields a non-positive
    pivot — a jitter proportional to mean(diag) restores positive
    definiteness at every scale."""
    eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)

    def per_bad(c):
        return jnp.any(~jnp.isfinite(c), axis=(-2, -1), keepdims=True)

    def retry(l):
        l1 = jnp.where(per_bad(l),
                       jnp.linalg.cholesky(mat + retry_jitter * eye), l)

        def rel_retry(c):
            diag_scale = jnp.mean(jnp.diagonal(mat, axis1=-2, axis2=-1),
                                  axis=-1)[..., None, None]
            rel = 1e-4 * jnp.maximum(diag_scale, 1.0)
            return jnp.where(per_bad(c),
                             jnp.linalg.cholesky(mat + rel * eye), c)

        return jax.lax.cond(jnp.any(~jnp.isfinite(l1)), rel_retry,
                            lambda c: c, l1)

    l0 = jnp.linalg.cholesky(mat)
    return jax.lax.cond(jnp.any(~jnp.isfinite(l0)), retry, lambda c: c, l0)


# Under vmap, lax.cond linearizes into select (both branches execute), so a
# vmapped caller — the multi-dataset trainer vmaps the whole step — would pay
# the two retry factorizations every step even when all matrices are healthy.
# The impl is batch-polymorphic (arbitrary leading dims), so the batching
# rule simply collapses the vmap axis into the impl's batch dims, keeping the
# retries behind a REAL branch.  One wrapper per retry_jitter value (the
# jitter is static).
_CHOL_VMAP_CACHE: dict = {}


def _psd_cholesky_batchsafe(mat: jnp.ndarray, retry_jitter: float):
    fn = _CHOL_VMAP_CACHE.get(retry_jitter)
    if fn is None:
        @jax.custom_batching.custom_vmap
        def fn(m):
            return _psd_cholesky_impl(m, retry_jitter)

        @fn.def_vmap
        def _(axis_size, in_batched, m):
            del axis_size, in_batched
            return fn(m), True

        _CHOL_VMAP_CACHE[retry_jitter] = fn
    return fn(mat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def psd_cholesky(mat: jnp.ndarray, retry_jitter: float = 1e-4) -> jnp.ndarray:
    """Cholesky of a batch of PSD matrices ``(..., M, M)`` with escalated
    jitter retries (the reference's 1e-4 fallback,
    conditionals_multi_output.py:30, turned into a real runtime repair).

    Implemented as a custom_vjp: the forward escalates jitter only when a
    factor comes back non-finite (one factorization in the common path —
    this op runs twice per training step, on Kmm and on the collapsed H),
    and the backward applies the standard cholesky pullback
    Σ̄ = L⁻ᵀ Φ(Lᵀ L̄) L⁻¹ from the saved factor, so no NaN from a failed
    first attempt can leak into gradients."""
    return _psd_cholesky_batchsafe(mat, retry_jitter)


def _psd_cholesky_fwd(mat, retry_jitter):
    l = _psd_cholesky_batchsafe(mat, retry_jitter)
    return l, l


def _psd_cholesky_bwd(retry_jitter, l, lbar):
    ltlbar = jnp.einsum("...ji,...jk->...ik", l, lbar,
                        precision="highest",
                        preferred_element_type=l.dtype)
    p = _phi(ltlbar)
    # Σ̄ = L⁻ᵀ P L⁻¹ via two triangular solves.
    tmp = solve_triangular(l, p, lower=True, trans=1)          # L⁻ᵀ P
    sigma_bar = solve_triangular(
        l, tmp.swapaxes(-1, -2), lower=True, trans=1).swapaxes(-1, -2)
    # Match jnp.linalg.cholesky's symmetrized cotangent (identical parameter
    # grads for any symmetric-constructed input, e.g. our gram + jitter·I).
    sigma_bar = 0.5 * (sigma_bar + sigma_bar.swapaxes(-1, -2))
    return (sigma_bar,)


psd_cholesky.defvjp(_psd_cholesky_fwd, _psd_cholesky_bwd)


# ---------------------------------------------------------------------------
# Blocked triangular inverse
# ---------------------------------------------------------------------------
#
# XLA's TPU triangular_solve is a sequential expander whose cost is dominated
# by a per-call fixed overhead plus a column sweep ∝ M; at M=512 it is the
# single largest piece of the training step (~0.4 ms of ~2.4 ms, TODO round
# 1).  The inverse of a lower-triangular matrix decomposes exactly:
#
#     [A 0; C D]⁻¹ = [A⁻¹ 0; −D⁻¹ C A⁻¹ D⁻¹]
#
# so we invert ALL diagonal BLOCK×BLOCK blocks in ONE batched small solve and
# assemble the rest with pure matmuls (MXU work, no sequential sweeps).  This
# is exact — same algorithm LAPACK's trtri uses — not an iterative
# approximation.

_TRI_INV_BLOCK = 64
_TRI_INV_MIN_M = 256


def blocked_tri_inv(l: jnp.ndarray, block: int = _TRI_INV_BLOCK) -> jnp.ndarray:
    """Inverse of batched lower-triangular ``l`` (..., M, M) via block
    elimination: one batched (M/block) small triangular solve + log₂(M/block)
    levels of batched matmuls.  Requires M % block == 0 (callers fall back to
    a direct solve otherwise)."""
    m = l.shape[-1]
    eye_b = jnp.eye(block, dtype=l.dtype)
    if m <= block:
        return solve_triangular(l, jnp.broadcast_to(jnp.eye(m, dtype=l.dtype),
                                                    l.shape), lower=True)
    assert m % block == 0, "blocked_tri_inv requires M divisible by block"
    nb = m // block
    diag_blocks = jnp.stack(
        [l[..., i * block:(i + 1) * block, i * block:(i + 1) * block]
         for i in range(nb)], axis=-3)                     # (..., nb, B, B)
    leaf_inv = solve_triangular(
        diag_blocks, jnp.broadcast_to(eye_b, diag_blocks.shape), lower=True)

    def combine(lo: int, hi: int) -> jnp.ndarray:
        if hi - lo == block:
            return leaf_inv[..., lo // block, :, :]
        mid = lo + (((hi - lo) // 2 + block - 1) // block) * block
        ai = combine(lo, mid)
        di = combine(mid, hi)
        c = l[..., mid:hi, lo:mid]
        ci = -_mm(_mm(di, c), ai)
        top = jnp.concatenate(
            [ai, jnp.zeros(ai.shape[:-1] + (hi - mid,), l.dtype)], axis=-1)
        bot = jnp.concatenate([ci, di], axis=-1)
        return jnp.concatenate([top, bot], axis=-2)

    return combine(0, m)


def _tri_inv(l: jnp.ndarray) -> jnp.ndarray:
    """Triangular inverse dispatch: blocked (matmul-dominated) at large M,
    direct XLA solve otherwise."""
    m = l.shape[-1]
    if m >= _TRI_INV_MIN_M and m % _TRI_INV_BLOCK == 0:
        return blocked_tri_inv(l)
    eye = jnp.eye(m, dtype=l.dtype)
    return solve_triangular(l, jnp.broadcast_to(eye, l.shape), lower=True)


# ---------------------------------------------------------------------------
# Fused Cholesky + triangular inverse
# ---------------------------------------------------------------------------
#
# XLA's TPU triangular_solve is a sequential expander with a large fixed cost
# (~0.3-0.5 ms for (4, M, M) regardless of M in our range) while its Cholesky
# and matmuls are fast.  A training step needs Lm⁻¹ anyway (the projection is
# a matmul against it), so we fuse chol+inverse into one custom op whose
# BACKWARD is pure matmuls — no triangular solve appears anywhere in the
# gradient path:
#
#   d(L⁻¹) = −L⁻¹ dL L⁻¹         ⇒  L̄_eff = L̄ − L⁻ᵀ (L⁻¹)‾ L⁻ᵀ
#   Σ̄ = L⁻ᵀ Φ(Lᵀ L̄_eff) L⁻¹      (all with the saved explicit L⁻¹)
#
# Φ(LᵀX) reads only tril(X), so upper-triangle cotangent junk is ignored
# exactly as in jnp.linalg.cholesky's own rule.

@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def chol_and_inv(mat: jnp.ndarray, retry_jitter: float = 1e-4):
    """(L, L⁻¹) of a batch of PSD matrices with jitter-escalating retries.
    One factorization + one triangular inversion forward; matmul-only
    backward."""
    l = _psd_cholesky_batchsafe(mat, retry_jitter)
    l_inv = _tri_inv(l)
    return l, l_inv


def _chol_and_inv_fwd(mat, retry_jitter):
    out = chol_and_inv(mat, retry_jitter)
    return out, out


def _mm(a, b):
    return jnp.einsum("...ij,...jk->...ik", a, b, precision="highest",
                      preferred_element_type=a.dtype)


def _chol_and_inv_bwd(retry_jitter, res, cots):
    l, l_inv = res
    lbar, linvbar = cots
    l_invT = l_inv.swapaxes(-1, -2)
    lbar_eff = lbar - _mm(_mm(l_invT, linvbar), l_invT)
    p = _phi(jnp.einsum("...ji,...jk->...ik", l, lbar_eff,
                        precision="highest",
                        preferred_element_type=l.dtype))
    sigma_bar = _mm(_mm(l_invT, p), l_inv)
    sigma_bar = 0.5 * (sigma_bar + sigma_bar.swapaxes(-1, -2))
    return (sigma_bar,)


chol_and_inv.defvjp(_chol_and_inv_fwd, _chol_and_inv_bwd)


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
