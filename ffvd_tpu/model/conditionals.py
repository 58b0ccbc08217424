"""Sparse-GP conditionals and the analytic collapse of q(U), batched over D.

This is the TPU rebuild of ``vfegpssm/conditionals_multi_output.py``.  The
reference loops D times in Python, producing D separate M×M Choleskys and
(N×M)·(M×M) matmuls per nll evaluation (conditionals_multi_output.py:107,158,
210,238).  Here each op is a single batched ``(D, …)`` tensor program:

- one batched Cholesky of ``(D, M, M)``,
- one batched triangular solve against the identity to get ``Lm⁻¹``
  (the reference's ``kernel_pre_cal`` trick, :124-169, applied always, because
  an M×M matmul pipelines onto the MXU far better than N sequential
  column-solves),
- batched MXU matmuls for the (D, M, N) projection.

All live code paths in the reference are whitened (``white=True`` everywhere,
dgp_model.py:99,343); only the whitened representation is implemented.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ffvd_tpu.ops import chol as cholops
from ffvd_tpu.ops import kernels as kops
from ffvd_tpu.ops.kernels import KernelParams


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Precal:
    """Cached factorization of Kmm for all D dims
    (reference: ``kernel_pre_cal``, conditionals_multi_output.py:124-169).

    lm:     (D, M, M) lower Cholesky of Kmm + jitter·I
    lm_inv: (D, M, M) Lm⁻¹ (lower triangular)
    """

    lm: jnp.ndarray
    lm_inv: jnp.ndarray


def kernel_precal(kernel_type: str, kparams: KernelParams, z: jnp.ndarray,
                  jitter: float = 1e-5) -> Precal:
    """Factorize Kmm = K(Z,Z) + jitter·I for all D dims at once.

    Uses the fused chol_and_inv custom op: its backward is matmul-only, so
    no (slow, sequential) TPU triangular solve appears in the gradient.

    NEGATIVE RESULT (round 3, kept as documentation): a scale-relative fp32
    jitter floor (jitter + 1e-3·maxdiag) was tried here against the fp32
    sampler escape and REJECTED by measurement — at real escaping-chain
    states (tests/golden/catapult_state_*.npz, grad_crosscheck.py) the bare
    fp32 kernel-hyper gradient is within 6-40% of fp64, while the floor
    distorted the TRUE gradient by 60-320% (the jitter's own gradient
    dominates the weak plateau signal).  The escape is instead handled in
    parameter space: sghmc_log_clip (reflecting barrier inside the
    objective's cliff) + sghmc_p_clip (catapult bound) — see config.py."""
    kmm = kops.gram(kernel_type, kparams, z)
    m = z.shape[0]
    eye = jnp.eye(m, dtype=kmm.dtype)
    lm, lm_inv = cholops.chol_and_inv(kmm + jitter * eye)
    return Precal(lm=lm, lm_inv=lm_inv)


def conditional(kernel_type: str, kparams: KernelParams, z: jnp.ndarray,
                u: jnp.ndarray, xnew: jnp.ndarray, q_sqrt=None,
                jitter: float = 1e-5):
    """Fresh-factorization whitened conditional — the reference's
    ``conditional`` (conditionals_multi_output.py:73-120), i.e. precal +
    cached conditional in one call."""
    pre = kernel_precal(kernel_type, kparams, z, jitter)
    return whitened_conditional(kernel_type, kparams, pre, z, u, xnew,
                                q_sqrt=q_sqrt)


def projection(kernel_type: str, kparams: KernelParams, pre: Precal,
               z: jnp.ndarray, xnew: jnp.ndarray) -> jnp.ndarray:
    """A = Lm⁻¹ K(Z, X̃) for all D dims → (D, M, N).

    Aᵀ is the reference's whitened feature matrix F̃ = K(X̃,Z) Lm⁻ᵀ
    (conditionals_multi_output.py:242)."""
    knm = kops.cross(kernel_type, kparams, xnew, z)          # (D, N, M)
    return jnp.einsum("dmk,dnk->dmn", pre.lm_inv, knm, precision="highest",
                      preferred_element_type=knm.dtype)       # (D, M, N)


def whitened_conditional(
    kernel_type: str,
    kparams: KernelParams,
    pre: Precal,
    z: jnp.ndarray,
    u: jnp.ndarray,
    xnew: jnp.ndarray,
    q_sqrt: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Whitened predictive q(f*) at xnew for D independent GPs.

    Mirrors ``base_conditional`` with white=True, full_cov=False
    (conditionals_multi_output.py:6-70 / :324-387):

        mean_d = A_dᵀ u_d,   var_d = Kdiag_d − Σ_m A_d² (+ Σ (L_dᵀ A_d)²)

    q_sqrt, if given, is ``(D, M, M)`` — the per-dim covariance factor L_d of
    q(u_d) (for the collapsed posterior, L_d = chol(H_d)⁻ᵀ).  NOTE: the
    reference's rollout applies dim 0's q_sqrt factor to every dim's variance
    (an indexing slip at conditionals_multi_output.py:317,322 — the
    ``[:, :, 0]`` selects only the first q_sqrt row after the (D,N)
    broadcast).  We compute the correct per-dim term; the difference only
    perturbs rollout noise magnitude and parity is statistical.

    Returns (mean (N, D), var (N, D)).
    """
    a = projection(kernel_type, kparams, pre, z, xnew)        # (D, M, N)
    kdiag = kops.diag(kernel_type, kparams, xnew)             # (D, N)
    mean = jnp.einsum("dmn,md->nd", a, u, precision="highest",
                      preferred_element_type=a.dtype)         # (N, D)
    var = kdiag - jnp.sum(a * a, axis=1)                      # (D, N)
    if q_sqrt is not None:
        lta = jnp.einsum("dmk,dmn->dkn", q_sqrt, a, precision="highest",
                         preferred_element_type=a.dtype)      # Lᵀ A
        var = var + jnp.sum(lta * lta, axis=1)
    return mean, var.T


def whitened_conditional_full_cov(
    kernel_type: str,
    kparams: KernelParams,
    pre: Precal,
    z: jnp.ndarray,
    u: jnp.ndarray,
    xnew: jnp.ndarray,
    q_sqrt: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full-covariance variant (reference base_conditional with
    full_cov=True, conditionals_multi_output.py:37-39,60-61; present in the
    upstream API though every live call site uses full_cov=False):

        mean (N, D),  cov (D, N, N) = Knn − AᵀA (+ AᵀLLᵀA)
    """
    a = projection(kernel_type, kparams, pre, z, xnew)        # (D, M, N)
    knn = kops.gram(kernel_type, kparams, xnew)               # (D, N, N)
    mean = jnp.einsum("dmn,md->nd", a, u, precision="highest",
                      preferred_element_type=a.dtype)
    cov = knn - jnp.einsum("dmn,dmk->dnk", a, a, precision="highest",
                           preferred_element_type=a.dtype)
    if q_sqrt is not None:
        lta = jnp.einsum("dmk,dmn->dkn", q_sqrt, a, precision="highest",
                         preferred_element_type=a.dtype)      # Lᵀ A
        cov = cov + jnp.einsum("dkn,dkm->dnm", lta, lta, precision="highest",
                               preferred_element_type=a.dtype)
    return mean, cov


def collapsed_bound_terms(
    kernel_type: str,
    kparams: KernelParams,
    pre: Precal,
    z: jnp.ndarray,
    x: jnp.ndarray,
    xc: jnp.ndarray,
    q: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    gram_scale: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The three collapsed-bound pieces (reference:
    ``collapse_after_kernel_precalculation``, conditionals_multi_output.py:
    230-257), full-batch (batch_size = Y_N, so the reference's
    /(batch·Q)·Y_N scaling reduces to /Q).

    ``gram_scale``: the reference's minibatch factor Y_N/batch_size applied
    to the H-gram and the a-vector (conditionals_multi_output.py:246-248) —
    1.0 for full batch.  The trace term is deliberately NOT scaled, matching
    the reference (:255 sums the batch rows unscaled).

    With F̃_d = Aᵀ (N, M), H_d = F̃ᵀF̃/Q_d + I, a_d = F̃ᵀ Δx_d / Q_d:

        term1   = ½ Σ_d log|H_d|                 (later_term1 · Y_N)
        term2   = −½ Σ_d a_dᵀ H_d⁻¹ a_d          (later_term2 · Y_N)
        trace   = ½ Σ_d Σ_t (K_tt − ‖F̃_t‖²)/Q_d  (reg trace · Y_N)

    Returned un-normalized (caller divides by Y_N) as nll contributions with
    the reference's signs.  x: (N+1, D) latent states; xc: (N, Din) GP inputs.
    ``mask`` (N,), optional: zero out padded transitions (multi-dataset
    padding) in every sum over t.
    """
    a = projection(kernel_type, kparams, pre, z, xc)          # (D, M, N)
    kdiag = kops.diag(kernel_type, kparams, xc)               # (D, N)
    dx = (x[1:] - x[:-1])                                     # (N, D)
    if mask is not None:
        a = a * mask[None, None, :]
        kdiag = kdiag * mask[None, :]
        dx = dx * mask[:, None]

    m = z.shape[0]
    eye = jnp.eye(m, dtype=a.dtype)
    h = (gram_scale * jnp.einsum("dmn,dkn->dmk", a, a, precision="highest",
                                 preferred_element_type=a.dtype)
         / q[:, None, None] + eye)                            # (D, M, M)
    avec = gram_scale * jnp.einsum("dmn,nd->dm", a, dx, precision="highest",
                                   preferred_element_type=a.dtype) \
        / q[:, None]

    chol_h, hinv_l = cholops.chol_and_inv(h)
    term1 = 0.5 * jnp.sum(cholops.chol_logdet(chol_h))
    # aᵀH⁻¹a = ‖L_H⁻¹ a‖² — a matmul against the explicit inverse factor.
    v = jnp.einsum("dmk,dk->dm", hinv_l, avec, precision="highest",
                   preferred_element_type=avec.dtype)
    term2 = -0.5 * jnp.sum(v * v)
    trace = 0.5 * jnp.sum((kdiag - jnp.sum(a * a, axis=1)) / q[:, None])
    return term1, term2, trace


def collapsed_u_posterior(
    kernel_type: str,
    kparams: KernelParams,
    pre: Precal,
    z: jnp.ndarray,
    x: jnp.ndarray,
    xc: jnp.ndarray,
    q: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior over collapsed whitened inducing outputs (reference:
    ``collapse_u_mean_after_kernel_precalculation``,
    conditionals_multi_output.py:206-227):

        q(u_d) = N(H_d⁻¹ a_d Q_d·…, H_d⁻¹),  factor L_d = chol(H_d)⁻ᵀ

    Returns (u_mean (M, D), q_sqrt (D, M, M) upper-triangular)."""
    a = projection(kernel_type, kparams, pre, z, xc)          # (D, M, N)
    dx = (x[1:] - x[:-1])
    m = z.shape[0]
    eye = jnp.eye(m, dtype=a.dtype)
    h = (jnp.einsum("dmn,dkn->dmk", a, a, precision="highest",
                    preferred_element_type=a.dtype)
         / q[:, None, None] + eye)
    avec = jnp.einsum("dmn,nd->dm", a, dx, precision="highest",
                      preferred_element_type=a.dtype) / q[:, None]
    _, hinv_l = cholops.chol_and_inv(h)
    # H⁻¹a = L⁻ᵀ (L⁻¹ a); q_sqrt = chol(H)⁻ᵀ = (L⁻¹)ᵀ (upper triangular).
    v = jnp.einsum("dmk,dk->dm", hinv_l, avec, precision="highest",
                   preferred_element_type=avec.dtype)
    u_mean = jnp.einsum("dmk,dm->dk", hinv_l, v, precision="highest",
                        preferred_element_type=avec.dtype)
    q_sqrt = hinv_l.swapaxes(-1, -2)
    return u_mean.T, q_sqrt
