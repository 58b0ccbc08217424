"""The collapsed GP bound in double-single (two-float32) precision.

This is the production fix for the measured fp32 gradient bias of the
collapsed bound (docs/DESIGN.md §12): near its optimum, the fp32 bound's
gradient is systematically wrong (err/signal ~1-8 on the z and
kernel.log_variance blocks), fp64-islanding single ops does not help, and
only evaluating the WHOLE segment

    gram  →  precal (Cholesky + triangular inverse)  →  collapsed terms

in high precision recovers the fp64 optimum (validated end-to-end by
tests/golden/fp32_mixed_control.py).  TPUs have no float64, so "high
precision" here is the double-single arithmetic of ``ffvd_tpu.ops.ds64``
(~49 mantissa bits at VPU speed).

Semantics are exactly those of ``conditionals.kernel_precal`` +
``conditionals.collapsed_bound_terms`` (the rebuild of the reference's
``kernel_pre_cal`` + ``collapse_after_kernel_precalculation``,
/root/reference/vfegpssm/conditionals_multi_output.py:124-169 and :230-257),
including the minibatch ``gram_scale`` (:246-248) and padded-dataset masking:

    F̃_d = K(X̃,Z) Lm⁻ᵀ,  H_d = s·F̃ᵀF̃/Q_d + I,  a_d = s·F̃ᵀΔx_d/Q_d
    term1 = ½ Σ_d log|H_d|,  term2 = −½ Σ_d a_dᵀH_d⁻¹a_d,
    trace = ½ Σ_d Σ_t (K_tt − ‖F̃_t‖²)/Q_d

Inputs are cast to float32 (this mode exists for fp32 production parameters;
the fp32 parameter VALUES are the exact points the double-single math
evaluates at), outputs are float32 scalars.  Gradients flow by plain JAX
autodiff through the error-free transformations: every ds64 primitive is a
smooth composition of +,−,× whose algebraic derivative is the true
derivative, evaluated around double-single-accurate primal values — the
forward cancellations that biased the pure-fp32 gradient are gone, and the
backward pass's own fp32 rounding is ordinary ~2⁻²⁴ relative noise
(measured small in tests/test_ds_collapse.py).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp

from ffvd_tpu.ops import ds64 as ds
from ffvd_tpu.ops.ds64 import DS
from ffvd_tpu.ops.kernels import KernelParams


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, jnp.float32)


# ---------------------------------------------------------------------------
# Kernels in double-single
# ---------------------------------------------------------------------------

def _se_scaled(x: jnp.ndarray, inv_ls: DS) -> DS:
    """x / ℓ for all D dims: (N, Din) × (D, Din) → DS (D, N, Din)."""
    return ds.mul_f(ds.dsmap(lambda t: t[:, None, :], inv_ls), _f32(x)[None])


def se_cross(kparams: KernelParams, x: jnp.ndarray, z: jnp.ndarray) -> DS:
    """K(X, Z) for D SE-ARD kernels → DS (D, N, M).

    Same math as ops/kernels.se_cross (direct-difference path — all FFVD
    datasets have Din ≤ 7): k = σ² exp(−½ Σ ((x−z)/ℓ)²)."""
    inv_ls = ds.exp(ds.neg(ds.lift(_f32(kparams.log_lengthscales))))
    xs = _se_scaled(x, inv_ls)                                # (D, N, Din)
    zs = _se_scaled(z, inv_ls)                                # (D, M, Din)
    diff = ds.sub(ds.dsmap(lambda t: t[:, :, None, :], xs),
                  ds.dsmap(lambda t: t[:, None, :, :], zs))   # (D, N, M, Din)
    r2 = ds.dsum(ds.mul(diff, diff), axis=-1)                 # (D, N, M)
    var = ds.exp(ds.lift(_f32(kparams.log_variance)))         # (D,)
    e = ds.exp(ds.mul_pow2(r2, -0.5))
    return ds.mul(ds.dsmap(lambda t: t[:, None, None], var), e)


def se_diag(kparams: KernelParams, x: jnp.ndarray) -> DS:
    """diag K(X, X) → DS (D, N): constant σ²."""
    n = x.shape[0]
    var = ds.exp(ds.lift(_f32(kparams.log_variance)))
    return ds.dsmap(lambda t: jnp.broadcast_to(t[:, None], (t.shape[0], n)),
                    var)


def linear_cross(kparams: KernelParams, x: jnp.ndarray, z: jnp.ndarray) -> DS:
    """σ²_d · X Zᵀ → DS (D, N, M) (reference kernels.py:270-281)."""
    g = ds.matmul(ds.lift(_f32(x)), ds.transpose(ds.lift(_f32(z))))  # (N, M)
    var = ds.exp(ds.lift(_f32(kparams.log_variance)))
    return ds.mul(ds.dsmap(lambda t: t[:, None, None], var),
                  ds.dsmap(lambda t: t[None], g))


def linear_diag(kparams: KernelParams, x: jnp.ndarray) -> DS:
    xl = ds.lift(_f32(x))
    s = ds.dsum(ds.mul(xl, xl), axis=-1)                      # (N,)
    var = ds.exp(ds.lift(_f32(kparams.log_variance)))
    return ds.mul(ds.dsmap(lambda t: t[:, None], var),
                  ds.dsmap(lambda t: t[None], s))


_DISPATCH = {
    "SquaredExponential": (se_cross, se_diag),
    "LinearK": (linear_cross, linear_diag),
}


# ---------------------------------------------------------------------------
# The fused segment
# ---------------------------------------------------------------------------

def _ds_projection(kernel_type: str, kparams: KernelParams, z: jnp.ndarray,
                   xc: jnp.ndarray, jitter: float,
                   refine: Optional[int] = None):
    """Shared precal + projection pipeline:
    (Lm, Lm⁻¹, A = Lm⁻¹K(Z,X̃) (D,M,N), Kdiag (D,N)) — all DS.
    ``refine``: chol_and_inv refinement rounds (None = ds64 module
    default)."""
    cross_fn, diag_fn = _DISPATCH[kernel_type]
    z32, xc32 = _f32(z), _f32(xc)
    m = z.shape[0]
    eye = jnp.eye(m, dtype=jnp.float32)
    # One fused cross-gram over [Z; X̃] rows instead of separate K(Z,Z) and
    # K(X̃,Z) calls — bitwise identical per element (SE is elementwise in
    # the row; the MXU dd matmul scales per row), half the dispatch chains
    # and one dd exp over the combined (D, M+N, M) block.
    big = cross_fn(kparams, jnp.concatenate([z32, xc32], axis=0), z32)
    kmm = ds.dsmap(lambda t: t[:, :m], big)                   # (D, M, M)
    knm = ds.dsmap(lambda t: t[:, m:], big)                   # (D, N, M)
    kmm = ds.add(kmm, ds.mul_f(ds.const(jitter), eye))
    lm, lm_inv = ds.chol_and_inv(kmm, refine=refine)
    a = ds.matmul(lm_inv, ds.transpose(knm))                  # (D, M, N)
    kdiag = diag_fn(kparams, xc32)                            # (D, N)
    return lm, lm_inv, a, kdiag


def ds_precal(kernel_type: str, kparams: KernelParams, z: jnp.ndarray,
              jitter: float = 1e-5, refine: Optional[int] = None):
    """Double-single-refined Kmm factorization, collapsed to a float32
    ``conditionals.Precal`` — a drop-in for ``kernel_precal`` wherever the
    downstream math is float32 anyway (e.g. the eval rollout's
    conditionals), removing the fp32 factorization error without changing
    any interface."""
    from ffvd_tpu.model.conditionals import Precal
    cross_fn, _ = _DISPATCH[kernel_type]
    z32 = _f32(z)
    eye = jnp.eye(z.shape[0], dtype=jnp.float32)
    kmm = cross_fn(kparams, z32, z32)
    kmm = ds.add(kmm, ds.mul_f(ds.const(jitter), eye))
    lm, lm_inv = ds.chol_and_inv(kmm, refine=refine)
    return Precal(lm=ds.to_f32(lm), lm_inv=ds.to_f32(lm_inv))


def ds_collapsed_u_posterior(
    kernel_type: str,
    kparams: KernelParams,
    z: jnp.ndarray,
    x: jnp.ndarray,
    xc: jnp.ndarray,
    log_q: jnp.ndarray,
    *,
    jitter: float = 1e-5,
    refine: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """q(U) of the collapsed bound in double-single, float32 out — the ds
    twin of ``conditionals.collapsed_u_posterior`` (reference:
    ``collapse_u_mean_after_kernel_precalculation``,
    /root/reference/vfegpssm/conditionals_multi_output.py:206-227).

    Exists because H = F̃ᵀF̃/Q + I has cond ~ ‖F̃‖²/Q: at a sharply trained
    point (Q ~ 1e-6, the regime ds64 training reaches) the fp32 factor of H
    is conditioning-garbage and q_sqrt = chol(H)⁻ᵀ inflates the rollout
    variance by orders of magnitude (PARITY §2f caveat).

    Returns (u_mean (M, D), q_sqrt (D, M, M) upper-triangular), float32."""
    _, _, a, _ = _ds_projection(kernel_type, kparams, z, xc, jitter, refine)
    m = z.shape[0]
    eye = jnp.eye(m, dtype=jnp.float32)
    dx = ds.sub(ds.lift(_f32(x[1:])), ds.lift(_f32(x[:-1])))  # (N, D)
    qinv = ds.exp(ds.neg(ds.lift(_f32(log_q))))               # (D,)

    aat = ds.matmul(a, ds.transpose(a))                       # (D, M, M)
    h = ds.add(ds.mul(aat, ds.dsmap(lambda t: t[:, None, None], qinv)),
               ds.lift(jnp.broadcast_to(eye, aat.hi.shape)))
    avec = ds.matmul(a, ds.dsmap(lambda t: t.T[..., None], dx))  # (D, M, 1)
    avec = ds.mul(ds.dsmap(lambda t: t[..., 0], avec),
                  ds.dsmap(lambda t: t[:, None], qinv))       # (D, M)

    _, lh_inv = ds.chol_and_inv(h, refine=refine)
    v = ds.matvec(lh_inv, avec)                               # L⁻¹ a
    u_mean = ds.matvec(ds.transpose(lh_inv), v)               # H⁻¹a = L⁻ᵀ v
    q_sqrt = ds.to_f32(ds.transpose(lh_inv))                  # chol(H)⁻ᵀ
    return ds.to_f32(u_mean).T, q_sqrt


def ds_collapsed_terms(
    kernel_type: str,
    kparams: KernelParams,
    z: jnp.ndarray,
    x: jnp.ndarray,
    xc: jnp.ndarray,
    log_q: jnp.ndarray,
    *,
    jitter: float = 1e-5,
    mask: Optional[jnp.ndarray] = None,
    gram_scale=1.0,
    refine: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(term1, term2, trace) of the collapsed bound, double-single throughout.

    Drop-in value replacement for ``conditionals.kernel_precal`` +
    ``conditionals.collapsed_bound_terms`` (same un-normalized scaling — the
    caller divides by Y_N).  Takes ``log_q`` instead of q so 1/Q_d is one
    double-single exp rather than an fp32-rounded reciprocal.
    """
    x32 = _f32(x)
    m = z.shape[0]
    eye = jnp.eye(m, dtype=jnp.float32)

    # --- precal + projection A = Lm⁻¹ K(Z, X̃), double-single refined ------
    _, _, a, kdiag = _ds_projection(kernel_type, kparams, z, xc, jitter,
                                    refine)
    dx = ds.sub(ds.lift(x32[1:]), ds.lift(x32[:-1]))          # (N, D)
    if mask is not None:
        m32 = _f32(mask)
        a = ds.mul_f(a, m32[None, None, :])
        kdiag = ds.mul_f(kdiag, m32[None, :])
        dx = ds.mul_f(dx, m32[:, None])

    qinv = ds.exp(ds.neg(ds.lift(_f32(log_q))))               # (D,)
    qinv_s = ds.mul_f(qinv, _f32(gram_scale))                 # s/Q_d

    # --- H = s·A Aᵀ/Q + I, a = s·A Δx/Q ------------------------------------
    aat = ds.matmul(a, ds.transpose(a))                       # (D, M, M)
    h = ds.add(ds.mul(aat, ds.dsmap(lambda t: t[:, None, None], qinv_s)),
               ds.lift(jnp.broadcast_to(eye, aat.hi.shape)))
    avec = ds.matmul(a, ds.dsmap(lambda t: t.T[..., None], dx))  # (D, M, 1)
    avec = ds.mul(ds.dsmap(lambda t: t[..., 0], avec),
                  ds.dsmap(lambda t: t[:, None], qinv_s))     # (D, M)

    lh, lh_inv = ds.chol_and_inv(h, refine=refine)

    # term1 = ½ Σ_d log|H_d| = Σ log diag(L_H)
    logdiag = ds.log(ds.diagonal(lh))                         # (D, M)
    term1 = ds.dsum(ds.dsmap(lambda t: t.reshape(-1), logdiag), axis=-1)

    # term2 = −½ Σ_d ‖L_H⁻¹ a_d‖²
    v = ds.matvec(lh_inv, avec)                               # (D, M)
    v2 = ds.dsum(ds.dsmap(lambda t: t.reshape(-1), ds.mul(v, v)), axis=-1)
    term2 = ds.mul_pow2(v2, -0.5)

    # trace = ½ Σ_d Σ_t (K_tt − Σ_m A²_mt)/Q_d — the catastrophic fp32
    # cancellation (K_tt − ‖F̃_t‖² → 0 as M covers the data) is exact here.
    a2 = ds.dsum(ds.mul(a, a), axis=-2)                       # (D, N)
    resid = ds.mul(ds.sub(kdiag, a2),
                   ds.dsmap(lambda t: t[:, None], qinv))      # unscaled /Q
    tr = ds.dsum(ds.dsmap(lambda t: t.reshape(-1), resid), axis=-1)
    trace = ds.mul_pow2(tr, 0.5)

    return ds.to_f32(term1), ds.to_f32(term2), ds.to_f32(trace)
