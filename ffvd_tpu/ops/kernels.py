"""Batched GP kernels, functional style.

The reference keeps D independent single-output kernel *objects* and loops
over them in Python (conditionals_multi_output.py:107,158,210,238;
kernels_multi_output.py:131-247).  On TPU that loop is the enemy: it emits D
separate small grams and D separate M×M Choleskys.  Here every kernel op is
batched over the leading dim-of-latent axis D, producing ``(D, M, M)`` /
``(D, N, M)`` tensors that XLA tiles onto the MXU in one shot.

Parameterization matches the reference: log-variance and log-lengthscales
(kernels_multi_output.py:156-161), squared-exponential
``k(x,x') = σ² exp(-r²/2)`` with ARD scaling (kernels_multi_output.py:246-247,
:163-182), and the linear kernel ``k(x,x') = σ² x·x'`` (kernels.py:270-281).
Like the reference's SquaredExponential (which overrides ``K_r2`` directly),
no sqrt/clipping is applied to the squared distance.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KernelParams:
    """Log-parameterized kernel hyperparameters for D independent GPs.

    log_variance:     (D,)
    log_lengthscales: (D, Din) for SE-ARD; ignored by the linear kernel.
    """

    log_variance: jnp.ndarray
    log_lengthscales: jnp.ndarray

    @property
    def variance(self) -> jnp.ndarray:
        return jnp.exp(self.log_variance)

    @property
    def lengthscales(self) -> jnp.ndarray:
        return jnp.exp(self.log_lengthscales)


# Below this input width, pairwise differences beat the norm²−2·dot matmul
# expansion: the contraction dim is far narrower than the 128-wide MXU, and
# direct differences have no catastrophic cancellation (all six system-id
# datasets have Din = x_dim + 1 ≤ 7).
_DIRECT_DIST_MAX_DIM = 8


def _scaled_sq_dist(x: jnp.ndarray, z: Optional[jnp.ndarray],
                    lengthscales: jnp.ndarray) -> jnp.ndarray:
    """((x - z')/ℓ)² batched over D; semantics of
    kernels_multi_output.py:163-182.

    x: (N, Din), z: (M, Din) or None, lengthscales: (D, Din) → (D, N, M).
    Small Din: direct squared differences on the VPU (exact, no
    cancellation).  Large Din: the reference's norm² + norm² − 2·dot
    expansion, one batched MXU matmul.
    """
    xs = x[None, :, :] / lengthscales[:, None, :]          # (D, N, Din)
    if z is None:
        zs = xs
    else:
        zs = z[None, :, :] / lengthscales[:, None, :]       # (D, M, Din)

    if x.shape[-1] <= _DIRECT_DIST_MAX_DIM:
        diff = xs[:, :, None, :] - zs[:, None, :, :]        # (D, N, M, Din)
        return jnp.sum(diff * diff, axis=-1)

    xn = jnp.sum(xs * xs, axis=-1)                          # (D, N)
    zn = xn if z is None else jnp.sum(zs * zs, axis=-1)     # (D, M)
    dot = jnp.einsum("dnk,dmk->dnm", xs, zs, precision="highest",
                     preferred_element_type=xs.dtype)       # (D, N, M)
    return xn[:, :, None] + zn[:, None, :] - 2.0 * dot


def se_gram(params: KernelParams, x: jnp.ndarray) -> jnp.ndarray:
    """K(X, X) for D SE-ARD kernels → (D, N, N)."""
    r2 = _scaled_sq_dist(x, None, params.lengthscales)
    return params.variance[:, None, None] * jnp.exp(-0.5 * r2)


def se_cross(params: KernelParams, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """K(X, Z) for D SE-ARD kernels → (D, N, M)."""
    r2 = _scaled_sq_dist(x, z, params.lengthscales)
    return params.variance[:, None, None] * jnp.exp(-0.5 * r2)


def se_diag(params: KernelParams, x: jnp.ndarray) -> jnp.ndarray:
    """diag K(X, X) → (D, N); constant σ² (kernels_multi_output.py:199-200)."""
    n = x.shape[0]
    return jnp.broadcast_to(params.variance[:, None], (params.variance.shape[0], n))


def linear_gram(params: KernelParams, x: jnp.ndarray) -> jnp.ndarray:
    """σ²_d · X Xᵀ → (D, N, N) (kernels.py:270-276)."""
    g = jnp.einsum("nk,mk->nm", x, x, precision="highest",
                   preferred_element_type=x.dtype)
    return params.variance[:, None, None] * g[None, :, :]


def linear_cross(params: KernelParams, x: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    g = jnp.einsum("nk,mk->nm", x, z, precision="highest",
                   preferred_element_type=x.dtype)
    return params.variance[:, None, None] * g[None, :, :]


def linear_diag(params: KernelParams, x: jnp.ndarray) -> jnp.ndarray:
    s = jnp.sum(x * x, axis=-1)
    return params.variance[:, None] * s[None, :]


_DISPATCH = {
    "SquaredExponential": (se_gram, se_cross, se_diag),
    "LinearK": (linear_gram, linear_cross, linear_diag),
}


def _slice(x: jnp.ndarray, active_dims) -> jnp.ndarray:
    """Column selection à la Kernel._slice (kernels_multi_output.py:84-106);
    shared across the D batched kernels.  None = all columns."""
    if active_dims is None:
        return x
    return x[..., jnp.asarray(active_dims)]


def gram(kernel_type: str, params: KernelParams, x: jnp.ndarray,
         active_dims=None) -> jnp.ndarray:
    return _DISPATCH[kernel_type][0](params, _slice(x, active_dims))


def cross(kernel_type: str, params: KernelParams, x: jnp.ndarray,
          z: jnp.ndarray, active_dims=None) -> jnp.ndarray:
    return _DISPATCH[kernel_type][1](params, _slice(x, active_dims),
                                     _slice(z, active_dims))


def diag(kernel_type: str, params: KernelParams, x: jnp.ndarray,
         active_dims=None) -> jnp.ndarray:
    return _DISPATCH[kernel_type][2](params, _slice(x, active_dims))
