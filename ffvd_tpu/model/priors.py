"""Log-priors for the free-form ELBO.

Rebuilds dgp_model.py:105-143 (Layer priors), :252 (x₀), :326-334
(hyperparameter prior) and the Strauss process (dgp_model.py:18-43).  The
reference's ``determinantal`` branch is broken for the live multi-output
kernel (it calls ``.K`` on a Python list, dgp_model.py:116); here it is a
working per-dim sum of log-determinants.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ffvd_tpu.ops import chol as cholops
from ffvd_tpu.ops import kernels as kops
from ffvd_tpu.ops.kernels import KernelParams

_LOG_HALF = math.log(0.5)
_LOG_005 = math.log(0.05)


def strauss_logp(z: jnp.ndarray, gamma: float = 0.5, radius: float = 0.5) -> jnp.ndarray:
    """Strauss point-process prior: (#pairs with dist ≤ R) · log γ
    (dgp_model.py:24-42; R=0.5 fixed at dgp_model.py:74)."""
    zs = jnp.sum(z * z, axis=-1, keepdims=True)
    d2 = zs + zs.T - 2.0 * (z @ z.T)
    dist = jnp.sqrt(jnp.maximum(d2, 1e-40))
    n_close = jnp.sum(dist <= radius)
    n_pairs = (n_close - z.shape[0]) / 2.0
    return n_pairs * jnp.log(jnp.asarray(gamma, dtype=z.dtype))


def prior_z(prior_type: str, kernel_type: str, kparams: KernelParams,
            z: jnp.ndarray, det_jitter: float = 1e-7) -> jnp.ndarray:
    """Inducing-input prior (dgp_model.py:105-121)."""
    if prior_type == "uniform":
        return jnp.zeros((), dtype=z.dtype)
    if prior_type == "normal":
        return -0.5 * jnp.sum(z * z)
    if prior_type == "strauss":
        return strauss_logp(z)
    if prior_type == "determinantal":
        kzz = kops.gram(kernel_type, kparams, z)
        eye = jnp.eye(z.shape[0], dtype=z.dtype)
        lm = cholops.psd_cholesky(kzz + det_jitter * eye)
        return jnp.sum(cholops.chol_logdet(lm))
    raise ValueError(f"invalid prior type {prior_type!r}")


def prior_hyper(kernel_type: str, kparams: KernelParams) -> jnp.ndarray:
    """Kernel hyperprior: N(0,1) on log-lengthscales, N(log 0.05, 1) on
    log-variance (dgp_model.py:123-130)."""
    lv = kparams.log_variance
    out = -0.5 * jnp.sum(jnp.square(lv - _LOG_005))
    if kernel_type == "SquaredExponential":
        out = out - 0.5 * jnp.sum(jnp.square(kparams.log_lengthscales))
    return out


def prior_u(u: jnp.ndarray) -> jnp.ndarray:
    """Whitened inducing-output prior N(0, I) (dgp_model.py:132-135)."""
    return -0.5 * jnp.sum(u * u)


def prior_x0(x0: jnp.ndarray) -> jnp.ndarray:
    """Initial-state prior N(0, I) (dgp_model.py:252)."""
    return -0.5 * jnp.sum(x0 * x0)


def hyperparameter_prior(log_q, c, d, log_rchol) -> jnp.ndarray:
    """N(0,1) priors on log Q, C, d, log Rchol (dgp_model.py:326-334)."""
    return (-0.5 * jnp.sum(jnp.square(log_q))
            - 0.5 * jnp.sum(jnp.square(c))
            - 0.5 * jnp.sum(jnp.square(d))
            - 0.5 * jnp.sum(jnp.square(log_rchol)))
