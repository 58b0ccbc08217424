"""Deep (multi-layer) GP-SSM transition — the functional version of the
reference's dead deep path.

Reference context: upstream parses ``--n_layers`` (FFVD_Main.py:371), builds
one ``Layer`` per level (dgp_model.py:187-199) and carries a sampling
``propagate`` (dgp_model.py:362-379) — but ``propagate`` has NO call site,
the ELBO reads only ``self.layers[-1]``, and ``fixed_mean`` is never applied
(dgp_model.py:101-102 commented out), so n_layers > 1 upstream just trains
the last layer alongside dead variables.  This module is the deep transition
that code gestures at, designed as a doubly-stochastic deep sparse GP
(Salimbeni & Deisenroth 2017 style, adapted to the GP-SSM residual
transition):

    h⁰_t = x_t
    h^l_t = h^{l-1}_t + f_l([h^{l-1}_t, c_t]) + ε_l,
            ε_l ~ N(0, diag(σ²_l([h^{l-1}_t, c_t])))          l = 1..L-1
    x_{t+1} ~ N(x_t + f_L([h^{L-1}_t, c_t]), Q)                (head layer)

The head layer keeps the reference's residual skip on x_t itself, so the
hidden layers warp the head GP's INPUT space (a learned, uncertainty-
propagating representation of the state) while the transition's residual
structure — and with it the collapsed q(U) bound, the particle-Gibbs
weights, and the rollout recursion — is unchanged from the single-layer
model.  Setting hidden = () recovers the reference model exactly.

Every layer is a whitened sparse GP with its own inducing set (Z_l, U_l) and
kernel hyperparameters; each re-ingests the control input so all layers share
the head's (M, D+U) shapes (and its trainability partition, trainer.py).  The
identity skip is the deep analogue of the reference's residual transition
mean (dgp_model.py:346); between layers the marginal is SAMPLED with the
reparameterization trick (stochastic ELBO gradients), except when no PRNG key
is supplied, which yields the deterministic mean-propagated objective (used
for reporting and eval-time SGHMC thinning).

TPU shape note: propagation is a Python loop over a STATIC tuple of layers —
each iteration is one batched (D, M, M)/(D, M, N) conditional, all MXU
matmuls; no dynamic control flow enters the jit.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ffvd_tpu.model import priors
from ffvd_tpu.model.conditionals import kernel_precal, whitened_conditional
from ffvd_tpu.model.params import HiddenLayerParams


def hidden_prior(kernel_type: str, prior_type: str,
                 layer: HiddenLayerParams) -> jnp.ndarray:
    """Log-prior contribution of one hidden layer: kernel hypers + inducing
    inputs + whitened inducing outputs — the same trio the head layer
    contributes (dgp_model.py:286/:296, summed per layer here because the
    deep model has one inducing set per layer)."""
    return (priors.prior_hyper(kernel_type, layer.kernel)
            + priors.prior_z(prior_type, kernel_type, layer.kernel, layer.z)
            + priors.prior_u(layer.u))


def hidden_priors(kernel_type: str, prior_type: str,
                  hidden: Sequence[HiddenLayerParams]) -> jnp.ndarray:
    total = 0.0
    for layer in hidden:
        total = total + hidden_prior(kernel_type, prior_type, layer)
    return total


def propagate_hidden(kernel_type: str, jitter: float,
                     hidden: Sequence[HiddenLayerParams],
                     h: jnp.ndarray, control: jnp.ndarray,
                     key: Optional[jax.Array] = None,
                     precals: Optional[Sequence] = None) -> jnp.ndarray:
    """Propagate states h (N, D) through the hidden layers.

    control: (N, U) rows aligned with h (U may be 0).  With ``key`` the
    inter-layer marginals are sampled (doubly-stochastic); with ``key=None``
    only means propagate.  ``precals``: optional cached Kmm factorizations
    (hidden_precals), for scans that propagate many times with fixed layers.
    Returns the head layer's state input (N, D) — concatenate the control
    again for the head GP.
    """
    for i, layer in enumerate(hidden):
        if control.shape[1] > 0:
            inp = jnp.concatenate([h, control], axis=1)
        else:
            inp = h
        pre = (precals[i] if precals is not None else
               kernel_precal(kernel_type, layer.kernel, layer.z, jitter))
        mu, var = whitened_conditional(kernel_type, layer.kernel, pre,
                                       layer.z, layer.u, inp)
        h = h + mu
        if key is not None:
            eps = jax.random.normal(jax.random.fold_in(key, i),
                                    mu.shape, mu.dtype)
            # Floor, not clamp-to-0: fp32 cancellation in Kdiag − ΣA² can go
            # ≈ −1e-7σ², and sqrt'(0)·dmax = inf·0 = NaN would poison the
            # whole gradient (then be silently zeroed by sanitize_grads).
            # Same guard as sghmc.py's noise scale.
            h = h + eps * jnp.sqrt(jnp.maximum(var, 1e-16))
    return h


def propagate_step(kernel_type: str, jitter: float,
                   hidden: Sequence[HiddenLayerParams],
                   precals: Sequence, x_t: jnp.ndarray, ctrl: jnp.ndarray,
                   key: Optional[jax.Array]) -> jnp.ndarray:
    """Single-state variant for rollout scans: x_t (D,), ctrl (U,) →
    head-layer state input (D,).  ``precals`` are the layers' cached Kmm
    factorizations (computed once outside the scan)."""
    h = propagate_hidden(kernel_type, jitter, hidden, x_t[None, :],
                         ctrl[None, :], key, precals=precals)
    return h[0]


def hidden_precals(kernel_type: str, jitter: float,
                   hidden: Sequence[HiddenLayerParams]) -> Tuple:
    return tuple(kernel_precal(kernel_type, layer.kernel, layer.z, jitter)
                 for layer in hidden)
