"""Scale-adapted SG-HMC (Springenberg-style), as a pure pytree transform.

Rebuild of ``BaseModel.generate_update_step`` (base_model.py:143-179).  The
reference materializes four auxiliary tf.Variables per sampled variable and
two big assign lists (burn-in = adaptation+step, sample = step-only); here the
same update is a pure function over (params, state, grads, key) pytrees, with
a static ``burn_in`` flag selecting whether the preconditioner adapts.

Per variable θ with auxiliaries (ξ, g, g², p) initialized (1, 1, 1, 0)
(base_model.py:151-154), all reads from the *old* values, exactly like the
TF graph's read-before-assign semantics:

    r      = 1/(ξ+1)
    g_t    = (1−r)·g  + r·∇          (adapted only during burn-in)
    g²_t   = (1−r)·g² + r·∇²
    ξ_t    = 1 + ξ·(1 − g·g/(g²+1e−16))
    M⁻¹    = 1/(√(g²+1e−16)+1e−16)
    ε_s    = ε/√X_N                  (base_model.py:166; X_N = N+1)
    σ      = √max(2·ε_s²·mdecay·M⁻¹, 1e−16)
    p_t    = p − ε²·M⁻¹·∇ − mdecay·p + N(0, σ²)   (note: ε², not ε_s² —
                                                   reference quirk, :172)
    θ_t    = θ + p_t
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp

Pytree = Any


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SGHMCState:
    xi: Pytree
    g: Pytree
    g2: Pytree
    p: Pytree


def sghmc_init(params: Pytree) -> SGHMCState:
    ones = jax.tree.map(jnp.ones_like, params)
    return SGHMCState(
        xi=ones,
        g=jax.tree.map(jnp.ones_like, params),
        g2=jax.tree.map(jnp.ones_like, params),
        p=jax.tree.map(jnp.zeros_like, params),
    )


def _leaf_update(theta, grad, xi, g, g2, p, noise_u, *, epsilon, mdecay,
                 x_n, burn_in, p_clip=None, spike_clip=None):
    if spike_clip is not None:
        # Trust-region guard against fp32 factorization spikes (see
        # FFVDConfig.sghmc_spike_clip): a sub-step gradient tens of times the
        # preconditioner's own running RMS (√g2) is numerical garbage — the
        # measured escape fuel was a single −79.8 gradient amid ±0.02
        # neighbors (tests/golden/catapult_flutter_C5_s0.jsonl, iter 585) —
        # and through M⁻¹ it becomes a momentum impulse that coasts
        # ~1/mdecay sub-steps.  The absolute floor keeps legitimately large
        # early-burn-in gradients (stale tiny g2) unclipped.
        bound = jnp.maximum(spike_clip * jnp.sqrt(g2 + 1e-16), 1.0)
        grad = jnp.clip(grad, -bound, bound)
    r = 1.0 / (xi + 1.0)
    g_t = (1.0 - r) * g + r * grad
    g2_t = (1.0 - r) * g2 + r * grad * grad
    xi_t = 1.0 + xi * (1.0 - g * g / (g2 + 1e-16))
    minv = 1.0 / (jnp.sqrt(g2 + 1e-16) + 1e-16)

    eps_scaled = epsilon / jnp.sqrt(jnp.asarray(x_n, dtype=theta.dtype))
    noise_scale = 2.0 * eps_scaled ** 2 * mdecay * minv
    sigma = jnp.sqrt(jnp.maximum(noise_scale, 1e-16))
    p_t = p - epsilon ** 2 * minv * grad - mdecay * p + noise_u * sigma
    if p_clip is not None:
        # fp32 catapult guard (see FFVDConfig.sghmc_p_clip): a healthy chain
        # moves |Δθ| ≲ 0.05 per sub-step, so a ±p_clip≈1 bound is inactive in
        # every normal regime; it only stops the one-sub-step jumps that an
        # fp32-garbage gradient (ill-conditioned Kmm) plus a stale
        # preconditioner can produce (the fp64 reference never faces these —
        # PARITY.md §2b-deep).
        p_t = jnp.clip(p_t, -p_clip, p_clip)
    theta_t = theta + p_t
    # burn_in may be a python bool or a traced scalar (when scanned over the
    # reference's B,(B,S)×10 flag pattern); select keeps both jit-able.
    keep = jnp.asarray(burn_in)
    return (theta_t,
            jnp.where(keep, xi_t, xi),
            jnp.where(keep, g_t, g),
            jnp.where(keep, g2_t, g2),
            p_t)


def _tree_normals(key: jax.Array, tree: Pytree) -> Pytree:
    leaves, treedef = jax.tree.flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree.unflatten(
        treedef,
        [jax.random.normal(k, a.shape, a.dtype) for k, a in zip(keys, leaves)])


def sghmc_step(params: Pytree, grads: Pytree, state: SGHMCState,
               key: jax.Array, *, epsilon: float, mdecay: float, x_n: int,
               burn_in: bool, p_clip=None, spike_clip=None,
               noise: Pytree = None) -> Tuple[Pytree, SGHMCState]:
    """One burn-in (adapt+move) or sampling (move-only) update over an entire
    pytree of sampled variables.  ``burn_in`` may be a python bool or a traced
    scalar (the reference's two assign lists become one selected program).
    ``p_clip`` bounds the per-sub-step move (see _leaf_update).

    ``noise``: optional pre-drawn standard normals (same pytree as params).
    Callers that scan many sub-steps hoist the PRNG work out of the
    sequential scan by vmapping ``_tree_normals`` over all sub-step keys —
    bit-identical to drawing inside (normal(k, shape) is a pure function of
    the key), but the hardware generates every draw in parallel while the
    scan is bottlenecked on the gradient chain."""
    if noise is None:
        noise = _tree_normals(key, params)

    flat = jax.tree.map(
        lambda th, gr, xi, g, g2, p, nu: _leaf_update(
            th, gr, xi, g, g2, p, nu, epsilon=epsilon, mdecay=mdecay,
            x_n=x_n, burn_in=burn_in, p_clip=p_clip, spike_clip=spike_clip),
        params, grads, state.xi, state.g, state.g2, state.p, noise)

    # Unzip the 5-tuples back into pytrees.
    def pick(i):
        return jax.tree.map(lambda t: t[i], flat,
                            is_leaf=lambda t: isinstance(t, tuple))

    new_params = pick(0)
    new_state = SGHMCState(xi=pick(1), g=pick(2), g2=pick(3), p=pick(4))
    return new_params, new_state
