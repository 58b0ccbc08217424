"""Particle Gibbs (conditional SMC) for the latent trajectory — case C6.

Rebuild of ``PG_for_X_speedup`` (base_model.py:78-141): P−1 free particles
propagated through the GP transition with a cached Kmm Cholesky, weighted by
the emission likelihood of y_t, categorically resampled with the current
trajectory retained as the reference particle; the stored sequence keeps the
*resampled states* per time (no ancestor tracing), exactly like the
reference's TensorArray.  The reference picks the final trajectory with
``np.random.choice`` frozen at graph-build time (base_model.py:135-137,
SURVEY.md §2.5 quirk); here the draw is a proper per-call PRNG sample.

The tf.while_loop over t becomes a single ``lax.scan``; the per-step GP
conditional is the batched whitened conditional over the (P−1, Din) particle
block — MXU-shaped work instead of P Python objects.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.model.conditionals import kernel_precal, whitened_conditional
from ffvd_tpu.model.likelihoods import emission_mean
from ffvd_tpu.model.params import GPSSMParams, SSMData
from ffvd_tpu.ops.densities import logdensity_norm_diag


def make_pg_fn(cfg: FFVDConfig, data: SSMData = None) -> Callable:
    """Returns pg_fn(params, key, data=...) -> params with a resampled
    trajectory.  ``data`` may be bound at construction or passed per call."""
    kt, jitter = cfg.kernel_type, cfg.jitter
    pp = cfg.pg_particles
    bound_data = data

    def pg_fn(params: GPSSMParams, key: jax.Array,
              data: SSMData = None) -> GPSSMParams:
        data = bound_data if data is None else data
        n = params.n_transitions
        d = params.x_dim
        k_init, k_scan, k_choice = jax.random.split(key, 3)

        pre = kernel_precal(kt, params.kernel, params.z, jitter)
        particles0 = jax.random.normal(k_init, (pp - 1, d), params.x.dtype)
        controls = data.control[:n]
        rchol_diag = params.rchol_diag
        q = params.q

        def step(x_t, inp):
            k, ctrl, y_t, x_ref_next = inp
            k_prop, k_res = jax.random.split(k)
            if controls.shape[1] > 0:
                ctrl_b = jnp.broadcast_to(ctrl, (pp - 1, ctrl.shape[0]))
                xc = jnp.concatenate([x_t, ctrl_b], axis=1)
            else:
                xc = x_t
            mu, var = whitened_conditional(kt, params.kernel, pre, params.z,
                                           params.u, xc)
            mu = mu + x_t                                    # identity mean
            noise = jax.random.normal(k_prop, mu.shape, mu.dtype)
            # clamp: fp32 cancellation can leave var slightly negative
            x_next = mu + noise * jnp.sqrt(jnp.maximum(var + q, 0.0))

            w_free = logdensity_norm_diag(
                y_t, emission_mean(x_next, params.c, params.d), rchol_diag)
            w_ref = logdensity_norm_diag(
                y_t, emission_mean(x_ref_next[None, :], params.c, params.d),
                rchol_diag)
            logits = jnp.concatenate([w_free, w_ref])        # (P,)
            idx = jax.random.categorical(k_res, logits, shape=(pp - 1,))
            pool = jnp.concatenate([x_next, x_ref_next[None, :]], axis=0)
            resampled = pool[idx]                            # (P-1, D)
            return resampled, resampled

        keys = jax.random.split(k_scan, n)
        _, seq = jax.lax.scan(step, particles0,
                              (keys, controls, data.y, params.x[1:]))
        trajectory = jnp.concatenate([particles0[None], seq], axis=0)

        # Uniform choice among P columns; column P-1 means "keep reference".
        choice = jax.random.randint(k_choice, (), 0, pp)
        col = jnp.take(trajectory, jnp.minimum(choice, pp - 2), axis=1)
        new_x = jnp.where(choice < pp - 1, col, params.x)
        return dataclasses.replace(params, x=new_x)

    return pg_fn
