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
from ffvd_tpu.model.likelihoods import emission_log_lik_rows, emission_mean
from ffvd_tpu.model.params import GPSSMParams, SSMData


def make_pg_fn(cfg: FFVDConfig, data: SSMData = None) -> Callable:
    """Returns pg_fn(params, key, data=...) -> params with a resampled
    trajectory.  ``data`` may be bound at construction or passed per call.

    ``cfg.pg_ancestor_trace`` selects between the reference's storage (the
    per-time RESAMPLED states, no ancestry — stored trajectories are
    patchworks of filtering marginals) and a proper ancestor-traced CSMC
    whose output is a coherent draw from the smoothing posterior (validated
    against an exact RTS smoother in tests)."""
    kt, jitter = cfg.kernel_type, cfg.jitter
    pp = cfg.pg_particles
    bound_data = data
    ancestor_trace = cfg.pg_ancestor_trace
    emission_noise = cfg.emission_noise

    def _propagate(params, pre, hpre, x_t, ctrl, k_prop):
        """GP transition for a (P-1, D) particle block.

        Deep transitions (params.hidden non-empty, model/deep.py): the
        particle block batches through the hidden layers exactly like time
        rows, with fresh inter-layer samples per particle — the transition
        density the weights see is the doubly-stochastic one the training
        objective uses.  The identity skip stays on x_t (head-skip design,
        model/deep.py)."""
        ctrl_b = jnp.broadcast_to(ctrl, (x_t.shape[0], ctrl.shape[0]))
        h = x_t
        if params.hidden:
            from ffvd_tpu.model.deep import propagate_hidden
            k_prop, k_h = jax.random.split(k_prop)
            h = propagate_hidden(kt, jitter, params.hidden, x_t, ctrl_b,
                                 k_h, precals=hpre)
        if ctrl.shape[0] > 0:
            xc = jnp.concatenate([h, ctrl_b], axis=1)
        else:
            xc = h
        mu, var = whitened_conditional(kt, params.kernel, pre, params.z,
                                       params.u, xc)
        mu = mu + x_t                                        # identity mean
        noise = jax.random.normal(k_prop, mu.shape, mu.dtype)
        # clamp: fp32 cancellation can leave var slightly negative
        return mu + noise * jnp.sqrt(jnp.maximum(var + params.q, 0.0))

    def _hidden_pre(params):
        if not params.hidden:
            return None
        from ffvd_tpu.model.deep import hidden_precals
        return hidden_precals(kt, jitter, params.hidden)

    def _weights(params, x_next, x_ref_next, y_t):
        w_free = emission_log_lik_rows(
            params, y_t, emission_mean(x_next, params.c, params.d),
            emission_noise)
        w_ref = emission_log_lik_rows(
            params, y_t, emission_mean(x_ref_next[None, :], params.c,
                                       params.d), emission_noise)
        return jnp.concatenate([w_free, w_ref])              # (P,)

    def pg_reference_style(params: GPSSMParams, key: jax.Array,
                           data: SSMData) -> GPSSMParams:
        """The reference's CSMC (base_model.py:78-141): store the resampled
        states per time, pick a column uniformly at the end."""
        n = params.n_transitions
        d = params.x_dim
        k_init, k_scan, k_choice = jax.random.split(key, 3)
        pre = kernel_precal(kt, params.kernel, params.z, jitter)
        hpre = _hidden_pre(params)
        particles0 = jax.random.normal(k_init, (pp - 1, d), params.x.dtype)
        controls = data.control[:n]

        def step(x_t, inp):
            k, ctrl, y_t, x_ref_next = inp
            k_prop, k_res = jax.random.split(k)
            x_next = _propagate(params, pre, hpre, x_t, ctrl, k_prop)
            logits = _weights(params, x_next, x_ref_next, y_t)
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

    def pg_ancestor_style(params: GPSSMParams, key: jax.Array,
                          data: SSMData) -> GPSSMParams:
        """Proper CSMC: resample parents, propagate from them, keep the
        reference as particle P; backtrack ancestors from a weight-
        proportional final draw → a coherent smoothing-posterior sample."""
        n = params.n_transitions
        d = params.x_dim
        k_init, k_scan, k_choice = jax.random.split(key, 3)
        pre = kernel_precal(kt, params.kernel, params.z, jitter)
        hpre = _hidden_pre(params)
        particles0 = jnp.concatenate(
            [jax.random.normal(k_init, (pp - 1, d), params.x.dtype),
             params.x[0][None, :]], axis=0)                  # (P, D)
        controls = data.control[:n]

        def step(carry, inp):
            x_t, logits_t = carry                            # (P,D), (P,)
            k, ctrl, y_t, x_ref_next = inp
            k_anc, k_prop = jax.random.split(k)
            parents = jax.random.categorical(k_anc, logits_t,
                                             shape=(pp - 1,))
            x_par = x_t[parents]                             # (P-1, D)
            x_next_free = _propagate(params, pre, hpre, x_par, ctrl, k_prop)
            x_next = jnp.concatenate(
                [x_next_free, x_ref_next[None, :]], axis=0)  # (P, D)
            logits = _weights(params, x_next_free, x_ref_next, y_t)
            anc = jnp.concatenate(
                [parents, jnp.asarray([pp - 1])])            # ref keeps lane
            return (x_next, logits), (x_next, anc, logits)

        zero_logits = jnp.zeros((pp,), params.x.dtype)
        keys = jax.random.split(k_scan, n)
        (_, final_logits), (states, ancs, _) = jax.lax.scan(
            step, (particles0, zero_logits),
            (keys, controls, data.y, params.x[1:]))

        j_final = jax.random.categorical(k_choice, final_logits)

        def back(j, inp):
            # carry j indexes states[t]; emit x_{t+1}^j, pass its parent on
            x_t, anc_t = inp
            return anc_t[j], x_t[j]

        j0, xs = jax.lax.scan(back, j_final, (states, ancs), reverse=True)
        # xs[t] = x_{t+1} of the selected lineage (scan writes outputs in
        # forward index order); the final carry indexes the t=0 particles.
        new_x = jnp.concatenate([particles0[j0][None, :], xs], axis=0)
        return dataclasses.replace(params, x=new_x)

    def pg_fn(params: GPSSMParams, key: jax.Array,
              data: SSMData = None) -> GPSSMParams:
        data = bound_data if data is None else data
        if ancestor_trace:
            return pg_ancestor_style(params, key, data)
        return pg_reference_style(params, key, data)

    if cfg.pg_compat_noop:
        # The reference's PG assign is dead in its graph (see
        # FFVDConfig.pg_compat_noop): reproduce by leaving X untouched.
        return lambda params, key, data=None: params
    return pg_fn
