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

Mixing diagnostics: both styles also compute per-sweep CSMC statistics
(reference-particle survival rate, mean unique ancestors/pool occupancy, X
update magnitude — the quantities PARITY §2b's C6 analysis needs).  They are
returned as scan outputs and simply DROPPED by the training-path wrapper, so
XLA dead-code-eliminates them from the fused training program; the study path
(``make_pg_fn(cfg, with_stats=True)``) keeps them at negligible cost.
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


def _occupancy(idx: jnp.ndarray, pp: int):
    """(unique-count, ref-survived) of a categorical index draw (K,) over a
    pool of ``pp`` (the reference particle is pool slot pp-1)."""
    counts = jnp.zeros((pp,), jnp.int32).at[idx].add(1)
    unique = jnp.sum(counts > 0)
    ref_survived = counts[pp - 1] > 0
    return unique, ref_survived


def make_pg_fn(cfg: FFVDConfig, data: SSMData = None,
               with_stats: bool = False) -> Callable:
    """Returns pg_fn(params, key, data=...) -> params with a resampled
    trajectory (or (params, stats) when ``with_stats``).  ``data`` may be
    bound at construction or passed per call.

    ``cfg.pg_ancestor_trace`` selects between the reference's storage (the
    per-time RESAMPLED states, no ancestry — stored trajectories are
    patchworks of filtering marginals) and a proper ancestor-traced CSMC
    whose output is a coherent draw from the smoothing posterior (validated
    against an exact RTS smoother in tests).  Ancestor tracing is the
    default: the 15-run full-protocol study (tests/golden/pg_c6_study.json,
    PARITY §2b) measures it in the reference's accuracy regime (ballbeam
    5-seed RMSE median 0.0064 vs ref 0.0060-0.0083) where live-CSMC
    storage lands 13-150x worse (median 0.52).

    ``with_stats``: also return the per-sweep mixing diagnostics dict —
      ref_survival    fraction of time steps where the reference particle
                      survives resampling into the free pool,
      unique_frac     mean fraction of distinct pool members selected per
                      resampling step (particle-degeneracy monitor),
      accepted        1.0 when the sweep replaced X with a non-reference
                      trajectory (reference-style: final uniform choice
                      landed on a free column; ancestor-style: the
                      weight-proportional final draw left the ref lane),
      dx_mean_abs     mean |new_x − old_x| over the trajectory,
      dx_frac_moved   fraction of trajectory rows that changed.
    """
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

    def _dx_stats(new_x, old_x):
        dx = jnp.abs(new_x - old_x)
        return (jnp.mean(dx),
                jnp.mean(jnp.any(dx > 0, axis=-1).astype(new_x.dtype)))

    def pg_reference_style(params: GPSSMParams, key: jax.Array,
                           data: SSMData):
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
            unique, ref_ok = _occupancy(idx, pp)
            return resampled, (resampled, unique, ref_ok)

        keys = jax.random.split(k_scan, n)
        _, (seq, uniq, ref_ok) = jax.lax.scan(
            step, particles0, (keys, controls, data.y, params.x[1:]))
        trajectory = jnp.concatenate([particles0[None], seq], axis=0)

        # Uniform choice among P columns; column P-1 means "keep reference".
        choice = jax.random.randint(k_choice, (), 0, pp)
        col = jnp.take(trajectory, jnp.minimum(choice, pp - 2), axis=1)
        accepted = choice < pp - 1
        new_x = jnp.where(accepted, col, params.x)
        dx_mean, dx_moved = _dx_stats(new_x, params.x)
        stats = {
            "ref_survival": jnp.mean(ref_ok.astype(new_x.dtype)),
            "unique_frac": jnp.mean(uniq.astype(new_x.dtype)) / pp,
            "accepted": accepted.astype(new_x.dtype),
            "dx_mean_abs": dx_mean,
            "dx_frac_moved": dx_moved,
        }
        return dataclasses.replace(params, x=new_x), stats

    def pg_ancestor_style(params: GPSSMParams, key: jax.Array,
                          data: SSMData):
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
            unique, ref_ok = _occupancy(parents, pp)
            return (x_next, logits), (x_next, anc, logits, unique, ref_ok)

        zero_logits = jnp.zeros((pp,), params.x.dtype)
        keys = jax.random.split(k_scan, n)
        (_, final_logits), (states, ancs, _, uniq, ref_ok) = jax.lax.scan(
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
        dx_mean, dx_moved = _dx_stats(new_x, params.x)
        # The reference lane is slot pp-1 at EVERY step (anc[pp-1] = pp-1),
        # so the selected lineage is the retained trajectory iff the final
        # draw lands on lane pp-1.
        stats = {
            "ref_survival": jnp.mean(ref_ok.astype(new_x.dtype)),
            "unique_frac": jnp.mean(uniq.astype(new_x.dtype)) / pp,
            "accepted": (j_final < pp - 1).astype(new_x.dtype),
            "dx_mean_abs": dx_mean,
            "dx_frac_moved": dx_moved,
        }
        return dataclasses.replace(params, x=new_x), stats

    style = pg_ancestor_style if ancestor_trace else pg_reference_style

    if cfg.pg_compat_noop:
        # The reference's PG assign is dead in its graph (see
        # FFVDConfig.pg_compat_noop): reproduce by leaving X untouched.
        zero = lambda p: jnp.zeros((), p.x.dtype)

        def noop(params, key, data=None):
            if with_stats:
                z = zero(params)
                return params, {"ref_survival": z + 1.0, "unique_frac": z,
                                "accepted": z, "dx_mean_abs": z,
                                "dx_frac_moved": z}
            return params
        return noop

    def pg_fn(params: GPSSMParams, key: jax.Array,
              data: SSMData = None):
        data = bound_data if data is None else data
        params, stats = style(params, key, data)
        if with_stats:
            return params, stats
        return params                # stats are DCE'd under jit
    return pg_fn
