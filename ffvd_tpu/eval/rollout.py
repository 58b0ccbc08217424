"""Posterior collection and free-running rollout prediction.

Rebuild of ``collect_samples_formal`` (base_model.py:197-522).  The reference
builds a fresh TF graph op per (sample, time-step) — O(num × test_len × D)
graph nodes executed in one giant session.run (SURVEY.md §3.4).  Here the
rollout is a ``lax.scan`` over time; posterior samples are ``vmap``-ed when
they are iid (collapsed/pure-Adam cases) and scanned when they continue an
SG-HMC chain (thinning steps between samples, base_model.py:227-231).

Per sample (reference semantics):
  - (if SG-HMC vars exist) run `spacing` sample-only SGHMC updates, then
    re-cache the Kmm Cholesky (:227-234);
  - (if U collapsed) compute q(U) = N(H⁻¹a, H⁻¹) from the training
    trajectory (:242-253);
  - free-run from the last training state x_N (:237): per step,
    f ~ q(f|x̃) including q(U) variance, x ← x + f_mu + N(0, f_var + Q)
    (:296-302), recording x and f_var + Q.

Metrics (base_model.py:340-349, :629):
  ŷ   = mean_samples(x C) + d,   v̂ = mean_samples(x_var C²) + R
  RMSE = sqrt(mean((Y_test[:30] − ŷ[:30])²)) · Y_train_std
  NLL  = −mean log N(y; ŷ, sqrt(v̂)) over the same 30 steps (normalized).
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ffvd_tpu.inference.sghmc import sghmc_step
from ffvd_tpu.inference.trainer import (SGHMC, SubsetOps, Trainer,
                                        TrainState, sanitize_grads)
from ffvd_tpu.model.conditionals import (collapsed_u_posterior, kernel_precal,
                                         whitened_conditional)
from ffvd_tpu.model.likelihoods import emission_mean
from ffvd_tpu.model.params import GPSSMParams, SSMData


def _rollout_one(kernel_type: str, jitter: float, kparams, z, u_val,
                 q_sqrt, q, x0, controls, key, hidden=(), ds64=False,
                 ds64_refine=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One free-running trajectory of length T = controls.shape[0].

    x0: (D,), controls: (T, U) — returns (xs (T, D), var_tot (T, D)).
    ``hidden``: deep-transition layers (model/deep.py); per step the state
    is propagated through them with fresh inter-layer samples before the
    head conditional.  ``ds64``: double-single-refined Kmm factorization
    (one-time, outside the scan — see model/ds_collapse.ds_precal)."""
    if ds64:
        from ffvd_tpu.model.ds_collapse import ds_precal
        pre = ds_precal(kernel_type, kparams, z, jitter, refine=ds64_refine)
    else:
        pre = kernel_precal(kernel_type, kparams, z, jitter)
    if hidden:
        from ffvd_tpu.model.deep import hidden_precals, propagate_step
        hpre = hidden_precals(kernel_type, jitter, hidden)
    t = controls.shape[0]
    keys = jax.random.split(key, t)

    def step(x_t, inp):
        k, ctrl = inp
        h_t = x_t
        if hidden:
            k, k_prop = jax.random.split(k)
            h_t = propagate_step(kernel_type, jitter, hidden, hpre,
                                 x_t, ctrl, k_prop)
        xc = jnp.concatenate([h_t, ctrl])[None, :]
        mu, var = whitened_conditional(kernel_type, kparams, pre, z, u_val,
                                       xc, q_sqrt=q_sqrt)
        mean = mu[0] + x_t
        # clamp: fp32 cancellation in Kdiag − ΣA² can leave var ≈ −1e-7σ²
        var_tot = jnp.maximum(var[0] + q, 0.0)
        noise = jax.random.normal(k, x_t.shape, x_t.dtype)
        x_next = mean + noise * jnp.sqrt(var_tot)
        return x_next, (x_next, var_tot)

    _, (xs, vs) = jax.lax.scan(step, x0, (keys, controls))
    return xs, vs


def collect_posterior(trainer: Trainer, state: TrainState, test_len: int,
                      key: jax.Array, num: Optional[int] = None,
                      spacing: Optional[int] = None):
    """Draw `num` posterior predictive trajectories.

    Returns (predict_x (S, T, D), predict_x_var (S, T, D), final_state).
    T = test_len (reference: prediction_length = test_len + pre_index − 1
    with pre_index = 1, base_model.py:209-210)."""
    cfg = trainer.cfg
    num = num or cfg.num_posterior_samples
    spacing = spacing or cfg.posterior_sample_spacing

    # jit cache on the trainer: a fresh closure per call would force a full
    # recompile of the S×(thinning + rollout) program on every evaluation.
    cache = getattr(trainer, "_collect_cache", None)
    if cache is None:
        cache = trainer._collect_cache = {}
    cache_key = (test_len, num, spacing)
    if cache_key in cache:
        return cache[cache_key](state, key, trainer.data)

    _collect = jax.jit(build_collect(trainer, test_len, num, spacing))
    cache[cache_key] = _collect
    return _collect(state, key, trainer.data)


def build_collect(trainer: Trainer, test_len: int, num: int, spacing: int):
    """The un-jitted (state, key, data) → (xs, vs, state) collection
    closure — exposed so MultiChainTrainer states can vmap it over a chain
    axis (eval/ensemble.multichain_moments, in_axes=(0, 0, None));
    collect_posterior jits it.  ``data`` is an argument rather than a
    closure constant for the same reasons as Trainer._run_chunk_impl
    (no d2h during lowering; dataset-independent compile-cache entries)."""
    cfg = trainer.cfg
    kt, jit_ = cfg.kernel_type, cfg.jitter
    collapse = cfg.case_config.u_collapse
    # ds64 mode extends to eval: the collapsed q(U)'s H = F̃ᵀF̃/Q + I has
    # cond ~ ‖F̃‖²/Q, and at the sharply trained points ds64 training
    # reaches (Q ~ 1e-6) the fp32 q_sqrt = chol(H)⁻ᵀ inflates rollout
    # variance by orders of magnitude (PARITY §2f caveat).  "hybrid" runs
    # ds64 on the eval side too: the rollout evaluates at the (sharply
    # trained) post-tail point where the fp32 factorization is the problem.
    ds64 = cfg.collapse_precision in ("ds64", "hybrid")
    refine = cfg.ds64_refine

    def u_and_qsqrt(params: GPSSMParams, data: SSMData):
        if collapse:
            if not ds64:
                pre = kernel_precal(kt, params.kernel, params.z, jit_)
            n = params.n_transitions
            h = params.x[:n]
            if params.hidden:
                # deterministic mean propagation for the collapsed q(U)
                # (training samples the layers; the collapse is a point
                # summary — see model/deep.py)
                from ffvd_tpu.model.deep import propagate_hidden
                h = propagate_hidden(kt, jit_, params.hidden, h,
                                     data.control[:n], None)
            if data.control.shape[1] > 0:
                xc = jnp.concatenate([h, data.control[:n]], axis=1)
            else:
                xc = h
            if ds64:
                from ffvd_tpu.model.ds_collapse import ds_collapsed_u_posterior
                u_val, q_sqrt = ds_collapsed_u_posterior(
                    kt, params.kernel, params.z, params.x, xc,
                    params.log_q, jitter=jit_, refine=refine)
            else:
                u_val, q_sqrt = collapsed_u_posterior(
                    kt, params.kernel, pre, params.z, params.x, xc, params.q)
            if cfg.rollout_qsqrt_dim0:
                # reference slip compat (conditionals_multi_output.py:322):
                # dim 0's q(U) factor applied to every dim's variance
                q_sqrt = jnp.broadcast_to(q_sqrt[:1], q_sqrt.shape)
            return u_val, q_sqrt
        return params.u, None

    def _collect(state: TrainState, key: jax.Array, data: SSMData):
        n_train = data.y.shape[0]
        controls = data.control[n_train:n_train + test_len]
        if controls.shape[0] < test_len:  # control shorter than test
            pad = jnp.zeros((test_len - controls.shape[0],
                             controls.shape[1]), controls.dtype)
            controls = jnp.concatenate([controls, pad], axis=0)
        params = state.params
        if trainer.has_sghmc:
            # Sequential chain: thin `spacing` sample-only steps per sample.
            # Thinning moves only the SGHMC-labeled leaves, so the scans carry
            # (and differentiate) just that subset — see SubsetOps.
            ops = SubsetOps(trainer.labels, params)
            # Deep (stochastic) models: thinning targets the SAME
            # doubly-stochastic objective as training — a fresh inter-layer
            # propagation key per thin step (without it the thinned chain
            # would sample the deterministic mean-propagated posterior, a
            # train/eval mismatch).  Shallow models have no propagation key.
            if trainer.stochastic:
                sub_grad = jax.grad(
                    lambda sub, kp: trainer.nll_fn(ops.merge(sub, params),
                                                   data, key=kp))
            else:
                sub_grad = jax.grad(
                    lambda sub, kp: trainer.nll_fn(ops.merge(sub, params),
                                                   data))
            x_n = params.x.shape[0]

            def per_sample(carry, k):
                sub, sstate = carry
                k_thin, k_roll = jax.random.split(k)

                def thin(c, kk):
                    sb, s = c
                    if trainer.stochastic:
                        kk, k_prop = jax.random.split(kk)  # static branch:
                    else:                                  # shallow PRNG
                        k_prop = None                      # stream unchanged
                    grads = sanitize_grads(sub_grad(sb, k_prop),
                                           cfg.sghmc_grad_clip)
                    sb2, s2 = sghmc_step(sb, grads, s, kk,
                                         epsilon=cfg.epsilon,
                                         mdecay=cfg.mdecay, x_n=x_n,
                                         burn_in=False,
                                         p_clip=cfg.sghmc_p_clip,
                                         spike_clip=cfg.sghmc_spike_clip)
                    return (ops.clip_log(sb2, cfg.log_clip_bounds), s2), None

                (sub, sstate), _ = jax.lax.scan(
                    thin, (sub, sstate), jax.random.split(k_thin, spacing))
                p = ops.merge(sub, params)
                u_val, q_sqrt = u_and_qsqrt(p, data)
                xs, vs = _rollout_one(kt, jit_, p.kernel, p.z,
                                      u_val, q_sqrt, p.q, p.x[-1],
                                      controls, k_roll, hidden=p.hidden,
                                      ds64=ds64, ds64_refine=refine)
                return (sub, sstate), (xs, vs)

            (sub, sstate), (xs, vs) = jax.lax.scan(
                per_sample, (ops.split(params), ops.split_state(state.sghmc)),
                jax.random.split(key, num))
            new_state = dataclasses.replace(
                state, params=ops.merge(sub, params),
                sghmc=ops.merge_state(sstate, state.sghmc))
            return xs, vs, new_state
        else:
            # iid samples: one U posterior, vmapped rollouts.
            u_val, q_sqrt = u_and_qsqrt(params, data)
            roll = functools.partial(_rollout_one, kt, jit_, params.kernel,
                                     params.z, u_val, q_sqrt, params.q,
                                     params.x[-1], controls,
                                     hidden=params.hidden, ds64=ds64,
                                     ds64_refine=refine)
            xs, vs = jax.vmap(roll)(jax.random.split(key, num))
            return xs, vs, state

    return _collect


def predict_summary(params: GPSSMParams, predict_x: jnp.ndarray,
                    predict_x_var: jnp.ndarray,
                    emission_noise: str = "auto"):
    """ŷ, v̂, and the training fit (base_model.py:334-343).

    ``emission_noise`` must match the training configuration: in diag mode
    the strictly-lower log_rchol entries are NOT part of the trained density
    (they can drift under hyperparameter sampling) and must not leak into
    the predictive variance."""
    from ffvd_tpu.model.likelihoods import use_full_r
    c, d = params.c, params.d
    y_s = predict_x @ c + d                           # (S, T, P)
    v_s = predict_x_var @ (c * c)                     # (S, T, P)
    if use_full_r(emission_noise, params.c.shape[1]):
        r2 = params.r_var_diag                        # diag(L·Lᵀ)
    else:
        r2 = params.rchol_diag ** 2                   # exp(2·diag log_rchol)
    predict_y = jnp.mean(y_s, axis=0)
    predict_y_var = jnp.mean(v_s, axis=0) + r2
    fit_y = emission_mean(params.x[1:], c, d)
    return predict_y, predict_y_var, fit_y


def rmse_nll(y_test: jnp.ndarray, predict_y: jnp.ndarray,
             predict_y_var: jnp.ndarray, y_train_std: float,
             horizon: int = 30):
    """RMSE/NLL on the first `horizon` test steps (base_model.py:345-349,
    :629).  NLL uses the properly normalized Normal logpdf like
    scipy.stats.norm.logpdf in the reference."""
    yt = y_test[:horizon].reshape(-1)
    yp = predict_y[:horizon].reshape(-1)
    vp = predict_y_var[:horizon].reshape(-1)
    rmse = jnp.sqrt(jnp.mean((yt - yp) ** 2)) * y_train_std
    nll = -jnp.mean(-0.5 * jnp.log(2 * math.pi * vp)
                    - 0.5 * (yt - yp) ** 2 / vp)
    return rmse, nll
