"""The negative free-form ELBO, collapsed and uncollapsed.

Rebuild of the objective assembly in ``DGPSSM.__init__``
(dgp_model.py:248-297) and ``regularizer`` (dgp_model.py:337-359), as one pure
jit-able function of the parameter pytree.  Term names match the reference's
tensors (``nll_log_likelihood``, ``nll_part_prior``, ``x_t_prior_Q``,
``nll_reg_trace_inverse_Q_B``, ``later_term1``, ``later_term2``) so per-term
golden values line up (see SURVEY.md §2.3 and the diagnostic decomposition at
base_model.py:952-989).

Normalization: the reference always runs full batch — ``get_minibatch``
returns [0, X_N] (base_model.py:188-194) — so batch_size = Y_N = N and the
collapsed H-matrix scaling /(batch·Q)·Y_N reduces to /Q.  We implement the
full-batch objective; when ``data.mask`` is set (padded multi-dataset
training, BASELINE.md config 5) every per-timestep sum is masked and
normalized by the number of real transitions instead.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ffvd_tpu.model import conditionals as cond
from ffvd_tpu.model import priors
from ffvd_tpu.model.likelihoods import emission_log_lik_rows, emission_mean
from ffvd_tpu.model.params import GPSSMParams, SSMData
from ffvd_tpu.ops.densities import (logdensity_norm_diag,
                                    logdensity_norm_diag_nonvec)


def _gp_inputs(params: GPSSMParams, data: SSMData, *,
               kernel_type: str = "SquaredExponential",
               jitter: float = 1e-5, key=None) -> jnp.ndarray:
    """x̃_t = concat(h_t, u_t) over the N training transitions
    (dgp_model.py:267-271 / :339-342), where h_t = x_t for the single-layer
    model and the hidden-layer propagation of x_t for a deep transition
    (model/deep.py; sampled when ``key`` is given)."""
    n = params.n_transitions
    x_prev = params.x[:n]
    ctrl = data.control[:n]
    if params.hidden:
        from ffvd_tpu.model.deep import propagate_hidden
        x_prev = propagate_hidden(kernel_type, jitter, params.hidden,
                                  x_prev, ctrl, key)
    if data.control.shape[1] > 0:
        return jnp.concatenate([x_prev, ctrl], axis=1)
    return x_prev


def elbo_terms(params: GPSSMParams, data: SSMData, *,
               kernel_type: str = "SquaredExponential",
               prior_type: str = "normal",
               u_collapse: bool = True,
               jitter: float = 1e-5,
               emission_noise: str = "auto",
               collapse_precision: str = "native",
               ds64_refine: Optional[int] = None,
               key=None) -> Dict[str, jnp.ndarray]:
    """All nll terms.  Returns a dict whose 'nll' entry is the objective.

    ``key``: PRNG key for the doubly-stochastic deep transition (only read
    when ``params.hidden`` is non-empty; key=None propagates layer means —
    see model/deep.py).

    ``collapse_precision``: "native" evaluates the collapsed GP segment in
    the params' dtype; "ds64" in double-single two-float32 arithmetic
    (model/ds_collapse.py) — the production fix for the measured fp32
    gradient bias of that segment (docs/DESIGN.md §12).  Only the collapsed
    branch is affected (the bias lives there); a deep model's hidden-layer
    propagation stays native (its contribution is sampled noise, not the
    biased deterministic segment).  ``ds64_refine``: chol_and_inv
    refinement rounds for the ds64 segment (None = ops/ds64 module
    default)."""
    n = params.n_transitions
    mask = data.mask
    if mask is None:
        y_n = jnp.asarray(float(n), dtype=params.x.dtype)
        msum = jnp.sum            # plain sums
        row_w = None
    else:
        y_n = jnp.sum(mask)

        def msum(rows):           # rows: (N,) or (N, D) — mask leading axis
            w = mask if rows.ndim == 1 else mask[:, None]
            return jnp.sum(rows * w)
        row_w = mask
    batch = y_n
    q = params.q

    # Emission term (dgp_model.py:248-250, :264).  "full" uses the full
    # lower-Cholesky R (the reference's logdensity_norm, likelihoods.py:114-127
    # — present upstream but never wired into a working P>1 ELBO, see
    # GPSSMParams.rchol); "auto" selects it whenever P > 1.
    y_mean = emission_mean(params.x[1:], params.c, params.d)
    log_lik = msum(emission_log_lik_rows(params, data.y, y_mean,
                                         emission_noise))
    nll_log_likelihood = -log_lik / batch

    # Priors (dgp_model.py:252, :286/:296, :326-334).
    hyper_prior = priors.hyperparameter_prior(params.log_q, params.c,
                                              params.d, params.log_rchol)
    part_prior = (priors.prior_hyper(kernel_type, params.kernel)
                  + priors.prior_z(prior_type, kernel_type, params.kernel,
                                   params.z)
                  + priors.prior_x0(params.x[0])
                  + hyper_prior)
    if params.hidden:
        from ffvd_tpu.model.deep import hidden_priors
        part_prior = part_prior + hidden_priors(kernel_type, prior_type,
                                                params.hidden)

    xc = _gp_inputs(params, data, kernel_type=kernel_type, jitter=jitter,
                    key=key)

    terms: Dict[str, jnp.ndarray] = {}
    if u_collapse:
        if collapse_precision == "ds64":
            from ffvd_tpu.model.ds_collapse import ds_collapsed_terms
            term1, term2, trace = ds_collapsed_terms(
                kernel_type, params.kernel, params.z, params.x, xc,
                params.log_q, jitter=jitter, mask=row_w,
                refine=ds64_refine)
        else:
            pre = cond.kernel_precal(kernel_type, params.kernel, params.z,
                                     jitter)
            term1, term2, trace = cond.collapsed_bound_terms(
                kernel_type, params.kernel, pre, params.z, params.x, xc, q,
                mask=row_w)
        later_term1 = term1 / y_n
        later_term2 = term2 / y_n
        nll_trace = trace / y_n
        # Residual random-walk dynamics prior (dgp_model.py:283-284).
        x_t_prior_q = -msum(logdensity_norm_diag_nonvec(
            params.x[1:], params.x[:-1], jnp.sqrt(q))) / batch
        nll_part_prior = -part_prior / y_n
        nll = (nll_part_prior + nll_log_likelihood + x_t_prior_q
               + nll_trace + later_term1 + later_term2)
        terms.update(later_term1=later_term1, later_term2=later_term2)
    else:
        pre = cond.kernel_precal(kernel_type, params.kernel, params.z, jitter)
        mean, var = cond.whitened_conditional(
            kernel_type, params.kernel, pre, params.z, params.u, xc)
        mean = mean + params.x[:n]        # identity mean function (:346)
        reg_trace = -0.5 * jnp.sum(var / q[None, :], axis=1)
        reg_x_prior = logdensity_norm_diag(params.x[1:], mean, jnp.sqrt(q))
        nll_trace = -msum(reg_trace) / batch
        x_t_prior_q = -msum(reg_x_prior) / batch
        nll_part_prior = -(part_prior + priors.prior_u(params.u)) / y_n
        nll = nll_part_prior + nll_log_likelihood + x_t_prior_q + nll_trace

    terms.update(
        nll_log_likelihood=nll_log_likelihood,
        nll_part_prior=nll_part_prior,
        x_t_prior_Q=x_t_prior_q,
        nll_reg_trace_inverse_Q_B=nll_trace,
        nll=nll,
    )
    return terms


def negative_elbo(params: GPSSMParams, data: SSMData, **kw) -> jnp.ndarray:
    """Scalar objective (reference's ``self.nll``, dgp_model.py:288/:297)."""
    return elbo_terms(params, data, **kw)["nll"]


def windowed_elbo_terms(params: GPSSMParams, data: SSMData,
                        start: jnp.ndarray, window_n: int, *,
                        kernel_type: str = "SquaredExponential",
                        prior_type: str = "normal",
                        u_collapse: bool = True,
                        jitter: float = 1e-5,
                        emission_noise: str = "auto",
                        collapse_precision: str = "native",
                        ds64_refine: Optional[int] = None,
                        key=None) -> Dict[str, jnp.ndarray]:
    """Minibatch (random time window) objective — the reference's
    batch_placeholder semantics made live.  ``key``: deep-transition
    sampling key (see elbo_terms); ``collapse_precision``: see elbo_terms.

    The reference carries full minibatch plumbing (``batch_placeholder``
    base_model.py:16, batch slicing dgp_model.py:248-284, the
    batch_size≠Y_N scaling conditionals_multi_output.py:246-248) but
    ``get_minibatch`` always returns the full range (base_model.py:188-194),
    so the path is dead upstream.  Semantics, with b0=start,
    b1=start+window_n+1, batch=window_n, Y_N=N (dgp_model.py:262-263):

    - emission / x-dynamics terms: window sums / batch;
    - collapsed H-gram and a-vector scaled by Y_N/batch (:246-248), logdet
      and quadratic terms / Y_N;
    - trace term: window sum / Y_N (unscaled — the reference's exact choice,
      a batch/Y_N-biased estimator of the full trace term);
    - priors (incl. prior_x0 on the GLOBAL x₀): / Y_N, window-independent.

    At window_n == N (start=0) this reproduces ``elbo_terms`` exactly
    (pinned in tests/test_minibatch.py).  ``start`` may be a traced index;
    ``window_n`` must be static.

    Masked (padded multi-dataset) data: Y_N becomes the number of real
    transitions, batch the number of real transitions inside the window
    (≥1), and every window sum is mask-weighted.  Since padding is a suffix
    (parallel/multidataset.py), a start drawn in [0, real_n − window_n]
    keeps the window fully real and this reduces to the unmasked math with
    Y_N = real_n.
    """
    n = params.n_transitions
    q = params.q
    mask = data.mask
    if mask is None:
        y_n = jnp.asarray(float(n), dtype=params.x.dtype)
        batch = jnp.asarray(float(window_n), dtype=params.x.dtype)
        mask_win = None
        gram_scale = float(n) / float(window_n)
        wsum = jnp.sum
    else:
        mask_win = jax.lax.dynamic_slice_in_dim(mask, start, window_n)
        y_n = jnp.sum(mask)
        batch = jnp.maximum(jnp.sum(mask_win), 1.0)
        gram_scale = y_n / batch

        def wsum(rows):           # rows: (W,) or (W, D) — mask leading axis
            w = mask_win if rows.ndim == 1 else mask_win[:, None]
            return jnp.sum(rows * w)

    # Window slices: x rows [start, start+window_n], y/control rows
    # [start, start+window_n) (dgp_model.py:248-284).
    x_win = jax.lax.dynamic_slice_in_dim(params.x, start, window_n + 1)
    y_win = jax.lax.dynamic_slice_in_dim(data.y, start, window_n)

    y_mean = emission_mean(x_win[1:], params.c, params.d)
    log_lik = wsum(emission_log_lik_rows(params, y_win, y_mean,
                                         emission_noise))
    nll_log_likelihood = -log_lik / batch

    hyper_prior = priors.hyperparameter_prior(params.log_q, params.c,
                                              params.d, params.log_rchol)
    part_prior = (priors.prior_hyper(kernel_type, params.kernel)
                  + priors.prior_z(prior_type, kernel_type, params.kernel,
                                   params.z)
                  + priors.prior_x0(params.x[0])
                  + hyper_prior)

    ctrl_win = jax.lax.dynamic_slice_in_dim(data.control, start, window_n)
    h_win = x_win[:-1]
    if params.hidden:
        from ffvd_tpu.model.deep import hidden_priors, propagate_hidden
        part_prior = part_prior + hidden_priors(kernel_type, prior_type,
                                                params.hidden)
        h_win = propagate_hidden(kernel_type, jitter, params.hidden,
                                 h_win, ctrl_win, key)
    if data.control.shape[1] > 0:
        xc = jnp.concatenate([h_win, ctrl_win], axis=1)
    else:
        xc = h_win

    terms: Dict[str, jnp.ndarray] = {}
    if u_collapse:
        if collapse_precision == "ds64":
            from ffvd_tpu.model.ds_collapse import ds_collapsed_terms
            term1, term2, trace = ds_collapsed_terms(
                kernel_type, params.kernel, params.z, x_win, xc,
                params.log_q, jitter=jitter, mask=mask_win,
                gram_scale=gram_scale, refine=ds64_refine)
        else:
            pre = cond.kernel_precal(kernel_type, params.kernel, params.z,
                                     jitter)
            term1, term2, trace = cond.collapsed_bound_terms(
                kernel_type, params.kernel, pre, params.z, x_win, xc, q,
                mask=mask_win, gram_scale=gram_scale)
        later_term1 = term1 / y_n
        later_term2 = term2 / y_n
        nll_trace = trace / y_n
        x_t_prior_q = -wsum(logdensity_norm_diag_nonvec(
            x_win[1:], x_win[:-1], jnp.sqrt(q))) / batch
        nll_part_prior = -part_prior / y_n
        nll = (nll_part_prior + nll_log_likelihood + x_t_prior_q
               + nll_trace + later_term1 + later_term2)
        terms.update(later_term1=later_term1, later_term2=later_term2)
    else:
        pre = cond.kernel_precal(kernel_type, params.kernel, params.z, jitter)
        mean, var = cond.whitened_conditional(
            kernel_type, params.kernel, pre, params.z, params.u, xc)
        mean = mean + x_win[:-1]
        reg_trace = -0.5 * jnp.sum(var / q[None, :], axis=1)
        reg_x_prior = logdensity_norm_diag(x_win[1:], mean, jnp.sqrt(q))
        nll_trace = -wsum(reg_trace) / batch
        x_t_prior_q = -wsum(reg_x_prior) / batch
        nll_part_prior = -(part_prior + priors.prior_u(params.u)) / y_n
        nll = nll_part_prior + nll_log_likelihood + x_t_prior_q + nll_trace

    terms.update(
        nll_log_likelihood=nll_log_likelihood,
        nll_part_prior=nll_part_prior,
        x_t_prior_Q=x_t_prior_q,
        nll_reg_trace_inverse_Q_B=nll_trace,
        nll=nll,
    )
    return terms


def windowed_negative_elbo(params: GPSSMParams, data: SSMData,
                           start: jnp.ndarray, window_n: int,
                           **kw) -> jnp.ndarray:
    return windowed_elbo_terms(params, data, start, window_n, **kw)["nll"]
