"""Multi-chain / multi-seed ensemble pooling of the posterior predictive.

Beyond-parity feature (measured motivation in
tests/golden/flutter_c5_chain_study.json and PARITY.md §2d/§2e): both this
rebuild and the reference evaluate a SINGLE chain's free-run rollout, whose
predictive variance estimator (predict_summary, after base_model.py:334-343)
averages within-chain sample variances only.  Chain-to-chain mode variation
— large for SGHMC cases and for fp32 seeds generally — is invisible to it,
which is why the 30-step NLL explodes into the thousands on both
implementations (PARITY §2).  Pooling C independently-trained chains as an
equal-weight mixture and keeping the mixture's total-variance term
(within-chain variance + cross-chain spread of predictive means) yields
calibrated free-run uncertainty at production speed: flutter C5 fp32 goes
from per-chain NLL 5.9e3-2.0e4 to 0.64 pooled, RMSE 1.61-worst-chain to
1.007 pooled.

Chains are trained independently (one chip: sequential at full per-chain
speed — vmapped chains are latency-bound, DESIGN §10; multi-chip: one chain
per 'dp' mesh slot via parallel.MultiChainTrainer).  Pooling happens on
host in float64: T×P arrays, microseconds.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional, Sequence, Tuple

import jax
import numpy as np

Chain = Tuple[np.ndarray, np.ndarray, np.ndarray]  # y_s (S,T,P), v_s, r2 (P,)


def chain_moments(model) -> Chain:
    """Per-sample emission-space moments of one fitted FFVDModel: the
    protocol's S thinned posterior rollouts (collect_posterior) pushed
    through the emission BEFORE any averaging — predict_summary's
    aggregation (eval/rollout.py:220-227) deferred so chains can pool."""
    from ffvd_tpu.eval.rollout import collect_posterior
    from ffvd_tpu.model.likelihoods import use_full_r

    model.key, sub = jax.random.split(model.key)
    xs, vs, model.state = collect_posterior(
        model.eval_trainer, model.state, model.dataset.n_test, sub)
    p = model.params
    y_s = np.asarray(xs @ p.c + p.d, np.float64)
    v_s = np.asarray(vs @ (p.c * p.c), np.float64)
    r2 = np.asarray(
        p.r_var_diag if use_full_r(model.cfg.emission_noise, p.c.shape[1])
        else p.rchol_diag ** 2, np.float64)
    return y_s, v_s, r2


def pool_moments(chains: Sequence[Chain], include_spread: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """Equal-weight mixture moments over chains' pooled samples.

    Mean: average over all (chain, sample) predictive means.  Variance:
    law of total variance for the mixture — mean within-sample variance
    (+ mean emission noise) plus, when ``include_spread``, the variance of
    the predictive means across all pooled samples.  ``include_spread=False``
    reproduces the single-chain protocol estimator applied to the pool
    (for ablation; it stays overconfident)."""
    y_all = np.concatenate([c[0] for c in chains], axis=0)
    v_all = np.concatenate([c[1] for c in chains], axis=0)
    r2 = np.mean([c[2] for c in chains], axis=0)
    py = y_all.mean(axis=0)
    pv = v_all.mean(axis=0) + r2
    if include_spread:
        pv = pv + y_all.var(axis=0)
    return py, pv


def _metrics(py, pv, y_test, y_train_std, horizon):
    yt = np.asarray(y_test, np.float64)[:horizon].reshape(-1)
    yp = py[:horizon].reshape(-1)
    vp = pv[:horizon].reshape(-1)
    rmse = float(np.sqrt(np.mean((yt - yp) ** 2)) * y_train_std)
    nll = float(-np.mean(-0.5 * np.log(2 * math.pi * vp)
                         - 0.5 * (yt - yp) ** 2 / vp))
    return rmse, nll


def ensemble_evaluate(models: List, horizon: int = 30,
                      include_spread: bool = True) -> dict:
    """Pooled mixture metrics + per-chain protocol metrics for C fitted
    models (same dataset, different seeds).  Returns
    {rmse, nll, nll_no_spread, predict_y, predict_y_var, per_chain}."""
    ds = models[0].dataset
    chains = [chain_moments(m) for m in models]
    py, pv = pool_moments(chains, include_spread=include_spread)
    rmse, nll = _metrics(py, pv, ds.y_test, ds.y_train_std, horizon)
    py_ns, pv_ns = pool_moments(chains, include_spread=False)
    _, nll_ns = _metrics(py_ns, pv_ns, ds.y_test, ds.y_train_std, horizon)
    per = []
    for y_s, v_s, r2 in chains:
        r, n = _metrics(y_s.mean(axis=0), v_s.mean(axis=0) + r2,
                        ds.y_test, ds.y_train_std, horizon)
        per.append({"rmse": r, "nll": n})
    return {"rmse": rmse, "nll": nll, "nll_no_spread": nll_ns,
            "predict_y": py, "predict_y_var": pv, "per_chain": per}


def multichain_moments(mct, state, test_len: int, key,
                       num: Optional[int] = None,
                       spacing: Optional[int] = None):
    """Chain moments for a chain-stacked parallel.MultiChainTrainer state.

    One jit of the single-chain collection closure (eval/rollout.
    build_collect) vmapped over the chain axis — on a ('dp','ep') mesh the
    C chains' thinning+rollout programs run one-per-'dp'-slot, so ensemble
    collection scales across chips exactly like ensemble training.
    Returns (chains list for pool_moments/ensemble-style metrics,
    new stacked state)."""
    from ffvd_tpu.eval.rollout import build_collect
    from ffvd_tpu.model.likelihoods import use_full_r

    cfg = mct.cfg
    num = num or cfg.num_posterior_samples
    spacing = spacing or cfg.posterior_sample_spacing
    cache = getattr(mct, "_collect_cache", None)
    if cache is None:
        cache = mct._collect_cache = {}
    k = (test_len, num, spacing)
    if k not in cache:
        cache[k] = jax.jit(jax.vmap(
            build_collect(mct.base, test_len, num, spacing),
            in_axes=(0, 0, None)))
    keys = jax.random.split(key, mct.n_chains)
    xs, vs, new_state = cache[k](state, keys, mct.base.data)  # (C,S,T,D) ×2

    # POST-thinning params (matches chain_moments, which reads model.params
    # after assigning the returned state): for sampled-likelihood cases the
    # thinning moves C/d/log_rchol, and the rollouts in xs/vs were produced
    # under the evolving chain — pushing them through the stale input-state
    # emission would mix pre/post-thin quantities.
    p = new_state.params                        # chain-stacked
    full_r = use_full_r(cfg.emission_noise, p.c.shape[-1])
    chains = []
    for i in range(mct.n_chains):
        pi = jax.tree.map(lambda a: a[i], p)
        y_s = np.asarray(xs[i] @ pi.c + pi.d, np.float64)
        v_s = np.asarray(vs[i] @ (pi.c * pi.c), np.float64)
        r2 = np.asarray(pi.r_var_diag if full_r else pi.rchol_diag ** 2,
                        np.float64)
        chains.append((y_s, v_s, r2))
    return chains, new_state


def fit_ensemble(cfg, n_chains: int, dtype=None,
                 seeds: Optional[Sequence[int]] = None,
                 init_jitter: float = 0.0, **fit_kwargs) -> List:
    """Train C independent chains of the same config (seeds default to
    cfg.seed, cfg.seed+1, …) sequentially on the local device and return
    the fitted FFVDModels.  For multi-chip 'dp' training use
    parallel.MultiChainTrainer instead.

    Seeds diversify the training PRNG stream, which only matters for
    stochastic protocols (SGHMC / particle-Gibbs / minibatch / deep):
    full-batch Adam cases (C1/C4) are deterministic given the warm start,
    so different seeds converge to BIT-IDENTICAL parameters (verified in
    tests/test_api.py) and the "ensemble" degenerates to pooled rollouts of
    one chain — use ``spread``-mode eval there instead, or set
    ``init_jitter`` (additive N(0, jitter²) perturbation of chains 1…C-1's
    warm start, like MultiChainTrainer.stack_params) to make deterministic
    chains explore genuinely different optima."""
    from ffvd_tpu.api import FFVDModel

    seeds = list(seeds) if seeds is not None else [
        cfg.seed + i for i in range(n_chains)]
    models = []
    for i, s in enumerate(seeds):
        m = FFVDModel(dataclasses.replace(cfg, seed=s), dtype=dtype)
        if init_jitter and i > 0:   # chain 0 keeps the exact warm start
            leaves, treedef = jax.tree.flatten(m.params)
            keys = jax.random.split(jax.random.key(s ^ 0x5EED), len(leaves))
            leaves = [a + init_jitter * jax.random.normal(k, a.shape,
                                                          a.dtype)
                      for a, k in zip(leaves, keys)]
            m.state = m.trainer.init_state(
                jax.tree.unflatten(treedef, leaves))
        m.fit(**fit_kwargs)
        models.append(m)
    return models
