"""Tests for SGHMC, the trainer protocol, and particle Gibbs
(SURVEY.md §4 plan #5: sampler statistical tests + protocol checks)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.config import ADAM, CASE_TABLE, FROZEN, SGHMC, FFVDConfig, \
    partition_for
from ffvd_tpu.inference.particle_gibbs import make_pg_fn
from ffvd_tpu.inference.sghmc import sghmc_init, sghmc_step
from ffvd_tpu.inference.trainer import Trainer, label_tree
from ffvd_tpu.model.params import SSMData
from tests.test_model_props import small_model

rng = np.random.RandomState(3)


# ---------------------------------------------------------------------------
# SGHMC
# ---------------------------------------------------------------------------

def numpy_sghmc_reference(theta, grad, xi, g, g2, p, noise, eps, mdecay, x_n,
                          burn):
    """Literal transcription of base_model.py:156-173 for one variable."""
    r = 1.0 / (xi + 1.0)
    g_t = (1 - r) * g + r * grad
    g2_t = (1 - r) * g2 + r * grad ** 2
    xi_t = 1.0 + xi * (1.0 - g * g / (g2 + 1e-16))
    minv = 1.0 / (np.sqrt(g2 + 1e-16) + 1e-16)
    eps_s = eps / np.sqrt(x_n)
    sigma = np.sqrt(np.maximum(2 * eps_s ** 2 * mdecay * minv, 1e-16))
    p_t = p - eps ** 2 * minv * grad - mdecay * p + noise * sigma
    theta_t = theta + p_t
    if burn:
        return theta_t, xi_t, g_t, g2_t, p_t
    return theta_t, xi, g, g2, p_t


@pytest.mark.parametrize("burn", [True, False])
def test_sghmc_step_matches_reference_equations(burn):
    theta = {"a": jnp.asarray(rng.randn(3))}
    grads = {"a": jnp.asarray(rng.randn(3))}
    state = sghmc_init(theta)
    # randomize the auxiliary state so the update formulas are exercised
    state = dataclasses.replace(
        state,
        xi={"a": jnp.asarray(rng.rand(3) + 0.5)},
        g={"a": jnp.asarray(rng.randn(3))},
        g2={"a": jnp.asarray(rng.rand(3) + 0.5)},
        p={"a": jnp.asarray(rng.randn(3))})
    key = jax.random.key(0)
    new_theta, new_state = sghmc_step(theta, grads, state, key,
                                      epsilon=0.01, mdecay=0.05, x_n=21,
                                      burn_in=burn)
    # replicate the noise draw
    leaves, _ = jax.tree.flatten(theta)
    k0 = jax.random.split(key, 1)[0]
    noise = np.asarray(jax.random.normal(k0, (3,), leaves[0].dtype))
    th, xi, g, g2, p = numpy_sghmc_reference(
        np.asarray(theta["a"]), np.asarray(grads["a"]),
        np.asarray(state.xi["a"]), np.asarray(state.g["a"]),
        np.asarray(state.g2["a"]), np.asarray(state.p["a"]),
        noise, 0.01, 0.05, 21, burn)
    np.testing.assert_allclose(np.asarray(new_theta["a"]), th, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.xi["a"]), xi, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.g2["a"]), g2, rtol=1e-12)
    np.testing.assert_allclose(np.asarray(new_state.p["a"]), p, rtol=1e-12)


def test_sghmc_samples_gaussian_target():
    """Stationary θ-marginal of the scale-adapted SGHMC on nll = λθ²/2
    targets exp(−X_N·nll): Var[θ] ≈ 1/(X_N·λ) (continuous-time limit)."""
    lam = 2.0
    x_n = 50
    dim = 512                      # parallel chains for statistics
    theta = {"t": jnp.zeros(dim)}
    state = sghmc_init(theta)
    key = jax.random.key(1)

    @jax.jit
    def run(theta, state, key):
        def body(carry, k):
            th, st, i = carry
            grads = {"t": lam * th["t"]}
            th, st = sghmc_step(th, grads, st, k, epsilon=0.01, mdecay=0.05,
                                x_n=x_n, burn_in=i < 500)
            return (th, st, i + 1), th["t"]

        keys = jax.random.split(key, 4000)
        (_, _, _), trace = jax.lax.scan(body, (theta, state, 0), keys)
        return trace

    trace = np.asarray(run(theta, state, key))[2000:]   # post burn-in
    var = trace.var()
    expected = 1.0 / (x_n * lam)
    assert 0.6 * expected < var < 1.6 * expected, (var, expected)


# ---------------------------------------------------------------------------
# Partition / trainer protocol
# ---------------------------------------------------------------------------

def test_partition_matches_case_table():
    """SURVEY.md §2.2 case matrix."""
    def labels(case):
        p = partition_for(FFVDConfig(case=case))
        return (p.kernel, p.u, p.z, p.x)

    assert labels(1) == (ADAM, ADAM, ADAM, ADAM)
    assert labels(2) == (SGHMC, SGHMC, ADAM, ADAM)
    assert labels(3) == (SGHMC, SGHMC, SGHMC, ADAM)
    assert labels(4) == (ADAM, FROZEN, ADAM, ADAM)   # U collapsed
    assert labels(5) == (SGHMC, FROZEN, ADAM, ADAM)
    assert labels(6) == (ADAM, ADAM, ADAM, FROZEN)   # X via PG
    p7 = partition_for(FFVDConfig(case=7))
    assert (p7.u, p7.x, p7.z, p7.kernel, p7.log_q, p7.lik) == \
        (SGHMC, SGHMC, FROZEN, FROZEN, FROZEN, FROZEN)
    ph = partition_for(FFVDConfig(case=2, hyperparameter_sampling=True))
    assert ph.log_q == SGHMC and ph.lik == SGHMC


def _mini_cfg(case, **kw):
    return FFVDConfig(dataset="ballbeam", case=case, num_inducing=6, x_dim=2,
                      window_size=8, **kw)


def test_trainer_c4_skips_sghmc_and_moves_adam_leaves():
    params, data = small_model()
    cfg = _mini_cfg(4)
    tr = Trainer(cfg, data)
    assert not tr.has_sghmc and tr.has_adam
    state = tr.init_state(params)
    state, nlls = tr.run(state, 5, jax.random.key(0), chunk_size=5)
    assert int(state.window_count) == 0          # never pushed
    assert not np.allclose(np.asarray(state.params.x), np.asarray(params.x))
    # U is collapsed: must not move
    np.testing.assert_array_equal(np.asarray(state.params.u),
                                  np.asarray(params.u))


def test_trainer_c3_fills_window_and_freezes_adam_free_leaves():
    params, data = small_model()
    cfg = _mini_cfg(3)
    tr = Trainer(cfg, data)
    assert tr.has_sghmc
    state = tr.init_state(params)
    state, nlls = tr.run(state, 10, jax.random.key(0), chunk_size=5)
    assert int(state.window_count) == 8           # capped at window_size
    # SGHMC leaves moved
    assert not np.allclose(np.asarray(state.params.u), np.asarray(params.u))
    assert not np.allclose(np.asarray(state.params.z), np.asarray(params.z))
    # Adam leaves moved too (X, log_q, lik)
    assert not np.allclose(np.asarray(state.params.x), np.asarray(params.x))
    assert np.isfinite(np.asarray(nlls)).all()


def test_trainer_c7_no_adam():
    params, data = small_model()
    cfg = _mini_cfg(7)
    tr = Trainer(cfg, data)
    assert tr.has_sghmc and not tr.has_adam
    state = tr.init_state(params)
    state, nlls = tr.run(state, 3, jax.random.key(0), chunk_size=3)
    # frozen leaves must not move
    np.testing.assert_array_equal(np.asarray(state.params.z),
                                  np.asarray(params.z))
    np.testing.assert_array_equal(np.asarray(state.params.log_q),
                                  np.asarray(params.log_q))
    assert not np.allclose(np.asarray(state.params.u), np.asarray(params.u))


# ---------------------------------------------------------------------------
# Particle Gibbs
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_pg_resamples_trajectory():
    params, data = small_model()
    cfg = _mini_cfg(6, pg_particles=16)
    pg = make_pg_fn(cfg, data)
    out = pg(params, jax.random.key(5))
    assert out.x.shape == params.x.shape
    assert bool(jnp.isfinite(out.x).all())
    # Unsampled blocks untouched
    np.testing.assert_array_equal(np.asarray(out.u), np.asarray(params.u))


def test_pg_ancestor_trace_default_resolution():
    """Ancestor-traced CSMC is the SHIPPED C6 default (PARITY §2b study:
    reference-regime accuracy vs live CSMC 13-150x worse), resolved from
    None so pg_compat_noop auto-disables it instead of conflicting."""
    assert _mini_cfg(6).pg_ancestor_trace is True
    assert _mini_cfg(6, pg_compat_noop=True).pg_ancestor_trace is False
    assert _mini_cfg(6, pg_ancestor_trace=False).pg_ancestor_trace is False
    with pytest.raises(ValueError, match="mutually exclusive"):
        _mini_cfg(6, pg_compat_noop=True, pg_ancestor_trace=True)


def test_pg_compat_noop_leaves_x_at_init():
    """The reference's PG op never updates X: its assign
    (base_model.py:137) is not a dependency of the returned tf.ones(1)
    fetch, so session.run(pg_x_sampling_op) is a no-op (verified against the
    executed reference graph — see FFVDConfig.pg_compat_noop).  The compat
    flag reproduces that: C6 trains with X frozen at its warm start."""
    params, data = small_model()
    cfg = _mini_cfg(6, pg_particles=16, pg_compat_noop=True)
    pg = make_pg_fn(cfg, data)
    out = pg(params, jax.random.key(5))
    np.testing.assert_array_equal(np.asarray(out.x), np.asarray(params.x))

    # And through a full training step: X bit-identical, others move.
    from ffvd_tpu.inference.trainer import Trainer
    tr = Trainer(cfg, data, pg_fn=pg)
    st = tr.init_state(params)
    st2, _ = tr.run(st, 3, jax.random.key(0), chunk_size=3)
    np.testing.assert_array_equal(np.asarray(st2.params.x),
                                  np.asarray(params.x))
    assert not np.array_equal(np.asarray(st2.params.u),
                              np.asarray(params.u))


@pytest.mark.slow
def test_pg_keeps_reference_with_prob_1_over_p():
    params, data = small_model()
    # live mode: the 1/P keep-probability comes from the final UNIFORM
    # choice over the stored pool (reference semantics); the ancestor-trace
    # default uses a weight-proportional final draw instead.
    cfg = _mini_cfg(6, pg_particles=4, pg_ancestor_trace=False)
    pg = jax.jit(make_pg_fn(cfg, data))
    kept = 0
    trials = 200
    for i in range(trials):
        out = pg(params, jax.random.key(i))
        kept += bool(jnp.array_equal(out.x, params.x))
    frac = kept / trials
    assert 0.10 < frac < 0.45, frac   # expect ≈ 1/P = 0.25


@pytest.mark.slow
def test_pg_tracks_informative_observations():
    """With a near-noiseless emission y = x·C, resampled latent states should
    reproduce the observations much better than prior particles."""
    params, data = small_model(n=30)
    # 1-to-1 emission on dim 0, tiny noise
    params = dataclasses.replace(
        params, c=jnp.asarray([[1.0], [0.0]]), d=jnp.zeros(1),
        log_rchol=jnp.asarray([[np.log(0.05)]]))
    # live (reference-storage) semantics: per-time filtering resampling
    # greedily tracks y_t; the ancestor-trace default draws a COHERENT
    # smoothing trajectory that balances the (here: random, ill-fitting)
    # transition prior, so this filtering-specific property needs live mode.
    cfg = _mini_cfg(6, pg_particles=64, pg_ancestor_trace=False)
    pg = jax.jit(make_pg_fn(cfg, data))
    out = pg(params, jax.random.key(2))
    resid = np.asarray(out.x[1:, 0]) - np.asarray(data.y[:, 0])
    prior_resid = np.asarray(data.y[:, 0])  # vs zero-mean prior particles
    assert np.mean(resid[5:] ** 2) < 0.5 * np.mean(prior_resid[5:] ** 2)


@pytest.mark.slow
def test_sghmc_log_clip_guards_overflow():
    """A log-hyperparameter started outside the clip box is pulled back in
    (the fp32 exp-overflow guard, FFVDConfig.sghmc_log_clip)."""
    params, data = small_model()
    params = dataclasses.replace(
        params,
        kernel=dataclasses.replace(
            params.kernel,
            log_variance=jnp.full_like(params.kernel.log_variance, 100.0)))
    cfg = _mini_cfg(2)              # kernel hypers are SGHMC-sampled in C2
    tr = Trainer(cfg, data)
    state = tr.init_state(params)
    state, nlls = tr.run(state, 1, jax.random.key(0), chunk_size=1,
                         nan_check=False)
    assert float(jnp.max(state.params.kernel.log_variance)) <= 30.0


def test_clip_log_leaves_only_touches_log_paths():
    from ffvd_tpu.inference.trainer import clip_log_leaves
    params, _ = small_model()
    big = jax.tree.map(lambda a: jnp.full_like(a, 1e6), params)
    out = clip_log_leaves(big, 30.0)
    assert float(out.x[0, 0]) == 1e6                  # not a log leaf
    assert float(out.log_q[0]) == 30.0
    assert float(out.kernel.log_lengthscales[0, 0]) == 30.0
    assert clip_log_leaves(big, None) is big


@pytest.mark.slow
def test_pg_matches_kalman_filter_marginals():
    """CSMC correctness against exact Gaussian inference: with kernel
    variance → 0 the GP transition vanishes and the implied model is a
    random walk x_{t+1}=x_t+w, y_t = x_{t+1}·C + d + v — conditionally
    linear-Gaussian.  The reference's CSMC stores the RESAMPLED states per
    time (no ancestor tracing), so the stored X[t+1] is a draw from the
    FILTERING marginal p(x_{t+1} | y_{0:t}).  Average many PG draws and
    compare with the exact Kalman filter means."""
    n, p_obs = 24, 1
    d = 1
    q_var, r_var = 0.3, 0.05
    rng2 = np.random.RandomState(9)
    # simulate the random walk + emission
    x_true = np.cumsum(np.sqrt(q_var) * rng2.randn(n + 1))
    y = x_true[1:, None] + np.sqrt(r_var) * rng2.randn(n, 1)

    from ffvd_tpu.model.params import GPSSMParams
    from ffvd_tpu.ops.kernels import KernelParams
    params = GPSSMParams(
        x=jnp.zeros((n + 1, d)),
        u=jnp.zeros((8, d)),
        z=jnp.asarray(rng2.randn(8, d)),
        kernel=KernelParams(log_variance=jnp.asarray([-30.0]),
                            log_lengthscales=jnp.zeros((d, d))),
        log_q=jnp.asarray([np.log(q_var)]),
        c=jnp.ones((d, p_obs)),
        d=jnp.zeros((p_obs,)),
        log_rchol=jnp.asarray([[0.5 * np.log(r_var)]]))
    data = SSMData(y=jnp.asarray(y), control=jnp.zeros((2 * n, 0)))

    # live mode: the stored states ARE filtering-marginal draws (the
    # property under test); ancestor tracing would draw smoothing marginals
    # (validated against RTS below).
    cfg = _mini_cfg(6, pg_particles=128, pg_ancestor_trace=False)
    pg = jax.jit(make_pg_fn(cfg, data))
    draws = jax.vmap(lambda k: pg(params, k).x)(
        jax.random.split(jax.random.key(0), 300))     # (300, n+1, 1)
    # Some draws keep the (zero) reference trajectory (prob 1/P) — that is
    # part of the sampler's output distribution; with P=128 the bias is <1%.
    pg_mean = np.asarray(draws).mean(axis=0)[:, 0]

    # exact Kalman filter for the implied model (x0 ~ N(0,1) like the
    # initial particles; predict then update with y_t at x_{t+1})
    means = np.zeros(n + 1)
    m_f, p_f = 0.0, 1.0
    means[0] = m_f
    for t in range(n):
        m_p, p_p = m_f, p_f + q_var
        k_gain = p_p / (p_p + r_var)
        m_f = m_p + k_gain * (y[t, 0] - m_p)
        p_f = (1 - k_gain) * p_p
        means[t + 1] = m_f

    # filter std ≈ sqrt(p_f) ~ 0.2; MC error over 300 draws ~ 0.2/17 ≈ 0.013
    err = np.abs(pg_mean[5:] - means[5:])
    assert err.max() < 0.12, (err.max(), pg_mean[:6], means[:6])


@pytest.mark.slow
def test_pg_ancestor_trace_matches_rts_smoother():
    """The ancestor-traced CSMC draws coherent trajectories from the
    smoothing posterior: on the conditionally-Gaussian random-walk model its
    marginal means must match the exact RTS smoother (the reference-style
    storage matches the FILTER instead — see the companion test)."""
    n = 24
    q_var, r_var = 0.3, 0.05
    rng2 = np.random.RandomState(9)
    x_true = np.cumsum(np.sqrt(q_var) * rng2.randn(n + 1))
    y = x_true[1:, None] + np.sqrt(r_var) * rng2.randn(n, 1)

    from ffvd_tpu.model.params import GPSSMParams
    from ffvd_tpu.ops.kernels import KernelParams
    params = GPSSMParams(
        x=jnp.zeros((n + 1, 1)),
        u=jnp.zeros((8, 1)),
        z=jnp.asarray(rng2.randn(8, 1)),
        kernel=KernelParams(log_variance=jnp.asarray([-30.0]),
                            log_lengthscales=jnp.zeros((1, 1))),
        log_q=jnp.asarray([np.log(q_var)]),
        c=jnp.ones((1, 1)), d=jnp.zeros((1,)),
        log_rchol=jnp.asarray([[0.5 * np.log(r_var)]]))
    data = SSMData(y=jnp.asarray(y), control=jnp.zeros((2 * n, 0)))

    cfg = _mini_cfg(6, pg_particles=256, pg_ancestor_trace=True)
    pg = jax.jit(make_pg_fn(cfg, data))
    draws = jax.vmap(lambda k: pg(params, k).x)(
        jax.random.split(jax.random.key(1), 400))
    pg_mean = np.asarray(draws).mean(axis=0)[:, 0]

    # Kalman filter + RTS smoother for x0 ~ N(0,1), RW(q), obs at x_{t+1}
    mf = np.zeros(n + 1); pf = np.zeros(n + 1)
    mp = np.zeros(n + 1); pp_ = np.zeros(n + 1)
    mf[0], pf[0] = 0.0, 1.0
    for t in range(n):
        mp[t + 1] = mf[t]; pp_[t + 1] = pf[t] + q_var
        k_g = pp_[t + 1] / (pp_[t + 1] + r_var)
        mf[t + 1] = mp[t + 1] + k_g * (y[t, 0] - mp[t + 1])
        pf[t + 1] = (1 - k_g) * pp_[t + 1]
    ms = mf.copy()
    for t in range(n - 1, -1, -1):
        g = pf[t] / pp_[t + 1]
        ms[t] = mf[t] + g * (ms[t + 1] - mp[t + 1])

    err = np.abs(pg_mean - ms)
    assert err.max() < 0.12, (err.max(), pg_mean[:5], ms[:5])
    # and the smoother differs measurably from the filter at early times,
    # so this test genuinely distinguishes the two storages
    assert np.abs(ms[:5] - mf[:5]).max() > 0.15


@pytest.mark.slow
def test_hyperparameter_sampling_end_to_end():
    """hyperparameter_sampling=True trains end-to-end: log_Q, C, d and
    log_Rchol are SGHMC-SAMPLED (dgp_model.py:241-243), not Adam-trained.
    (Upstream this path crashes at graph build for every provided-value
    configuration — see generate_golden.py — so this is the rebuild's
    working version of it.)"""
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import SSMData, init_params_random

    ds = generate_kink(n=40, seed=1)
    data = SSMData(y=jnp.asarray(ds.y_train),
                   control=jnp.zeros((80, 0)))
    params = init_params_random(jax.random.key(0), n=40, x_dim=2, m=8,
                                control_dim=0, p=1)
    cfg = FFVDConfig(dataset="ballbeam", case=2, num_inducing=8, x_dim=2,
                     hyperparameter_sampling=True, window_size=4)
    tr = Trainer(cfg, data)
    assert tr.has_sghmc
    state, nlls = tr.run(tr.init_state(params), 8, jax.random.key(2),
                         chunk_size=4)
    assert bool(jnp.all(jnp.isfinite(nlls)))
    p1 = state.params
    # every hs block moved, via the sampler (they are SGHMC-labeled)
    from ffvd_tpu.config import SGHMC, partition_for
    part = partition_for(cfg)
    assert part.log_q == SGHMC and part.lik == SGHMC
    for name in ("log_q", "c", "d", "log_rchol"):
        assert float(jnp.max(jnp.abs(getattr(p1, name)
                                     - getattr(params, name)))) > 0.0, name
    # posterior eval runs on the hs chain too
    from ffvd_tpu.eval.rollout import collect_posterior, predict_summary
    xs, vs, _ = collect_posterior(tr, state, test_len=10,
                                  key=jax.random.key(3), num=2, spacing=2)
    py, pv, _ = predict_summary(p1, xs, vs)
    assert bool(jnp.all(jnp.isfinite(py))) and bool(jnp.all(pv > 0))
