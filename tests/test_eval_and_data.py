"""Tests for data loaders, warm starts, rollout eval, and results IO."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data import (DATASET_FILES, create_dataset, list_warmstarts,
                           load_warmstart)
from ffvd_tpu.eval import (collect_posterior, predict_summary, rmse_nll,
                           save_results_npz)
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.model.params import SSMData, init_params_from_warmstart
from tests.test_model_props import small_model

# SURVEY.md §6: pinned dataset sizes
EXPECTED_SIZES = {"ballbeam": 500, "dryer": 500, "flutter": 512,
                  "actuator": 512, "drive": 250, "gas_furnace": 148}


@pytest.mark.parametrize("name", sorted(DATASET_FILES))
def test_dataset_sizes_and_normalization(name):
    ds = create_dataset(name)
    assert ds.n_train == EXPECTED_SIZES[name]
    assert ds.n_test in (EXPECTED_SIZES[name], EXPECTED_SIZES[name] + 1)
    # train half is z-normalized by construction
    np.testing.assert_allclose(ds.y_train.mean(), 0.0, atol=1e-10)
    np.testing.assert_allclose(ds.y_train.std(), 1.0, rtol=1e-10)
    # control normalized over the full series
    np.testing.assert_allclose(ds.control.mean(), 0.0, atol=1e-10)
    np.testing.assert_allclose(ds.control.std(), 1.0, rtol=1e-10)
    assert ds.control.shape[0] == ds.n_train + ds.n_test


@pytest.mark.parametrize("name", sorted(DATASET_FILES))
def test_warmstart_schema(name):
    files = list_warmstarts(name)
    assert len(files) >= 10
    assert files == sorted(files)
    ws = load_warmstart(name, 3)
    params = init_params_from_warmstart(ws)
    n = EXPECTED_SIZES[name]
    assert params.x.shape == (n + 1, 4)
    assert params.u.shape == (100, 4)
    assert params.z.shape == (100, 5)


def test_rollout_near_deterministic_when_noise_tiny():
    """With Q→0, U=0 and tiny kernel variance the free-run is ≈ a fixed
    point of the identity mean function: x stays at x_N."""
    params, data = small_model(n=10)
    params = dataclasses.replace(
        params,
        u=jnp.zeros_like(params.u),
        log_q=jnp.full_like(params.log_q, np.log(1e-12)),
        kernel=dataclasses.replace(params.kernel,
                                   log_variance=jnp.full_like(
                                       params.kernel.log_variance,
                                       np.log(1e-12))))
    cfg = FFVDConfig(dataset="ballbeam", case=1, num_inducing=6, x_dim=2,
                     num_posterior_samples=3)
    tr = Trainer(cfg, data)
    state = tr.init_state(params)
    xs, vs, _ = collect_posterior(tr, state, test_len=5, key=jax.random.key(0))
    assert xs.shape == (3, 5, 2) and vs.shape == (3, 5, 2)
    expected = np.broadcast_to(np.asarray(params.x[-1]), (3, 5, 2))
    np.testing.assert_allclose(np.asarray(xs), expected, atol=1e-4)


@pytest.mark.slow
def test_tensorboard_sink_writes_reference_summary_set(tmp_path):
    """utils.metrics.TensorBoardSink — the reference's gated-off summary set
    (models.py:94-131) made live.  Write two steps, read the event file back
    and check the tag scheme."""
    pytest.importorskip("torch.utils.tensorboard")
    from ffvd_tpu.utils.metrics import TensorBoardSink

    params, _ = small_model(n=10)
    sink = TensorBoardSink(str(tmp_path))
    sink.write(params, nll=-1.5, step=1)
    sink.write(params, nll=-2.5, step=2)
    sink.close()
    files = list(tmp_path.glob("events.out.tfevents.*"))
    assert files and files[0].stat().st_size > 0
    try:
        from tensorboard.backend.event_processing.event_accumulator import \
            EventAccumulator
    except ImportError:
        return
    acc = EventAccumulator(str(tmp_path))
    acc.Reload()
    scalars = set(acc.Tags()["scalars"])
    hists = set(acc.Tags()["histograms"])
    assert "marginal-ll" in scalars
    assert "kernel-0-log-variance" in scalars
    assert {"CC-histogram", "DD-histogram", "log-Q-histogram",
            "x0-histogram", "U1-histogram"} <= hists
    vals = [e.value for e in acc.Scalars("marginal-ll")]
    assert vals == [1.5, 2.5]


def test_predict_summary_and_metrics():
    params, data = small_model(n=10)
    s, t, d = 4, 6, 2
    xs = jnp.asarray(np.random.RandomState(0).randn(s, t, d))
    vs = jnp.asarray(np.random.RandomState(1).rand(s, t, d))
    py, pv, fy = predict_summary(params, xs, vs)
    c = np.asarray(params.c)
    expected_y = np.mean(np.asarray(xs) @ c, axis=0) + np.asarray(params.d)
    np.testing.assert_allclose(np.asarray(py), expected_y, rtol=1e-9)
    r2 = np.exp(2 * np.asarray(params.log_rchol)[0, 0])
    expected_v = np.mean(np.asarray(vs) @ (c * c), axis=0) + r2
    np.testing.assert_allclose(np.asarray(pv), expected_v, rtol=1e-9)

    y_test = jnp.asarray(np.random.RandomState(2).randn(t, 1))
    rmse, nll = rmse_nll(y_test, py, pv, y_train_std=2.0, horizon=5)
    from scipy.stats import norm
    yt = np.asarray(y_test)[:5, 0]
    yp = np.asarray(py)[:5, 0]
    vp = np.asarray(pv)[:5, 0]
    np.testing.assert_allclose(float(rmse),
                               np.sqrt(np.mean((yt - yp) ** 2)) * 2.0,
                               rtol=1e-8)
    np.testing.assert_allclose(float(nll),
                               -np.mean(norm.logpdf(yt, yp, np.sqrt(vp))),
                               rtol=1e-8)


def test_results_npz_schema(tmp_path):
    params, data = small_model(n=10)
    out = save_results_npz(
        tmp_path / "res.npz", params=params,
        fit_y=np.zeros(10), predict_y=np.zeros(5), predict_y_var=np.ones(5),
        y_test=np.zeros((5, 1)), y_train=np.zeros((10, 1)),
        y_train_std=1.5, case="C4", ll_seq=[1.0, 2.0])
    with np.load(out, allow_pickle=True) as z:
        keys = set(z.files)
    # reference schema, base_model.py:512-517
    expected = {"y_train_vfe", "y_test_vfe", "v_test_vfe_var", "Y_test_data",
                "Y_train_data", "Y_train_std", "CC_val", "DD_val",
                "log_R_cholesky", "log_QQ", "Z_val", "U_val", "X_val",
                "k_lengthscales", "k_log_variances", "case", "ll_seq",
                "running_time_seq", "PG_num", "mc_posterior_samples"}
    assert expected <= keys


@pytest.mark.slow
def test_checkpoint_roundtrip_and_resume(tmp_path):
    """Orbax checkpoint + exact deterministic resume
    (SURVEY.md §5 failure-detection/checkpoint row)."""
    import jax
    from ffvd_tpu.utils.checkpoint import CheckpointManager, \
        run_with_checkpoints
    params, data = small_model()
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=6, x_dim=2,
                     window_size=4)
    tr = Trainer(cfg, data)
    key = jax.random.key(0)

    mgr = CheckpointManager(tmp_path / "ckpt")
    state = tr.init_state(params)
    final, nlls = run_with_checkpoints(tr, state, 8, key, mgr, every=4,
                                       chunk_size=4)
    assert mgr.latest_step() == 8

    # crash after step 4: restore and replay — must be bit-identical
    template = tr.init_state(params)
    resumed = mgr.restore(template, step=4)
    assert int(resumed.step) == 4
    refinal, _ = run_with_checkpoints(tr, resumed, 8, key, mgr, every=4,
                                      chunk_size=4)
    np.testing.assert_array_equal(np.asarray(refinal.params.x),
                                  np.asarray(final.params.x))
    np.testing.assert_array_equal(np.asarray(refinal.params.z),
                                  np.asarray(final.params.z))
    mgr.close()


@pytest.mark.slow
def test_nan_guard_raises():
    import dataclasses
    import jax
    import pytest
    params, data = small_model()
    params = dataclasses.replace(
        params, x=params.x.at[0, 0].set(jnp.nan))
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=6, x_dim=2)
    tr = Trainer(cfg, data)
    state = tr.init_state(params)
    with pytest.raises(FloatingPointError, match="non-finite nll"):
        tr.run(state, 2, jax.random.key(0), chunk_size=2)


@pytest.mark.slow
def test_synthetic_kink_cold_start_trains():
    """Framework capability the reference lacks entirely: train on generated
    data with a cold start (no Factnonlin warm start)."""
    import jax
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import init_params_random

    ds = generate_kink(n=60, seed=1)
    assert ds.y_train.shape == (60, 1) and ds.control.shape[1] == 0
    params = init_params_random(jax.random.key(0), n=60, x_dim=1, m=12,
                                control_dim=0)
    data = SSMData(y=jnp.asarray(ds.y_train),
                   control=jnp.asarray(ds.control))
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=12, x_dim=1,
                     num_posterior_samples=3)
    tr = Trainer(cfg, data)
    state, nlls = tr.run(tr.init_state(params), 150, jax.random.key(1),
                         chunk_size=150)
    assert float(nlls[-1]) < float(nlls[0]) - 0.5   # actually learns
    xs, vs, _ = collect_posterior(tr, state, test_len=10,
                                  key=jax.random.key(2))
    assert np.isfinite(np.asarray(xs)).all()


def test_get_rand_moments():
    import jax
    from ffvd_tpu.ops.sampling import get_rand
    mean = jnp.zeros((2000, 2))
    var = jnp.asarray(np.tile([[0.25, 4.0]], (2000, 1)))
    s = get_rand(jax.random.key(0), mean, var)
    np.testing.assert_allclose(np.asarray(s).std(axis=0), [0.5, 2.0],
                               rtol=0.05)
    # full covariance path
    cov = jnp.asarray(np.stack([np.eye(50) * 0.25, np.eye(50) * 4.0]))
    s2 = get_rand(jax.random.key(1), jnp.zeros((50, 2)), cov, full_cov=True)
    assert s2.shape == (50, 2) and np.isfinite(np.asarray(s2)).all()


def test_fresh_conditional_equals_cached():
    from ffvd_tpu.model.conditionals import (conditional, kernel_precal,
                                             whitened_conditional)
    params, data = small_model()
    xq = jnp.asarray(np.random.RandomState(5).randn(6, 3))
    mu1, v1 = conditional("SquaredExponential", params.kernel, params.z,
                          params.u, xq)
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    mu2, v2 = whitened_conditional("SquaredExponential", params.kernel, pre,
                                   params.z, params.u, xq)
    np.testing.assert_array_equal(np.asarray(mu1), np.asarray(mu2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


@pytest.mark.slow
def test_linear_system_identification_end_to_end():
    """On a generated linear-Gaussian SSM the GPSSM should free-run predict
    near the observation-noise floor (sampler-quality smoke on data with
    known ground truth — the reference's 'linear_dynamic_systems' path)."""
    import jax
    from ffvd_tpu.data.synthetic import generate_linear
    from ffvd_tpu.model.params import init_params_random

    ds, truth = generate_linear(n=120, x_dim=2, q_std=0.05, r_std=0.1,
                                seed=3)
    params = init_params_random(jax.random.key(0), n=120, x_dim=2, m=16,
                                control_dim=0)
    data = SSMData(y=jnp.asarray(ds.y_train),
                   control=jnp.asarray(ds.control))
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=16, x_dim=2,
                     num_posterior_samples=5)
    tr = Trainer(cfg, data)
    state, nlls = tr.run(tr.init_state(params), 400, jax.random.key(1),
                         chunk_size=200)
    assert float(nlls[-1]) < float(nlls[0]) - 1.0
    xs, vs, _ = collect_posterior(tr, state, test_len=ds.n_test,
                                  key=jax.random.key(2))
    py, pv, _ = predict_summary(state.params, xs, vs)
    rmse, _ = rmse_nll(jnp.asarray(ds.y_test), py, pv, ds.y_train_std,
                       horizon=10)
    # free-run on a stable contracting system: normalized 10-step RMSE
    # should land near the noise floor (r_std=0.1, y scale ~ y_train_std)
    assert float(rmse) < 3.0 * ds.y_train_std


def test_split_rhat():
    """utils.metrics.split_rhat — standard split-chain Gelman-Rubin values:
    ~1 for iid stationary chains, >1.1 for chains at different levels or a
    single drifting chain (the split catches within-chain trends)."""
    from ffvd_tpu.utils.metrics import split_rhat

    rng = np.random.RandomState(0)
    mixed = rng.randn(2000, 4)
    assert abs(split_rhat(mixed) - 1.0) < 0.02

    separated = mixed + np.array([0.0, 0.0, 0.0, 5.0])
    assert split_rhat(separated) > 1.5

    drifting = rng.randn(2000) + np.linspace(0, 4, 2000)
    assert split_rhat(drifting) > 1.1  # 1-D input: split halves disagree

    assert split_rhat(np.ones((100, 3))) == 1.0  # frozen chain
    assert np.isnan(split_rhat(np.ones((2, 3))))  # too short


def test_compile_cache_idempotent_and_opt_out(tmp_path, monkeypatch):
    """utils.compile_cache: first call configures jax, repeats are no-ops,
    FFVD_COMPILE_CACHE=0 disables, and an existing user config is
    respected (never overwritten)."""
    import jax

    from ffvd_tpu.utils import compile_cache

    prior = jax.config.jax_compilation_cache_dir
    try:
        # opt-out wins over everything
        monkeypatch.setattr(compile_cache, "_state", None)
        monkeypatch.setenv("FFVD_COMPILE_CACHE", "0")
        assert compile_cache.enable_compilation_cache() is None

        # fresh enable lands in the env-pointed directory
        monkeypatch.setattr(compile_cache, "_state", None)
        monkeypatch.setenv("FFVD_COMPILE_CACHE", "1")
        monkeypatch.setenv("FFVD_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
        jax.config.update("jax_compilation_cache_dir", None)
        got = compile_cache.enable_compilation_cache()
        assert got == str(tmp_path / "xla")
        assert jax.config.jax_compilation_cache_dir == got
        # idempotent: a second call (different env) changes nothing
        monkeypatch.setenv("FFVD_COMPILE_CACHE_DIR", str(tmp_path / "other"))
        assert compile_cache.enable_compilation_cache() == got

        # a dir the user configured directly is respected as-is
        monkeypatch.setattr(compile_cache, "_state", None)
        jax.config.update("jax_compilation_cache_dir", str(tmp_path / "user"))
        assert compile_cache.enable_compilation_cache() == str(tmp_path / "user")
    finally:
        jax.config.update("jax_compilation_cache_dir", prior)
        compile_cache._state = None
