"""High-level API surface tests (reference models.py parity —
RegressionModel.fit/predict/calculate_density/sample, all of which are dead
code upstream and WORK here)."""

import numpy as np

from ffvd_tpu.api import RegressionModel
import pytest


@pytest.mark.slow
def test_regression_model_full_surface(tmp_path):
    m = RegressionModel("normal", dataset="ballbeam", case=4)
    m.fit(num_iterations=60, chunk_size=60)
    assert m.nll_trace.shape == (60,)
    py, pv = m.predict(test_len=15, num_samples=3)
    assert py.shape == (15, 1) and pv.shape == (15, 1)
    assert np.isfinite(np.asarray(py)).all() and (np.asarray(pv) > 0).all()

    s = m.sample(test_len=10, s=2)
    assert s.shape == (2, 10, 1) and np.isfinite(s).all()

    dens = m.calculate_density(m.dataset.y_test[:10])
    assert dens.shape == (10, 1) and np.isfinite(dens).all()

    out = m.save_results(tmp_path / "res.npz")
    with np.load(out, allow_pickle=True) as z:
        assert "y_test_vfe" in z.files and "ll_seq" in z.files


@pytest.mark.slow
def test_fit_with_periodic_eval_and_per_sample():
    m = RegressionModel("normal", dataset="ballbeam", case=4,
                        num_posterior_samples=3)
    m.fit(num_iterations=40, chunk_size=20, eval_every=20)
    assert len(m.rmse_seq) == 2
    assert all(np.isfinite(r) and np.isfinite(n) for _, r, n in m.rmse_seq)
    rmses, nlls = m.evaluate_per_sample()
    assert len(rmses) == 3 and all(np.isfinite(r) for r in rmses)


@pytest.mark.slow
def test_model_with_injected_synthetic_dataset():
    import jax
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import init_params_random

    ds = generate_kink(n=50, seed=2)
    params = init_params_random(jax.random.key(0), n=50, x_dim=1, m=10,
                                control_dim=0)
    cfg = FFVDConfig(case=4, num_inducing=10, x_dim=1,
                     num_posterior_samples=3)
    m = FFVDModel(cfg, dataset=ds, params=params)
    m.fit(num_iterations=80, chunk_size=80)
    res = m.evaluate(horizon=10)
    assert np.isfinite(res["rmse"])


@pytest.mark.slow
def test_fit_ensemble_and_pooled_eval():
    """eval.ensemble: pooled mixture moments — pooled mean is the average
    of per-chain means, the spread term only ever widens the variance, and
    the pooled NLL with spread is finite and below the no-spread NLL when
    chains disagree."""
    import jax.numpy as jnp
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.eval import (chain_moments, ensemble_evaluate,
                               fit_ensemble, pool_moments)

    cfg = FFVDConfig(dataset="ballbeam", case=4, num_posterior_samples=3,
                     seed=7)
    models = fit_ensemble(cfg, 2, dtype=jnp.float32,
                          num_iterations=40, chunk_size=40)
    assert len(models) == 2
    assert models[0].cfg.seed == 7 and models[1].cfg.seed == 8

    res = ensemble_evaluate(models, horizon=10)
    assert len(res["per_chain"]) == 2
    assert np.isfinite(res["rmse"]) and np.isfinite(res["nll"])

    chains = [chain_moments(m) for m in models]
    py, pv = pool_moments(chains)
    py_ns, pv_ns = pool_moments(chains, include_spread=False)
    np.testing.assert_allclose(
        py, np.concatenate([c[0] for c in chains]).mean(axis=0), rtol=1e-12)
    assert (pv >= pv_ns - 1e-15).all()          # spread only widens
    y_all = np.concatenate([c[0] for c in chains])
    np.testing.assert_allclose(pv - pv_ns, y_all.var(axis=0), atol=1e-12)

    # C4 training is DETERMINISTIC (full-batch Adam, no sampling in the
    # objective): different seeds → bit-identical params.  This is the fact
    # behind fit_ensemble's init_jitter option and PARITY §2e's framing.
    import jax
    for a, b in zip(jax.tree.leaves(models[0].params),
                    jax.tree.leaves(models[1].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # init_jitter breaks the degeneracy; chain 0 keeps the exact start
    jit_models = fit_ensemble(cfg, 2, dtype=jnp.float32, init_jitter=1e-3,
                              num_iterations=40, chunk_size=40)
    la = jax.tree.leaves(jit_models[0].params)
    lb = jax.tree.leaves(jit_models[1].params)
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(la, lb))
    for a, b in zip(la, jax.tree.leaves(models[0].params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # single-chain spread-mode eval: the 1x-train-cost calibration fix for
    # deterministic cases — widens the variance, never touches the mean
    m = models[0]
    res_spread = m.evaluate(horizon=10, num_samples=8, spread=True)
    assert np.isfinite(res_spread["nll"])
    assert (res_spread["predict_y_var"] >= 0).all()
