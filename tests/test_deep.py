"""Deep (multi-layer) GP-SSM transition — model/deep.py.

The reference parses --n_layers but its deep path is dead code: propagate()
(dgp_model.py:362-379) has no call site and the ELBO reads only
self.layers[-1].  These tests pin the rebuild's functional deep transition:
identity initialization collapses to the shallow model, the windowed
objective agrees with full batch, and training/eval run end-to-end for both
Adam and SGHMC protocols.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data.synthetic import generate_kink
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.model.elbo import (elbo_terms, negative_elbo,
                                 windowed_elbo_terms)
from ffvd_tpu.model.params import (SSMData, init_hidden_layers,
                                   init_params_random)

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow


def _setup(n=40, m=8, x_dim=2, n_hidden=1, seed=0):
    ds = generate_kink(n=n, seed=seed)
    data = SSMData(y=jnp.asarray(ds.y_train),
                   control=jnp.zeros((2 * n, 0)))
    params = init_params_random(jax.random.key(seed), n=n, x_dim=x_dim,
                                m=m, control_dim=0, p=1)
    hidden = init_hidden_layers(jax.random.key(seed + 1), n_hidden, params)
    deep = dataclasses.replace(params, hidden=hidden)
    return ds, data, params, deep


def test_identity_init_matches_shallow():
    """u=0 hidden layers + mean propagation: the head sees the same inputs
    as the shallow model, so every term except the (hidden-prior-augmented)
    part_prior matches exactly."""
    _, data, params, deep = _setup()
    for u_collapse in (True, False):
        ts = elbo_terms(params, data, u_collapse=u_collapse)
        td = elbo_terms(deep, data, u_collapse=u_collapse)
        for k in ts:
            if k in ("nll", "nll_part_prior"):
                continue
            np.testing.assert_allclose(float(td[k]), float(ts[k]),
                                       rtol=1e-12, err_msg=k)


def test_windowed_full_window_matches_full_batch():
    """Deterministic (key=None) deep objective: window_n == N, start == 0
    must equal full batch — same invariant the shallow model pins in
    test_minibatch.py."""
    _, data, _, deep = _setup()
    n = deep.n_transitions
    for u_collapse in (True, False):
        full = elbo_terms(deep, data, u_collapse=u_collapse)
        win = windowed_elbo_terms(deep, data, jnp.asarray(0), n,
                                  u_collapse=u_collapse)
        for k in full:
            np.testing.assert_allclose(float(win[k]), float(full[k]),
                                       rtol=1e-12, err_msg=k)


def test_stochastic_objective_varies_with_key_and_stays_finite():
    _, data, _, deep = _setup(n_hidden=2)
    a = float(negative_elbo(deep, data, key=jax.random.key(0)))
    b = float(negative_elbo(deep, data, key=jax.random.key(1)))
    det = float(negative_elbo(deep, data))
    assert np.isfinite(a) and np.isfinite(b) and np.isfinite(det)
    assert a != b  # inter-layer noise is live

    g = jax.grad(lambda p: negative_elbo(p, data, key=jax.random.key(2)))(
        deep)
    assert all(np.all(np.isfinite(l)) for l in jax.tree.leaves(g))
    # the hidden layer's own parameters receive gradient
    assert float(jnp.linalg.norm(g.hidden[0].u)) > 0


def test_deep_c4_api_trains_and_evaluates():
    """Full API path: FFVDModel grafts hidden layers onto injected shallow
    params (cfg.n_layers=2), trains collapsed-U Adam, and rolls out."""
    from ffvd_tpu.api import FFVDModel
    ds, _, params, _ = _setup()
    cfg = FFVDConfig(case=4, num_inducing=params.z.shape[0], x_dim=2,
                     iterations=30, num_posterior_samples=2,
                     posterior_sample_spacing=2, n_layers=2)
    model = FFVDModel(cfg, dtype=jnp.float64, dataset=ds, params=params)
    assert len(model.params.hidden) == 1
    model.fit(num_iterations=60, chunk_size=30)
    assert np.all(np.isfinite(np.asarray(model.nll_trace)))
    # training must actually move the objective
    assert float(model.nll_trace[-1]) < float(model.nll_trace[0])
    # hidden layers trained (u moved off its zero init)
    assert float(jnp.linalg.norm(model.params.hidden[0].u)) > 0
    res = model.evaluate_quick(num_samples=2, horizon=10)
    assert np.isfinite(res["rmse"]) and np.isfinite(res["nll"])


def test_deep_sghmc_case_smoke():
    """Sampler protocol (C3: kernel, U, Z all SGHMC) with a hidden layer.
    Default: hidden blocks are MAP (Adam) — a sampled hidden log-variance
    scales the inter-layer noise and destabilizes fp32 chains (observed
    e2e, FFVDConfig.deep_sample_hidden).  Opt-in restores per-layer
    sampling."""
    _, data, _, deep = _setup(n=24, m=6)
    cfg = FFVDConfig(case=3, num_inducing=6, x_dim=2, iterations=2,
                     n_layers=2)
    tr = Trainer(cfg, data)
    assert tr.stochastic
    labels = jax.tree.leaves(tr.labels.hidden[0])
    assert all(l == "adam" for l in labels)
    state = tr.init_state(deep)
    state, nlls = tr.run(state, 3, jax.random.key(0), chunk_size=3)
    assert np.all(np.isfinite(np.asarray(nlls)))

    cfg2 = FFVDConfig(case=3, num_inducing=6, x_dim=2, iterations=2,
                      n_layers=2, deep_sample_hidden=True)
    tr2 = Trainer(cfg2, data)
    labels2 = jax.tree.leaves(tr2.labels.hidden[0])
    assert all(l == "sghmc" for l in labels2)
    state2, nlls2 = tr2.run(tr2.init_state(deep), 3, jax.random.key(0),
                            chunk_size=3)
    assert np.all(np.isfinite(np.asarray(nlls2)))


def test_deep_multichain_compose():
    """Deep transitions compose with the ('dp','ep') multi-chain path:
    hidden-layer leaves stack, shard, and train like the head's."""
    from ffvd_tpu.parallel import MultiChainTrainer, make_mesh
    _, data, _, deep = _setup(n=16, m=6)
    cfg = FFVDConfig(case=4, num_inducing=6, x_dim=2, iterations=2,
                     window_size=4, n_layers=2)
    mesh = make_mesh(4, x_dim=cfg.x_dim)
    mct = MultiChainTrainer(cfg, data, n_chains=mesh.shape["dp"], mesh=mesh)
    state = mct.init_state(mct.stack_params(deep,
                                            jitter_key=jax.random.key(1)))
    state, nlls = mct.run(state, 2, jax.random.key(0), chunk_size=2)
    assert nlls.shape == (2, mesh.shape["dp"])
    assert np.all(np.isfinite(np.asarray(nlls)))


def test_deep_sequence_sharding_compose():
    """Deep transitions compose with time-axis ('sp') sharding: hidden
    leaves replicate while x shards (the spec tree must carry the hidden
    structure — regression test for the missed _params_seq_spec)."""
    from ffvd_tpu.parallel.sequence import (SequenceShardedTrainer,
                                            make_seq_mesh)
    _, data, _, deep = _setup(n=15, m=6)
    cfg = FFVDConfig(case=4, num_inducing=6, x_dim=2, iterations=2,
                     n_layers=2)
    tr = Trainer(cfg, data)
    seq = SequenceShardedTrainer(tr, make_seq_mesh(4))
    state, nlls = seq.run(tr.init_state(deep), data, 2, jax.random.key(0))
    assert np.all(np.isfinite(np.asarray(nlls)))
    assert len(state.params.x.sharding.device_set) > 1


@pytest.mark.parametrize("ancestor", [False, True])
def test_deep_particle_gibbs_smoke(ancestor):
    """Deep + C6: the particle block batches through the hidden layers
    (particle_gibbs._propagate), so the full PG protocol runs with a deep
    transition — both the reference-style and ancestor-traced CSMC."""
    from ffvd_tpu.inference.particle_gibbs import make_pg_fn
    _, data, _, deep = _setup(n=20, m=6)
    cfg = FFVDConfig(case=6, num_inducing=6, x_dim=2, iterations=2,
                     pg_particles=8, n_layers=2, pg_ancestor_trace=ancestor)
    tr = Trainer(cfg, data, pg_fn=make_pg_fn(cfg))
    state = tr.init_state(deep)
    x0 = state.params.x
    state, nlls = tr.run(state, 3, jax.random.key(0), chunk_size=3)
    assert np.all(np.isfinite(np.asarray(nlls)))
    # PG actually resampled the trajectory
    assert not np.allclose(np.asarray(state.params.x), np.asarray(x0))


def test_adapt_xdim_refuses_deep_params():
    """adapt_warmstart_xdim rebuilds GPSSMParams field-by-field; it must
    refuse deep params instead of silently dropping trained hidden layers."""
    from ffvd_tpu.model.params import adapt_warmstart_xdim
    _, _, _, deep = _setup()
    with pytest.raises(ValueError, match="hidden"):
        adapt_warmstart_xdim(deep, x_dim=3, control_dim=0)


def test_deep_learns_kink_better_than_start():
    """2-layer model on the kink dataset: a real (short) training run ends
    with a much better objective than it starts, and the deep rollout
    produces finite trajectories of the right shape."""
    from ffvd_tpu.eval.rollout import collect_posterior
    _, data, _, deep = _setup(n=40, m=8)
    cfg = FFVDConfig(case=1, num_inducing=8, x_dim=2, iterations=50,
                     n_layers=2)
    tr = Trainer(cfg, data)
    state = tr.init_state(deep)
    state, nlls = tr.run(state, 100, jax.random.key(0), chunk_size=50)
    assert float(nlls[-1]) < float(nlls[0]) - 0.1
    xs, vs, state = collect_posterior(tr, state, test_len=10,
                                      key=jax.random.key(1), num=2,
                                      spacing=2)
    assert xs.shape == (2, 10, 2) and vs.shape == (2, 10, 2)
    assert np.all(np.isfinite(np.asarray(xs)))
    assert np.all(np.isfinite(np.asarray(vs)))


def test_deep_minibatch_long_sequence_trains():
    """Deep × random-window minibatch on a long synthetic sequence (the
    regime neither the reference nor round 2 ever exercised): N=5000 with a
    256-step window — every gradient is windowed AND doubly stochastic.
    Pins finiteness, nll improvement, and that the windowed deep objective
    sees fresh inter-layer noise (two chunks differ)."""
    n = 5000
    key = jax.random.key(0)
    ks, kc = jax.random.split(key)
    # long kink-style sequence with control-free dynamics
    xs = [jnp.zeros(())]
    for t in range(n):
        xs.append(0.8 * xs[-1] + jnp.sin(2.5 * xs[-1]))
    y = (jnp.stack(xs[1:])[:, None]
         + 0.05 * jax.random.normal(ks, (n, 1))).astype(jnp.float64)
    data = SSMData(y=y, control=jnp.zeros((2 * n, 0)))
    params = init_params_random(jax.random.key(1), n=n, x_dim=2, m=16,
                                control_dim=0, p=1)
    deep = dataclasses.replace(
        params, hidden=init_hidden_layers(jax.random.key(2), 1, params))
    cfg = FFVDConfig(dataset="ballbeam", case=4, n_layers=2,
                     minibatch_size=256)
    tr = Trainer(cfg, data)
    state = tr.init_state(deep)
    state, nlls = tr.run(state, 60, jax.random.key(3), chunk_size=30)
    assert bool(jnp.all(jnp.isfinite(nlls)))
    assert float(nlls[-1]) < float(nlls[0])
    assert tr.window_n == 256      # long N: the window must stay a window
