"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.parallel import MultiChainTrainer, make_mesh, shard_chain_state
from tests.test_model_props import small_model

# heavy compile/e2e module: excluded from the `-m quick` tier
pytestmark = pytest.mark.slow


def test_mesh_shapes():
    mesh = make_mesh(8, x_dim=4)
    assert mesh.shape["dp"] * mesh.shape["ep"] == 8
    assert mesh.shape["ep"] in (1, 2, 4)
    mesh2 = make_mesh(8, ep=1)
    assert mesh2.shape == {"dp": 8, "ep": 1}


def test_multichain_matches_single_chain():
    """Two chains given identical params+keys must exactly reproduce the
    single-chain Trainer — sharding must not change the math."""
    params, data = small_model()
    cfg = FFVDConfig(dataset="ballbeam", case=2, num_inducing=6, x_dim=2,
                     window_size=4)
    single = Trainer(cfg, data)
    s_state = single.init_state(params)
    key = jax.random.key(9)
    keys = jax.random.split(key, 3)
    s_state, s_nlls = single._run_chunk(s_state, keys, single.data)

    mesh = make_mesh(8, x_dim=2)
    n_chains = mesh.shape["dp"]                   # chain axis must divide dp
    mct = MultiChainTrainer(cfg, data, n_chains=n_chains, mesh=mesh)
    stacked = mct.stack_params(params)           # identical chains
    m_state = mct.init_state(stacked)
    chain_keys = jnp.stack([keys] * n_chains, axis=1)  # same keys per chain
    m_state, m_nlls = mct._run_chunk(m_state, chain_keys, mct.base.data)

    np.testing.assert_allclose(np.asarray(m_nlls[:, 0]), np.asarray(s_nlls),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m_nlls[:, 1]), np.asarray(s_nlls),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(m_state.params.u[0]),
                               np.asarray(s_state.params.u), rtol=1e-9)


def test_sharded_state_is_distributed():
    params, data = small_model(n=8, m=4, d=2)
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=4, x_dim=2,
                     window_size=2)
    mesh = make_mesh(8, x_dim=2)
    mct = MultiChainTrainer(cfg, data, n_chains=mesh.shape["dp"], mesh=mesh)
    state = mct.init_state(mct.stack_params(params))
    shards = state.params.x.sharding
    assert len(shards.device_set) > 1            # actually spread over devices
    state, nlls = mct.run(state, 2, jax.random.key(0), chunk_size=2)
    assert np.isfinite(np.asarray(nlls)).all()


def test_graft_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_sequence_sharded_matches_unsharded():
    """Time-axis (sp) sharding must not change the math: same keys, same
    nll trace and final params as the unsharded trainer."""
    from ffvd_tpu.parallel.sequence import (SequenceShardedTrainer,
                                            make_seq_mesh)
    # n=15 → x has 16 rows (divides the 8-device 'sp' axis and gets
    # sharded); y's 15 rows don't divide and stay replicated (the
    # selective-sharding fallback).
    params, data = small_model(n=15, m=6, d=2)
    cfg = FFVDConfig(dataset="ballbeam", case=2, num_inducing=6, x_dim=2,
                     window_size=4)
    single = Trainer(cfg, data)
    key = jax.random.key(4)
    s_state = single.init_state(params)
    s_state, s_nlls = single.run(s_state, 4, key, chunk_size=2)

    mesh = make_seq_mesh(8)
    seq = SequenceShardedTrainer(Trainer(cfg, data), mesh)
    q_state, q_nlls = seq.run(seq.trainer.init_state(params), data, 4, key,
                              chunk_size=2)
    # seq.run uses Trainer.run's exact chunked key schedule
    np.testing.assert_allclose(np.asarray(q_nlls), np.asarray(s_nlls),
                               rtol=1e-9)
    np.testing.assert_allclose(np.asarray(q_state.params.x),
                               np.asarray(s_state.params.x), rtol=1e-9)
    # the trajectory really is distributed
    assert len(q_state.params.x.sharding.device_set) > 1


def test_multidataset_train_and_per_dataset_eval():
    """Config-5 shape: stacked training then un-padded per-dataset eval."""
    from ffvd_tpu.data import create_dataset
    from ffvd_tpu.parallel.multidataset import (MultiDatasetTrainer,
                                                stack_datasets)

    names = ["drive", "gas_furnace"]      # N = 250 / 148
    sd, sp, lens = stack_datasets(names, dtype=jnp.float64)
    dsets = [create_dataset(nm) for nm in names]

    cfg = FFVDConfig(case=4, num_posterior_samples=3)
    mdt = MultiDatasetTrainer(cfg, sd)
    state = mdt.init_state(sp)
    state, nlls = mdt.run(state, 20, jax.random.key(0), chunk_size=10)
    assert np.isfinite(np.asarray(nlls)).all()
    res = mdt.evaluate(state, dsets, lens, jax.random.key(1))
    assert set(res) == {"drive", "gas_furnace"}
    for v in res.values():
        assert np.isfinite(v["rmse"]) and v["rmse"] < 5.0


def test_stack_warmstarts():
    from ffvd_tpu.parallel.sharding import stack_warmstarts
    stacked = stack_warmstarts("drive", [0, 1, 2], dtype=jnp.float64)
    assert stacked.x.shape[0] == 3 and stacked.u.shape == (3, 100, 4)
    # distinct warm starts
    assert not np.allclose(np.asarray(stacked.u[0]), np.asarray(stacked.u[1]))


def test_initialize_multihost_passthrough(monkeypatch):
    """The DCN hook forwards env-var configuration to
    jax.distributed.initialize (mocked: no real coordinator here)."""
    from ffvd_tpu.parallel.distributed import initialize_multihost
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None, local_device_ids=None):
        calls.update(addr=coordinator_address, n=num_processes,
                     pid=process_id, ids=local_device_ids)

    monkeypatch.setattr(jax.distributed, "initialize", fake_init)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    monkeypatch.setenv("JAX_NUM_PROCESSES", "4")
    monkeypatch.setenv("JAX_PROCESS_ID", "2")
    assert initialize_multihost() is True
    assert calls == {"addr": "10.0.0.1:1234", "n": 4, "pid": 2, "ids": None}


def test_initialize_multihost_single_process_noop(monkeypatch):
    from ffvd_tpu.parallel.distributed import initialize_multihost
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda **kw: (_ for _ in ()).throw(
                            AssertionError("must not initialize")))
    assert initialize_multihost() is False


def test_multihost_mesh_single_process_fallback():
    """On one process the mesh builder delegates to the ICI make_mesh and a
    MultiChainTrainer step runs on it (virtual CPU devices)."""
    from ffvd_tpu.parallel.distributed import multihost_mesh
    mesh = multihost_mesh(dp=2, ep=2, x_dim=2)
    assert dict(mesh.shape) == {"dp": 2, "ep": 2}


def test_multichain_mixture_collection():
    """eval/ensemble.multichain_moments on a dp mesh: per-chain moments
    from one vmapped jit must match the single-chain collect_posterior
    pipeline chain-by-chain (same keys), and pool into finite mixture
    moments."""
    from ffvd_tpu.eval import pool_moments
    from ffvd_tpu.eval.ensemble import multichain_moments

    params, data = small_model(n=12, m=4, d=2)
    cfg = FFVDConfig(dataset="ballbeam", case=2, num_inducing=4, x_dim=2,
                     window_size=4, num_posterior_samples=2,
                     posterior_sample_spacing=2)
    mesh = make_mesh(8, x_dim=2)
    mct = MultiChainTrainer(cfg, data, n_chains=mesh.shape["dp"], mesh=mesh)
    state = mct.init_state(mct.stack_params(
        params, jitter_key=jax.random.key(3)))
    state, _ = mct.run(state, 2, jax.random.key(0), chunk_size=2)

    chains, new_state = multichain_moments(mct, state, test_len=6,
                                           key=jax.random.key(5))
    assert len(chains) == mct.n_chains
    for y_s, v_s, r2 in chains:
        assert y_s.shape == (2, 6, 1) and np.isfinite(y_s).all()
        assert (v_s >= 0).all() and np.isfinite(r2).all()
    # chains were jittered apart → moments must differ across chains
    assert not np.allclose(chains[0][0], chains[1][0])

    py, pv = pool_moments(chains)
    assert py.shape == (6, 1) and np.isfinite(py).all() and (pv > 0).all()

    # the stacked thinning advanced the sampler state like the single-chain
    # path would: params must have moved
    assert not np.allclose(np.asarray(new_state.params.u),
                           np.asarray(state.params.u))
