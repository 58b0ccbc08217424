"""Round-4 features: ds64 refine knob, hybrid precision schedule, deep guard.

Covers VERDICT r3 items 1 (refine=1 productionization — the config/threading
half; the accuracy half lives in the TPU study artifacts), 3 (hybrid
schedule), and 5 (deep usage guard).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.ops import ds64 as ds


# ---------------------------------------------------------------------------
# ds64 refine knob
# ---------------------------------------------------------------------------

def test_shipped_default_refine_is_1(monkeypatch):
    """Pin the SHIPPED default, not just the resolution mechanism: with no
    env override and refine=None, chol_and_inv must run exactly one
    refinement round (the round-4 revalidated default — VERDICT r4 item 1
    flagged that the flip was documented but never landed)."""
    monkeypatch.delenv("FFVD_DS64_REFINE", raising=False)
    assert ds._DEFAULT_REFINE == 1
    assert ds._resolve_refine(None) == 1


def test_refine_resolution(monkeypatch):
    assert ds._resolve_refine(0) == 0
    assert ds._resolve_refine(1) == 1
    assert ds._resolve_refine(None) == ds._DEFAULT_REFINE
    monkeypatch.setenv("FFVD_DS64_REFINE", "3")
    assert ds._resolve_refine(None) == 3
    assert ds._resolve_refine(2) == 2          # explicit beats env
    monkeypatch.setenv("FFVD_DS64_REFINE", "x")
    with pytest.raises(ValueError, match="FFVD_DS64_REFINE"):
        ds._resolve_refine(None)
    monkeypatch.delenv("FFVD_DS64_REFINE")
    old = ds._DEFAULT_REFINE
    try:
        ds.set_default_refine(5)
        assert ds._resolve_refine(None) == 5
        with pytest.raises(ValueError):
            ds.set_default_refine(-1)
    finally:
        ds.set_default_refine(old)


@pytest.mark.slow
def test_chol_and_inv_refine1_beats_fp32_seed():
    """One refinement round must already reach well below fp32 factor error
    on a moderately conditioned matrix (the healthy-regime claim behind the
    refine=1 default; the ill-conditioned edge is tests/test_ds64.py's
    refine=2 territory)."""
    rng = np.random.default_rng(0)
    b = rng.normal(size=(4, 32, 32))
    a64 = b @ b.transpose(0, 2, 1) + 0.05 * np.eye(32)   # cond ~ 1e3-1e4
    a = ds.lift(jnp.asarray(a64, jnp.float32))
    a_in = np.asarray(a.hi, np.float64)          # the rounded fp32 target
    scale = np.max(np.abs(a64))
    for refine in (1, 2):
        l, _ = ds.chol_and_inv(a, refine=refine)
        lf = np.asarray(l.hi, np.float64) + np.asarray(l.lo, np.float64)
        resid = np.max(np.abs(a_in - lf @ lf.transpose(0, 2, 1)))
        assert resid / scale < 3e-11, (refine, resid / scale)
    # fp32 seed alone is orders of magnitude worse
    l0 = np.linalg.cholesky(a_in.astype(np.float32)).astype(np.float64)
    r0 = np.max(np.abs(a_in - l0 @ l0.transpose(0, 2, 1)))
    assert r0 / scale > 1e-8


def test_config_refine_and_hybrid_validation():
    FFVDConfig(collapse_precision="hybrid", hybrid_tail_iters=0)
    FFVDConfig(ds64_refine=0)
    with pytest.raises(ValueError):
        FFVDConfig(ds64_refine=-1)
    with pytest.raises(ValueError):
        FFVDConfig(hybrid_tail_iters=-1)
    with pytest.raises(ValueError):
        FFVDConfig(collapse_precision="fp16")


# ---------------------------------------------------------------------------
# hybrid precision schedule
# ---------------------------------------------------------------------------

def _tiny_model(**cfg_kw):
    """Small injected-synthetic FFVDModel (no reference data, fast compile)."""
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import init_params_random

    dataset = generate_kink(n=30, seed=2)
    params = init_params_random(jax.random.key(0), n=30, x_dim=1, m=8,
                                control_dim=0)
    cfg_kw.setdefault("case", 4)
    cfg = FFVDConfig(num_inducing=8, x_dim=1,
                     num_posterior_samples=2, **cfg_kw)
    return FFVDModel(cfg, dataset=dataset, params=params,
                     dtype=jnp.float32)


@pytest.mark.slow
def test_hybrid_fit_runs_native_then_ds64(monkeypatch):
    """fit() under collapse_precision='hybrid' must run the head iterations
    on the native bound and exactly the tail on the ds64 bound, and eval
    must ride the ds64 trainer."""
    from ffvd_tpu.model import ds_collapse

    calls = {"ds": 0}
    real = ds_collapse.ds_collapsed_terms

    def counting(*a, **kw):
        calls["ds"] += 1
        return real(*a, **kw)

    monkeypatch.setattr(ds_collapse, "ds_collapsed_terms", counting)

    # tail=0: hybrid degenerates to pure native training
    model0 = _tiny_model(iterations=2, collapse_precision="hybrid",
                         hybrid_tail_iters=0, ds64_refine=1)
    model0.fit(4, chunk_size=4)
    assert calls["ds"] == 0
    assert getattr(model0, "_ds64_trainer", None) is None

    # tail=2: the LAST 2 of fit(4) run the ds64 bound
    model = _tiny_model(iterations=2, collapse_precision="hybrid",
                        hybrid_tail_iters=2, ds64_refine=1)
    assert model.hybrid
    model.fit(4, chunk_size=4)
    assert calls["ds"] > 0
    assert model._ds64_trainer is not None
    assert model._ds64_trainer.cfg.collapse_precision == "ds64"
    assert model.eval_trainer is model._ds64_trainer
    assert bool(jnp.all(jnp.isfinite(model.nll_trace)))


@pytest.mark.slow
def test_hybrid_single_fit_split(monkeypatch):
    """One fit(n) call splits n into (n - tail) native + tail ds64 without
    crossing the boundary inside a chunk."""
    model = _tiny_model(iterations=3, collapse_precision="hybrid",
                        hybrid_tail_iters=2, ds64_refine=1)
    seen = []
    real_run = model.trainer.run

    def wrap_native(state, n, key, **kw):
        seen.append(("native", n))
        return real_run(state, n, key, **kw)

    monkeypatch.setattr(model.trainer, "run", wrap_native)
    real_tail_trainer = model._tail_trainer

    def tail_trainer():
        tr = real_tail_trainer()
        if not getattr(tr, "_wrapped", False):
            real_tr_run = tr.run

            def wrap_tail(state, n, key, **kw):
                seen.append(("ds64", n))
                return real_tr_run(state, n, key, **kw)

            tr.run = wrap_tail
            tr._wrapped = True
        return tr

    monkeypatch.setattr(model, "_tail_trainer", tail_trainer)
    model.fit(6, chunk_size=10)
    assert seen == [("native", 4), ("ds64", 2)]


@pytest.mark.slow
def test_hybrid_noop_for_uncollapsed_case():
    """C1 keeps U uncollapsed — there is no ds64 segment, so hybrid must
    behave exactly like native (self.hybrid False, no tail trainer)."""
    model = _tiny_model(iterations=2, case=1, collapse_precision="hybrid")
    assert not model.hybrid
    assert model.eval_trainer is model.trainer


# ---------------------------------------------------------------------------
# deep usage guard (unit: the guard function itself, no data/trainer needed)
# ---------------------------------------------------------------------------

def _guard(dsname, n_layers):
    from ffvd_tpu.api import _warn_deep_usage
    _warn_deep_usage(FFVDConfig(dataset=dsname, n_layers=n_layers))


def test_deep_guard_warns_on_actuator():
    with pytest.warns(UserWarning, match="2-5x"):
        _guard("actuator", 2)


def test_deep_guard_warns_on_wellfit_short_datasets():
    for dsname in ("ballbeam", "gas_furnace", "dryer"):
        with pytest.warns(UserWarning, match="shallow"):
            _guard(dsname, 2)


def test_deep_guard_silent_where_deep_wins_or_shallow():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _guard("flutter", 2)     # measured deep win — no warning
        _guard("drive", 2)       # measured deep win — no warning
        _guard("actuator", 1)    # shallow — no warning


# ---------------------------------------------------------------------------
# vendored offline fixtures (fresh clone, no reference checkout, no network)
# ---------------------------------------------------------------------------

def _offline(monkeypatch, tmp_path):
    """Point every data root at an empty dir — simulates a fresh clone."""
    monkeypatch.setenv("FFVD_DATA_DIR", str(tmp_path / "nodata"))
    monkeypatch.setenv("FFVD_WARMSTART_DIR", str(tmp_path / "nows"))
    monkeypatch.setenv("FFVD_REFERENCE_DIR", str(tmp_path / "noref"))


_ALL_DATASETS = (("gas_furnace", 148), ("ballbeam", 500), ("dryer", 500),
                 ("flutter", 512), ("actuator", 512), ("drive", 250))


def test_vendored_datasets_load_offline(monkeypatch, tmp_path):
    """Round 5 (VERDICT r4 missing #1): ALL SIX datasets run from a fresh
    clone with no reference checkout and no network."""
    from ffvd_tpu.data import create_dataset
    _offline(monkeypatch, tmp_path)
    for dsname, n in _ALL_DATASETS:
        ds = create_dataset(dsname)
        assert ds.n_train == n and ds.n_test >= n


def test_vendored_warmstart_matches_full_file(monkeypatch, tmp_path):
    """Params built from the reduced vendored npz must equal those from the
    full reference file (the reduction pre-computes exactly the mean the
    init takes).  Skips the full-file comparison when no reference checkout
    exists (then offline loading alone is asserted)."""
    from ffvd_tpu.data import load_warmstart
    from ffvd_tpu.data.warmstart import list_warmstarts
    from ffvd_tpu.model.params import init_params_from_warmstart

    names = [d for d, _ in _ALL_DATASETS]
    have_ref = bool(list_warmstarts("gas_furnace"))
    full = {dsn: init_params_from_warmstart(load_warmstart(dsn, 3))
            for dsn in names} if have_ref else {dsn: None for dsn in names}
    _offline(monkeypatch, tmp_path)
    for dsn, pf in full.items():
        pv = init_params_from_warmstart(load_warmstart(dsn, 3))
        if pf is not None:
            for a, b in zip(jax.tree.leaves(pf), jax.tree.leaves(pv)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    with pytest.raises(FileNotFoundError, match="vendored"):
        load_warmstart("gas_furnace", 5)    # only file_id=3 ships


def test_quickstart_model_builds_offline(monkeypatch, tmp_path):
    """The default-config FFVDModel (ballbeam C4) must construct — data,
    warm start, trainer — from a fresh clone with no reference checkout."""
    from ffvd_tpu.api import FFVDModel
    _offline(monkeypatch, tmp_path)
    model = FFVDModel(FFVDConfig(dataset="ballbeam", case=4, iterations=1),
                      dtype=jnp.float32)
    assert model.params.x.shape == (501, 4)


# ---------------------------------------------------------------------------
# C6 CSMC mixing diagnostics
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("ancestor", [False, True])
@pytest.mark.slow
def test_pg_stats_sane_and_sampling_unchanged(ancestor):
    """make_pg_fn(with_stats=True) must return sane diagnostics and must
    not perturb the sampled trajectory (stats are outputs, not controls)."""
    from ffvd_tpu.inference.particle_gibbs import make_pg_fn
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import SSMData, init_params_random

    ds = generate_kink(n=25, seed=1)
    params = init_params_random(jax.random.key(3), n=25, x_dim=1, m=6,
                                control_dim=0)
    data = SSMData(y=jnp.asarray(ds.y_train, jnp.float64),
                   control=jnp.asarray(ds.control, jnp.float64))
    cfg = FFVDConfig(case=6, num_inducing=6, x_dim=1, pg_particles=8,
                     pg_ancestor_trace=ancestor)
    key = jax.random.key(7)
    p_plain = jax.jit(make_pg_fn(cfg, data))(params, key)
    p_stats, st = jax.jit(make_pg_fn(cfg, data, with_stats=True))(params, key)
    np.testing.assert_array_equal(np.asarray(p_plain.x),
                                  np.asarray(p_stats.x))
    assert set(st) == {"ref_survival", "unique_frac", "accepted",
                       "dx_mean_abs", "dx_frac_moved"}
    assert 0.0 <= float(st["ref_survival"]) <= 1.0
    assert 0.0 < float(st["unique_frac"]) <= 1.0
    assert float(st["accepted"]) in (0.0, 1.0)
    assert np.isfinite(float(st["dx_mean_abs"]))
    # a sweep over a cold-start trajectory should move X
    if float(st["accepted"]) == 1.0:
        assert float(st["dx_frac_moved"]) > 0.5


def test_pg_compat_noop_stats():
    from ffvd_tpu.inference.particle_gibbs import make_pg_fn
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import SSMData, init_params_random

    ds = generate_kink(n=10, seed=1)
    params = init_params_random(jax.random.key(0), n=10, x_dim=1, m=4,
                                control_dim=0)
    data = SSMData(y=jnp.asarray(ds.y_train, jnp.float64),
                   control=jnp.asarray(ds.control, jnp.float64))
    cfg = FFVDConfig(case=6, num_inducing=4, x_dim=1, pg_particles=4,
                     pg_compat_noop=True)
    p, st = make_pg_fn(cfg, data, with_stats=True)(params, jax.random.key(1))
    np.testing.assert_array_equal(np.asarray(p.x), np.asarray(params.x))
    assert float(st["accepted"]) == 0.0
    assert float(st["dx_mean_abs"]) == 0.0


def test_deep_guard_fires_from_model_constructor():
    """FFVDModel must route through the guard (integration, tiny model)."""
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import init_params_random

    dataset = generate_kink(n=20, seed=0)
    params = init_params_random(jax.random.key(0), n=20, x_dim=1, m=6,
                                control_dim=0)
    cfg = FFVDConfig(dataset="actuator", case=4, num_inducing=6, x_dim=1,
                     n_layers=2, iterations=1)
    with pytest.warns(UserWarning, match="PARITY"):
        FFVDModel(cfg, dataset=dataset, params=params, dtype=jnp.float32)
