"""High-level model API — the rebuild of ``vfegpssm/models.py``.

The reference exposes ``RegressionModel(prior_type).fit(Y_train, ...)``
(models.py:315-322) plus ``predict`` / ``calculate_density`` / ``sample``
(models.py:324-337 — all dead upstream: they call the removed ``predict_y``,
SURVEY.md §2.7).  Here the same surface exists and *works*: fit runs the
fused trainer, and the predictive methods ride the posterior rollout.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data import create_dataset, load_warmstart
from ffvd_tpu.eval import collect_posterior, predict_summary, rmse_nll
from ffvd_tpu.eval.results import save_results_npz
from ffvd_tpu.inference.particle_gibbs import make_pg_fn
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.model.params import (GPSSMParams, SSMData, adapt_warmstart_xdim,
                                   init_params_from_warmstart)


def _warn_deep_usage(cfg: FFVDConfig) -> None:
    """Deep-transition usage guard (PARITY §2b-deep, encoded): the seeded
    study measured deep-2 wins only where the shallow model underfits
    (flutter 1.8-2.4x, drive 1.2x over 3 seeds each); on the other stock
    datasets it is parity-to-worse — actuator DEGRADES 2-5x (shallow
    0.13-0.27 vs deep-2 0.50-0.66, tests/golden/deep_study.json).  The
    reference's --n_layers path is dead code (dgp_model.py:362-379), so it
    has no such regime to warn about."""
    from ffvd_tpu.config import DATASETS, DEEP_UNDERFIT_DATASETS
    if cfg.n_layers <= 1 or cfg.dataset not in DATASETS:
        return
    if cfg.dataset in DEEP_UNDERFIT_DATASETS:
        return
    import warnings
    detail = (
        "the measured regression is 2-5x (deep-2 RMSE 0.50-0.66 vs shallow "
        "0.13-0.27 over 3 seeds); a smaller deep_hidden_init_scale "
        "(e.g. 0.0625) recovers about half of it, but shallow remains best"
        if cfg.dataset == "actuator" else
        "deep-2 measured parity-to-slightly-worse within seed spread there")
    warnings.warn(
        f"n_layers={cfg.n_layers} on '{cfg.dataset}': the shallow model "
        f"already fits this dataset well and {detail}.  Deep transitions "
        "pay only where shallow underfits (measured: flutter, drive) — "
        "see PARITY.md §2b-deep / tests/golden/deep_study.json.",
        UserWarning, stacklevel=3)


class FFVDModel:
    """Config → data → warm start → fused trainer → posterior predictions."""

    def __init__(self, cfg: FFVDConfig, dtype=None, dataset=None,
                 params=None):
        """``dataset``/``params`` may be injected (e.g. synthetic data from
        ffvd_tpu.data.synthetic + a cold start from init_params_random);
        by default the named dataset and its Factnonlin warm start load."""
        self.cfg = cfg
        _warn_deep_usage(cfg)
        if dtype is None:
            dtype = (jnp.float64 if jax.config.jax_enable_x64
                     else jnp.float32)
        self.dtype = dtype
        self.dataset = dataset if dataset is not None             else create_dataset(cfg.dataset)
        if params is None:
            ws = load_warmstart(cfg.dataset, cfg.file_id)
            params = init_params_from_warmstart(ws, dtype=dtype)
        else:
            params = jax.tree.map(lambda a: jnp.asarray(a, dtype), params)
        if cfg.x_dim != params.x_dim:
            params = adapt_warmstart_xdim(
                params, cfg.x_dim,
                control_dim=self.dataset.control.shape[1], seed=cfg.seed)
        if cfg.num_inducing != params.z.shape[0]:
            from ffvd_tpu.parallel.multidataset import _resize_inducing
            params = _resize_inducing(params, cfg.num_inducing, cfg.seed)
        if cfg.n_layers > 1 and not params.hidden:
            # deep transition: near-identity hidden layers grafted onto the
            # (single-layer) warm start — see model/deep.py
            import dataclasses as _dc

            from ffvd_tpu.model.params import init_hidden_layers
            params = _dc.replace(params, hidden=init_hidden_layers(
                jax.random.key(cfg.seed), cfg.n_layers - 1, params,
                var_scale=cfg.deep_hidden_init_scale))
        self.data = SSMData(
            y=jnp.asarray(self.dataset.y_train, dtype=dtype),
            control=jnp.asarray(self.dataset.control, dtype=dtype))
        pg_fn = make_pg_fn(cfg) if cfg.case_config.x_pg else None
        self.trainer = Trainer(cfg, self.data, pg_fn=pg_fn)
        self.state = self.trainer.init_state(params)
        self.key = jax.random.key(cfg.seed, impl=cfg.prng_impl)
        self.nll_trace = jnp.zeros((0,), dtype)

    @property
    def params(self) -> GPSSMParams:
        return self.state.params

    @property
    def hybrid(self) -> bool:
        """collapse_precision="hybrid": native fp32 burn-in + ds64 tail
        (the measured fp32 gradient bias is a near-optimum phenomenon,
        DESIGN §12, so only the tail needs the ds64 cost).  Only collapsed
        cases (C4/C5) have the biased segment."""
        return (self.cfg.collapse_precision == "hybrid"
                and self.cfg.case_config.u_collapse)

    def _tail_trainer(self) -> Trainer:
        """The ds64 Trainer for the hybrid tail (lazily built; TrainState
        is interchangeable — same labels, same optax structure)."""
        tr = getattr(self, "_ds64_trainer", None)
        if tr is None:
            import dataclasses as _dc
            cfg64 = _dc.replace(self.cfg, collapse_precision="ds64")
            pg_fn = (make_pg_fn(cfg64)
                     if cfg64.case_config.x_pg else None)
            tr = self._ds64_trainer = Trainer(cfg64, self.data, pg_fn=pg_fn)
        return tr

    @property
    def eval_trainer(self) -> Trainer:
        """Trainer used for posterior collection: under the hybrid schedule
        the eval-time SGHMC thinning happens at the sharply trained
        post-tail point, exactly where the native-fp32 gradient is biased —
        so eval rides the ds64 trainer there."""
        return self._tail_trainer() if self.hybrid else self.trainer

    def fit(self, num_iterations: Optional[int] = None,
            chunk_size: int = 500,
            eval_every: Optional[int] = None,
            eval_samples: int = 3,
            tensorboard_dir: Optional[str] = None) -> "FFVDModel":
        """Train; with ``eval_every`` also record (iteration, RMSE, NLL)
        into ``self.rmse_seq`` — the working version of the reference's dead
        per-iteration tracker (RMSE_calculate_per_iteration,
        base_model.py:777-909, call commented at models.py:190).

        ``tensorboard_dir``: write the reference's gated-off summary set
        (models.py:94-131) per training chunk via
        utils.metrics.TensorBoardSink.

        Under ``collapse_precision="hybrid"`` the last
        ``cfg.hybrid_tail_iters`` iterations OF THIS CALL run the ds64
        bound (per-call semantics: a study that trains in several fit()
        calls pays one short ds64 tail per call; the intended production
        use is one fit() for the whole protocol)."""
        n = num_iterations or self.cfg.total_iterations
        if not hasattr(self, "rmse_seq"):
            self.rmse_seq = []
        tb = None
        if tensorboard_dir is not None:
            from ffvd_tpu.utils.metrics import TensorBoardSink
            tb = TensorBoardSink(tensorboard_dir)
        # Hybrid precision schedule: the LAST `hybrid_tail_iters` of this
        # fit() call run on the ds64 bound (see FFVDConfig.collapse_precision
        # and self.hybrid); everything before runs native.
        tail = min(self.cfg.hybrid_tail_iters, n) if self.hybrid else 0
        done = 0
        step = min(chunk_size, eval_every or n)
        while done < n:
            m = min(step, n - done)
            if done < n - tail:
                m = min(m, n - tail - done)   # don't cross the boundary
                trainer = self.trainer
            else:
                trainer = self._tail_trainer() if tail else self.trainer
            self.key, sub = jax.random.split(self.key)
            self.state, nlls = trainer.run(self.state, m, sub,
                                           chunk_size=chunk_size)
            self.nll_trace = jnp.concatenate([self.nll_trace, nlls])
            done += m
            if tb is not None:
                tb.write(self.state.params, float(nlls[-1]),
                         int(self.state.step))
            if eval_every and (done % eval_every == 0 or done == n):
                res = self.evaluate_quick(eval_samples)
                self.rmse_seq.append((int(self.state.step), res["rmse"],
                                      res["nll"]))
        if tb is not None:
            tb.close()
        return self

    def evaluate_quick(self, num_samples: int = 3, horizon: int = 30):
        """Cheap mid-training eval (fewer posterior samples)."""
        test_len = min(self.dataset.n_test, max(horizon, 30))
        self.key, sub = jax.random.split(self.key)
        xs, vs, self.state = collect_posterior(
            self.eval_trainer, self.state, test_len, sub, num=num_samples)
        py, pv, _ = predict_summary(self.params, xs, vs,
                                    self.cfg.emission_noise)
        rmse, nll = rmse_nll(
            jnp.asarray(self.dataset.y_test[:test_len], self.dtype), py, pv,
            self.dataset.y_train_std, horizon=horizon)
        return {"rmse": float(rmse), "nll": float(nll)}

    def evaluate_per_sample(self, horizon: int = 30):
        """Per-posterior-sample RMSE/NLL lists — the reference's
        collect_samples_2023 output (base_model.py:619-635, dead)."""
        test_len = self.dataset.n_test
        self.key, sub = jax.random.split(self.key)
        xs, vs, self.state = collect_posterior(
            self.eval_trainer, self.state, test_len, sub)
        rmses, nlls = [], []
        y_test = jnp.asarray(self.dataset.y_test, self.dtype)
        for s in range(xs.shape[0]):
            py, pv, _ = predict_summary(self.params, xs[s:s + 1],
                                        vs[s:s + 1],
                                        self.cfg.emission_noise)
            r, n = rmse_nll(y_test, py, pv, self.dataset.y_train_std,
                            horizon=horizon)
            rmses.append(float(r))
            nlls.append(float(n))
        return rmses, nlls

    def predict(self, test_len: Optional[int] = None,
                num_samples: Optional[int] = None, spread: bool = False):
        """Posterior-mean free-run prediction: (ŷ (T,P), v̂ (T,P)).

        ``spread=True`` adds the across-rollout variance of the per-sample
        predictive means to v̂ (the mixture total-variance term the
        reference's estimator drops, base_model.py:334-343) — the
        single-chain form of eval/ensemble's calibration fix: for
        deterministic training cases (C1/C4, full-batch Adam) it gives the
        same calibrated NLL as pooling seed-ensembles at 1× the train cost
        (PARITY §2e)."""
        test_len = test_len or self.dataset.n_test
        self.key, sub = jax.random.split(self.key)
        xs, vs, self.state = collect_posterior(
            self.eval_trainer, self.state, test_len, sub, num=num_samples)
        self._last_rollout = (xs, vs)
        py, pv, fy = predict_summary(self.params, xs, vs,
                                     self.cfg.emission_noise)
        self._last_fit_y = fy
        if spread:
            ys = xs @ self.params.c + self.params.d      # (S, T, P)
            pv = pv + jnp.var(ys, axis=0)
        return py, pv

    def evaluate(self, horizon: int = 30, num_samples: Optional[int] = None,
                 spread: bool = False) -> dict:
        """Train-free-run eval: RMSE/NLL on the first `horizon` test steps
        (base_model.py:345-349, :629).  See predict() for ``spread``."""
        py, pv = self.predict(num_samples=num_samples, spread=spread)
        rmse, nll = rmse_nll(
            jnp.asarray(self.dataset.y_test, self.dtype), py, pv,
            self.dataset.y_train_std, horizon=horizon)
        return {"rmse": float(rmse), "nll": float(nll),
                "predict_y": np.asarray(py), "predict_y_var": np.asarray(pv)}

    def calculate_density(self, y: np.ndarray, ystd: float = 1.0):
        """Log predictive density of held-out observations under the
        free-run predictive (working version of models.py:330-333)."""
        py, pv = self.predict(test_len=len(y))
        yv = jnp.asarray(y, self.dtype).reshape(py.shape) * ystd
        mu = py * ystd
        var = pv * (ystd ** 2)
        return np.asarray(-0.5 * jnp.log(2 * math.pi * var)
                          - 0.5 * (yv - mu) ** 2 / var)

    def sample(self, test_len: Optional[int] = None, s: int = 1):
        """Draw S free-run observation trajectories
        (working version of models.py:335-337)."""
        test_len = test_len or self.dataset.n_test
        self.key, sub = jax.random.split(self.key)
        xs, vs, self.state = collect_posterior(
            self.eval_trainer, self.state, test_len, sub, num=s)
        ys = xs @ self.params.c + self.params.d
        self.key, sub = jax.random.split(self.key)
        z = jax.random.normal(sub, ys.shape, ys.dtype)
        from ffvd_tpu.model.likelihoods import use_full_r
        if use_full_r(self.cfg.emission_noise, self.params.c.shape[1]):
            # correlated emission noise ε = z·Lᵀ, R = L·Lᵀ
            noise = z @ self.params.rchol.T
        else:
            noise = z * self.params.rchol_diag
        return np.asarray(ys + noise)

    def save_results(self, path, case: Optional[str] = None,
                     predictions: Optional[tuple] = None):
        """Write the reference-schema results npz.  ``predictions``
        overrides (predict_y, predict_y_var) — used by the ensemble CLI
        path to store pooled mixture predictions alongside this chain's
        parameters."""
        if predictions is not None:
            py, pv = predictions
        elif hasattr(self, "_last_rollout"):
            # reuse the rollout from the last predict/evaluate so the saved
            # predictions are the ones that were reported
            py, pv, _ = predict_summary(self.params, *self._last_rollout,
                                    emission_noise=self.cfg.emission_noise)
        else:
            py, pv = self.predict()
        fit_y = getattr(self, "_last_fit_y", None)
        if fit_y is None:
            # no predict() yet on this model (e.g. the ensemble CLI path
            # pools rollouts via chain_moments): the training fit is a pure
            # function of the current params (predict_summary:257)
            from ffvd_tpu.eval.rollout import emission_mean
            fit_y = emission_mean(self.params.x[1:], self.params.c,
                                  self.params.d)
        return save_results_npz(
            path, params=self.params, fit_y=fit_y,
            predict_y=py, predict_y_var=pv,
            y_test=self.dataset.y_test, y_train=self.dataset.y_train,
            y_train_std=self.dataset.y_train_std,
            case=case or self.cfg.case_config.name,
            ll_seq=(-np.asarray(self.nll_trace)).tolist() or [0.0],
            pg_num=self.cfg.pg_particles)


class RegressionModel(FFVDModel):
    """Reference-shaped constructor: ``RegressionModel(prior_type)``
    (models.py:315-317) + keyword configuration at fit time."""

    def __init__(self, prior_type: str = "normal", **cfg_kw):
        cfg = FFVDConfig(prior_type=prior_type, **cfg_kw)
        super().__init__(cfg)
