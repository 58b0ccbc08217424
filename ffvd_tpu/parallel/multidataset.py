"""All six datasets trained in ONE jit — BASELINE.md stress config 5.

The reference can only run one dataset per process.  Here datasets of
different lengths are padded to a common N with a transition mask (the masked
ELBO normalizes per-dataset by its real length), their parameter pytrees are
stacked on a leading axis, and the full training protocol is ``vmap``-ed over
that axis — one fused program covering six models.  On a mesh the dataset
axis shards over 'dp' and each model's D per-dim GPs shard over 'ep'.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data import create_dataset, load_warmstart
from ffvd_tpu.inference.trainer import Trainer, TrainState
from ffvd_tpu.model.params import (GPSSMParams, SSMData,
                                   init_params_from_warmstart)


def pad_dataset(data: SSMData, params: GPSSMParams, n_pad: int
                ) -> Tuple[SSMData, GPSSMParams]:
    """Pad one dataset/params pair to ``n_pad`` transitions with a mask."""
    n = data.y.shape[0]
    dtype = data.y.dtype
    pad = n_pad - n
    if pad < 0:
        raise ValueError(f"n_pad {n_pad} < dataset length {n}")
    y = jnp.concatenate([data.y, jnp.zeros((pad, data.y.shape[1]), dtype)])
    # control must cover train+test indices; pad to 2*n_pad
    c_pad = 2 * n_pad - data.control.shape[0]
    control = jnp.concatenate(
        [data.control,
         jnp.zeros((max(c_pad, 0), data.control.shape[1]), dtype)])
    mask = jnp.concatenate([jnp.ones((n,), dtype), jnp.zeros((pad,), dtype)])
    # x needs n_pad+1 rows; padded rows replicate the last state (they are
    # masked out of every objective term).
    x_pad = jnp.broadcast_to(params.x[-1], (pad, params.x.shape[1]))
    params = dataclasses.replace(
        params, x=jnp.concatenate([params.x, x_pad], axis=0))
    return SSMData(y=y, control=control, mask=mask), params


def stack_datasets(names: Sequence[str], file_id: int = 3, dtype=None,
                   m: Optional[int] = None, seed: int = 0
                   ) -> Tuple[SSMData, GPSSMParams, List[int]]:
    """Load + warm-start + pad + stack several datasets.

    ``m`` overrides the number of inducing points (warm starts carry M=100;
    for M≠100, Z/U are re-initialized by subsampling/tiling the warm start).
    Returns (stacked data, stacked params, list of true lengths)."""
    import jax.numpy as jnp
    dtype = dtype or jnp.float32
    datas, paramss, lens = [], [], []
    for name in names:
        ds = create_dataset(name)
        ws = load_warmstart(name, file_id)
        params = init_params_from_warmstart(ws, dtype=dtype)
        if m is not None and m != params.z.shape[0]:
            params = _resize_inducing(params, m, seed)
        data = SSMData(y=jnp.asarray(ds.y_train, dtype),
                       control=jnp.asarray(ds.control, dtype))
        datas.append(data)
        paramss.append(params)
        lens.append(ds.n_train)
    n_pad = max(lens)
    padded = [pad_dataset(d, p, n_pad) for d, p in zip(datas, paramss)]
    datas = [d for d, _ in padded]
    paramss = [p for _, p in padded]
    stack = lambda trees: jax.tree.map(lambda *a: jnp.stack(a), *trees)
    return stack(datas), stack(paramss), lens


def _resize_inducing(params: GPSSMParams, m: int, seed: int) -> GPSSMParams:
    """Grow/shrink the inducing set: subsample rows for m<M; for m>M draw the
    extra points from the latent-trajectory input distribution so Z stays
    well-separated and Kmm well-conditioned (tiling the warm-start Z would
    make Kmm numerically singular).  The reference has no resize mechanism."""
    if params.hidden:
        raise ValueError("resize the inducing set before attaching deep "
                         "hidden layers (api.py grafts hidden AFTER resize)")
    m0 = params.z.shape[0]
    din = params.z.shape[1]
    rng = np.random.RandomState(seed)
    if m <= m0:
        idx = rng.choice(m0, size=m, replace=False)
        z, u = params.z[idx], params.u[idx]
    else:
        extra = m - m0
        x = np.asarray(params.x)
        # Sample states, append control-range noise for the control dims.
        rows = x[rng.choice(x.shape[0], size=extra)]
        ctrl = rng.randn(extra, din - x.shape[1])
        z_new = np.concatenate([rows, ctrl], axis=1) \
            + 0.1 * rng.randn(extra, din)
        z = jnp.concatenate(
            [params.z, jnp.asarray(z_new, params.z.dtype)], axis=0)
        u = jnp.concatenate(
            [params.u,
             jnp.zeros((extra, params.u.shape[1]), params.u.dtype)], axis=0)
    return dataclasses.replace(params, z=z, u=u)


class MultiDatasetTrainer:
    """vmap the full FFVD protocol over a stacked-dataset axis."""

    def __init__(self, cfg: FFVDConfig, stacked_data: SSMData,
                 pg_fn=None):
        # The base Trainer's bound self.data is never used on this path —
        # data flows through outer_step's explicit argument.
        template = jax.tree.map(lambda a: a[0], stacked_data)
        self.base = Trainer(cfg, template, pg_fn=pg_fn)
        self.cfg = cfg
        self.stacked_data = stacked_data
        self.k = jax.tree.leaves(stacked_data)[0].shape[0]
        self._vstep = jax.vmap(self.base.outer_step)

        def run_chunk(state, keys, data):  # keys: (T, K)
            return jax.lax.scan(lambda s, kk: self._vstep(s, kk, data),
                                state, keys)

        self._run_chunk = jax.jit(run_chunk)

    def init_state(self, params_stacked: GPSSMParams) -> TrainState:
        return jax.vmap(self.base.init_state)(params_stacked)

    def evaluate(self, state: TrainState, datasets, lens, key: jax.Array,
                 horizon: int = 30):
        """Per-dataset posterior-rollout RMSE/NLL after stacked training.

        ``datasets``: the per-dataset loader objects (with y_test /
        y_train_std / control); ``lens``: true training lengths from
        stack_datasets.  Each dataset's trained params are un-padded and
        evaluated through the standard single-model pipeline.  For SGHMC
        cases the eval thinning chain restarts its preconditioner state
        (exact for the collapsed/pure-Adam stress config this path targets).
        """
        from ffvd_tpu.eval.rollout import (collect_posterior, predict_summary,
                                           rmse_nll)
        if self.base.has_sghmc:
            import warnings
            warnings.warn(
                "MultiDatasetTrainer.evaluate restarts the SGHMC "
                "preconditioner for the eval thinning chain — sampler-case "
                f"(C{self.cfg.case}) results are approximate; for exact "
                "reference eval semantics run each dataset through a single "
                "Trainer whose state carries the trained preconditioner.",
                stacklevel=2)
        results = {}
        for k, (ds, n) in enumerate(zip(datasets, lens)):
            params_k = jax.tree.map(lambda a: a[k], state.params)
            params_k = dataclasses.replace(params_k, x=params_k.x[:n + 1])
            dtype = params_k.x.dtype
            data_k = SSMData(y=jnp.asarray(ds.y_train, dtype),
                             control=jnp.asarray(ds.control, dtype))
            tr = Trainer(self.cfg, data_k)
            st = tr.init_state(params_k)
            key, sub = jax.random.split(key)
            xs, vs, _ = collect_posterior(tr, st, ds.n_test, sub)
            py, pv, _ = predict_summary(params_k, xs, vs,
                                        self.cfg.emission_noise)
            rmse, nll = rmse_nll(jnp.asarray(ds.y_test, dtype), py, pv,
                                 ds.y_train_std, horizon=horizon)
            results[ds.name] = {"rmse": float(rmse), "nll": float(nll)}
        return results

    def run(self, state: TrainState, num_iterations: int, key: jax.Array,
            chunk_size: int = 500, nan_check: bool = True):
        from ffvd_tpu.parallel.sharding import _check_finite
        traces = []
        done = 0
        while done < num_iterations:
            n = min(chunk_size, num_iterations - done)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, n * self.k).reshape(n, self.k)
            state, nlls = self._run_chunk(state, keys, self.stacked_data)
            _check_finite(nlls, done, "dataset", nan_check)
            traces.append(nlls)
            done += n
        return state, (jnp.concatenate(traces) if traces
                       else jnp.zeros((0, self.k)))
