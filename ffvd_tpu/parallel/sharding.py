"""Multi-device scale-out over a jax.sharding.Mesh.

The reference is strictly single-process/single-device (SURVEY.md §2:
no distributed machinery at all).  The TPU-native scale-out axes for this
model family (SURVEY.md §5) are:

- **dp** (chain/data parallel): independent SG-HMC chains / posterior seeds /
  dataset replicas — embarrassingly parallel, sharded over the mesh's first
  axis; no cross-device traffic except metric reductions.
- **ep** (expert parallel): the D *independent* per-latent-dim GPs.  Every
  (D, M, M) Cholesky, (D, M, N) projection and per-dim reduction shards over
  'ep'; the only collectives are the Σ_d psum-style reductions XLA inserts
  for the scalar nll — tiny, and they ride ICI.

Shardings are expressed as input NamedShardings on the chain-stacked
TrainState; XLA's SPMD partitioner propagates them through the fused
training-step program (scan over 21 SG-HMC sub-steps + Adam) and inserts the
collectives.  This is the scaling-book recipe: pick a mesh, annotate inputs,
let XLA do the rest.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.inference.sghmc import SGHMCState
from ffvd_tpu.inference.trainer import Trainer, TrainState
from ffvd_tpu.model.params import GPSSMParams, HiddenLayerParams, SSMData
from ffvd_tpu.ops.kernels import KernelParams


def _check_finite(nlls, done: int, axis_name: str, enabled: bool) -> None:
    """Per-chunk failure detection for the parallel runners (same contract
    as Trainer.run's nan_check)."""
    if not enabled or bool(jnp.all(jnp.isfinite(nlls))):
        return
    bad = jnp.argwhere(~jnp.isfinite(nlls), size=1)[0]
    raise FloatingPointError(
        f"non-finite nll at iteration {done + int(bad[0])} in {axis_name} "
        f"{int(bad[1])}; try fp64 or a larger jitter (cfg.jitter)")


def make_mesh(n_devices: Optional[int] = None, ep: Optional[int] = None,
              x_dim: int = 4) -> Mesh:
    """Build a ('dp', 'ep') mesh.  'ep' (latent-dim sharding) defaults to the
    largest power-of-two divisor of min(x_dim, n_devices)."""
    devices = jax.devices()
    n = n_devices or len(devices)
    devices = devices[:n]
    if ep is None:
        ep = 1
        while ep * 2 <= min(x_dim, n) and n % (ep * 2) == 0:
            ep *= 2
    dp = n // ep
    return Mesh(np.asarray(devices).reshape(dp, ep), ("dp", "ep"))


def params_pspec(chain_axis: bool = True, n_hidden: int = 0) -> GPSSMParams:
    """PartitionSpec tree for (chain-stacked) GPSSMParams: chains over 'dp',
    the latent-dim axis over 'ep'.  ``n_hidden``: deep-transition layers
    (model/deep.py) — their u/kernel shard like the head's."""
    pre = ("dp",) if chain_axis else ()
    kspec = KernelParams(log_variance=P(*pre, "ep"),
                         log_lengthscales=P(*pre, "ep"))
    hidden = tuple(
        HiddenLayerParams(u=P(*pre, None, "ep"), z=P(*pre), kernel=kspec)
        for _ in range(n_hidden))
    return GPSSMParams(
        x=P(*pre, None, "ep"),
        u=P(*pre, None, "ep"),
        z=P(*pre),
        kernel=kspec,
        log_q=P(*pre, "ep"),
        c=P(*pre, "ep"),
        d=P(*pre),
        log_rchol=P(*pre),
        hidden=hidden,
    )


def _is_spec(x) -> bool:
    return isinstance(x, P)


def state_pspec(state: TrainState) -> TrainState:
    """PartitionSpec tree for a chain-stacked TrainState."""
    pspec = params_pspec(n_hidden=len(state.params.hidden))
    sghmc = SGHMCState(xi=pspec, g=pspec, g2=pspec, p=pspec)
    window = jax.tree.map(lambda _: P("dp"), state.window)
    adam = jax.tree.map(lambda a: P("dp") if jnp.ndim(a) >= 1 else P(),
                        state.adam)
    return TrainState(params=pspec, sghmc=sghmc, adam=adam, window=window,
                      window_count=P("dp"), step=P("dp"))


def shard_chain_state(state: TrainState, mesh: Mesh) -> TrainState:
    specs = state_pspec(state)
    shardings = jax.tree.map(lambda s: NamedSharding(mesh, s), specs,
                             is_leaf=_is_spec)
    return jax.device_put(state, shardings)


def stack_warmstarts(dataset: str, file_ids, dtype=jnp.float32
                     ) -> GPSSMParams:
    """Stack several Factnonlin warm starts on a chain axis — the reference
    runs its ~16 per-dataset warm starts as separate processes
    (FFVD_Main.py:363,386); here they train as chains in one jit
    (MultiChainTrainer) and the best posterior is picked afterwards."""
    from ffvd_tpu.data import load_warmstart
    from ffvd_tpu.model.params import init_params_from_warmstart
    ps = [init_params_from_warmstart(load_warmstart(dataset, f), dtype=dtype)
          for f in file_ids]
    return jax.tree.map(lambda *a: jnp.stack(a), *ps)


class MultiChainTrainer:
    """Run C independent FFVD chains in one jit over a ('dp','ep') mesh.

    Each chain follows the full single-chain protocol (Trainer.outer_step);
    chains shard over 'dp' and each chain's D per-dim GPs shard over 'ep'.
    """

    def __init__(self, cfg: FFVDConfig, data: SSMData, n_chains: int,
                 mesh: Optional[Mesh] = None, pg_fn=None):
        self.base = Trainer(cfg, data, pg_fn=pg_fn)
        self.cfg = cfg
        self.n_chains = n_chains
        self.mesh = mesh
        # Chains map over state/keys; the dataset is shared (in_axes=None)
        # and passed as a jit argument — not a closure constant — so the
        # compiled program is dataset-independent (see Trainer._run_chunk_impl).
        self._vstep = jax.vmap(self.base.outer_step, in_axes=(0, 0, None))

        def run_chunk(state, keys, data):  # keys: (T, C)
            return jax.lax.scan(lambda s, kk: self._vstep(s, kk, data),
                                state, keys)

        self._run_chunk = jax.jit(run_chunk)

    def init_state(self, params_stacked: GPSSMParams) -> TrainState:
        state = jax.vmap(self.base.init_state)(params_stacked)
        if self.mesh is not None:
            state = shard_chain_state(state, self.mesh)
        return state

    def stack_params(self, params: GPSSMParams,
                     jitter_key: Optional[jax.Array] = None) -> GPSSMParams:
        """Replicate one warm start across chains (optionally with a small
        perturbation per chain so chains decorrelate)."""
        stacked = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (self.n_chains,) + a.shape).copy(),
            params)
        if jitter_key is not None:
            leaves, treedef = jax.tree.flatten(stacked)
            keys = jax.random.split(jitter_key, len(leaves))
            leaves = [a + 1e-3 * jax.random.normal(k, a.shape, a.dtype)
                      for a, k in zip(leaves, keys)]
            stacked = jax.tree.unflatten(treedef, leaves)
        return stacked

    def run(self, state: TrainState, num_iterations: int, key: jax.Array,
            chunk_size: int = 500, nan_check: bool = True):
        traces = []
        done = 0
        while done < num_iterations:
            n = min(chunk_size, num_iterations - done)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, n * self.n_chains)
            keys = keys.reshape(n, self.n_chains)
            state, nlls = self._run_chunk(state, keys, self.base.data)
            _check_finite(nlls, done, "chain", nan_check)
            traces.append(nlls)
            done += n
        return state, (jnp.concatenate(traces) if traces
                       else jnp.zeros((0, self.n_chains)))

    @staticmethod
    def rhat(nll_trace, burn_frac: float = 0.5) -> float:
        """Split-R̂ over the post-burn-in tail of run()'s (T, C) nll trace.

        The reference has no convergence diagnostic (chains are eyeballed
        via print_sample_performance, base_model.py:952-989); this is the
        standard replacement.  R̂ ≲ 1.01 on the nll ⇒ chains agree."""
        from ffvd_tpu.utils.metrics import split_rhat
        t = nll_trace.shape[0]
        return split_rhat(nll_trace[int(t * burn_frac):])
