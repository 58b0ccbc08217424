"""Sequence (time-axis) parallelism for long trajectories.

SURVEY.md §5 (long-context row): the FFVD ELBO is *parallel over t* — every
GP term is a batched gram/projection over the N transitions, and all
reductions over t are sums.  So the GPSSM analog of sequence parallelism is
simply: shard the time axis of (x, y, controls) over an 'sp' mesh axis and
let XLA turn the Σ_t reductions (the H-matrix accumulation F̃ᵀF̃, the a-vector,
the trace and likelihood sums) into psum-style collectives, with a
collective-permute halo for the x_{t+1} − x_t difference.  No ring attention
needed — there is no attention.

This is genuinely useful when N is large (the six system-id datasets are
tiny, but the framework is not limited to them).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ffvd_tpu.inference.trainer import Trainer, TrainState
from ffvd_tpu.model.params import GPSSMParams, HiddenLayerParams, SSMData
from ffvd_tpu.ops.kernels import KernelParams


def make_seq_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("sp",))


def _params_seq_spec(n_hidden: int = 0) -> GPSSMParams:
    """Only the latent trajectory has a time axis; hidden deep-transition
    layers (model/deep.py) have none and replicate."""
    kspec = KernelParams(log_variance=P(), log_lengthscales=P())
    hidden = tuple(HiddenLayerParams(u=P(), z=P(), kernel=kspec)
                   for _ in range(n_hidden))
    return GPSSMParams(
        x=P("sp", None), u=P(), z=P(),
        kernel=kspec,
        log_q=P(), c=P(), d=P(), log_rchol=P(), hidden=hidden)


def data_seq_spec(data: SSMData) -> SSMData:
    mask = None if data.mask is None else P("sp")
    return SSMData(y=P("sp", None), control=P("sp", None), mask=mask)


def shard_sequence(state: TrainState, data: SSMData, mesh: Mesh):
    """Place a TrainState + data with the time axis sharded over 'sp'.

    The SGHMC auxiliaries and window snapshots of x inherit x's sharding;
    everything else is replicated.
    """
    pspec = _params_seq_spec(n_hidden=len(state.params.hidden))
    from ffvd_tpu.inference.sghmc import SGHMCState
    sghmc = SGHMCState(xi=pspec, g=pspec, g2=pspec, p=pspec)
    # window holds only SGHMC leaves (zero-size placeholders elsewhere);
    # it is small, so replicate it.
    window = jax.tree.map(lambda _: P(), state.window)
    adam = jax.tree.map(lambda a: P(), state.adam)
    specs = TrainState(params=pspec, sghmc=sghmc, adam=adam, window=window,
                       window_count=P(), step=P())

    sp = mesh.shape["sp"]

    def fit_spec(leaf, spec):
        """Drop 'sp' from dims that don't divide the mesh (device_put
        requires divisibility; XLA still shards the big intermediates by
        propagation from the operands that ARE sharded)."""
        dims = tuple(
            None if (ax == "sp" and leaf.shape[i] % sp != 0) else ax
            for i, ax in enumerate(spec))
        return NamedSharding(mesh, P(*dims))

    put = lambda tree, spec_tree: jax.device_put(
        tree, jax.tree.map(fit_spec, tree, spec_tree,
                           is_leaf=lambda x: isinstance(x, P)))
    return put(state, specs), put(data, data_seq_spec(data))


class SequenceShardedTrainer:
    """Trainer whose per-step program runs with the time axis sharded.

    The run path is the same chunked ``lax.scan`` as ``Trainer.run`` (one
    device dispatch and one host sync per chunk, not per iteration) with an
    identical key schedule, so a sharded run reproduces an unsharded
    ``Trainer.run`` exactly (tests/test_sharding.py)."""

    def __init__(self, trainer: Trainer, mesh: Mesh):
        self.trainer = trainer
        self.mesh = mesh
        self._run_chunk = jax.jit(
            lambda state, keys, data: jax.lax.scan(
                lambda s, k: trainer.outer_step(s, k, data), state, keys))

    def run(self, state: TrainState, data: SSMData, num_iterations: int,
            key: jax.Array, chunk_size: int = 500, nan_check: bool = True):
        from ffvd_tpu.parallel.sharding import _check_finite
        state, data = shard_sequence(state, data, self.mesh)
        traces = []
        done = 0
        while done < num_iterations:
            n = min(chunk_size, num_iterations - done)
            key, sub = jax.random.split(key)
            keys = jax.random.split(sub, n)
            state, nlls = self._run_chunk(state, keys, data)
            _check_finite(nlls[:, None], done, "step", nan_check)
            traces.append(nlls)
            done += n
        return state, (jnp.concatenate(traces) if traces
                       else jnp.zeros((0,)))
