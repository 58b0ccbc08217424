"""Multi-host (DCN) initialization and hybrid mesh construction.

The reference is strictly single-process/single-device (SURVEY.md §2: no
NCCL/MPI/anything), so this module is beyond-parity scale-out plumbing: it
wires ``jax.distributed`` for multi-host pods and builds meshes whose
fast-collective axes ride ICI within a host/slice while only the
data/chain-parallel axis crosses DCN.

Design rule (scaling-book recipe): put 'ep' (latent-dim / model-ish axis,
collectives every step: the batched Cholesky + projection psums) innermost on
ICI; put 'dp' (independent SG-HMC chains / datasets, collectives only for
metrics) outermost across hosts.

Untestable on this single-chip machine beyond mocks — the initialize call is
pass-through-tested with a stub, and the mesh builder is exercised on the
virtual CPU mesh (tests/test_sharding.py).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None,
                         local_device_ids=None) -> bool:
    """Initialize JAX's multi-host runtime (DCN) if configured.

    Arguments default to the standard env vars (JAX_COORDINATOR_ADDRESS,
    JAX_NUM_PROCESSES, JAX_PROCESS_ID) so launchers can configure workers
    without code changes.  Returns True when distributed init ran, False for
    the single-process fallback (no coordinator configured) — callers can
    unconditionally call this first thing in main().

    Must run BEFORE any other jax API touches a backend.
    """
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    if num_processes is None:
        env = os.environ.get("JAX_NUM_PROCESSES")
        num_processes = int(env) if env else None
    if process_id is None:
        env = os.environ.get("JAX_PROCESS_ID")
        process_id = int(env) if env else None

    import jax
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    return True


def multihost_mesh(dp: Optional[int] = None, ep: Optional[int] = None,
                   x_dim: int = 4):
    """A ('dp', 'ep') mesh laid out for the hardware topology.

    Single process: delegates to parallel.sharding.make_mesh (ICI only).
    Multi-process: 'dp' spans processes (hosts, DCN) and 'ep' spans each
    process's local devices (ICI), via mesh_utils.create_hybrid_device_mesh —
    so the per-step collapsed-bound collectives never cross DCN; only
    independent chains do.
    """
    import jax
    from jax.sharding import Mesh

    def _default_ep(n_avail: int) -> int:
        # largest power-of-two divisor of n_avail that is <= x_dim
        e = 1
        while e * 2 <= min(n_avail, x_dim) and n_avail % (e * 2) == 0:
            e *= 2
        return e

    if jax.process_count() == 1:
        from ffvd_tpu.parallel.sharding import make_mesh
        n = len(jax.devices())
        if dp is not None:
            if ep is None:
                if n % dp != 0:
                    raise ValueError(f"dp={dp} does not divide the "
                                     f"{n}-device platform")
                ep = _default_ep(n // dp)
            return make_mesh(dp * ep, ep=ep, x_dim=x_dim)
        return make_mesh(None, ep=ep, x_dim=x_dim)

    from jax.experimental import mesh_utils
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    total = n_proc * n_local
    if ep is None:
        ep = _default_ep(n_local)
    if n_local % ep != 0:
        raise ValueError(f"ep={ep} must divide the {n_local} local devices "
                         "(ep rides ICI within a host)")
    dp_local = n_local // ep
    if dp is None:
        dp = n_proc * dp_local
    if dp != n_proc * dp_local:
        raise ValueError(
            f"dp={dp} inconsistent with {n_proc} processes x {n_local} "
            f"local devices / ep={ep} (need dp = {n_proc * dp_local}); "
            "this builder always uses every device")
    devices = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(dp_local, ep), dcn_mesh_shape=(n_proc, 1))
    assert devices.size == total
    return Mesh(np.asarray(devices).reshape(dp, ep), ("dp", "ep"))
