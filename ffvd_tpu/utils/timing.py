"""Reliable device synchronization for wall-clock measurement.

Why this exists: on the experimental ``axon`` TPU plugin backend,
``jax.block_until_ready()`` RETURNS IMMEDIATELY (~0.05 ms) while the
dispatched program is still executing on the chip.  Measured 2026-08-20 on
this stack: five back-to-back "timed" executions of a ~25 ms program each
"completed" in <0.1 ms by block_until_ready, while a ``jax.device_get`` on
the same output took the full program time (and the first get drained ~19 s
of queued work).  The bogus ``train_step_M512_ms = 0.0042`` briefly recorded
in tests/golden/tri_inv_timings.json was this failure mode.

A host readback is the only synchronization primitive that provably waits on
every backend, so ALL timing code in this repo syncs through
:func:`hard_sync` instead of ``block_until_ready``.  Correctness-only code
(e.g. materialize-before-assert) may keep ``block_until_ready`` — any later
value read forces the sync anyway.

The readback is one scalar per array leaf (a ``ravel()[-1]`` slice), so the
transfer cost is a single round trip (~25 ms on the tunneled chip, ~0 on
local CPU), independent of array sizes.  Timed stretches must simply be long
enough that one round trip is noise (>=1 s recommended on the tunnel).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def hard_sync(tree):
    """Block until every array in ``tree`` is actually computed.

    Dispatches a scalar slice of each leaf and reads them back to host in
    one ``device_get``.  Returns ``tree`` unchanged for chaining.
    """
    leaves = [x for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and hasattr(x, "shape")]
    if leaves:
        jax.device_get([jnp.ravel(x)[-1] if x.ndim else x for x in leaves])
    return tree


def in_program_ms(fn, *args, k: int = 32, n: int = 10):
    """Per-application ms of ``fn`` measured INSIDE one jit program.

    Runs ``k`` (and ``2k``) sequential, data-dependent applications under a
    single ``lax.scan`` and reports ``(t(2k) - t(k)) / k`` — differencing
    cancels both the per-dispatch overhead (~0.65 ms on the tunneled axon
    chip, which floors :func:`timed_ms` for cheap ops) and any fixed
    program-entry cost.  The scan carry perturbs the first argument by a
    denormal-scale amount derived from the previous output so XLA cannot
    CSE the applications away; the perturbation is far below fp32 ulp at
    the magnitudes these ops see, so each application does the full work.
    """
    from jax import lax

    first = args[0]

    def _prog(length):
        @jax.jit
        def prog(a0, rest, eps0):
            def body(eps, _):
                out = fn(a0 + eps, *rest)
                leaf = jnp.ravel(jax.tree_util.tree_leaves(out)[0])[0]
                return (leaf * jnp.asarray(1e-30, a0.dtype)).astype(a0.dtype), None
            eps, _ = lax.scan(body, eps0, None, length=length)
            return eps
        return prog

    rest = args[1:]
    eps0 = jnp.zeros((), first.dtype)
    times = {}
    for length in (k, 2 * k):
        prog = _prog(length)
        hard_sync(prog(first, rest, eps0))
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = prog(first, rest, eps0)
        hard_sync(out)
        times[length] = (time.perf_counter() - t0) / n
    return (times[2 * k] - times[k]) / k * 1e3


def timed_ms(fn, *args, n: int = 50, warmup: int = 1):
    """Mean wall-clock ms per ``fn(*args)`` call over ``n`` queued dispatches.

    Calls are dispatched asynchronously (the device executes them serially)
    and the stretch is closed with one :func:`hard_sync`, so the per-call
    figure is throughput-true even where block_until_ready lies.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    hard_sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    hard_sync(out)
    return (time.perf_counter() - t0) / n * 1e3
