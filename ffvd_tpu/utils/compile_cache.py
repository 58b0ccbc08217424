"""Persistent XLA compilation cache (on by default, opt-out).

FFVD workloads compile a small number of LARGE fused programs — the chunked
training scan is one XLA program per (case, shapes, chunk length), ~20-40 s
to compile on the TPU backend, and the long-study variants (12k-iteration
ds64 chunks) have taken tens of minutes.  The shapes recur exactly across
CLI runs, studies, and bench re-runs, so JAX's persistent compilation cache
converts every repeat compile into a disk load.  Measured through the
tunneled axon TPU backend: a second process's first call on an identical
program drops 0.52 s -> 0.06 s (cache hit; 2026-08-19 probe).

The reference (TF1 graph mode, FFVD_Main.py) rebuilds and re-optimizes its
graph from scratch every process — there is no equivalent subsystem there.

Env knobs:
  FFVD_COMPILE_CACHE=0          disable entirely
  FFVD_COMPILE_CACHE_DIR=<path> override the location
                                (default ~/.cache/ffvd_tpu/xla)

Known cosmetic noise: on cache hits the XLA:CPU AOT loader logs
"Target machine feature +prefer-no-gather is not supported on the host
machine ... could lead to execution errors such as SIGILL".  On the same
host this is a false positive — `prefer-no-gather`/`prefer-no-scatter` are
XLA codegen *tuning* flags recorded in the compile-time feature list but
never reported by host CPU detection, so the set comparison can't match.
Execution is correct (verified: cached CLI runs bit-match the golden
warm-start anchor).  A genuinely different host would miss or safely
recompile; delete the cache dir (or FFVD_COMPILE_CACHE=0) if the warning
is ever accompanied by an actual crash.
"""

from __future__ import annotations

import os

_DISABLE_VALUES = ("0", "off", "false", "none", "no")

# None = not yet attempted; False = disabled; str = active cache dir.
_state: object = None


def enable_compilation_cache() -> str | None:
    """Idempotently point JAX at the on-disk compile cache.

    Returns the cache directory in use, or None when disabled (env opt-out
    or an unwritable location).  Safe to call from multiple entry points;
    only the first call does work.  A cache dir the user already configured
    (via JAX_COMPILATION_CACHE_DIR or jax.config) is respected as-is.

    JAX's default entry filters stay in place (min compile time ~1 s), so
    the thousands of small test-suite programs never hit the disk — only
    the big fused training/eval programs are persisted.
    """
    global _state
    if _state is not None:
        return _state or None
    if os.environ.get("FFVD_COMPILE_CACHE", "1").lower() in _DISABLE_VALUES:
        _state = False
        return None
    import jax

    existing = jax.config.jax_compilation_cache_dir
    if existing:
        _state = existing
        return existing
    path = os.environ.get("FFVD_COMPILE_CACHE_DIR") or os.path.join(
        os.path.expanduser("~"), ".cache", "ffvd_tpu", "xla")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        _state = False
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    _state = path
    return path
