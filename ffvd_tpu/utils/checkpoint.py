"""Periodic training checkpoints with exact resume.

The reference has NO mid-training checkpointing — a crash loses the run; the
only write happens at the very end (base_model.py:486-517) and the only read
is the warm-start npz (SURVEY.md §5).  Here training state checkpoints
periodically via orbax, and because every PRNG key is derived from
(seed, iteration) the resumed trajectory is bit-exact.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional

import jax


class CheckpointManager:
    """Thin orbax wrapper for TrainState pytrees keyed by outer iteration."""

    def __init__(self, directory, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._dir = Path(directory).absolute()
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self._ocp = ocp

    def save(self, step: int, state: Any, force: bool = False) -> None:
        self._mgr.save(step, args=self._ocp.args.StandardSave(state),
                       force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        return self._mgr.restore(
            step, args=self._ocp.args.StandardRestore(template))

    def close(self):
        self._mgr.close()


def run_with_checkpoints(trainer, state, num_iterations: int, key: jax.Array,
                         manager: CheckpointManager, every: int = 500,
                         chunk_size: int = 500):
    """Trainer.run with a checkpoint every `every` iterations.  Keys are
    derived per-chunk from (key, chunk index) so a resume from checkpoint k
    replays the identical remaining trajectory."""
    import jax.numpy as jnp

    start = int(state.step)
    traces = []
    done = start
    while done < num_iterations:
        n = min(every, chunk_size, num_iterations - done)
        chunk_key = jax.random.fold_in(key, done)
        keys = jax.random.split(chunk_key, n)
        state, nlls = trainer._run_chunk(state, keys)
        traces.append(nlls)
        done += n
        manager.save(done, state)
    return state, (jnp.concatenate(traces) if traces else jnp.zeros((0,)))
