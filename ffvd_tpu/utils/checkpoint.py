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
import numpy as np

CHECKPOINT_FORMAT = 2
"""Training-state layout / PRNG-protocol version.  Bump whenever a change
makes resuming an older mid-run checkpoint silently diverge from the
original trajectory.

v2 (round 2): the SubsetOps refactor splits SGHMC noise keys over the
*sampled subset* of leaves instead of the full parameter tree
(inference/trainer.py), so sampler trajectories resumed from v1
checkpoints would no longer replay bit-exactly.  v1 (unversioned) saves
are refused at restore with a clear error instead.
"""


class CheckpointManager:
    """Thin orbax wrapper for TrainState pytrees keyed by outer iteration.

    Saves carry ``CHECKPOINT_FORMAT`` alongside the state; ``restore``
    refuses a checkpoint whose format does not match, so the "bit-exact
    resume" guarantee can never silently turn into a divergent trajectory
    across protocol changes."""

    def __init__(self, directory, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        self._dir = Path(directory).absolute()
        self._mgr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep))
        self._ocp = ocp

    def save(self, step: int, state: Any, force: bool = False) -> None:
        payload = {"format": np.array(CHECKPOINT_FORMAT, np.int32), "state": state}
        self._mgr.save(step, args=self._ocp.args.StandardSave(payload),
                       force=force)
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, template: Any, step: Optional[int] = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self._dir}")
        payload_t = {"format": np.array(0, np.int32), "state": template}
        try:
            payload = self._mgr.restore(
                step, args=self._ocp.args.StandardRestore(payload_t))
        except Exception as e:
            raise ValueError(
                f"checkpoint {step} under {self._dir} does not match the "
                f"current layout (format v{CHECKPOINT_FORMAT}); if it was "
                "written before format versioning (v1, pre-SubsetOps), its "
                "sampler trajectory cannot be resumed bit-exactly — restart "
                f"training instead. Underlying error: {e}") from e
        fmt = int(payload["format"])
        if fmt != CHECKPOINT_FORMAT:
            raise ValueError(
                f"checkpoint {step} has format v{fmt} but this build writes "
                f"v{CHECKPOINT_FORMAT}: the training-state/PRNG protocol "
                "changed, so resuming would silently diverge from the "
                "original trajectory. Restart training, or pin the matching "
                "ffvd_tpu version.")
        return payload["state"]

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
        state, nlls = trainer._run_chunk(state, keys, trainer.data)
        traces.append(nlls)
        done += n
        manager.save(done, state)
    return state, (jnp.concatenate(traces) if traces else jnp.zeros((0,)))
