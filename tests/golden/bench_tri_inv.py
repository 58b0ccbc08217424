"""Measure the M=512 triangular-inverse paths on the real TPU.

Round-1 finding (docs/DESIGN.md): XLA's triangular_solve costs ~0.3-0.6 ms
fixed per call at (4, M, M); at M=512 it bounds the training-step forward.
This script times direct solve vs blocked_tri_inv vs the full chol_and_inv,
and a full M=512 training step, writing tri_inv_timings.json.

Run ONLY when nothing else uses the TPU chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=50):
    # hard_sync, NOT block_until_ready — the latter is a no-op on the axon
    # backend and produced the bogus r4 row (see ffvd_tpu/utils/timing.py).
    from ffvd_tpu.utils.timing import timed_ms
    return timed_ms(fn, *args, n=n)


def main():
    from jax.scipy.linalg import solve_triangular
    from ffvd_tpu.ops.chol import blocked_tri_inv, chol_and_inv

    rec = {"platform": jax.devices()[0].platform}
    rng = np.random.RandomState(0)
    for m in (100, 256, 512):
        a = rng.randn(4, m, m).astype(np.float32)
        spd = jnp.asarray(a @ a.transpose(0, 2, 1) + m * np.eye(m, dtype=np.float32))
        l = jnp.linalg.cholesky(spd)

        direct = jax.jit(lambda x: solve_triangular(
            x, jnp.broadcast_to(jnp.eye(x.shape[-1], dtype=x.dtype), x.shape),
            lower=True))
        blocked = jax.jit(blocked_tri_inv)
        fused = jax.jit(chol_and_inv)

        rec[f"direct_solve_ms_M{m}"] = round(timeit(direct, l), 4)
        if m % 64 == 0:
            rec[f"blocked_ms_M{m}"] = round(timeit(blocked, l), 4)
        rec[f"chol_and_inv_ms_M{m}"] = round(timeit(fused, spd), 4)
        # In-program (dispatch-free) times — the number that matters inside
        # the fused train step, where there is no per-dispatch floor.
        from ffvd_tpu.utils.timing import in_program_ms
        rec[f"inprog_direct_ms_M{m}"] = round(in_program_ms(direct, l), 4)
        if m % 64 == 0:
            rec[f"inprog_blocked_ms_M{m}"] = round(in_program_ms(blocked, l), 4)
        rec[f"inprog_chol_and_inv_ms_M{m}"] = round(in_program_ms(fused, spd), 4)
        print({k: v for k, v in rec.items() if f"M{m}" in k}, flush=True)

    # full M=512 training step (ballbeam C4 shapes)
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_random
    params = init_params_random(jax.random.key(0), n=500, x_dim=4, m=512,
                                control_dim=1, p=1, dtype=jnp.float32)
    data = SSMData(y=0.5 * jax.random.normal(jax.random.key(1), (500, 1), jnp.float32),
                   control=jax.random.normal(jax.random.key(2), (1000, 1), jnp.float32))
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=512)
    tr = Trainer(cfg, data)
    state = tr.init_state(params)
    keys = jax.random.split(jax.random.key(3), 100)
    # Warm up with the SAME chunk length — a different scan length would
    # recompile inside the timed region — and warm TWICE: the round-5
    # reconciliation (m512_reconcile.json + DESIGN §14) measured a
    # one-time ~550 ms overhead on the SECOND execution of a fresh
    # process (8.2 ms/iter over a 100-iter chunk, then 2.7 steady).  The
    # r4 row's train_step_M512_ms = 8.90 was exactly this: one warm, one
    # timed run.  Timing now records the median of 3 repeated synced runs.
    from ffvd_tpu.utils.timing import hard_sync
    for _ in range(2):
        state, warm_nlls = tr._run_chunk(state, keys, tr.data)
        hard_sync(warm_nlls)
    reps = []
    for _ in range(3):
        t0 = time.perf_counter()
        state, nlls = tr._run_chunk(state, keys, tr.data)
        hard_sync(nlls)
        reps.append((time.perf_counter() - t0) / 100 * 1e3)
    rec["train_step_M512_ms"] = round(sorted(reps)[1], 4)
    rec["train_step_M512_ms_reps"] = [round(r, 4) for r in reps]
    print("train_step_M512_ms:", rec["train_step_M512_ms"], reps, flush=True)

    out = Path(__file__).parent / "tri_inv_timings.json"
    prev = json.loads(out.read_text()) if out.exists() else {}
    tag = sys.argv[1] if len(sys.argv) > 1 else "run"
    prev[tag] = rec
    out.write_text(json.dumps(prev, indent=2))
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
