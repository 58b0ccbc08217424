"""Sampler-case throughput: steady-state C2/C5 it/s, and the sghmc_unroll /
prng_impl sweeps (VERDICT round-3 items 4 and 5).

One protocol iteration = 21 nll-gradient evaluations (base_model.py:915-925).
All rates are STEADY-STATE: the timed stretch re-runs a warmed-up fused
chunk of identical length, so no compile time is included.  Results append
to sampler_timings.json under a labeled tag.

Usage: python tests/golden/bench_sampler.py [tag]
Run ONLY when nothing else uses the TPU chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from ffvd_tpu.utils.timing import hard_sync


def rate(cfg, iters=500):
    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart

    ds = create_dataset(cfg.dataset)
    params = init_params_from_warmstart(load_warmstart(cfg.dataset,
                                                       cfg.file_id),
                                        dtype=jnp.float32)
    data = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
                   control=jnp.asarray(ds.control, jnp.float32))
    tr = Trainer(cfg, data)
    state = tr.init_state(params)
    key = jax.random.key(0, impl=cfg.prng_impl)   # same mechanism as api.py
    key, kw = jax.random.split(key)
    t0 = time.time()
    state, warm = tr.run(state, iters, kw, chunk_size=iters)
    hard_sync(warm)
    compile_s = time.time() - t0
    t0 = time.time()
    state, nlls = tr.run(state, iters, key, chunk_size=iters)
    hard_sync(nlls)
    dt = time.time() - t0
    finite = bool(jnp.all(jnp.isfinite(nlls)))
    return round(iters / dt, 2), round(compile_s, 1), finite


def main():
    from ffvd_tpu.config import FFVDConfig

    tag = sys.argv[1] if len(sys.argv) > 1 else "r3"
    rec = {"platform": jax.devices()[0].platform,
           "method": "steady-state, warmed-up same-length fused chunk, "
                     "500 iters; 1 iteration = 21 grad evals"}

    for case in (2, 5):
        r, c, fin = rate(FFVDConfig(dataset="ballbeam", case=case))
        rec[f"C{case}"] = {"it_per_s": r, "compile_s": c, "finite": fin}
        print(f"C{case}: {r} it/s (compile {c}s, finite={fin})", flush=True)

    for unroll in (3, 7, 21):
        r, c, fin = rate(FFVDConfig(dataset="ballbeam", case=5,
                                    sghmc_unroll=unroll))
        rec[f"C5_unroll{unroll}"] = {"it_per_s": r, "compile_s": c,
                                     "finite": fin}
        print(f"C5 unroll={unroll}: {r} it/s (compile {c}s)", flush=True)

    r, c, fin = rate(FFVDConfig(dataset="ballbeam", case=5, prng_impl="rbg"))
    rec["C5_rbg"] = {"it_per_s": r, "compile_s": c, "finite": fin}
    print(f"C5 rbg: {r} it/s", flush=True)

    out = Path(__file__).parent / "sampler_timings.json"
    prev = json.loads(out.read_text()) if out.exists() else {}
    prev[tag] = rec
    out.write_text(json.dumps(prev, indent=2))
    print(json.dumps(rec, indent=2))


if __name__ == "__main__":
    main()
