"""fp64-on-TPU probe: can the axon chip run the x64-emulated C5 workload at
useful speed?  If yes, the flutter×C5 "use fp64 on CPU (99 min)" fallback
(PARITY §2b-deep) becomes a minutes-scale TPU run.

NEGATIVE RESULT (round 3, 2026-08-17): the x64-emulated program CRASHED the
TPU worker ("TPU worker process crashed or restarted ... kernel fault",
JaxRuntimeError UNAVAILABLE) during/after compilation of the fused C5
chunk; the tunnel needed ~10 minutes to recover.  fp64 therefore stays a
CPU-only path on this stack — do NOT re-run this probe casually on the
shared chip.

Usage: python tests/golden/fp64_tpu_probe.py [dataset] [seeds...]
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from ffvd_tpu.utils.timing import hard_sync


def main():
    ds = sys.argv[1] if len(sys.argv) > 1 else "flutter"
    seeds = [int(s) for s in sys.argv[2:]] or [0]

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    outjson = Path(__file__).parent / "fp64_tpu.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    # quick throughput probe first: 200 iters
    cfg = FFVDConfig(dataset=ds, case=5, iterations=2000, seed=0)
    model = FFVDModel(cfg, dtype=jnp.float64)
    t0 = time.time()
    model.state, nlls = model.trainer.run(model.state, 200,
                                          jax.random.key(99),
                                          chunk_size=200)
    hard_sync(nlls)
    compile_and_200 = time.time() - t0
    t0 = time.time()
    model.state, nlls = model.trainer.run(model.state, 200,
                                          jax.random.key(98),
                                          chunk_size=200)
    hard_sync(nlls)
    rate = 200 / (time.time() - t0)
    print(f"fp64 TPU C5 {ds}: {rate:.1f} it/s steady "
          f"(first 200 + compile: {compile_and_200:.0f}s)", flush=True)
    results[f"{ds}_C5_fp64tpu_rate"] = {
        "it_per_s": round(rate, 2),
        "platform": jax.devices()[0].platform}
    outjson.write_text(json.dumps(results, indent=1))
    if rate < 3:
        print("too slow for full runs; stopping at the probe", flush=True)
        return

    for seed in seeds:
        tag = f"{ds}_C5_fp64tpu_s{seed}"
        if tag in results:
            continue
        cfg = FFVDConfig(dataset=ds, case=5, iterations=2000, seed=seed)
        m = FFVDModel(cfg, dtype=jnp.float64)
        t0 = time.time()
        m.fit()
        t1 = time.time()
        ev = m.evaluate()
        lv = np.asarray(m.params.kernel.log_variance, np.float64)
        results[tag] = {"rmse": ev["rmse"], "nll": ev["nll"],
                        "train_time_sec": round(t1 - t0, 1),
                        "log_var": lv.tolist()}
        outjson.write_text(json.dumps(results, indent=1))
        print(tag, round(ev["rmse"], 4), f"{t1-t0:.0f}s",
              [round(x, 1) for x in lv], flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
