"""Live-CSMC particle-count sweep (VERDICT r4 item 8, stretch).

The 15-run C6 study (pg_c6_study.json, PARITY §2b) demoted live
(reference-storage, no-ancestry) CSMC from the default: at P=100 its
full-protocol ballbeam RMSE is 13-150x worse than ancestor trace.  The
mixing stats say the machinery is healthy (ref-survival ~0.8,
unique-frac ~0.5), so the failure is the STORAGE (filtering-marginal
patchworks), not degeneracy.  Before closing the question, measure the
one lever the reference exposes (P, hardcoded 100 upstream —
/root/reference/vfegpssm/base_model.py:78): does P=500 move live CSMC
toward ancestor-trace quality, or is the patchwork incoherence
P-independent as the mechanism predicts?

Protocol: ballbeam C6 live, P in {100, 500}, seeds 0-2, full 4000-iter
workload + protocol eval (P=100 seeds reuse pg_c6_study.json records).

Appends `ballbeam_C6_liveP500_s*` to pg_c6_study.json.
NEVER run concurrently with another TPU process (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax


def main():
    import jax.numpy as jnp

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.utils.timing import hard_sync

    outjson = Path(__file__).parent / "pg_c6_study.json"
    results = json.loads(outjson.read_text())

    for seed in range(3):
        tag = f"ballbeam_C6_liveP500_s{seed}"
        if tag in results:
            print("skip", tag, flush=True)
            continue
        cfg = FFVDConfig(dataset="ballbeam", case=6, iterations=2000,
                         seed=seed, pg_ancestor_trace=False,
                         pg_particles=500)
        model = FFVDModel(cfg, dtype=jnp.float32)
        t0 = time.time()
        model.fit(chunk_size=400)
        hard_sync(model.state.params.x)
        train_s = time.time() - t0
        ev = model.evaluate()
        rec = {"rmse": ev["rmse"], "nll": ev["nll"],
               "train_time_sec": round(train_s, 1),
               "pg_particles": 500}
        results[tag] = rec
        outjson.write_text(json.dumps(results, indent=1))
        print(tag, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
