"""Deep-transition evidence batch (round-3: VERDICT items 3 and 6).

Sequentially runs (one TPU process, resumable via the JSON record):
  A. deep-2 seed fill: 3 seeds for every dataset currently at < 3 seeds
     (gas_furnace, dryer, ballbeam; actuator gets a 3rd baseline seed);
  B. actuator regression study: deep-2 with hidden init var_scale
     ∈ {0.25, 0.0625} × 3 seeds (hypothesis: injected inter-layer noise
     pushes the warm-started head off its basin on the shortest/noisiest
     dataset), plus shallow re-anchors over the same seeds;
  C. depth sweep: deep-3 and deep-4 on flutter and drive (1 seed each) —
     is "2 layers is the sweet spot" flutter-only?

Usage: python tests/golden/deep_study.py [phase ...]   (default: A B C)
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp


def run_one(tag, results, outjson, **cfg_kw):
    if tag in results:
        print(f"skip {tag}", flush=True)
        return
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    import time
    cfg = FFVDConfig(iterations=2000, **cfg_kw)
    model = FFVDModel(cfg, dtype=jnp.float32)
    t0 = time.time()
    model.fit()
    t1 = time.time()
    ev = model.evaluate()
    rec = {"rmse": ev["rmse"], "nll": ev["nll"],
           "train_time_sec": round(t1 - t0, 1),
           "cfg": {k: v for k, v in cfg_kw.items()}}
    results[tag] = rec
    outjson.write_text(json.dumps(results, indent=1))
    print(tag, {k: rec[k] for k in ("rmse", "nll", "train_time_sec")},
          flush=True)


def main():
    phases = sys.argv[1:] or ["A", "B", "C"]
    outjson = Path(__file__).parent / "deep_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    if "A" in phases:
        for ds, seeds in [("gas_furnace", (1, 2)), ("dryer", (1, 2)),
                          ("ballbeam", (2,)), ("actuator", (2,)),
                          ("flutter", ()), ("drive", ())]:
            for seed in seeds:
                run_one(f"{ds}_deep2_s{seed}", results, outjson,
                        dataset=ds, case=4, n_layers=2, seed=seed)

    if "B" in phases:
        for scale, label in [(0.25, "q"), (0.0625, "s")]:
            for seed in (0, 1, 2):
                run_one(f"actuator_deep2_vs{label}_s{seed}", results, outjson,
                        dataset="actuator", case=4, n_layers=2, seed=seed,
                        deep_hidden_init_scale=scale)
        for seed in (0, 1, 2):
            run_one(f"actuator_shallow_s{seed}", results, outjson,
                    dataset="actuator", case=4, seed=seed)

    if "C" in phases:
        for ds in ("flutter", "drive"):
            for nl in (3, 4):
                run_one(f"{ds}_deep{nl}_s0", results, outjson,
                        dataset=ds, case=4, n_layers=nl, seed=0)

    print("done", flush=True)


if __name__ == "__main__":
    main()
