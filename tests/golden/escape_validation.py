"""Validate the fp32 sampler-escape fix e2e (VERDICT round-3 item 1).

Full workload (C5, 4000 iterations + 10-sample eval) on one TPU chip, fp32,
with the round-3 guards at their defaults (sghmc_log_clip=12, p_clip=1):
  - flutter C5 seeds 0-2  (round 2: diverged to RMSE 1531 / 1.6e6)
  - ballbeam C5 seeds 0-4 (round 2: one of 5 seeds escaped to 0.2209)

Records rmse/nll/train-time plus the final sampled-hyper ranges and whether
any leaf sits on the clip (saturation = fix failed).  Done-criterion
(VERDICT): flutter RMSE within the fp64 bracket (≲1.0; fp64 anchors ours
0.672 / ref 0.768), no clip saturation; ballbeam escape seed gone.

Round-3 addendum: FFVD_ESCAPE_DS64=1 (tags ``*_ds64``) reruns with
--collapse_precision ds64 — C5's bound is collapsed, so the sampler's 21
hyper-gradient evaluations per iteration get the double-single segment
(DESIGN §13).  Question: does the unbiased bound narrow the residual gap
to the fp64 anchors (flutter median 1.19 fp32 vs 0.672/0.768 fp64)?

Round-4 arms (FFVD_ESCAPE_MODE=...):
  ds64r1 (tags ``*_ds64r1``): collapse_precision=ds64 with chol_and_inv
    refine=1 — the productionization candidate (VERDICT r3 item 1; probed
    1.91x end-to-end at same-optimum convergence, ds64_profile.json
    r3_refine).  Success = same seed statistics as the refine=2 ``*_ds64``
    arm (median inside the fp64 bracket) at ~half the train time.
  hybrid (tags ``*_hybrid``): collapse_precision=hybrid — native fp32
    burn-in, ds64(refine=1) for the last cfg.hybrid_tail_iters=500 outer
    iterations + eval (VERDICT r3 item 3).  Success = 5-seed median <=0.85
    at <=5x the native-fp32 train time (~30 s).

Usage: [FFVD_ESCAPE_DS64=1 | FFVD_ESCAPE_MODE=ds64r1|hybrid]
       python tests/golden/escape_validation.py [datasets...]
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jobs = {"flutter": (0, 1, 2, 3, 4), "ballbeam": (0, 1, 2, 3, 4)}
    if len(sys.argv) > 1:
        jobs = {d: jobs[d] for d in sys.argv[1:]}

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    outjson = Path(__file__).parent / "escape_validation.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    mode = os.environ.get("FFVD_ESCAPE_MODE", "")
    if os.environ.get("FFVD_ESCAPE_DS64", "0") == "1":
        mode = "ds64"
    cfg_kw = {
        "": dict(collapse_precision="native"),
        "ds64": dict(collapse_precision="ds64"),
        "ds64r1": dict(collapse_precision="ds64", ds64_refine=1),
        "hybrid": dict(collapse_precision="hybrid", ds64_refine=1),
    }[mode]
    suffix = f"_{mode}" if mode else ""
    # hybrid tail-length sweep: FFVD_ESCAPE_TAIL=<iters> (default 500);
    # non-default tails get their own tag (e.g. *_hybrid1000).
    tail = int(os.environ.get("FFVD_ESCAPE_TAIL", "500"))
    if mode == "hybrid":
        cfg_kw["hybrid_tail_iters"] = tail
        if tail != 500:
            suffix = f"_hybrid{tail}"
    for ds, seeds in jobs.items():
        for seed in seeds:
            tag = f"{ds}_C5_s{seed}{suffix}"
            if tag in results:
                print(f"skip {tag}", flush=True)
                continue
            cfg = FFVDConfig(dataset=ds, case=5, iterations=2000, seed=seed,
                             **cfg_kw)
            model = FFVDModel(cfg, dtype=jnp.float32)
            t0 = time.time()
            model.fit()
            # hard boundary: don't let the last chunk's execution leak into
            # the eval timing (block_until_ready is a no-op on axon —
            # ffvd_tpu/utils/timing.py)
            from ffvd_tpu.utils.timing import hard_sync
            hard_sync(model.state.params.x)
            t1 = time.time()
            ev = model.evaluate()
            p = model.params
            lv = np.asarray(p.kernel.log_variance, np.float64)
            ls = np.asarray(p.kernel.log_lengthscales, np.float64)
            lo, hi = cfg.log_clip_bounds
            sat = any(bool(a.max() >= hi - 1e-3 or a.min() <= lo + 1e-3)
                      for a in (lv, ls))
            rec = {
                "rmse": ev["rmse"], "nll": ev["nll"],
                "train_time_sec": round(t1 - t0, 1),
                "log_var": lv.tolist(),
                "log_ls_minmax": [float(ls.min()), float(ls.max())],
                "clip_saturated": sat,
            }
            results[tag] = rec
            outjson.write_text(json.dumps(results, indent=1))
            print(tag, {k: rec[k] for k in
                        ("rmse", "nll", "train_time_sec", "clip_saturated")},
                  "lv", np.round(lv, 2).tolist(), flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
