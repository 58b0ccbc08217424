"""Is the C2 seed noise an fp32-factorization artifact? (round 5)

The round-5 seed extension (PARITY §2b fn 5) showed ours-fp32 C2 spreads
0.005-0.066 over 9 seeds (median 0.0228) where the fp64 reference's 3
runs spread 0.004-0.012 (median 0.0045), ensemble pooling bounds the
damage without recovering the median, and final-ELBO chain selection is
refuted (the worst chain records the HIGHEST ELBO).  One candidate
mechanism remains measurable: fp32 error in the Kmm factorization that
every one of C2's 21 per-iteration SGHMC gradient evaluations flows
through (the uncollapsed bound has no ds64 coverage — DESIGN §12's bias
study was collapsed-only).

Experiment: rerun the full C2 protocol with ``ds_collapse.ds_precal``
(double-single-refined Kmm factorization, fp32 Precal out — already
built for the eval path) substituted for ``conditionals.kernel_precal``
in the training objective, seeds 20-24, vs 5 fresh native seeds 20-24.
If the dd-precal arm's spread/median tightens toward the reference, the
factorization error is (part of) the mechanism and the wiring ships; if
the two arms are statistically alike, the noise is genuine SGHMC
chain-to-chain variation at fp32 step scale and we document the
negative result.

Appends to c2_precision_study.json.  NEVER run concurrently with
another TPU process (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax


def run_one(seed, ds_factor):
    import jax.numpy as jnp

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.model import conditionals as cond
    from ffvd_tpu.utils.timing import hard_sync

    orig = cond.kernel_precal
    if ds_factor:
        from ffvd_tpu.model.ds_collapse import ds_precal
        cond.kernel_precal = ds_precal
    try:
        cfg = FFVDConfig(dataset="ballbeam", case=2, iterations=2000,
                         seed=seed)
        model = FFVDModel(cfg, dtype=jnp.float32)
        t0 = time.time()
        model.fit(chunk_size=500)
        hard_sync(model.state.params.x)
        train_s = time.time() - t0
        ev = model.evaluate()
        return {"rmse": ev["rmse"], "nll": ev["nll"],
                "final_elbo": -float(model.nll_trace[-1]),
                "train_time_sec": round(train_s, 1)}
    finally:
        cond.kernel_precal = orig


def main():
    outjson = Path(__file__).parent / "c2_precision_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}
    for seed in range(20, 25):
        for arm, ds_factor in (("native", False), ("dsprecal", True)):
            tag = f"ballbeam_C2_{arm}_s{seed}"
            if tag in results:
                print("skip", tag, flush=True)
                continue
            rec = run_one(seed, ds_factor)
            results[tag] = rec
            outjson.write_text(json.dumps(results, indent=1))
            print(tag, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
