"""C6 (particle Gibbs) statistical validation at benchmark scale (round 4).

VERDICT r3 item 4: the CSMC samplers are unit-validated against exact
Kalman/RTS on toy models, but the full-scale picture had only 6 live-CSMC
seeds (RMSE 0.03-0.68) and 2 ancestor-trace seeds, with no mixing
diagnostics — "the price of actually injecting resampled trajectories" was
asserted, not measured.

This script runs the FULL C6 workload (4000 outer iterations + 10-sample
eval, fp32, one TPU chip) for:
  - ancestor-traced CSMC (``--pg_ancestor_trace``), seeds 0-4,
    ballbeam + drive,
  - live reference-style CSMC, seeds 0-4, ballbeam (drive optional),
recording per-run RMSE/NLL/time plus MIXING DIAGNOSTICS sampled every 400
iterations via ``make_pg_fn(cfg, with_stats=True)`` side-sweeps on the
current parameters (statistically equivalent to instrumenting the in-loop
sweeps — each sweep is an iid CSMC pass given the state):
  ref_survival   fraction of time steps where the reference particle
                 survives resampling into the free pool,
  unique_frac    mean fraction of distinct pool members selected per step
                 (degeneracy monitor; 1/P = full collapse),
  accepted       whether the sweep would replace X with a non-reference
                 trajectory,
  dx_mean_abs / dx_frac_moved   X update magnitude.

Reference context: PG_for_X_speedup (/root/reference/vfegpssm/
base_model.py:78-141) — which never actually updates X upstream (the
assign at :137 is dead, SURVEY §2.7), so the reference has no comparable
statistics at all; its "C6" numbers are frozen-X numbers.

Results append to pg_c6_study.json.  Usage:
  python tests/golden/pg_c6_study.py [ancestor|live] [datasets...]
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np


def main():
    import jax.numpy as jnp

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.particle_gibbs import make_pg_fn

    args = sys.argv[1:]
    styles = [a for a in args if a in ("ancestor", "live")] or ["ancestor",
                                                                "live"]
    datasets = [a for a in args if a not in ("ancestor", "live")]

    outjson = Path(__file__).parent / "pg_c6_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    jobs = []
    for style in styles:
        dss = datasets or (["ballbeam", "drive"] if style == "ancestor"
                           else ["ballbeam"])
        for ds in dss:
            for seed in range(5):
                jobs.append((style, ds, seed))

    for style, ds, seed in jobs:
        tag = f"{ds}_C6_{style}_s{seed}"
        if tag in results:
            print(f"skip {tag}", flush=True)
            continue
        cfg = FFVDConfig(dataset=ds, case=6, iterations=2000, seed=seed,
                         pg_ancestor_trace=(style == "ancestor"))
        model = FFVDModel(cfg, dtype=jnp.float32)
        stats_fn = jax.jit(make_pg_fn(cfg, with_stats=True))
        key = jax.random.key(1000 + seed)
        sweep_log = []
        t0 = time.time()
        done = 0
        total = cfg.total_iterations
        while done < total:
            n = min(400, total - done)
            model.fit(n, chunk_size=n)
            done += n
            key, sub = jax.random.split(key)
            _, st = stats_fn(model.params, sub, model.data)
            sweep_log.append({k: round(float(v), 5) for k, v in st.items()})
        # TIMING RULE (TODO.md): block_until_ready is a no-op on axon — the
        # float() readbacks in each sweep probe already force a sync per
        # 400-iter segment, but pin the tail explicitly.
        from ffvd_tpu.utils.timing import hard_sync
        hard_sync(model.state.params.x)
        train_s = time.time() - t0
        ev = model.evaluate()
        agg = {k: round(float(np.mean([s[k] for s in sweep_log])), 5)
               for k in sweep_log[0]}
        rec = {
            "rmse": ev["rmse"], "nll": ev["nll"],
            "train_time_sec": round(train_s, 1),
            "sweeps_sampled": len(sweep_log),
            "mixing_mean": agg,
            "mixing_last": sweep_log[-1],
            "mixing_seq": sweep_log,
        }
        results[tag] = rec
        outjson.write_text(json.dumps(results, indent=1))
        print(tag, {k: rec[k] for k in ("rmse", "nll", "train_time_sec")},
              "mix", agg, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
