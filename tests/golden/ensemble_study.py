"""Ensemble (4-chain mixture) eval across the C4 benchmark at TPU speed.

Companion to flutter_c5_chain_study.py's mixture finding (PARITY §2d):
pooling independently-seeded chains with the cross-chain spread term fixes
the method's free-run overconfidence.  This measures it on the headline
benchmark — all six datasets, C4, the full 2000-CLI-iteration protocol per
chain, fp32, one TPU chip — plus flutter C5 (the sampler case that
motivated it), so PARITY §2e can put pooled NLL/RMSE next to the §2
single-chain table and the reference's own numbers.

Writes ensemble_study.json: per dataset {pooled rmse/nll, no-spread nll,
per-chain rmse/nll, train_time}.

Round-3 follow-up (the determinism discovery, PARITY §2e): C4 training is
deterministic given the warm start (different seeds → bit-identical params,
pinned in tests/test_api.py), so the seed-"ensemble" C4 rows above are
really 4×10 pooled rollouts of ONE chain.  Two extra variant rows per C4
dataset separate the mechanisms at matched rollout budget (40):
  <ds>_1chain_n40spread : one chain, evaluate(num_samples=40, spread=True)
                          — 1× train cost; prediction: ≈ the pooled row.
  <ds>_jit4             : 4 chains from init_jitter=1e-3 warm starts —
                          genuinely different optima; does real diversity
                          buy anything over rollout pooling?
Deep × ensemble (`<ds>_deep2_ens4`): 4-seed ensembles of the 2-layer deep
transition (model/deep.py) — deep training is doubly stochastic, so seeds
give genuinely different chains; pooling should combine the deep RMSE gains
(PARITY §2b-deep) with §2e's calibration.

Usage: python tests/golden/ensemble_study.py [targets...]
(targets: dataset names, or '<ds>_1chain_n40spread' / '<ds>_jit4' /
'<ds>_deep2_ens4'; append '_ds64' to a plain/<ds>_C5 target to train the
chains with --collapse_precision ds64 — the round-3 combination probe for
the flutter C5 fp32 residual)
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax.numpy as jnp

OUT = Path(__file__).parent / "ensemble_study.json"
SIX = ["ballbeam", "drive", "gas_furnace", "dryer", "actuator", "flutter"]


def main():
    targets = sys.argv[1:] or (
        SIX + ["flutter_C5"]
        + [f"{d}_1chain_n40spread" for d in SIX]
        + [f"{d}_jit4" for d in SIX])
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.eval import ensemble_evaluate, fit_ensemble

    results = json.loads(OUT.read_text()) if OUT.exists() else {}

    def save(name, rec):
        results[name] = rec
        OUT.write_text(json.dumps(results, indent=1))
        print(name, rec, flush=True)

    for name in targets:
        if name in results:
            print(f"skip {name}", flush=True)
            continue
        t0 = time.time()
        if name.endswith("_1chain_n40spread"):
            ds = name[: -len("_1chain_n40spread")]
            cfg = FFVDConfig(dataset=ds, case=4, iterations=2000, seed=0)
            model = FFVDModel(cfg, dtype=jnp.float32)
            model.fit()
            res = model.evaluate(num_samples=40, spread=True)
            res_ns = model.evaluate(num_samples=40)
            save(name, {"train_time_sec": round(time.time() - t0, 1),
                        "rmse": res["rmse"], "nll": res["nll"],
                        "nll_no_spread": res_ns["nll"]})
            continue
        if name.endswith("_deep2_ens4"):
            ds = name[: -len("_deep2_ens4")]
            cfg = FFVDConfig(dataset=ds, case=4, iterations=2000, seed=0,
                             n_layers=2)
            models = fit_ensemble(cfg, 4, dtype=jnp.float32)
            res = ensemble_evaluate(models)
            save(name, {"train_time_sec": round(time.time() - t0, 1),
                        "rmse": res["rmse"], "nll": res["nll"],
                        "nll_no_spread": res["nll_no_spread"],
                        "per_chain": res["per_chain"]})
            continue
        if name.endswith("_jit4"):
            ds = name[: -len("_jit4")]
            cfg = FFVDConfig(dataset=ds, case=4, iterations=2000, seed=0)
            models = fit_ensemble(cfg, 4, dtype=jnp.float32,
                                  init_jitter=1e-3)
            res = ensemble_evaluate(models)
            save(name, {"train_time_sec": round(time.time() - t0, 1),
                        "rmse": res["rmse"], "nll": res["nll"],
                        "nll_no_spread": res["nll_no_spread"],
                        "per_chain": res["per_chain"]})
            continue
        ds64 = name.endswith("_ds64")
        if ds64:
            name_base = name[: -len("_ds64")]
        else:
            name_base = name
        case = 5 if name_base.endswith("_C5") else 4
        ds = name_base[:-3] if name_base.endswith("_C5") else name_base
        cfg = FFVDConfig(dataset=ds, case=case, iterations=2000, seed=0,
                         collapse_precision="ds64" if ds64 else "native")
        models = fit_ensemble(cfg, 4, dtype=jnp.float32)
        res = ensemble_evaluate(models)
        save(name, {"train_time_sec": round(time.time() - t0, 1),
                    "rmse": res["rmse"], "nll": res["nll"],
                    "nll_no_spread": res["nll_no_spread"],
                    "per_chain": res["per_chain"]})
    print("done", flush=True)


if __name__ == "__main__":
    main()
