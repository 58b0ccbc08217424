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
Usage: python tests/golden/ensemble_study.py [datasets...]
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
    targets = sys.argv[1:] or SIX + ["flutter_C5"]
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.eval import ensemble_evaluate, fit_ensemble

    results = json.loads(OUT.read_text()) if OUT.exists() else {}
    for name in targets:
        if name in results:
            print(f"skip {name}", flush=True)
            continue
        case = 5 if name.endswith("_C5") else 4
        ds = name[:-3] if name.endswith("_C5") else name
        cfg = FFVDConfig(dataset=ds, case=case, iterations=2000, seed=0)
        t0 = time.time()
        models = fit_ensemble(cfg, 4, dtype=jnp.float32)
        res = ensemble_evaluate(models)
        rec = {"train_time_sec": round(time.time() - t0, 1),
               "rmse": res["rmse"], "nll": res["nll"],
               "nll_no_spread": res["nll_no_spread"],
               "per_chain": res["per_chain"]}
        results[name] = rec
        OUT.write_text(json.dumps(results, indent=1))
        print(name, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
