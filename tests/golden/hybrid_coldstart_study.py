"""Decide the hybrid precision mode's fate (VERDICT r4 item 7 / weak #7).

``collapse_precision="hybrid"`` (native fp32 burn-in + ds64 tail) was
REFUTED for warm-started C5 retrains (PARITY §2d round-4 addendum: the
Factnonlin warm start already sits in the near-optimum regime, so biased
fp32 gradients act from iteration 0).  TODO kept the mode for "cold-start
protocols where burn-in genuinely passes through a far-from-optimum
phase" — an untested rationale.  This script tests it.

Protocol: the cold-start config of examples/04_synthetic_cold_start.py
(generated kink dynamics, random init, C4, M=20, D=1), 4000 iterations,
5 seeds x 3 arms:
  native      pure fp32 collapsed bound
  ds64        full ds64 bound (the accuracy reference)
  hybrid      native for 3500 + ds64 for the last 500 (the kept use case)
recording final nll (under BOTH bounds for comparability), learned Q,
eval RMSE at horizons 1/5, and wall-clock.

Decision rule (encoded in the pin test): hybrid stays iff its final
ds64-bound nll / learned Q land measurably closer to the ds64 arm than
native's do (the tail bought something); otherwise the mode is deleted.

Writes hybrid_coldstart_study.json.  NEVER run concurrently with another
TPU process (single tunneled chip).
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
    from ffvd_tpu.data.synthetic import generate_kink
    from ffvd_tpu.model.params import init_params_random
    from ffvd_tpu.utils.timing import hard_sync

    outjson = Path(__file__).parent / "hybrid_coldstart_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    TOTAL, TAIL = 4000, 500

    def build(seed, precision):
        ds = generate_kink(n=120, seed=seed)
        params = init_params_random(jax.random.key(seed), n=ds.n_train,
                                    x_dim=1, m=20, control_dim=0)
        cfg = FFVDConfig(case=4, num_inducing=20, x_dim=1,
                         collapse_precision=precision,
                         hybrid_tail_iters=TAIL, iterations=TOTAL // 2)
        return FFVDModel(cfg, dataset=ds, params=params, dtype=jnp.float32)

    def ds64_bound_nll(model):
        """Evaluate the trained point under the ds64 bound — one common
        ruler for all arms (the fp32 bound under-reports near the
        optimum; DESIGN §12)."""
        from ffvd_tpu.inference.trainer import Trainer
        cfg64 = FFVDConfig(case=4, num_inducing=20, x_dim=1,
                           collapse_precision="ds64")
        tr = Trainer(cfg64, model.data)
        return float(tr.nll_fn(model.state.params, model.data))

    for seed in range(5):
        for arm in ("native", "ds64", "hybrid"):
            tag = f"kink_cold_{arm}_s{seed}"
            if tag in results:
                print("skip", tag, flush=True)
                continue
            model = build(seed, arm)
            t0 = time.time()
            model.fit(TOTAL, chunk_size=1000)
            hard_sync(model.state.params.x)
            train_s = time.time() - t0
            ev1 = model.evaluate_quick(num_samples=10, horizon=1)
            ev5 = model.evaluate_quick(num_samples=10, horizon=5)
            rec = {
                "nll_final_own_bound": round(float(model.nll_trace[-1]), 6),
                "nll_final_ds64_bound": round(ds64_bound_nll(model), 6),
                "Q": [round(float(q), 9)
                      for q in np.exp(np.asarray(model.params.log_q))],
                "rmse_h1": round(ev1["rmse"], 5),
                "rmse_h5": round(ev5["rmse"], 5),
                "train_time_sec": round(train_s, 1),
            }
            results[tag] = rec
            outjson.write_text(json.dumps(results, indent=1))
            print(tag, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
