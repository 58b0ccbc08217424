"""Calibrated free-run uncertainty: spread-mode eval and chain ensembles.

Both this framework's protocol estimator and the reference's
(base_model.py:334-343) average only within-rollout variances, so the
30-step free-run NLL explodes into the thousands after full training
(PARITY.md §2).  Keeping the mixture's spread-of-means term fixes it
(PARITY.md §2e).  This example shows the three tiers:

  1. single chain, spread-mode eval       (1x train cost; right for C1/C4,
                                           whose training is deterministic)
  2. seed ensemble                        (Kx cost; right for SGHMC/PG
                                           cases, where seeds give genuinely
                                           different chains)
  3. jittered ensemble                    (Kx cost; genuine multi-optimum
                                           diversity for deterministic cases)

Run:  python examples/08_ensemble_calibration.py  [--cpu]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from ffvd_tpu import FFVDConfig
from ffvd_tpu.api import FFVDModel
from ffvd_tpu.eval import ensemble_evaluate, fit_ensemble

ITERS = 500        # demo-sized; the benchmark protocol is 2000
ITERS_SGHMC = 150  # C5 runs 21 grad evals/iteration — keep the CPU demo
                   # short (~0.6 s/iter on CPU; ~5 ms/iter on one TPU chip)

# --- 1. single chain + spread-mode eval (C4 is deterministic) -----------
cfg = FFVDConfig(dataset="ballbeam", case=4, iterations=ITERS)
model = FFVDModel(cfg)
model.fit()
plain = model.evaluate()
spread = model.evaluate(num_samples=40, spread=True)
print(f"single chain   : RMSE {plain['rmse']:.4f}  NLL {plain['nll']:.1f}")
print(f"  + spread eval: RMSE {spread['rmse']:.4f}  NLL {spread['nll']:.2f}"
      "   <- calibrated")

# --- 2. seed ensemble on a sampler case (chains genuinely differ) -------
cfg5 = FFVDConfig(dataset="ballbeam", case=5, iterations=ITERS_SGHMC)
models = fit_ensemble(cfg5, 2)
res = ensemble_evaluate(models)
chains = "/".join(f"{c['rmse']:.4f}" for c in res["per_chain"])
print(f"C5 seed ens(2) : RMSE {res['rmse']:.4f} (chains {chains})  "
      f"NLL {res['nll']:.2f} (no-spread {res['nll_no_spread']:.0f})")

# --- 3. jittered ensemble (diversity for the deterministic case) --------
jit_models = fit_ensemble(cfg, 2, init_jitter=1e-3)
jres = ensemble_evaluate(jit_models)
print(f"C4 jit ens(2)  : RMSE {jres['rmse']:.4f}  NLL {jres['nll']:.2f}")
