"""NLL residual-factor study (round-3, VERDICT item 2).

Round 2 established the q_sqrt-dim0 slip as the main NLL mechanism but left
a residual gap: our slip-compat NLL population sits 3-5x BELOW the
reference's (drive 125-241 vs 575-4378; flutter 18-199 vs 289-1267).  The
free-run predictive variance at escaped rollout states is dominated by the
prior GP variance through the emission map — the budget B = Σ_d σ_d²·C_d²
(+R) — so if the two implementations' *learned parameter populations* differ
in B, the NLL populations must differ by ≈ the same factor (overconfident
regime: NLL ≈ mean err²/2v).

This script runs our full slip-mode workload on drive/flutter for 3 seeds,
saves full-parameter results npz per run, and records (rmse, nll, B, Q, R,
mean v̂[:30]) so the factor can be attributed.  Compare against the
reference's saved runs (tests/golden/tf_ref_<ds>_results.npz) and its seed
metrics (tf_reference_e2e.json).

Usage: python tests/golden/nll_study.py [datasets...]   (default drive flutter)
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    datasets = sys.argv[1:] or ["drive", "flutter"]
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    outdir = Path(__file__).parent
    outjson = outdir / "nll_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    for ds in datasets:
        for seed in (1, 2, 3):
            tag = f"{ds}_slip_seed{seed}"
            if tag in results:
                print(f"skip {tag} (done)", flush=True)
                continue
            cfg = FFVDConfig(dataset=ds, case=4, iterations=2000, seed=seed,
                             rollout_qsqrt_dim0=True)
            model = FFVDModel(cfg, dtype=jnp.float32)
            model.fit()
            ev = model.evaluate()
            p = model.params
            lv = np.ravel(np.asarray(p.kernel.log_variance, np.float64))
            c = np.asarray(p.c, np.float64)
            budget = float((np.exp(lv)[:, None] * c * c).sum())
            rec = {
                "rmse": ev["rmse"], "nll": ev["nll"],
                "budget_s2C2": budget,
                "Q": np.exp(np.asarray(p.log_q, np.float64)).tolist(),
                "R": (np.asarray(p.rchol_diag, np.float64) ** 2).tolist(),
                "v30_mean": float(np.asarray(ev["predict_y_var"])[:30].mean()),
                "err30_sq_mean": float(((np.asarray(ev["predict_y"])[:30]
                                         - model.dataset.y_test[:30]) ** 2
                                        ).mean()),
            }
            model.save_results(outdir / f"ours_{tag}_results.npz")
            results[tag] = rec
            outjson.write_text(json.dumps(results, indent=1))
            print(tag, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
