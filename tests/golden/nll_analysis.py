"""Join nll_study.py results with the reference artifacts and attribute the
residual NLL factor (VERDICT round-3 item 2).

In the overconfident free-run regime NLL ≈ mean(err²/2v̂) + ½·mean(log v̂);
with comparable errors the population NLL ratio tracks the predictive-
variance scale, which at escaped rollout states is dominated by the prior
GP variance through the emission map: B = Σ_d σ_d²·C_d² (+ R).  This script
prints, per dataset:
  - reference: B, Q, R from its saved full run (tf_ref_<ds>_results.npz),
    its saved v̂[:30] mean, and its seed-population NLL
    (tf_reference_e2e.json);
  - ours (slip-mode seeds, nll_study.json): B, Q, R, v̂[:30] mean,
    err²[:30] mean, NLL;
  - the predicted NLL ratio from the variance budgets vs the observed one.

Pure CPU/numpy — safe to run any time.
"""

import json
import sys
from pathlib import Path

import numpy as np

HERE = Path(__file__).parent


def ref_budget(ds):
    f = np.load(HERE / f"tf_ref_{ds}_results.npz")
    lv = np.ravel(f["k_log_variances"])
    c = np.asarray(f["CC_val"])
    b = float((np.exp(lv)[:, None] * c * c).sum())
    q = np.exp(np.ravel(f["log_QQ"]))
    r = float(np.exp(2 * np.ravel(f["log_R_cholesky"]))[0])
    v30 = float(np.asarray(f["v_test_vfe_var"])[:30].mean())
    yt = np.ravel(f["Y_test_data"])[:30]
    yp = np.ravel(f["y_test_vfe"])[:30]
    err30 = float(((yt - yp) ** 2).mean())
    return b, q, r, v30, err30


def main():
    study = json.loads((HERE / "nll_study.json").read_text())
    ref_e2e = json.loads((HERE / "tf_reference_e2e.json").read_text())

    for ds in ("drive", "flutter"):
        ours = {k: v for k, v in study.items() if k.startswith(ds)}
        if not ours:
            print(f"{ds}: no study runs yet")
            continue
        b_r, q_r, r_r, v30_r, err30_r = ref_budget(ds)
        ref_nlls = [v["nll_metric"] for k, v in ref_e2e.items()
                    if k.startswith(f"{ds}_C4") and "nll_metric" in v]
        print(f"== {ds}")
        print(f"  reference: B={b_r:.3f} v30={v30_r:.3f} err30={err30_r:.3f} "
              f"Q={np.array2string(q_r, precision=2, formatter={'float': lambda x: f'{x:.1e}'})} "
              f"R={r_r:.1e} NLL(seeds)={sorted(round(x) for x in ref_nlls)}")
        for tag, rec in sorted(ours.items()):
            print(f"  {tag}: B={rec['budget_s2C2']:.3f} "
                  f"v30={rec['v30_mean']:.3f} err30={rec['err30_sq_mean']:.3f} "
                  f"Q={np.array2string(np.asarray(rec['Q']), precision=2, formatter={'float': lambda x: f'{x:.1e}'})} "
                  f"R={rec['R'][0]:.1e} NLL={rec['nll']:.0f} "
                  f"RMSE={rec['rmse']:.3f}")
        v_ours = np.mean([r["v30_mean"] for r in ours.values()])
        e_ours = np.mean([r["err30_sq_mean"] for r in ours.values()])
        nll_ours = np.median([r["nll"] for r in ours.values()])
        pred_ratio = (err30_r / v30_r) / max(e_ours / v_ours, 1e-30)
        obs_ratio = (np.median(ref_nlls) / nll_ours) if ref_nlls else float("nan")
        print(f"  -> overconfidence-term ratio (err/v, ref÷ours) = "
              f"{pred_ratio:.2f}; observed median-NLL ratio = {obs_ratio:.2f}")


if __name__ == "__main__":
    main()
