"""Rollout-draw spread at the drive 12k ds64(refine=1) trained point.

The round-4 budget validation (`fp32_stall_study.json drive_long12k_s1_ds64r1`)
landed the training-determined quantities inside the fp64 bracket (budget
1.2254 in [mixed 1.211, fp64 1.493]; Q ~ 1e-6) but its single free-run draw
evaluated RMSE 4.38 — outside the 0.89/1.63 two-draw spread §2f recorded at
the refine=2 point.  PARITY §2f already established that single-rollout RMSE
at 12k-overtrained points has large draw variance and pinned the
training-determined quantities instead; this probe quantifies the draw
distribution at the refine=1 point: retrain (same seed/protocol), then
evaluate SIX independent 10-sample rollouts.

Appends to fp32_stall_study.json under drive_long12k_s1_ds64r1 as
"rmse_draws"/"nll_draws".  Usage: python tests/golden/ds64r1_eval_spread.py
Run ONLY when nothing else uses the TPU chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

HERE = Path(__file__).resolve().parent


def main():
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    cfg = FFVDConfig(dataset="drive", case=4, iterations=2000, seed=1,
                     rollout_qsqrt_dim0=True, ds64_refine=1,
                     collapse_precision="ds64")
    model = FFVDModel(cfg, dtype=jnp.float32)
    t0 = time.time()
    model.fit(12000)
    print("retrained 12k in", round(time.time() - t0, 1), "s", flush=True)
    rmses, nlls = [], []
    for _ in range(6):
        ev = model.evaluate()
        rmses.append(round(ev["rmse"], 4))
        nlls.append(round(ev["nll"], 4))
        print("draw:", rmses[-1], nlls[-1], flush=True)

    path = HERE / "fp32_stall_study.json"
    d = json.loads(path.read_text())
    rec = d["drive_long12k_s1_ds64r1"]
    rec["rmse_draws"] = rmses
    rec["nll_draws"] = nlls
    path.write_text(json.dumps(d, indent=1))
    print("updated", path)


if __name__ == "__main__":
    main()
