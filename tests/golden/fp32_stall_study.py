"""fp32 optimum-stall discrimination study (round 3, post-NLL-closure).

The NLL attribution (PARITY §2a round-3 closure) named the mechanism for the
residual fp32-vs-fp64 gap: fp32 training stalls at a looser posterior-variance
optimum (drive v̂[0] 6.9e-4 vs fp64 5.7e-5; flutter 5.2e-3 vs 3.8e-5).  Two
candidate sub-mechanisms predict different fixes:

  (a) EQUILIBRIUM WIDTH — Adam at lr 3e-3 random-walks in the fp32 gradient
      noise; the stationary distribution around the (correctly sensed)
      optimum is wide.  Prediction: a polish phase at lr/10 (production fp32
      speed) tightens v̂[0] toward the fp64 floor; merely training 3× longer
      at the same lr does not.
  (b) GRADIENT BIAS — fp32 factorization error systematically biases the
      gradient near the optimum.  Prediction: neither longer training nor a
      smaller lr moves v̂[0]; only higher-precision arithmetic does.

This script runs, per dataset (drive, flutter; C4, slip mode, fp32, TPU):
  long12k : 12000 iters @ default lr           (3x the reference workload)
  polish  : 4000 iters @ default + 4000 @ lr/10
  polish2 : 4000 @ default + 2000 @ lr/10 + 2000 @ lr/100

recording (rmse, nll, v_first, v30_mean, Q) into fp32_stall_study.json,
comparable to nll_study.json's fp32 seeds (base) and *_slip_fp64cpu_s1 (target).

Control: the same variants at fp64 on CPU (FFVD_STALL_FP64CPU=1, tags
``*_fp64cpu``) discriminate "fp32 gradient bias" from "the longer protocol
genuinely overfits the 30-step free-run at any precision".

Round-3 addendum: FFVD_STALL_DS64=1 (tags ``*_ds64``) runs the long12k
variant with collapse_precision="ds64" — the double-single TPU
implementation of the "whole segment in high precision" design that
fp32_mixed_control.py validated with fp64 on CPU.  Success = the ds64 run
lands in the mixed/fp64 bracket (budget ~1.2-1.5, v_first ≤ ~3e-4) at TPU
speed; train_time_sec gives the ds64-vs-native throughput cost directly.

Round-4 addendum: FFVD_STALL_DS64R1=1 (tags ``*_ds64r1``) runs the
long12k ds64 arm with chol_and_inv refine=1 — the budget-validation half
of the refine=1 productionization (VERDICT r3 item 1).  Success = the
fp64-bracket budget of the ``*_ds64`` arm at ~half its train time.

Usage: [FFVD_STALL_FP64CPU=1|FFVD_STALL_DS64=1|FFVD_STALL_DS64R1=1]
       python tests/golden/fp32_stall_study.py [datasets...]
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

FP64CPU = os.environ.get("FFVD_STALL_FP64CPU", "0") == "1"
if FP64CPU:
    # must precede any jax import (see tests/conftest.py on why both)
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax

if FP64CPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def _record(model, train_s):
    ev = model.evaluate()
    p = model.params
    lv = np.ravel(np.asarray(p.kernel.log_variance, np.float64))
    c = np.asarray(p.c, np.float64)
    pv = np.asarray(ev["predict_y_var"])
    return {
        "rmse": ev["rmse"], "nll": ev["nll"],
        "train_time_sec": round(train_s, 1),
        "budget_s2C2": float((np.exp(lv)[:, None] * c * c).sum()),
        "Q": np.exp(np.asarray(p.log_q, np.float64)).tolist(),
        "v_first": float(np.ravel(pv)[0]),
        "v30_mean": float(pv[:30].mean()),
        "err30_sq_mean": float(((np.asarray(ev["predict_y"])[:30]
                                 - model.dataset.y_test[:30]) ** 2).mean()),
    }


def main():
    datasets = sys.argv[1:] or ["drive", "flutter"]
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.trainer import Trainer

    outjson = Path(__file__).parent / "fp32_stall_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    def save(tag, rec):
        results[tag] = rec
        outjson.write_text(json.dumps(results, indent=1))
        print(tag, rec, flush=True)

    ds64r1 = os.environ.get("FFVD_STALL_DS64R1", "0") == "1"
    ds64 = os.environ.get("FFVD_STALL_DS64", "0") == "1" or ds64r1
    dtype = jnp.float64 if FP64CPU else jnp.float32
    suffix = ("_fp64cpu" if FP64CPU
              else ("_ds64r1" if ds64r1 else ("_ds64" if ds64 else "")))

    for ds in datasets:
        cfg = FFVDConfig(dataset=ds, case=4, iterations=2000, seed=1,
                         rollout_qsqrt_dim0=True,
                         ds64_refine=1 if ds64r1 else None,
                         collapse_precision="ds64" if ds64 else "native")

        tag = f"{ds}_long12k_s1{suffix}"
        if tag not in results:
            model = FFVDModel(cfg, dtype=dtype)
            t0 = time.time()
            model.fit(12000)
            save(tag, _record(model, time.time() - t0))

        if ds64:
            continue      # the ds64 arm only needs the long12k discriminator
        for name, phases in (("polish", ((4000, 1.0), (4000, 0.1))),
                             ("polish2", ((4000, 1.0), (2000, 0.1),
                                          (2000, 0.01)))):
            tag = f"{ds}_{name}_s1{suffix}"
            if tag in results:
                continue
            model = FFVDModel(cfg, dtype=dtype)
            t0 = time.time()
            for n_it, lr_factor in phases:
                if lr_factor != 1.0:
                    cfg_p = dataclasses.replace(
                        cfg, adam_lr=cfg.adam_lr * lr_factor)
                    model.trainer = Trainer(cfg_p, model.data)
                model.fit(n_it)
            save(tag, _record(model, time.time() - t0))

    print("done", flush=True)


if __name__ == "__main__":
    main()
