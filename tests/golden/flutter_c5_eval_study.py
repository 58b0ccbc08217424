"""flutter×C5 fp32 residual study: is the 1.6× RMSE gap vs fp64 eval noise?

Round-3 escape validation left flutter C5 fp32 at median RMSE 1.19 over 5
seeds vs single-seed fp64 anchors 0.672 (ours) / 0.768 (reference) — within
flutter's seed spread but a gap in expectation (TODO.md round-4 candidate).
One listed candidate mechanism is cheap to test: the eval averages only
num=10 thinned posterior samples (spacing 32); if per-sample predictions are
noisy, the mean prediction's RMSE improves with more averaging at production
(fp32 TPU) speed.

Per seed 0-4: train the full C5 workload once, then evaluate the SAME chain
three ways — (num=10, spacing=32) the protocol default, (num=30, spacing=32)
3x averaging, (num=10, spacing=128) 4x decorrelation.  If neither moves the
median toward the fp64 bracket, the residual is in the trained chain itself
(consistent with the fp32 gradient-bias finding of fp32_stall_study.py), not
in the eval.

Usage: python tests/golden/flutter_c5_eval_study.py
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax.numpy as jnp
import numpy as np


def _eval(model, num, spacing):
    from ffvd_tpu.eval import collect_posterior, predict_summary, rmse_nll
    import jax

    model.key, sub = jax.random.split(model.key)
    xs, vs, model.state = collect_posterior(
        model.trainer, model.state, model.dataset.n_test, sub,
        num=num, spacing=spacing)
    py, pv, _ = predict_summary(model.params, xs, vs,
                                model.cfg.emission_noise)
    rmse, nll = rmse_nll(jnp.asarray(model.dataset.y_test, model.dtype),
                         py, pv, model.dataset.y_train_std, horizon=30)
    return {"rmse": float(rmse), "nll": float(nll)}


def main():
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    outjson = Path(__file__).parent / "flutter_c5_eval_study.json"
    results = json.loads(outjson.read_text()) if outjson.exists() else {}

    for seed in (0, 1, 2, 3, 4):
        tag = f"flutter_C5_s{seed}"
        if tag in results:
            print(f"skip {tag}", flush=True)
            continue
        cfg = FFVDConfig(dataset="flutter", case=5, iterations=2000,
                         seed=seed)
        model = FFVDModel(cfg, dtype=jnp.float32)
        t0 = time.time()
        model.fit()
        rec = {"train_time_sec": round(time.time() - t0, 1),
               "n10_s32": _eval(model, 10, 32),
               "n30_s32": _eval(model, 30, 32),
               "n10_s128": _eval(model, 10, 128)}
        results[tag] = rec
        outjson.write_text(json.dumps(results, indent=1))
        print(tag, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
