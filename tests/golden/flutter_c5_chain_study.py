"""flutter×C5 fp32 chain-side study: epsilon tempering and multi-chain mixture.

flutter_c5_eval_study.py ruled the eval out: 3x sample averaging (num=30)
and 4x decorrelation (spacing=128) both leave the 5-seed median RMSE at
~1.1-1.2 vs the fp64 anchors 0.672 (ours) / 0.768 (reference).  The residual
is the trained chain.  This script tests the two cheapest chain-side levers
at production (fp32 TPU) speed:

  temper   : per seed 0-4, train 1500 iters at epsilon=0.01 (protocol
             default, FFVD_Main.py:343) then 500 iters at epsilon/3.
             SGHMC's stationary distribution widens with epsilon; if the
             fp32 residual is sampler temperature, annealing tightens the
             chain around its mode.  If it is the fp32 gradient-bias floor
             (fp32_stall_study.py's finding for the Adam case), it won't.
  mixture  : 4 independent chains (seeds 100-103), full 2000-iter protocol
             each, 10 posterior samples per chain, predictions pooled as an
             equal-weight mixture (per-chain emission params applied before
             pooling).  flutter seeds land in visibly different
             log-variance modes (escape_validation.json), so a mixture can
             beat the median seed without beating the best one.  Records
             per-chain RMSE, protocol-style pooled moments (no cross-chain
             mean-spread term, matching predict_summary's within-chain
             estimator), and pooled+spread moments.

Writes flutter_c5_chain_study.json.
Usage: python tests/golden/flutter_c5_chain_study.py [temper|mixture]...
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import dataclasses
import json
import math
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


OUT = Path(__file__).parent / "flutter_c5_chain_study.json"


def _load():
    return json.loads(OUT.read_text()) if OUT.exists() else {}


def _save(tag, rec):
    results = _load()
    results[tag] = rec
    OUT.write_text(json.dumps(results, indent=1))
    print(tag, rec, flush=True)


def _eval_protocol(model):
    from ffvd_tpu.eval import collect_posterior, predict_summary, rmse_nll

    model.key, sub = jax.random.split(model.key)
    xs, vs, model.state = collect_posterior(
        model.trainer, model.state, model.dataset.n_test, sub)
    py, pv, _ = predict_summary(model.params, xs, vs,
                                model.cfg.emission_noise)
    rmse, nll = rmse_nll(jnp.asarray(model.dataset.y_test, model.dtype),
                         py, pv, model.dataset.y_train_std, horizon=30)
    return float(rmse), float(nll)


def run_temper():
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.trainer import Trainer

    for seed in (0, 1, 2, 3, 4):
        tag = f"temper_s{seed}"
        if tag in _load():
            print(f"skip {tag}", flush=True)
            continue
        cfg = FFVDConfig(dataset="flutter", case=5, iterations=2000,
                         seed=seed)
        model = FFVDModel(cfg, dtype=jnp.float32)
        t0 = time.time()
        model.fit(1500)
        model.trainer = Trainer(
            dataclasses.replace(cfg, epsilon=cfg.epsilon / 3), model.data)
        model.fit(500)
        train_s = time.time() - t0
        rmse, nll = _eval_protocol(model)
        _save(tag, {"rmse": rmse, "nll": nll,
                    "train_time_sec": round(train_s, 1)})


def run_mixture():
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.eval import collect_posterior
    from ffvd_tpu.model.likelihoods import use_full_r

    if "mixture_4chain" in _load():
        print("skip mixture_4chain", flush=True)
        return

    chains = []
    t0 = time.time()
    for seed in (100, 101, 102, 103):
        cfg = FFVDConfig(dataset="flutter", case=5, iterations=2000,
                         seed=seed)
        model = FFVDModel(cfg, dtype=jnp.float32)
        model.fit()
        model.key, sub = jax.random.split(model.key)
        xs, vs, model.state = collect_posterior(
            model.trainer, model.state, model.dataset.n_test, sub)
        p = model.params
        y_s = np.asarray(xs @ p.c + p.d)              # (S, T, P)
        v_s = np.asarray(vs @ (p.c * p.c))            # (S, T, P)
        r2 = np.asarray(p.r_var_diag if use_full_r(
            cfg.emission_noise, p.c.shape[1]) else p.rchol_diag ** 2)
        chains.append((y_s, v_s, r2))
        dataset = model.dataset
    train_s = time.time() - t0

    y_all = np.concatenate([c[0] for c in chains], axis=0)   # (4S, T, P)
    v_all = np.concatenate([c[1] for c in chains], axis=0)
    r2_mean = np.mean([c[2] for c in chains], axis=0)

    def _rmse_nll(py, pv):
        yt = np.asarray(dataset.y_test)[:30].reshape(-1)
        yp = py[:30].reshape(-1)
        vp = pv[:30].reshape(-1)
        rmse = float(np.sqrt(np.mean((yt - yp) ** 2)) * dataset.y_train_std)
        nll = float(-np.mean(-0.5 * np.log(2 * math.pi * vp)
                             - 0.5 * (yt - yp) ** 2 / vp))
        return rmse, nll

    py = y_all.mean(axis=0)
    pv_protocol = v_all.mean(axis=0) + r2_mean
    pv_spread = pv_protocol + y_all.var(axis=0)
    rec = {"train_time_sec": round(train_s, 1)}
    rec["pooled_rmse"], rec["pooled_nll"] = _rmse_nll(py, pv_protocol)
    _, rec["pooled_spread_nll"] = _rmse_nll(py, pv_spread)
    per = []
    for y_s, v_s, r2 in chains:
        r, n = _rmse_nll(y_s.mean(axis=0), v_s.mean(axis=0) + r2)
        per.append({"rmse": r, "nll": n})
    rec["per_chain"] = per
    _save("mixture_4chain", rec)


def main():
    parts = sys.argv[1:] or ["temper", "mixture"]
    if "temper" in parts:
        run_temper()
    if "mixture" in parts:
        run_mixture()
    print("done", flush=True)


if __name__ == "__main__":
    main()
