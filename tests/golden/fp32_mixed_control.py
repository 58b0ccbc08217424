"""End-to-end control for the mixed-precision design (CPU).

fp32_bias_probe.py showed the fp32 gradient error of the collapsed GP bound
is NOT localized: fp64-islanding the gram, the Cholesky, or the reductions
individually leaves err/signal ~1-8 on the z / kernel-log-variance blocks.
The candidate production design is therefore "the WHOLE collapsed-bound
segment (gram → precal → collapsed terms) in high precision, everything else
(x, likelihood, priors, optimizer state) fp32".

This script validates that design end-to-end before any TPU double-single
implementation: run the drive C4 slip workload with the GP segment monkey-
patched to fp64 while parameters/optimizer stay fp32, for 12000 iterations
(the regime where pure fp32 drifts: RMSE 1.58 / v̂[0] 2.4e-3 vs fp64's
0.73 / 1.7e-5, fp32_stall_study.json).  Success = the mixed run lands in the
fp64 bracket, proving a high-precision bound alone removes the drift.

First result (drive_long12k_s1_mixed): the learned PARAMETERS land in the
fp64 bracket (Q within 15% per component where pure fp32 was 10x off,
budget 1.21 vs fp64 1.49 vs fp32 2.94, v_first 3.2e-4 vs 1.7e-5 vs 2.4e-3)
but the single stochastic 30-step rollout gave RMSE 3.5.  Since drive's
eval-key spread at a fixed chain is tight (0.76-0.87, nll_study seeds 1-3),
that needed replication, hence this script now: (a) evaluates R=5 replicate
rollouts per run, (b) has a pure-fp32 SAME-ENVIRONMENT control
(FFVD_MIXED_PURE=1, tag *_fp32cpuenv) so the mixed-vs-pure comparison is
CPU-vs-CPU rather than CPU-vs-TPU, (c) takes a seed argument.

Usage: [FFVD_MIXED_PURE=1] python tests/golden/fp32_mixed_control.py [iters=12000] [seed=1]
Writes into fp32_stall_study.json with tag drive_long{N}k_s{seed}_mixed
(or _fp32cpuenv).
"""

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np


def patch_gp_segment_fp64():
    """Run gram → precal → collapsed terms in fp64; fp32 in/out."""
    import ffvd_tpu.model.conditionals as cond

    orig_precal = cond.kernel_precal
    orig_collapsed = cond.collapsed_bound_terms

    def up(a):
        return jnp.asarray(a, jnp.float64)

    def precal64(kernel_type, kparams, z, jitter=1e-5):
        kp = jax.tree.map(up, kparams)
        return orig_precal(kernel_type, kp, up(z), jitter)  # fp64 Precal

    def collapsed64(kernel_type, kparams, pre, z, x, xc, q, mask=None,
                    gram_scale=1.0):
        kp = jax.tree.map(up, kparams)
        t1, t2, tr = orig_collapsed(
            kernel_type, kp, pre, up(z), up(x), up(xc), up(q),
            mask=None if mask is None else up(mask), gram_scale=gram_scale)
        return (t1.astype(jnp.float32), t2.astype(jnp.float32),
                tr.astype(jnp.float32))

    cond.kernel_precal = precal64
    cond.collapsed_bound_terms = collapsed64

    def unpatch():
        cond.kernel_precal = orig_precal
        cond.collapsed_bound_terms = orig_collapsed
    return unpatch


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    pure = os.environ.get("FFVD_MIXED_PURE", "0") == "1"
    unpatch = (lambda: None) if pure else patch_gp_segment_fp64()

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    cfg = FFVDConfig(dataset="drive", case=4, iterations=2000, seed=seed,
                     rollout_qsqrt_dim0=True)
    model = FFVDModel(cfg, dtype=jnp.float32)
    t0 = time.time()
    model.fit(iters)
    train_s = time.time() - t0
    # eval in plain fp32 (the floor is a property of the learned params;
    # the fp64 Precal would change the rollout scan's carry dtype)
    unpatch()
    ev = model.evaluate()
    p = model.params
    lv = np.ravel(np.asarray(p.kernel.log_variance, np.float64))
    c = np.asarray(p.c, np.float64)
    pv = np.asarray(ev["predict_y_var"])
    rec = {
        "rmse": ev["rmse"], "nll": ev["nll"],
        "train_time_sec": round(train_s, 1),
        "budget_s2C2": float((np.exp(lv)[:, None] * c * c).sum()),
        "Q": np.exp(np.asarray(p.log_q, np.float64)).tolist(),
        "v_first": float(np.ravel(pv)[0]),
        "v30_mean": float(pv[:30].mean()),
        "err30_sq_mean": float(((np.asarray(ev["predict_y"])[:30]
                                 - model.dataset.y_test[:30]) ** 2).mean()),
        # 4 more independent-eval-key replicates (5 total with the above)
        "rmse_replicates": [ev["rmse"]],
        "nll_replicates": [ev["nll"]],
    }
    for _ in range(4):
        ev_r = model.evaluate()
        rec["rmse_replicates"].append(ev_r["rmse"])
        rec["nll_replicates"].append(ev_r["nll"])
    out = Path(__file__).parent / "fp32_stall_study.json"
    results = json.loads(out.read_text()) if out.exists() else {}
    tag = (f"drive_long{iters // 1000}k_s{seed}"
           + ("_fp32cpuenv" if pure else "_mixed"))
    results[tag] = rec
    out.write_text(json.dumps(results, indent=1))
    print(tag, rec, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
