"""Headline benchmark: FFVD training iterations/sec on ballbeam C4 (M=100),
plus sampler-case (C2/C5) and M=512 steady-state numbers in "extra".

Matches BASELINE.md's primary metric: ELBO iterations/sec and
time-to-2000-CLI-iterations (= 4000 outer iterations, models.py:142) for the
default workload (ballbeam, case C4, M=100, D=4).  vs_baseline compares
against the TF reference measured on this host's CPU
(tests/golden/baseline_timing.json; 36.1 it/s) — the speed target in
BASELINE.md is >=20x that wall-clock.

The extra sampler numbers are STEADY-STATE rates (timed after the compile
warm-up, 500-iteration stretch; one protocol iteration = 21 nll-gradient
evaluations, base_model.py:915-925) — recorded here so every BENCH_rNN.json
carries them and the round-2 record discrepancies (VERDICT weak #4) cannot
recur.  Set FFVD_BENCH_QUICK=1 to skip the extras.

Prints ONE json line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}
"""

import json
import os
import sys
import time
from pathlib import Path


def _build(cfg, dtype):
    import jax.numpy as jnp

    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart

    ds = create_dataset(cfg.dataset)
    ws = load_warmstart(cfg.dataset, cfg.file_id)
    params = init_params_from_warmstart(ws, dtype=dtype)
    if cfg.num_inducing != params.z.shape[0]:
        from ffvd_tpu.parallel.multidataset import _resize_inducing
        params = _resize_inducing(params, cfg.num_inducing, cfg.seed)
    data = SSMData(y=jnp.asarray(ds.y_train, dtype=dtype),
                   control=jnp.asarray(ds.control, dtype=dtype))
    trainer = Trainer(cfg, data)
    return trainer, trainer.init_state(params)


def _steady_rate(trainer, state, iters, key):
    """iterations/sec over a timed stretch after a compile warm-up."""
    import jax
    import jax.numpy as jnp

    from ffvd_tpu.utils.timing import hard_sync

    # Warm-up with the SAME chunk length: run() compiles one fused program
    # per distinct chunk length, so a shorter warm-up would leave the timed
    # stretch to compile (this exact bug produced the bogus first-run extras
    # c2=81.9/c5=70.2/m512=140ms — vs true steady 394/190/?).
    # hard_sync, NOT block_until_ready: the latter is a no-op on the axon
    # backend (see ffvd_tpu/utils/timing.py).
    key, kw = jax.random.split(key)
    state, warm = trainer.run(state, iters, kw, chunk_size=iters)
    hard_sync(warm)
    t0 = time.time()
    state, nlls = trainer.run(state, iters, key, chunk_size=iters)
    hard_sync(nlls)
    dt = time.time() - t0
    assert bool(jnp.all(jnp.isfinite(nlls))), "non-finite nll during bench"
    return iters / dt, state


# Advertised per-chip peaks (dense matmul) for the TPU generations this
# repo can land on.  bf16 is the MXU's native format; fp32 work cannot
# exceed it, so MFU-vs-bf16-peak is a conservative utilization bound.
# Sources: public Cloud TPU system-architecture tables.
_PEAK_BF16_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0, "TPU v5e": 197.0,
    "TPU v5": 459.0, "TPU v5p": 459.0,
    "TPU v6 lite": 918.0, "TPU v6e": 918.0,
}


def _hw_utilization(trainer, state, iters, iters_per_sec):
    """FLOPs/iteration from the compiled chunk's cost analysis + MFU.

    Returns {} when the backend exposes no cost analysis (e.g. some
    plugin backends) — the bench line must never fail on that."""
    import jax

    try:
        keys = jax.random.split(jax.random.key(0), iters)
        compiled = trainer._run_chunk.lower(
            state, keys, trainer.data).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):   # older jax returns [dict]
            cost = cost[0]
        flops_chunk = float(cost.get("flops", 0.0))
        if flops_chunk <= 0:
            return {}
    except Exception:
        return {}
    flops_iter = flops_chunk / iters
    achieved = flops_iter * iters_per_sec
    out = {
        "m512_gflops_per_iter": round(flops_iter / 1e9, 3),
        "m512_achieved_tflops": round(achieved / 1e12, 3),
    }
    kind = jax.devices()[0].device_kind
    for name, peak in _PEAK_BF16_TFLOPS.items():
        if name.lower() in kind.lower():
            out["mfu_m512_vs_bf16_peak"] = round(achieved / (peak * 1e12), 5)
            out["peak_ref"] = f"{name} bf16 {peak:.0f} TFLOP/s"
            break
    return out


def main():
    import jax
    import jax.numpy as jnp

    platform = jax.devices()[0].platform
    fp64 = os.environ.get("FFVD_BENCH_FP64", "0") == "1"
    if fp64:
        jax.config.update("jax_enable_x64", True)
    dtype = jnp.float64 if fp64 else jnp.float32

    from ffvd_tpu.config import FFVDConfig

    cfg = FFVDConfig(dataset="ballbeam", case=4)
    trainer, state = _build(cfg, dtype)
    key = jax.random.key(0)

    total = cfg.total_iterations          # 4000 (2000 CLI iterations)
    chunk = total                         # one fused program for the run

    from ffvd_tpu.utils.timing import hard_sync

    # Warm-up: compile the fused chunk and run it once.
    key, kw = jax.random.split(key)
    state, warm = trainer.run(state, chunk, kw, chunk_size=chunk)
    hard_sync(warm)

    t0 = time.time()
    state, nlls = trainer.run(state, total, key, chunk_size=chunk)
    hard_sync(nlls)
    dt = time.time() - t0
    iters_per_sec = total / dt

    assert bool(jnp.all(jnp.isfinite(nlls))), "non-finite nll during bench"
    final_nll = float(nlls[-1])

    baseline_file = Path(__file__).parent / "tests/golden/baseline_timing.json"
    vs = None
    if baseline_file.exists():
        base = json.loads(baseline_file.read_text())
        vs = iters_per_sec / base["tf_iters_per_sec"]

    extra = {
        "time_2000_cli_iters_sec": round(dt, 3),
        "final_nll": round(final_nll, 4),
        "platform": platform,
        "dtype": str(dtype.__name__ if hasattr(dtype, "__name__")
                     else dtype),
    }

    if os.environ.get("FFVD_BENCH_QUICK", "0") != "1":
        # Sampler cases: steady-state it/s (21 grad evals per iteration).
        for case in (2, 5):
            tr, st = _build(FFVDConfig(dataset="ballbeam", case=case), dtype)
            rate, _ = _steady_rate(tr, st, 500, jax.random.key(case))
            extra[f"c{case}_iters_per_sec_steady"] = round(rate, 2)
        # M=512 stress config: steady-state ms/iteration + hardware
        # utilization (VERDICT r3 item 2).  FLOPs come from the COMPILED
        # program's own cost analysis (the algebraic flop count XLA assigns
        # to the fused chunk), not a hand model, so fusion/rematerialization
        # are priced in.  MFU is reported against the chip's advertised
        # bf16 peak (the MXU's native format; the fp32 work cannot exceed
        # it) — see docs/DESIGN.md "Roofline".
        tr, st = _build(FFVDConfig(dataset="ballbeam", case=4,
                                   num_inducing=512), dtype)
        rate, _ = _steady_rate(tr, st, 200, jax.random.key(512))
        extra["m512_ms_per_iter_steady"] = round(1000.0 / rate, 3)
        util = _hw_utilization(tr, st, 200, rate)
        if util:
            extra.update(util)
        # BASELINE config 5: all six datasets x M=512 in ONE jit (padded +
        # masked + vmapped).  Steady-state, hard-synced (the 21.6 ms PARITY
        # §3 record was a pre-r4 short-window number; VERDICT r4 item 4).
        try:
            from ffvd_tpu.config import DATASETS
            from ffvd_tpu.parallel.multidataset import (MultiDatasetTrainer,
                                                        stack_datasets)
            from ffvd_tpu.utils.timing import hard_sync
            sdata, sparams, _ = stack_datasets(DATASETS, m=512, dtype=dtype)
            mdt = MultiDatasetTrainer(
                FFVDConfig(dataset="ballbeam", case=4, num_inducing=512),
                sdata)
            mstate = mdt.init_state(sparams)
            mkey = jax.random.key(6512)
            mkey, mw = jax.random.split(mkey)
            mstate, warm = mdt.run(mstate, 200, mw, chunk_size=200)
            hard_sync(warm)
            t6 = time.time()
            mstate, mn = mdt.run(mstate, 200, mkey, chunk_size=200)
            hard_sync(mn)
            dt6 = time.time() - t6
            assert bool(jnp.all(jnp.isfinite(mn))), "non-finite 6-ds nll"
            extra["six_ds_m512_ms_per_6model_iter_steady"] = round(
                dt6 / 200 * 1e3, 3)
            extra["six_ds_m512_aggregate_iters_per_sec"] = round(
                6 * 200 / dt6, 1)
        except FileNotFoundError:
            pass   # datasets unavailable (offline partial checkout)
        # ds64 accuracy mode at its production setting (drive C4 — the
        # PARITY §2f budget-validation workload; VERDICT r3 item 1's done
        # criterion is >=350 it/s steady at the shipped refine default).
        tr, st = _build(FFVDConfig(dataset="drive", case=4,
                                   collapse_precision="ds64"), dtype)
        rate, _ = _steady_rate(tr, st, 500, jax.random.key(64))
        extra["ds64_drive_c4_iters_per_sec_steady"] = round(rate, 2)

    out = {
        "metric": f"ffvd_train_iters_per_sec_ballbeam_c4_{platform}",
        "value": round(iters_per_sec, 2),
        "unit": "iters/sec",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "extra": extra,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
