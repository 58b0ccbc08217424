"""TPU timing: ds64 collapse training with the VPU vs MXU matmul backend.

Round-3 TODO named ds64 throughput (54 it/s incl. compile on drive, 12.7x
slower than native fp32) as dispatch/VPU-bound, with "chunked-matmul fusion
or a pallas dd-dot kernel" as candidates.  ops/ds64_mxu.py takes a third
route: Ozaki digit splitting puts the dd-matmul MACs on the MXU as exact
bf16-integer matmuls.  This script measures what that buys end-to-end:

  per backend (vpu, mxu):
    - steady-state train it/s on the drive C4 ds64 config of
      fp32_stall_study.py (compile excluded; 100-iter timed chunks)
    - the training objective after WARM+TIMED iters (backend equivalence:
      both are ~49-bit dd, so trajectories must agree to fp32-display
      precision over this horizon)

Writes tests/golden/ds64_mxu_timings.json.  TPU-only (the comparison is
meaningless on CPU).  NEVER run two TPU processes concurrently.
"""

import json
import time
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import numpy as np

WARM = 100
TIMED = 400


def run(impl: str):
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.ops import ds64 as ds

    ds.set_matmul_impl(impl)
    cfg = FFVDConfig(dataset="drive", case=4, iterations=2000, seed=1,
                     rollout_qsqrt_dim0=True, collapse_precision="ds64")
    model = FFVDModel(cfg)
    t0 = time.time()
    model.fit(WARM)                       # compile + warm-up
    compile_s = time.time() - t0
    rates = []
    for _ in range(TIMED // 100):
        t0 = time.time()
        model.fit(100)
        rates.append(100.0 / (time.time() - t0))
    nll = float(np.asarray(model.nll_trace[-1]))
    return {
        "impl": impl,
        "steady_it_per_s": round(max(rates), 1),
        "chunk_rates": [round(r, 1) for r in rates],
        "compile_plus_warm100_s": round(compile_s, 1),
        "objective_after_%d" % (WARM + TIMED): nll,
    }


def main():
    assert jax.default_backend() != "cpu", "TPU-only benchmark"
    out = {"config": "drive C4 seed1 collapse_precision=ds64",
           "warm_iters": WARM, "timed_iters": TIMED,
           "device": str(jax.devices()[0])}
    for impl in ("vpu", "mxu"):
        out[impl] = run(impl)
        print(impl, out[impl], flush=True)
    out["mxu_speedup"] = round(out["mxu"]["steady_it_per_s"]
                               / out["vpu"]["steady_it_per_s"], 2)
    path = Path(__file__).parent / "ds64_mxu_timings.json"
    path.write_text(json.dumps(out, indent=1))
    print("wrote", path, "speedup", out["mxu_speedup"], flush=True)


if __name__ == "__main__":
    main()
