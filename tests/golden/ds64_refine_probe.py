"""ds64 refine-round accuracy probe: is refine=1 enough in the healthy regime?

ds64_profile.json attributes ~64% of the ds64 train step to the
chol_and_inv refinement loop (refine=2 -> 0: 220.6 -> 616.5 it/s on the
drive C4 step).  Each round costs 6 dd matmuls, so refine=1 would be a
~1.5x end-to-end win IF the second round only matters near the
ill-conditioned edge (DESIGN 13: cond ~1e7 residual 1e-9 after one round,
dd-floor after two).

This probe times refine=1 and measures its nll-trajectory divergence from
the shipped refine=2 over 1000 drive C4 iters (same key), in the style of
the ds64_mxu trajectory check.  It does NOT change the shipped default -
flipping it requires redoing the PARITY 2f 12k-iter validations.

Results append to ds64_profile.json under "<tag>_refine".  Usage:
  python tests/golden/ds64_refine_probe.py [tag]
Run ONLY when nothing else uses the TPU chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from ffvd_tpu.utils.timing import hard_sync

HERE = Path(__file__).resolve().parent
ITERS = 1000


def run_traj(refine):
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart
    from ffvd_tpu.ops import ds64 as ds

    orig = ds.chol_and_inv

    def patched(a, refine_unused=2, **kw):
        return orig(a, refine=refine, **kw)

    ds.chol_and_inv = patched
    try:
        cfg = FFVDConfig(dataset="drive", case=4, collapse_precision="ds64")
        dsd = create_dataset(cfg.dataset)
        params = init_params_from_warmstart(
            load_warmstart(cfg.dataset, cfg.file_id), dtype=jnp.float32)
        data = SSMData(y=jnp.asarray(dsd.y_train, jnp.float32),
                       control=jnp.asarray(dsd.control, jnp.float32))
        tr = Trainer(cfg, data)
        state = tr.init_state(params)
        key = jax.random.key(0)
        t0 = time.time()
        state, nlls = tr.run(state, ITERS, key, chunk_size=ITERS)
        hard_sync(nlls)
        wall = time.time() - t0
        # steady-state rate from a second chunk
        t0 = time.time()
        state, nlls2 = tr.run(state, ITERS, jax.random.key(1),
                              chunk_size=ITERS)
        hard_sync(nlls2)
        rate = ITERS / (time.time() - t0)
        return (jnp.concatenate([nlls, nlls2]), round(rate, 2),
                round(wall, 1))
    finally:
        ds.chol_and_inv = orig


def main():
    tag = (sys.argv[1] if len(sys.argv) > 1 else "r3") + "_refine"
    n2, rate2, _ = run_traj(2)
    n1, rate1, _ = run_traj(1)
    div = jnp.abs(n1 - n2)
    out = {
        "platform": jax.default_backend(),
        "workload": f"drive C4 ds64, M=100, {2 * ITERS} iters, same key",
        "it_per_s": {"refine2": rate2, "refine1": rate1},
        "finite": {"refine2": bool(jnp.all(jnp.isfinite(n2))),
                   "refine1": bool(jnp.all(jnp.isfinite(n1)))},
        "nll_absdiv_max": float(jnp.max(div)),
        "nll_absdiv_at_end": float(div[-1]),
        "nll_final": {"refine2": float(n2[-1]), "refine1": float(n1[-1])},
        "note": "probe only - shipped default stays refine=2 pending the "
                "PARITY 2f revalidation",
    }
    print(json.dumps(out, indent=1), flush=True)
    path = HERE / "ds64_profile.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data[tag] = out
    path.write_text(json.dumps(data, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
