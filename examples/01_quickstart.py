"""Quickstart: train the default FFVD benchmark (ballbeam, case C4) and
evaluate free-running prediction — the equivalent of
`python FFVD_Main.py --file_index 5` in the reference, ~100x faster.

Run:  python examples/01_quickstart.py  [--cpu]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

if "--cpu" in sys.argv:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if "--cpu" in sys.argv:
    # the axon sitecustomize re-prepends the TPU platform, so the config
    # update is needed in addition to the env var on this image
    jax.config.update("jax_platforms", "cpu")

from ffvd_tpu import FFVDConfig
from ffvd_tpu.api import FFVDModel

cfg = FFVDConfig(dataset="ballbeam", case=4, iterations=2000)
model = FFVDModel(cfg)

t0 = time.time()
model.fit()                                   # 2*iterations fused steps
print(f"trained {cfg.total_iterations} iterations in {time.time()-t0:.2f}s; "
      f"ELBO {-float(model.nll_trace[0]):.3f} -> "
      f"{-float(model.nll_trace[-1]):.3f}")

res = model.evaluate()                        # 10-sample posterior rollout
print(f"RMSE = {res['rmse']:.4f} (reference TF run: 0.0282)")
model.save_results("results/quickstart_ballbeam.npz")
