"""Train all six system-identification datasets in ONE jit-compiled program
(padded + masked + vmapped), then evaluate each — impossible in the
reference (one process = one dataset).

Run:  python examples/02_all_datasets_one_jit.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import jax

from ffvd_tpu.config import DATASETS, FFVDConfig
from ffvd_tpu.data import create_dataset
from ffvd_tpu.parallel.multidataset import MultiDatasetTrainer, stack_datasets

cfg = FFVDConfig(case=4)
stacked_data, stacked_params, lens = stack_datasets(DATASETS)
mdt = MultiDatasetTrainer(cfg, stacked_data)

state = mdt.init_state(stacked_params)
t0 = time.time()
state, nlls = mdt.run(state, cfg.total_iterations, jax.random.key(0),
                      chunk_size=1000)
print(f"6 datasets x {cfg.total_iterations} iterations in "
      f"{time.time()-t0:.1f}s")

datasets = [create_dataset(n) for n in DATASETS]
results = mdt.evaluate(state, datasets, lens, jax.random.key(1))
for name, r in results.items():
    print(f"  {name:12s} RMSE={r['rmse']:.4f}")
