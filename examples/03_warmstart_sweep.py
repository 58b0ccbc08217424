"""All 16 Factnonlin warm starts for one dataset trained as parallel chains
in one jit (the reference runs 16 separate processes).

Run:  python examples/03_warmstart_sweep.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import time

import jax
import jax.numpy as jnp

from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data import create_dataset, list_warmstarts
from ffvd_tpu.eval.rollout import collect_posterior, predict_summary, rmse_nll
from ffvd_tpu.inference.trainer import Trainer
from ffvd_tpu.model.params import SSMData
from ffvd_tpu.parallel.sharding import MultiChainTrainer, stack_warmstarts

cfg = FFVDConfig(dataset="ballbeam", case=4)
ds = create_dataset(cfg.dataset)
data = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
               control=jnp.asarray(ds.control, jnp.float32))

n = len(list_warmstarts(cfg.dataset))
mct = MultiChainTrainer(cfg, data, n_chains=n)
state = mct.init_state(stack_warmstarts(cfg.dataset, range(n)))
t0 = time.time()
state, _ = mct.run(state, cfg.total_iterations, jax.random.key(0),
                   chunk_size=1000)
print(f"{n} warm starts x {cfg.total_iterations} iterations in "
      f"{time.time()-t0:.1f}s")

key = jax.random.key(1)
rmses = []
tr = Trainer(cfg, data)      # one trainer → eval program compiles once
for k in range(n):
    params_k = jax.tree.map(lambda a: a[k], state.params)
    key, sub = jax.random.split(key)
    xs, vs, _ = collect_posterior(tr, tr.init_state(params_k), ds.n_test, sub)
    py, pv, _ = predict_summary(params_k, xs, vs)
    r, _ = rmse_nll(jnp.asarray(ds.y_test, jnp.float32), py, pv,
                    ds.y_train_std)
    rmses.append(float(r))
print("per-warm-start RMSE:", [round(r, 4) for r in rmses])
import statistics

print(f"best={min(rmses):.4f}  median={statistics.median(rmses):.4f}")
