"""Train on generated kink-dynamics data from a cold start — no warm-start
checkpoint needed (the reference cannot do this at all).

Run:  python examples/04_synthetic_cold_start.py
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

from ffvd_tpu.api import FFVDModel
from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.data.synthetic import generate_kink
from ffvd_tpu.model.params import init_params_random

ds = generate_kink(n=120, seed=0)
params = init_params_random(jax.random.key(0), n=ds.n_train, x_dim=1, m=20,
                            control_dim=0)
cfg = FFVDConfig(case=4, num_inducing=20, x_dim=1)
model = FFVDModel(cfg, dataset=ds, params=params)
model.fit(num_iterations=4000, chunk_size=1000)

# Short-horizon free-run prediction reaches the observation-noise floor
# (noise std 0.2); long horizons decorrelate — the kink map mixes fast.
for h in (1, 5, 10):
    r = model.evaluate_quick(num_samples=10, horizon=h)
    print(f"{h:2d}-step-ahead RMSE = {r['rmse']:.4f} "
          f"(observation noise std = 0.2)")
