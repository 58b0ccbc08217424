"""Case C6: particle-Gibbs trajectory sampling, with mixing diagnostics.

The reference's C6 never actually updates X — its PG op's assign is dead
in the graph (base_model.py:137-138, verified by execution; SURVEY §2.7)
— so upstream "C6" trains with X frozen at the warm start.  Here the
conditional SMC really runs, and since round 5 the default is the
ancestor-traced variant: coherent smoothing-posterior draws that reach
the reference's accuracy regime at full protocol where the
reference-style per-time storage lands 13-150x worse (PARITY.md §2b,
15-run study).

This example trains a short C6 run on ballbeam (fully offline — the
dataset and warm start are vendored in-tree) and prints the CSMC mixing
diagnostics between training segments:

  ref_survival   fraction of time steps where the retained reference
                 particle survives resampling (should sit well inside
                 (0.5, 1): surviving but not dominating),
  unique_frac    mean fraction of distinct pool members selected per
                 resampling step (1/P = total particle collapse),
  accepted       whether the sweep replaced X with a fresh trajectory,
  dx_mean_abs    mean |Δx| the sweep applied.

Run:  python examples/09_particle_gibbs_c6.py  [--cpu]
"""
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if "--cpu" in sys.argv:
    import os
    os.environ["JAX_PLATFORMS"] = "cpu"
import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

from ffvd_tpu.api import FFVDModel
from ffvd_tpu.config import FFVDConfig
from ffvd_tpu.inference.particle_gibbs import make_pg_fn

cfg = FFVDConfig(dataset="ballbeam", case=6, iterations=150)  # 300 steps
model = FFVDModel(cfg)
assert model.cfg.pg_ancestor_trace          # the round-5 default

stats_fn = jax.jit(make_pg_fn(model.cfg, with_stats=True))
key = jax.random.key(99)
for seg in range(3):
    model.fit(100, chunk_size=100)
    key, sub = jax.random.split(key)
    _, st = stats_fn(model.params, sub, model.data)
    print(f"after {100 * (seg + 1):3d} iters: "
          + "  ".join(f"{k}={float(v):.3f}" for k, v in sorted(st.items())))

res = model.evaluate_quick(num_samples=5)
print(f"quick eval: RMSE {res['rmse']:.4f}  NLL {res['nll']:.2f} "
      "(full-protocol 5-seed median: 0.0064 — PARITY §2b)")
