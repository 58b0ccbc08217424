"""fp32-vs-fp64 objective/gradient cross-check at captured trajectory states.

Loads every tests/golden/catapult_state_*.npz (written by catapult_capture.py
along the escaping flutter C5 fp32 chain), rebuilds the exact parameter
pytree, and compares the C5 objective and its sampled-leaf (kernel) gradient
computed:
  (a) fp64, base jitter           — the truth the fp64 reference sees
  (b) fp32, base jitter           — what the escaping round-2 chain saw
  (c) fp32, rel-jitter floor      — the proposed guard

Hypotheses under test: near the conditioning cliff the fp32 gradient is
garbage (catapult fuel), and/or the fp32 objective is *systematically biased
downward* as variance grows (a fake pull into the escape region).

Runs on CPU (x64) — safe to run next to a TPU job.
"""

import os
import sys
from glob import glob
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import jax.numpy as jnp
import numpy as np


def main():
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.data import create_dataset
    from ffvd_tpu.data.warmstart import load_warmstart
    from ffvd_tpu.model import conditionals
    from ffvd_tpu.model.elbo import negative_elbo
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart

    cfg = FFVDConfig(dataset="flutter", case=5, iterations=2000, seed=0)
    ds = create_dataset(cfg.dataset)
    template = init_params_from_warmstart(load_warmstart(cfg.dataset,
                                                         cfg.file_id))
    treedef = jax.tree_util.tree_structure(template)
    paths = [jax.tree_util.keystr(kp) for kp, _ in
             jax.tree_util.tree_leaves_with_path(template)]
    data64 = SSMData(y=jnp.asarray(ds.y_train, jnp.float64),
                     control=jnp.asarray(ds.control, jnp.float64))

    def val_and_kgrad(params, data):
        def f(kp):
            p = dataclasses.replace(params, kernel=kp)
            return negative_elbo(p, data, u_collapse=True, jitter=cfg.jitter)
        v, g = jax.value_and_grad(f)(params.kernel)
        return float(v), np.concatenate([
            np.ravel(np.asarray(g.log_variance, np.float64)),
            np.ravel(np.asarray(g.log_lengthscales, np.float64))])

    cast32 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), t)
    rel = lambda a, b: float(np.linalg.norm(a - b) /
                             max(np.linalg.norm(b), 1e-30))

    for path in sorted(glob(str(Path(__file__).parent /
                                "catapult_state_*.npz"))):
        z = np.load(path)
        leaves = [jnp.asarray(z["param" + p], jnp.float64) for p in paths]
        params64 = jax.tree_util.tree_unflatten(treedef, leaves)
        params32, data32 = cast32(params64), cast32(data64)

        v64, g64 = val_and_kgrad(params64, data64)
        saved = conditionals.F32_REL_JITTER
        conditionals.F32_REL_JITTER = 0.0
        v32, g32 = val_and_kgrad(params32, data32)
        conditionals.F32_REL_JITTER = saved
        v32r, g32r = val_and_kgrad(params32, data32)

        lv = np.asarray(z["param.kernel.log_variance"])
        print(f"== {Path(path).name} (iter {int(z['iter'])}) "
              f"lv={np.array2string(lv, precision=2)} "
              f"lsmax={np.asarray(z['param.kernel.log_lengthscales']).max():.2f}")
        print(f"   nll: fp64 {v64:.6f} | fp32bare {v32:.6f} "
              f"(bias {v32 - v64:+.4f}) | fp32rel {v32r:.6f} "
              f"(bias {v32r - v64:+.4f})")
        print(f"   kgrad rel-err vs fp64: bare {rel(g32, g64):.3g} "
              f"rel-jitter {rel(g32r, g64):.3g}; "
              f"|g| fp64 {np.abs(g64).max():.3g} "
              f"bare {np.abs(g32).max():.3g} rel {np.abs(g32r).max():.3g}")


if __name__ == "__main__":
    main()
