"""ds64 train-step time attribution: where does the non-matmul VPU time go?

After the MXU digit-split matmul (ops/ds64_mxu.py) the remaining ds64
overhead vs native fp32 is VPU work.  This study attributes it by timing
the SAME train step with individual ds64 primitives swapped for
precision-breaking fp32 stand-ins (timing-only monkeypatches — never
shipped; the swapped steps are numerically WRONG by design):

  baseline      the shipped ds64 step (mxu matmul on TPU)
  exp_f32       ds.exp        -> lift(exp(hi + lo))   [gram + 1/Q]
  log_f32       ds.log        -> lift(log(hi + lo))   [term1 logdet]
  chol_refine0  ds.chol_and_inv refine=2 -> refine=0  [Newton polish off]
  matmul_vpu    FFVD_DS64_MATMUL=vpu                  [MXU win, re-check]
  all_f32       exp+log fp32 AND refine=0             [floor: residual dd
                 add/mul/reduction cost]

The baseline-minus-variant gap is (approximately) that primitive's share;
shares need not sum to the total (XLA fusion changes around each swap).

Results append to ds64_profile.json.  Usage:
  python tests/golden/ds64_profile.py [tag]
Run ONLY when nothing else uses the TPU chip.
"""

import json
import sys
import time
from contextlib import contextmanager
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp

from ffvd_tpu.utils.timing import hard_sync

HERE = Path(__file__).resolve().parent


def rate(iters=300):
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart

    cfg = FFVDConfig(dataset="drive", case=4, collapse_precision="ds64")
    ds = create_dataset(cfg.dataset)
    params = init_params_from_warmstart(load_warmstart(cfg.dataset,
                                                       cfg.file_id),
                                        dtype=jnp.float32)
    data = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
                   control=jnp.asarray(ds.control, jnp.float32))
    tr = Trainer(cfg, data)
    state = tr.init_state(params)
    key, kw = jax.random.split(jax.random.key(0))
    t0 = time.time()
    state, warm = tr.run(state, iters, kw, chunk_size=iters)
    hard_sync(warm)
    compile_s = time.time() - t0
    t0 = time.time()
    state, nlls = tr.run(state, iters, key, chunk_size=iters)
    hard_sync(nlls)
    dt = time.time() - t0
    return (round(iters / dt, 2), round(compile_s, 1),
            bool(jnp.all(jnp.isfinite(nlls))))


@contextmanager
def swap(mod, name, fn):
    orig = getattr(mod, name)
    setattr(mod, name, fn)
    try:
        yield
    finally:
        setattr(mod, name, orig)


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r3"
    from ffvd_tpu.ops import ds64 as ds

    def exp_f32(a):
        return ds.lift(jnp.exp(a.hi + a.lo))

    def log_f32(a):
        return ds.lift(jnp.log(a.hi + a.lo))

    orig_chol = ds.chol_and_inv

    def chol_refine0(a, refine=2, **kw):
        return orig_chol(a, refine=0, **kw)

    path = HERE / "ds64_profile.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    out = data.get(tag) or {
        "platform": jax.default_backend(),
        "workload": "drive C4 ds64 train step, M=100, 300 steady iters",
        "note": "variants are precision-breaking timing stand-ins"}

    def run(name, patches=(), matmul=None):
        if name in out:                      # resume-safe across timeouts
            print("skip", name, out[name], flush=True)
            return
        from contextlib import ExitStack
        with ExitStack() as st:
            for pname, fn in patches:
                st.enter_context(swap(ds, pname, fn))
            if matmul:
                ds.set_matmul_impl(matmul)
            try:
                it_s, compile_s, finite = rate()
            finally:
                if matmul:
                    ds.set_matmul_impl("auto")
        out[name] = {"it_per_s": it_s, "compile_s": compile_s,
                     "finite": finite}
        data[tag] = out
        path.write_text(json.dumps(data, indent=1))
        print(name, out[name], flush=True)

    run("baseline")
    run("exp_f32", [("exp", exp_f32)])
    run("log_f32", [("log", log_f32)])
    run("chol_refine0", [("chol_and_inv", chol_refine0)])
    run("matmul_vpu", matmul="vpu")
    run("all_f32", [("exp", exp_f32), ("log", log_f32),
                    ("chol_and_inv", chol_refine0)])

    print("wrote", path)


if __name__ == "__main__":
    main()
