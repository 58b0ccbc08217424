"""M=512 train-step time attribution + roofline inputs (round 4).

VERDICT r3 item 2 asks for hardware-utilization accounting: BENCH_r04 now
carries FLOPs/MFU from the compiled program's cost analysis (bench.py), and
this script supplies the ATTRIBUTION half — which component the 3.1 ms
M=512 step actually spends its time in — using the same swap methodology as
the ds64 study (tests/golden/ds64_profile.py): replace one component with a
cheap stand-in of identical output shape, re-time the FULL fused step, and
read the share off the delta.  Swaps are forward-semantics-preserving
enough to keep the optimizer stable for the 200-iteration timing window
(they are NOT numerically meaningful runs).

Also records the compiled chunk's cost_analysis flops + bytes accessed so
the DESIGN roofline paragraph can state achieved-vs-peak for both the MXU
(flops) and HBM (bytes) axes.

Results -> m512_profile.json.  Usage: python tests/golden/m512_profile.py [tag]
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
import numpy as np

HERE = Path(__file__).resolve().parent
ITERS = 200


def build(swap=None):
    """Fresh trainer/state for ballbeam C4 M=512 with an optional component
    swap applied via monkeypatching BEFORE the jit traces."""
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart
    from ffvd_tpu.parallel.multidataset import _resize_inducing

    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=512)
    ds = create_dataset(cfg.dataset)
    params = init_params_from_warmstart(load_warmstart(cfg.dataset,
                                                       cfg.file_id),
                                        dtype=jnp.float32)
    params = _resize_inducing(params, 512, cfg.seed)
    data = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
                   control=jnp.asarray(ds.control, jnp.float32))
    tr = Trainer(cfg, data)
    return tr, tr.init_state(params)


def timed_rate(tr, state):
    keys = jax.random.split(jax.random.key(0), ITERS)
    state2, _ = tr._run_chunk(state, keys, tr.data)      # compile+warm
    hard_sync(state2.params.x)
    t0 = time.perf_counter()
    state3, nlls = tr._run_chunk(state2, keys, tr.data)
    hard_sync(nlls)
    return (time.perf_counter() - t0) / ITERS * 1e3      # ms/iter


SWAPS = {}


def swap(name):
    def deco(fn):
        SWAPS[name] = fn
        return fn
    return deco


@swap("no_chol_and_inv")
def _swap_chol(mp):
    """chol_and_inv -> (scaled identity, scaled identity): removes the
    factorization + triangular inverse, keeps downstream shapes."""
    from ffvd_tpu.ops import chol as chol_mod

    def fake(mat, retry_jitter=1e-4):
        d = jnp.sqrt(jnp.maximum(
            jnp.diagonal(mat, axis1=-2, axis2=-1), 1e-6))
        eye = jnp.eye(mat.shape[-1], dtype=mat.dtype)
        l = d[..., None] * eye
        linv = (1.0 / d)[..., None] * eye
        return l, linv
    mp(chol_mod, "chol_and_inv", fake)


@swap("no_se_gram")
def _swap_gram(mp):
    """SE gram/cross -> rank-1 cheap stand-in: removes the (D, N, M, Din)
    difference tensors + exp (the kernel-evaluation share).  Patches the
    module-level dispatchers (gram/cross/diag), which the conditionals call
    as kops.* attributes."""
    from ffvd_tpu.ops import kernels as kmod

    def fake_pair(kparams, x, z2):
        var = jnp.exp(kparams.log_variance)[:, None, None]
        base = (x[:, :1] @ z2[:, :1].T)[None]     # rank-1 cheap stand-in
        return var * (1.0 + 0.01 * base)

    mp(kmod, "gram", lambda kt, kp, x, active_dims=None: fake_pair(kp, x, x)
       + jnp.eye(x.shape[0], dtype=x.dtype))
    mp(kmod, "cross",
       lambda kt, kp, x, z2, active_dims=None: fake_pair(kp, x, z2))
    mp(kmod, "diag",
       lambda kt, kp, x, active_dims=None: jnp.broadcast_to(
           jnp.exp(kp.log_variance)[:, None] + 1.0,
           (kp.log_variance.shape[0], x.shape[0])))


@swap("no_collapse_terms")
def _swap_terms(mp):
    """collapsed_bound_terms -> parameter-touching scalars: removes the H
    gram, its factorization, logdet and quadratic terms (keeps kernel_precal
    + upstream gram)."""
    from ffvd_tpu.model import conditionals as cmod

    def fake(kernel_type, kparams, pre, z, x, xc, q, mask=None,
             gram_scale=1.0):
        s = (jnp.sum(pre.lm_inv[..., 0, 0]) + jnp.sum(x[0]) + jnp.sum(q)
             + jnp.sum(xc[0]) + jnp.sum(z[0]))
        return 1e-6 * s, 1e-6 * s, 1e-6 * s
    mp(cmod, "collapsed_bound_terms", fake)


@swap("no_emission")
def _swap_emission(mp):
    from ffvd_tpu.model import elbo as emod

    def fake(params, y, y_mean, emission_noise):
        return 1e-6 * (jnp.sum(y_mean, axis=-1) + jnp.sum(y, axis=-1))
    mp(emod, "emission_log_lik_rows", fake)


def main():
    from _pytest.monkeypatch import MonkeyPatch

    tag = sys.argv[1] if len(sys.argv) > 1 else "r4"
    out = {"platform": jax.default_backend(), "iters": ITERS,
           "workload": "ballbeam C4 M=512 fp32 fused chunk"}

    tr, st = build()
    out["full_ms"] = round(timed_rate(tr, st), 4)

    # cost analysis of the full compiled chunk
    keys = jax.random.split(jax.random.key(0), ITERS)
    try:
        cost = tr._run_chunk.lower(st, keys, tr.data).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        out["flops_per_iter"] = float(cost.get("flops", 0.0)) / ITERS
        out["bytes_per_iter"] = float(cost.get("bytes accessed", 0.0)) / ITERS
    except Exception as e:  # cost analysis is best-effort
        out["cost_analysis_error"] = repr(e)

    for name, apply in SWAPS.items():
        mp = MonkeyPatch()
        try:
            apply(mp.setattr)
            tr2, st2 = build()
            out[f"{name}_ms"] = round(timed_rate(tr2, st2), 4)
        finally:
            mp.undo()
        full = out["full_ms"]
        out[f"{name}_share"] = round(
            max(0.0, full - out[f"{name}_ms"]) / full, 4)
        print(name, out[f"{name}_ms"], "share", out[f"{name}_share"],
              flush=True)

    path = HERE / "m512_profile.json"
    data = json.loads(path.read_text()) if path.exists() else {}
    data[tag] = out
    path.write_text(json.dumps(data, indent=1))
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
