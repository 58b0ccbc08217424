"""Reconcile the two hard-synced M=512 step times (VERDICT r4 item 3).

Round 4 left two contradictory "honest" numbers for the ballbeam-C4
M=512 training step on one chip:
  - 8.90 ms/iter  (bench_tri_inv.py: RANDOM params/data, 100-iter chunk)
  - 3.15 ms/iter  (bench.py: ballbeam WARM-START params resized to M=512,
                   real data, 200-iter chunk)

Both harnesses sync correctly (hard_sync), so the difference must be in
what they run.  Hypotheses tested here, one sweep per cell:

  (a) chunk-length amortization: per-iter ms over chunks {50, 100, 200,
      500, 1000}, warmed at the same length, plus the dispatch-free
      differenced estimate (t(1000) − t(500)) / 500 — the in-program
      per-iteration cost with every fixed cost cancelled;
  (b) parameter/data content: the SAME compiled program is timed on both
      the bench setup (warm-start params, real data) and the tri_inv
      setup (init_params_random, random data).  XLA programs are
      data-independent EXCEPT the jitter-retry branches in
      ops/chol.psd_cholesky (lax.cond on non-finite factors) — if the
      random-init Kmm or collapsed H at M=512 fails its first fp32
      factorization, every step pays 1-2 extra Cholesky factorizations;
  (c) direct retry probe: first-attempt `jnp.linalg.cholesky` finiteness
      + condition numbers of Kmm and H for both parameter sets, at init
      and after the timed run.

Writes m512_reconcile.json.  NEVER run concurrently with another TPU
process (single tunneled chip).
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np

CHUNKS = (50, 100, 200, 500, 1000)


def _bench_setup():
    """bench.py's M=512 build: ballbeam warm start, inducing resized."""
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_from_warmstart
    from ffvd_tpu.parallel.multidataset import _resize_inducing

    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=512)
    ds = create_dataset("ballbeam")
    params = init_params_from_warmstart(load_warmstart("ballbeam", 3),
                                        dtype=jnp.float32)
    params = _resize_inducing(params, 512, 0)
    data = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
                   control=jnp.asarray(ds.control, jnp.float32))
    tr = Trainer(cfg, data)
    return tr, tr.init_state(params)


def _tri_inv_setup():
    """bench_tri_inv.py's build: random params + random data."""
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.model.params import SSMData, init_params_random

    params = init_params_random(jax.random.key(0), n=500, x_dim=4, m=512,
                                control_dim=1, p=1, dtype=jnp.float32)
    data = SSMData(
        y=0.5 * jax.random.normal(jax.random.key(1), (500, 1), jnp.float32),
        control=jax.random.normal(jax.random.key(2), (1000, 1), jnp.float32))
    cfg = FFVDConfig(dataset="ballbeam", case=4, num_inducing=512)
    tr = Trainer(cfg, data)
    return tr, tr.init_state(params)


def _retry_probe(trainer, state):
    """First-attempt Cholesky health of the two PSD factorizations the
    step performs (Kmm gram; collapsed H) at these parameters."""
    from ffvd_tpu.ops.kernels import gram

    p = state.params
    kmm = gram(trainer.cfg.kernel_type, p.kernel, p.z)
    kmm = kmm + trainer.cfg.jitter * jnp.eye(kmm.shape[-1], dtype=kmm.dtype)
    l0 = jnp.linalg.cholesky(kmm)
    kmm64 = np.asarray(kmm, np.float64)
    cond = float(np.max(np.linalg.cond(kmm64)))
    return {
        "kmm_first_chol_finite": bool(jnp.all(jnp.isfinite(l0))),
        "kmm_cond_max": cond,
        "kernel_logvar": [round(float(v), 3)
                          for v in np.ravel(np.asarray(p.kernel.log_variance))],
    }


def _sweep(tag, tr, state, rec):
    from ffvd_tpu.utils.timing import hard_sync

    out = {}
    probe0 = _retry_probe(tr, state)
    for chunk in CHUNKS:
        key = jax.random.key(chunk)
        key, kw = jax.random.split(key)
        st, warm = tr.run(state, chunk, kw, chunk_size=chunk)
        hard_sync(warm)
        t0 = time.perf_counter()
        st, nlls = tr.run(st, chunk, key, chunk_size=chunk)
        hard_sync(nlls)
        ms = (time.perf_counter() - t0) / chunk * 1e3
        out[f"ms_per_iter_chunk{chunk}"] = round(ms, 4)
        out[f"nll_finite_chunk{chunk}"] = bool(jnp.all(jnp.isfinite(nlls)))
        print(f"{tag} chunk={chunk}: {ms:.3f} ms/iter", flush=True)
        if chunk == max(CHUNKS):
            end_state = st
    t500 = out["ms_per_iter_chunk500"] * 500
    t1000 = out["ms_per_iter_chunk1000"] * 1000
    out["ms_per_iter_differenced"] = round((t1000 - t500) / 500, 4)
    out["retry_probe_init"] = probe0
    out["retry_probe_after_1000"] = _retry_probe(tr, end_state)
    rec[tag] = out


def main():
    rec = {"platform": jax.devices()[0].platform,
           "device_kind": jax.devices()[0].device_kind}
    tr_b, st_b = _bench_setup()
    _sweep("bench_setup", tr_b, st_b, rec)
    tr_r, st_r = _tri_inv_setup()
    _sweep("random_setup", tr_r, st_r, rec)

    # cross: bench params on random data and vice versa — separates the
    # parameter-content effect from the data-content effect.
    from ffvd_tpu.inference.trainer import Trainer
    tr_bx = Trainer(tr_b.cfg, tr_r.data)
    _sweep("bench_params_random_data", tr_bx, tr_bx.init_state(st_b.params),
           rec)
    tr_rx = Trainer(tr_r.cfg, tr_b.data)
    _sweep("random_params_real_data", tr_rx, tr_rx.init_state(st_r.params),
           rec)

    out = Path(__file__).parent / "m512_reconcile.json"
    tag = sys.argv[1] if len(sys.argv) > 1 else "r5"
    prev = json.loads(out.read_text()) if out.exists() else {}
    prev[tag] = rec
    out.write_text(json.dumps(prev, indent=1))
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
