"""Sampler-case (C2/C5) training throughput on the current platform.

Measures iterations/sec of the fused 21-sub-step SG-HMC protocol
(base_model.py:915-925 semantics) before/after perf work; results append to
tests/golden/sampler_timings.json keyed by a tag argument.

Usage: python tests/golden/bench_sampler.py [tag]
NEVER run concurrently with another TPU job — single tunneled chip.
"""

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

OUT = Path(__file__).parent / "sampler_timings.json"


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "untagged"
    import jax
    import jax.numpy as jnp

    from ffvd_tpu import FFVDConfig, Trainer, init_params_from_warmstart
    from ffvd_tpu.data import create_dataset, load_warmstart

    from ffvd_tpu.model.params import SSMData

    platform = jax.devices()[0].platform
    ds = create_dataset("ballbeam")
    out = {"platform": platform}
    for case in (2, 5):
        cfg = FFVDConfig(dataset="ballbeam", case=case)
        params = init_params_from_warmstart(load_warmstart("ballbeam", 3),
                                            dtype=jnp.float32)
        data = SSMData(y=jnp.asarray(ds.y_train, jnp.float32),
                       control=jnp.asarray(ds.control, jnp.float32))
        tr = Trainer(cfg, data)
        st = tr.init_state(params)
        t0 = time.time()
        st, nll = tr.run(st, 50, jax.random.key(0), chunk_size=50)
        jax.block_until_ready(nll)
        compile_s = time.time() - t0
        t0 = time.time()
        st, nll = tr.run(st, 400, jax.random.key(1), chunk_size=400)
        jax.block_until_ready(nll)
        dt = time.time() - t0
        out[f"C{case}"] = {"compile_s": round(compile_s, 1),
                           "it_per_s": round(400 / dt, 1),
                           "finite": bool(jnp.all(jnp.isfinite(nll)))}
        print(f"C{case}: {out[f'C{case}']}")

    book = json.loads(OUT.read_text()) if OUT.exists() else {}
    book[tag] = out
    OUT.write_text(json.dumps(book, indent=2))
    print(json.dumps({tag: out}))


if __name__ == "__main__":
    main()
