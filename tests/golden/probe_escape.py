"""Instrumented sampler-case run: record per-chunk parameter/sampler-state
diagnostics to locate the fp32 SGHMC escape (flutter C5, PARITY §2b-deep).

Writes JSONL to tests/golden/probe_<dataset>_C<case>_s<seed>.jsonl with, per
chunk: nll stats, sampled log-hyper ranges, SGHMC auxiliary-state ranges.

Usage: python tests/golden/probe_escape.py [dataset] [case] [seed] [chunk]
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def stats(a):
    a = np.asarray(a, dtype=np.float64)
    return [float(np.min(a)), float(np.max(a))]


def main():
    dataset = sys.argv[1] if len(sys.argv) > 1 else "flutter"
    case = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    seed = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 50

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig

    cfg = FFVDConfig(dataset=dataset, case=case, iterations=2000, seed=seed)
    model = FFVDModel(cfg, dtype=jnp.float32)
    out = Path(__file__).parent / f"probe_{dataset}_C{case}_s{seed}.jsonl"
    f = out.open("w")

    n = cfg.total_iterations
    done = 0
    while done < n:
        m = min(chunk, n - done)
        model.key, sub = jax.random.split(model.key)
        model.state, nlls = model.trainer.run(model.state, m, sub,
                                              chunk_size=m, nan_check=False)
        done += m
        p = model.state.params
        ss = model.state.sghmc
        rec = {
            "step": done,
            "nll": [float(nlls[0]), float(nlls[-1]),
                    float(jnp.min(nlls)), float(jnp.max(nlls))],
            "log_var": stats(p.kernel.log_variance),
            "log_ls": stats(p.kernel.log_lengthscales),
            "log_q": stats(p.log_q),
            "x_absmax": float(jnp.max(jnp.abs(p.x))),
            "z_absmax": float(jnp.max(jnp.abs(p.z))),
            "log_rchol": stats(p.log_rchol),
            "xi_kvar": stats(ss.xi.kernel.log_variance),
            "xi_kls": stats(ss.xi.kernel.log_lengthscales),
            "g2_kvar": stats(ss.g2.kernel.log_variance),
            "g2_kls": stats(ss.g2.kernel.log_lengthscales),
            "p_kvar": stats(ss.p.kernel.log_variance),
            "p_kls": stats(ss.p.kernel.log_lengthscales),
        }
        f.write(json.dumps(rec) + "\n")
        f.flush()
    f.close()
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
