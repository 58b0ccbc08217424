"""Replay the flutter C5 fp32 trajectory (seed 0, chunk 50 — identical PRNG
stream to probe_escape.py) to just before the escape, then instrument the
21-sub-step SGHMC phase per sub-step until the catapult (|Δθ| > 1 on a
sampled leaf) is caught.  Dumps the pre-catapult state + the offending
gradient to an npz for a separate fp64 cross-check (grad_crosscheck.py).

Usage: python tests/golden/catapult_capture.py [upto_step=550] [max_extra=100]
NEVER run two TPU processes concurrently (single tunneled chip).
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    upto = int(sys.argv[1]) if len(sys.argv) > 1 else 550
    max_extra = int(sys.argv[2]) if len(sys.argv) > 2 else 100

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.inference.sghmc import sghmc_step
    from ffvd_tpu.inference.trainer import SubsetOps, sanitize_grads

    cfg = FFVDConfig(dataset="flutter", case=5, iterations=2000, seed=0)
    model = FFVDModel(cfg, dtype=jnp.float32)
    trainer = model.trainer

    # Phase 1: replay to `upto` with the same chunking as the probe.
    done = 0
    while done < upto:
        m = min(50, upto - done)
        model.key, sub = jax.random.split(model.key)
        model.state, _ = trainer.run(model.state, m, sub,
                                     chunk_size=m, nan_check=False)
        done += m
    print(f"replayed to step {done}; lv="
          f"{np.asarray(model.state.params.kernel.log_variance)}")

    # Phase 2: instrumented outer iterations.  For each iteration we first
    # clone trainer._sghmc_phase as a python loop with identical keys and
    # per-sub-step logging, then advance the real state with outer_step on
    # the same key (so the trajectory stays bit-identical to the probe's).
    ops = SubsetOps(trainer.labels, model.state.params)
    flags = [True] + [True, False] * 10
    out = Path(__file__).parent / "catapult_flutter_C5_s0.jsonl"
    fh = out.open("w")

    outer = jax.jit(trainer.outer_step)

    # remaining keys of the current chunk stream: the probe generates keys
    # per 50-iteration chunk; reproduce that structure.
    def iter_keys():
        nonlocal model
        while True:
            model.key, sub = jax.random.split(model.key)
            for k in jax.random.split(sub, 50):
                yield k

    sub_grad = jax.jit(jax.grad(
        lambda s, p: trainer.nll_fn(ops.merge(s, p), trainer.data)))
    sub_nll = jax.jit(
        lambda s, p: trainer.nll_fn(ops.merge(s, p), trainer.data))

    caught = False
    for it, key in zip(range(done, done + max_extra), iter_keys()):
        k_sghmc, _, _ = jax.random.split(key, 3)
        keys = jax.random.split(k_sghmc, len(flags))
        params = model.state.params
        sub = ops.split(params)
        ss = ops.split_state(model.state.sghmc)
        x_n = params.x.shape[0]
        for j, (flag, kk) in enumerate(zip(flags, keys)):
            g = sub_grad(sub, params)
            gs = sanitize_grads(g, cfg.sghmc_grad_clip)
            sub2, ss2 = sghmc_step(sub, gs, ss, kk, epsilon=cfg.epsilon,
                                   mdecay=cfg.mdecay, x_n=x_n, burn_in=flag)
            rec = {
                "iter": it, "sub": j,
                "theta_kvar": np.asarray(sub[0], np.float64).tolist(),
                "grad_kvar": np.asarray(g[0], np.float64).tolist(),
                "grad_kls_absmax": float(jnp.max(jnp.abs(g[1]))),
                "p_kvar": np.asarray(ss2.p[0], np.float64).tolist(),
                "p_kls_absmax": float(jnp.max(jnp.abs(ss2.p[1]))),
                "minv_kvar": np.asarray(
                    1.0 / (jnp.sqrt(ss.g2[0] + 1e-16) + 1e-16),
                    np.float64).tolist(),
                "nll": float(sub_nll(sub, params)),
            }
            fh.write(json.dumps(rec) + "\n")
            dmax = float(max(jnp.max(jnp.abs(s2 - s1))
                             for s1, s2 in zip(sub, sub2)))
            if dmax > 1.0 and not caught:
                caught = True
                print(f"CATAPULT at iter {it} sub {j}: max|dtheta|={dmax:.3g}")
                save = {"iter": np.int64(it), "sub": np.int64(j)}
                for name, tree in [("theta", sub), ("grad", g),
                                   ("xi", ss.xi), ("gm", ss.g), ("g2", ss.g2),
                                   ("p", ss.p)]:
                    for i, leaf in enumerate(tree):
                        save[f"{name}_{i}"] = np.asarray(leaf)
                for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
                    save["param" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
                np.savez(Path(__file__).parent / "catapult_state.npz", **save)
                fh.flush()
            sub, ss = ops.clip_log(sub2, cfg.sghmc_log_clip), ss2
        model.state, _ = outer(model.state, key)
        if caught:
            break
    fh.close()
    print(f"wrote {out}; caught={caught}")


if __name__ == "__main__":
    main()
