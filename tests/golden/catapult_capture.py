"""Replay the flutter C5 fp32 trajectory (seed 0, chunk 50 — identical PRNG
stream to probe_escape.py) to just before the escape, then run a JITTED
instrumented clone of the 21-sub-step SGHMC phase per iteration, recording
per-sub-step theta/grad/preconditioner/momentum traces until the catapult
(|Δθ| > 1 on a sampled leaf).  Dumps the pre-catapult TrainState to an npz
for a separate fp64 cross-check.

Usage: python tests/golden/catapult_capture.py [upto=550] [max_extra=100]
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
    from ffvd_tpu.model import conditionals

    conditionals.F32_REL_JITTER = 0.0     # reproduce the round-2 numerics
    cfg = FFVDConfig(dataset="flutter", case=5, iterations=2000, seed=0,
                     sghmc_p_clip=None)   # reproduce the round-2 escape
    model = FFVDModel(cfg, dtype=jnp.float32)
    trainer = model.trainer

    done = 0
    while done < upto:
        m = min(50, upto - done)
        model.key, sub = jax.random.split(model.key)
        model.state, _ = trainer.run(model.state, m, sub,
                                     chunk_size=m, nan_check=False)
        done += m
    print(f"replayed to step {done}", flush=True)

    ops = SubsetOps(trainer.labels, model.state.params)
    flags = jnp.asarray([True] + [True, False] * 10)

    def sub_grad(sub, params):
        return jax.grad(
            lambda s: trainer.nll_fn(ops.merge(s, params), trainer.data))(sub)

    @jax.jit
    def instrumented(state, key):
        """Clone of trainer._sghmc_phase with per-sub-step trace outputs,
        then the REAL outer_step on the same key (identical trajectory)."""
        params = state.params
        k_sghmc, _, _ = jax.random.split(key, 3)
        keys = jax.random.split(k_sghmc, flags.shape[0])
        x_n = params.x.shape[0]

        def body(carry, inp):
            flag, k = inp
            sub, ss = carry
            g = sub_grad(sub, params)
            gs = sanitize_grads(g, cfg.sghmc_grad_clip)
            sub2, ss2 = sghmc_step(sub, gs, ss, k, epsilon=cfg.epsilon,
                                   mdecay=cfg.mdecay, x_n=x_n, burn_in=flag,
                                   p_clip=None)
            tr = {"theta_kvar": sub[0], "grad_kvar": g[0],
                  "g2_kvar": ss.g2[0], "p_kvar": ss2.p[0],
                  "theta_kls": sub[1], "grad_kls": g[1],
                  "g2_kls": ss.g2[1], "p_kls": ss2.p[1],
                  "nll": trainer.nll_fn(ops.merge(sub, params), trainer.data)}
            return (ops.clip_log(sub2, cfg.log_clip_bounds), ss2), tr

        _, traces = jax.lax.scan(
            body, (ops.split(params), ops.split_state(state.sghmc)),
            (flags, keys))
        new_state, _ = trainer.outer_step(state, key)
        return new_state, traces

    out = Path(__file__).parent / "catapult_flutter_C5_s0.jsonl"
    fh = out.open("w")

    def iter_keys():
        while True:
            model.key, sub = jax.random.split(model.key)
            for k in jax.random.split(sub, 50):
                yield k

    def dump_state(state, it, tag):
        save = {"iter": np.int64(it)}
        for kp, leaf in jax.tree_util.tree_leaves_with_path(state.params):
            save["param" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
        for name, tree in [("xi", state.sghmc.xi), ("g", state.sghmc.g),
                           ("g2", state.sghmc.g2), ("p", state.sghmc.p)]:
            for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
                save[name + jax.tree_util.keystr(kp)] = np.asarray(leaf)
        np.savez(Path(__file__).parent / f"catapult_state_{tag}.npz", **save)
        print(f"dumped state at iter {it} ({tag})", flush=True)

    dump_iters = {560, 580, 590, 600, 620, 640}
    caught = False
    for it, key in zip(range(done, done + max_extra), iter_keys()):
        prev_state = model.state
        if it in dump_iters:
            dump_state(prev_state, it, f"it{it}")
        model.state, tr = instrumented(prev_state, key)
        tr = jax.tree.map(lambda a: np.asarray(a, np.float64), tr)
        rec = {"iter": it,
               "nll": tr["nll"].tolist(),
               "theta_kvar": tr["theta_kvar"].tolist(),
               "grad_kvar": tr["grad_kvar"].tolist(),
               "g2_kvar": tr["g2_kvar"].tolist(),
               "p_kvar": tr["p_kvar"].tolist(),
               "theta_kls_max": tr["theta_kls"].max(axis=(1, 2)).tolist(),
               "grad_kls_absmax": np.abs(tr["grad_kls"]).max(axis=(1, 2)).tolist(),
               "g2_kls_max": tr["g2_kls"].max(axis=(1, 2)).tolist(),
               "p_kls_absmax": np.abs(tr["p_kls"]).max(axis=(1, 2)).tolist()}
        fh.write(json.dumps(rec) + "\n")
        fh.flush()
        pmax = max(np.abs(tr["p_kvar"]).max(), np.abs(tr["p_kls"]).max())
        if pmax > 1.0 and not caught:
            caught = True
            print(f"CATAPULT at iter {it}: max|p|={pmax:.3g}", flush=True)
            save = {"iter": np.int64(it)}
            for kp, leaf in jax.tree_util.tree_leaves_with_path(
                    prev_state.params):
                save["param" + jax.tree_util.keystr(kp)] = np.asarray(leaf)
            for name, tree in [("xi", prev_state.sghmc.xi),
                               ("g", prev_state.sghmc.g),
                               ("g2", prev_state.sghmc.g2),
                               ("p", prev_state.sghmc.p)]:
                for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
                    save[name + jax.tree_util.keystr(kp)] = np.asarray(leaf)
            np.savez(Path(__file__).parent / "catapult_state.npz", **save)
            # a few more iterations of traces after the catapult, then stop
        if caught and it > 0 and pmax <= 1.0:
            break
    fh.close()
    print(f"wrote {out}; caught={caught}", flush=True)


if __name__ == "__main__":
    main()
