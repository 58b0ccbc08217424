"""Localize the fp32 gradient bias (follow-up to fp32_stall_study.py).

fp32_stall_study established that the fp32 Adam dynamics drift AWAY from the
fp64 optimum (longer fp32 training loosens v̂[0] and worsens RMSE while the
identical fp64 protocol keeps improving) — a systematic fp32 gradient bias,
not noise width.  This probe measures WHERE the bias enters:

  1. train drive C4 (slip mode) at fp64 on CPU — the reference workload;
  2. at the trained point θ*, compute per-term gradients of the collapsed
     bound in fp64 (truth) and in fp32 (what a TPU chain sees);
  3. report, for each ELBO term and each parameter block, the fp32 error
     ‖g32−g64‖ against the true signal ‖g64‖ — the term×block cells with
     error ≫ signal are the precision island a mixed-precision fix must
     cover.

Everything runs in one x64-enabled CPU process; the fp32 gradient is the
same pure function applied to fp32-cast inputs (all ffvd_tpu ops follow
input dtypes).

Usage: python tests/golden/fp32_bias_probe.py [iters=4000]
Writes tests/golden/fp32_bias_probe.json.
"""

import functools
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

TERMS = ("later_term1", "later_term2", "nll_reg_trace_inverse_Q_B",
         "nll_log_likelihood", "nll_part_prior", "x_t_prior_Q", "nll")
BLOCKS = ("x", "kernel.log_variance", "kernel.log_lengthscales", "log_q",
          "z", "c", "log_rchol")


def _leaf(tree, path):
    out = tree
    for part in path.split("."):
        out = getattr(out, part)
    return out


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FFVDConfig
    from ffvd_tpu.model.elbo import elbo_terms
    from ffvd_tpu.model.params import SSMData

    cfg = FFVDConfig(dataset="drive", case=4, iterations=2000, seed=1,
                     rollout_qsqrt_dim0=True)
    model = FFVDModel(cfg, dtype=jnp.float64)
    model.fit(iters)
    params64, data64 = model.params, model.data

    term_kw = dict(kernel_type=cfg.kernel_type, prior_type=cfg.prior_type,
                   u_collapse=True, jitter=cfg.jitter,
                   emission_noise=cfg.emission_noise)

    import ffvd_tpu.model.conditionals as cond
    import ffvd_tpu.ops.chol as cholops
    import ffvd_tpu.ops.kernels as kops

    def _to(dt):
        return lambda a: jnp.asarray(a, dt)

    # --- precision islands: one fp32 pipeline with ONE piece in fp64 -------
    orig = {"gram": kops.gram, "cross": kops.cross, "diag": kops.diag,
            "chol_and_inv": cholops.chol_and_inv,
            "collapsed": cond.collapsed_bound_terms}

    def patch_gram64():
        # kernel grams (distances+exp) in fp64, results cast back
        def mk(f):
            def g(kt, kp, *arrs):
                kp64 = jax.tree.map(_to(jnp.float64), kp)
                out = f(kt, kp64, *[a.astype(jnp.float64) for a in arrs])
                return out.astype(jnp.float32)
            return g
        kops.gram = mk(orig["gram"])
        kops.cross = mk(orig["cross"])
        kops.diag = mk(orig["diag"])
        cond.kops = kops

    def patch_chol64():
        # every Cholesky + triangular inverse in fp64, factors cast back
        def ci(mat, retry_jitter=1e-4):
            l, li = orig["chol_and_inv"](mat.astype(jnp.float64),
                                         retry_jitter)
            return l.astype(jnp.float32), li.astype(jnp.float32)
        cholops.chol_and_inv = ci
        cond.cholops = cholops

    def patch_reduce64():
        # fp32 projection/grams; the big /Q reductions, H-gram, chol(H),
        # logdet and quadratic all in fp64
        def cb(kt, kp, pre, z, x, xc, q, mask=None, gram_scale=1.0):
            # a/kdiag computed in fp32 (as production would), then upcast
            a32 = cond.projection(kt, kp, pre, z, xc)
            kd32 = kops.diag(kt, kp, xc)
            t1, t2, tr = _collapsed_from(
                a32.astype(jnp.float64), kd32.astype(jnp.float64),
                x.astype(jnp.float64), q.astype(jnp.float64), mask,
                gram_scale)
            return (t1.astype(jnp.float32), t2.astype(jnp.float32),
                    tr.astype(jnp.float32))
        cond.collapsed_bound_terms = cb

    def _collapsed_from(a, kdiag, x, q, mask, gram_scale):
        # mirror of conditionals.collapsed_bound_terms from (a, kdiag)
        dx = x[1:] - x[:-1]
        if mask is not None:
            a = a * mask[None, None, :]
            kdiag = kdiag * mask[None, :]
            dx = dx * mask[:, None]
        m = a.shape[1]
        eye = jnp.eye(m, dtype=a.dtype)
        h = (gram_scale * jnp.einsum("dmn,dkn->dmk", a, a)
             / q[:, None, None] + eye)
        avec = gram_scale * jnp.einsum("dmn,nd->dm", a, dx) / q[:, None]
        chol_h, hinv_l = orig["chol_and_inv"](h)
        term1 = 0.5 * jnp.sum(cholops.chol_logdet(chol_h))
        v = jnp.einsum("dmk,dk->dm", hinv_l, avec)
        term2 = -0.5 * jnp.sum(v * v)
        trace = 0.5 * jnp.sum((kdiag - jnp.sum(a * a, axis=1)) / q[:, None])
        return term1, term2, trace

    def unpatch():
        kops.gram, kops.cross, kops.diag = (orig["gram"], orig["cross"],
                                            orig["diag"])
        cholops.chol_and_inv = orig["chol_and_inv"]
        cond.collapsed_bound_terms = orig["collapsed"]

    islands = {"gram64": patch_gram64, "chol64": patch_chol64,
               "reduce64": patch_reduce64}

    grads = {}          # (label, term) -> grad pytree (numpy leaves)
    for dt, label in ((jnp.float64, "fp64"), (jnp.float32, "fp32")):
        p = jax.tree.map(lambda a: jnp.asarray(a, dt), params64)
        d = SSMData(y=jnp.asarray(data64.y, dt),
                    control=jnp.asarray(data64.control, dt))
        for term in TERMS:
            grads[(label, term)] = jax.grad(
                lambda pp: elbo_terms(pp, d, **term_kw)[term])(p)

    p32 = jax.tree.map(_to(jnp.float32), params64)
    d32 = SSMData(y=jnp.asarray(data64.y, jnp.float32),
                  control=jnp.asarray(data64.control, jnp.float32))
    for label, apply_patch in islands.items():
        apply_patch()
        try:
            for term in TERMS:
                grads[(label, term)] = jax.grad(
                    lambda pp: elbo_terms(pp, d32, **term_kw)[term])(p32)
        finally:
            unpatch()

    labels = ["fp32"] + list(islands)
    report = {"iters": iters}
    summary = {}
    for term in TERMS:
        rec = report.setdefault(term, {})
        for blk in BLOCKS:
            g64 = np.asarray(_leaf(grads[("fp64", term)], blk), np.float64)
            sig = float(np.linalg.norm(g64))
            rec[blk] = {"fp64_norm": sig}
            if g64.size <= 8:
                rec[blk]["fp64"] = g64.ravel().tolist()
            cell = summary[f"{term}/{blk}"] = {"signal": sig}
            for lab in labels:
                g = np.asarray(_leaf(grads[(lab, term)], blk), np.float64)
                err = float(np.linalg.norm(g - g64))
                rec[blk][f"{lab}_norm"] = float(np.linalg.norm(g))
                rec[blk][f"{lab}_err"] = err
                if g64.size <= 8:
                    rec[blk][lab] = g.ravel().tolist()
                cell[f"eos_{lab}"] = err / max(sig, 1e-300)

    out = Path(__file__).parent / "fp32_bias_probe.json"
    out.write_text(json.dumps({"report": report, "summary": summary},
                              indent=1))
    # console: the interesting cells and what each island repairs
    for k, v in summary.items():
        if v["eos_fp32"] > 0.3:
            fix = " ".join(f"{lab}={v[f'eos_{lab}']:.3f}"
                           for lab in labels[1:])
            print(f"{k}: fp32 err/sig={v['eos_fp32']:.2f} | {fix} "
                  f"(signal {v['signal']:.3e})", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
