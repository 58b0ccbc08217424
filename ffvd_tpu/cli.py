"""Experiment driver CLI — the rebuild of ``FFVD_Main.py``.

Usage:  python -m ffvd_tpu.cli --file_index 5 --case_val 4 --iterations 2000

Flags mirror FFVD_Main.py:355-379 (same names/defaults), with the two quirks
fixed deliberately (SURVEY.md §2.7): ``--x_dims`` is a usable int, and
``--posterior_sample_spacing`` is honored (default 32, matching the value the
reference silently forced at FFVD_Main.py:331).  ``--platform`` selects
cpu/tpu; ``--precision`` selects fp64 (parity) or fp32 (TPU speed).
"""

from __future__ import annotations

import argparse
import os
import time
from datetime import datetime


def _str2bool(v: str) -> bool:
    if v.lower() in ("true", "1", "yes"):
        return True
    if v.lower() in ("false", "0", "no"):
        return False
    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run an FFVD-GPSSM experiment (TPU rebuild)")
    p.add_argument("--num_inducing", type=int, default=100)
    # Reference flag (FFVD_Main.py:357, default 1000) — but inert upstream
    # (get_minibatch always returns the full range), so OUR default is full
    # batch regardless of N; pass a value to opt into random-window training.
    p.add_argument("--minibatch_size", type=int, default=None)
    p.add_argument("--iterations", type=int, default=2000)
    p.add_argument("--posterior_sample_spacing", type=int, default=32)
    p.add_argument("--file_id", type=int, default=3)
    p.add_argument("--file_index", type=int, default=2)
    p.add_argument("--case_val", type=int, default=4)
    p.add_argument("--x_dims", type=int, default=4)
    p.add_argument("--samples", type=int, default=10)
    p.add_argument("--n_layers", type=int, default=1)
    p.add_argument("--ratio", type=float, default=0.5)
    p.add_argument("--kernel_type", choices=["SquaredExponential", "LinearK"],
                   default="SquaredExponential")
    # the reference's `type=bool` made this flag impossible to turn off
    # (bool('False') is True, FFVD_Main.py:375) — fixed with a real parser
    p.add_argument("--kernel_train_flag", type=_str2bool, default=True)
    p.add_argument("--data_index", type=int, default=4)
    p.add_argument("--fold", type=int, default=0)
    p.add_argument("--prior_type",
                   choices=["determinantal", "normal", "strauss", "uniform"],
                   default="normal")
    p.add_argument("--prng_impl", choices=["threefry2x32", "rbg"],
                   default="threefry2x32",
                   help="rbg is ~1.5x faster for SGHMC-heavy cases on TPU")
    p.add_argument("--hyperparameter_sampling", action="store_true",
                   help="push log_Q, C, d, log_Rchol into the SG-HMC set "
                        "(dgp_model.py:241-243; off by default like "
                        "FFVD_Main.py:271)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--n_ensemble", type=int, default=1,
                   help="train K independent chains (seeds seed..seed+K-1) "
                        "and report the pooled mixture prediction — "
                        "calibrated free-run uncertainty the single-chain "
                        "protocol can't give (PARITY.md §2d; beyond the "
                        "reference, which is single-chain only)")
    p.add_argument("--eval_spread", action="store_true",
                   help="keep the across-rollout spread of predictive means "
                        "in the predictive variance (single-chain form of "
                        "the §2e calibration fix; for deterministic cases "
                        "C1/C4 this matches --n_ensemble pooling at 1x "
                        "train cost)")
    p.add_argument("--rollout_qsqrt_dim0", action="store_true",
                   help="bug-compat: reproduce the reference's rollout "
                        "variance slip (dim 0's q(U) factor applied to every "
                        "dim; conditionals_multi_output.py:322) for NLL "
                        "parity studies")
    p.add_argument("--pg_ancestor_trace", type=_str2bool, nargs="?",
                   const=True, default=None,
                   help="ancestor-traced CSMC (coherent smoothing-posterior "
                        "draws) vs the reference's resampled-state storage "
                        "('false').  Default: on — the 15-run C6 study "
                        "(tests/golden/pg_c6_study.json, PARITY §2b) puts "
                        "ancestor-trace in the reference's accuracy regime "
                        "(ballbeam median 0.0064) and live CSMC 13-150x "
                        "worse (auto-off under --pg_compat_noop)")
    p.add_argument("--pg_particles", type=int, default=100,
                   help="CSMC pool size (reference hardcodes 100, "
                        "base_model.py:78).  The particle axis is vmapped "
                        "— on TPU 500 costs ~13%% wall-clock and removes "
                        "the drive chain-outlier lottery (PARITY 2b)")
    p.add_argument("--pg_compat_noop", action="store_true",
                   help="bug-compat: the reference's PG op never updates X "
                        "(the assign at base_model.py:137 is not a "
                        "dependency of the tf.ones(1) fetch) — leave X at "
                        "its warm start like the reference's C6 actually "
                        "does")
    p.add_argument("--sghmc_log_clip", type=str, default=None,
                   help="upper clip for sampled log-parameters (default: "
                        "config's 12.0 reflecting barrier (fp32 sampler "
                        "escape region — see FFVDConfig.sghmc_log_clip); "
                        "'none' or 0 disables clipping entirely")
    p.add_argument("--sghmc_log_clip_lower", type=str, default=None,
                   help="lower clip for sampled log-parameters (default: "
                        "config's -30.0 exp-overflow guard — the escape "
                        "cliff is one-sided; 'none' mirrors -sghmc_log_clip)")
    p.add_argument("--deep_sample_hidden", action="store_true",
                   help="apply the case's SGHMC partition to hidden deep "
                        "layers too (default: hidden layers are MAP — see "
                        "FFVDConfig.deep_sample_hidden)")
    p.add_argument("--tensorboard_dir", type=str, default=None,
                   help="write the reference's (gated-off) TensorBoard "
                        "summary set per training chunk (models.py:94-131)")
    p.add_argument("--platform", choices=["cpu", "tpu", "default"],
                   default="default")
    p.add_argument("--precision", choices=["fp32", "fp64"], default=None,
                   help="default: fp64 on cpu, fp32 on tpu")
    p.add_argument("--collapse_precision",
                   choices=["native", "ds64", "hybrid"],
                   default="native",
                   help="'ds64' evaluates the collapsed GP bound in "
                        "double-single (two-float32) arithmetic — fp64-"
                        "quality gradients for that segment on fp64-less "
                        "TPUs (extended-training regimes; DESIGN.md §12); "
                        "'hybrid' runs native fp32 burn-in and switches to "
                        "ds64 for the last --hybrid_tail_iters iterations "
                        "— for COLD starts only (there it closes ~84%% of "
                        "the native-to-ds64 gap at 1/8 the cost; for warm "
                        "starts it buys nothing — PARITY 2d)")
    p.add_argument("--hybrid_tail_iters", type=int, default=500,
                   help="length of the ds64 tail under "
                        "--collapse_precision hybrid (outer iterations)")
    p.add_argument("--ds64_refine", type=int, default=None,
                   help="chol_and_inv refinement rounds for the ds64 "
                        "segment (default: the ops/ds64 module default; "
                        "2 = the conservative ill-conditioned-edge "
                        "setting)")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--chunk_size", type=int, default=500)
    return p


def _log_clip_kwargs(value, lower=None):
    """Parse --sghmc_log_clip[_lower]: unset → config defaults (12.0 /
    -30.0); 'none'/'off'/0 → disabled (upper: no clipping at all; lower:
    mirror -upper); otherwise float bounds."""
    kw = {}
    if value is not None:
        if value.strip().lower() in ("none", "off") or float(value) == 0.0:
            kw["sghmc_log_clip"] = None
        else:
            kw["sghmc_log_clip"] = float(value)
    if lower is not None:
        if lower.strip().lower() in ("none", "off"):
            kw["sghmc_log_clip_lower"] = None
        else:
            kw["sghmc_log_clip_lower"] = float(lower)
    return kw


def _results_path(args, dataset, cfg):
    """Results-npz path, reference naming scheme (base_model.py:512-517)."""
    fileid = datetime.now().strftime("%Y_%m_%d_%H_%M_%S_%f") \
        + f"file_id{args.file_id}"
    case = cfg.case_config.name
    return os.path.join(
        args.results_dir, dataset,
        f"{case}VFE_result_{dataset}_{fileid}.npz_results.npz")


def main(argv=None):
    args = build_argparser().parse_args(argv)

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    from ffvd_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    platform = jax.devices()[0].platform
    precision = args.precision or ("fp64" if platform == "cpu" else "fp32")
    if precision == "fp64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ffvd_tpu.api import FFVDModel
    from ffvd_tpu.config import FILE_INDEX_ORDER, FFVDConfig

    # The reference parses --n_layers but its deep path is dead code
    # (propagate() has no call site, the ELBO reads only layers[-1],
    # dgp_model.py:362-379).  Here n_layers > 1 runs a real deep transition:
    # doubly-stochastic hidden sparse-GP layers — see model/deep.py.
    dataset = FILE_INDEX_ORDER[args.file_index]
    cfg = FFVDConfig(
        dataset=dataset, case=args.case_val, num_inducing=args.num_inducing,
        x_dim=args.x_dims, iterations=args.iterations,
        num_posterior_samples=args.samples,
        posterior_sample_spacing=args.posterior_sample_spacing,
        prior_type=args.prior_type, kernel_type=args.kernel_type,
        kernel_train_flag=args.kernel_train_flag, file_id=args.file_id,
        hyperparameter_sampling=args.hyperparameter_sampling,
        prng_impl=args.prng_impl, pg_particles=args.pg_particles,
        seed=args.seed,
        minibatch_size=args.minibatch_size, n_layers=args.n_layers,
        rollout_qsqrt_dim0=args.rollout_qsqrt_dim0,
        pg_compat_noop=args.pg_compat_noop,
        pg_ancestor_trace=args.pg_ancestor_trace,
        deep_sample_hidden=args.deep_sample_hidden,
        collapse_precision=args.collapse_precision,
        ds64_refine=args.ds64_refine,
        hybrid_tail_iters=args.hybrid_tail_iters,
        **_log_clip_kwargs(args.sghmc_log_clip, args.sghmc_log_clip_lower))

    print(f"#### {dataset} | case C{cfg.case} | {platform} {precision} ####")

    dtype = jnp.float64 if precision == "fp64" else jnp.float32

    if args.n_ensemble > 1:
        from ffvd_tpu.eval import ensemble_evaluate, fit_ensemble
        if args.eval_spread:
            print("note: --eval_spread is subsumed by ensemble pooling "
                  "(the mixture's cross-chain spread term is always on)")
        t0 = time.time()
        models = fit_ensemble(cfg, args.n_ensemble, dtype=dtype,
                              chunk_size=args.chunk_size)
        train_time = time.time() - t0
        res = ensemble_evaluate(models)
        for i, pc in enumerate(res["per_chain"]):
            print(f"chain {i} (seed {cfg.seed + i}): "
                  f"RMSE {pc['rmse']:.6f}  NLL {pc['nll']:.6f}")
        print(f"ensemble({args.n_ensemble}) pooled: "
              f"RMSE: {res['rmse']:.6f}  NLL: {res['nll']:.6f}  "
              f"(no-spread NLL {res['nll_no_spread']:.6f}; "
              f"trained {train_time:.2f}s)")
        # Same results-npz contract as the single-chain path: pooled mixture
        # predictions, chain 0's parameters/ELBO trace.
        out = _results_path(args, dataset, cfg)
        models[0].save_results(
            out, case=cfg.case_config.name,
            predictions=(res["predict_y"], res["predict_y_var"]))
        print(f"saved {out}")
        return {"rmse": res["rmse"], "nll": res["nll"],
                "per_chain": res["per_chain"], "train_time": train_time,
                "final_elbo": -float(models[0].nll_trace[-1])}

    model = FFVDModel(cfg, dtype=dtype)  # data→warm-start→adapt→trainer

    t0 = time.time()
    model.fit(chunk_size=args.chunk_size,
              tensorboard_dir=args.tensorboard_dir)
    train_time = time.time() - t0
    nlls = model.nll_trace
    print(f"trained {cfg.total_iterations} iters in {train_time:.2f}s "
          f"({cfg.total_iterations / train_time:.1f} it/s); "
          f"nll {float(nlls[0]):.4f} -> {float(nlls[-1]):.4f}")

    t1 = time.time()
    res = model.evaluate(spread=args.eval_spread)
    eval_time = time.time() - t1
    print(f"RMSE: {res['rmse']:.6f}  NLL: {res['nll']:.6f}  "
          f"(eval {eval_time:.2f}s)")

    out = _results_path(args, dataset, cfg)
    model.save_results(out, case=cfg.case_config.name)
    print(f"saved {out}")
    return {"rmse": res["rmse"], "nll": res["nll"],
            "train_time": train_time, "final_elbo": -float(nlls[-1])}


if __name__ == "__main__":
    main()
