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


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Run an FFVD-GPSSM experiment (TPU rebuild)")
    p.add_argument("--num_inducing", type=int, default=100)
    p.add_argument("--minibatch_size", type=int, default=1000)
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
    p.add_argument("--kernel_train_flag", type=bool, default=True)
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
    p.add_argument("--platform", choices=["cpu", "tpu", "default"],
                   default="default")
    p.add_argument("--precision", choices=["fp32", "fp64"], default=None,
                   help="default: fp64 on cpu, fp32 on tpu")
    p.add_argument("--results_dir", type=str, default="results")
    p.add_argument("--chunk_size", type=int, default=500)
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    if args.platform == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
    platform = jax.devices()[0].platform
    precision = args.precision or ("fp64" if platform == "cpu" else "fp32")
    if precision == "fp64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from ffvd_tpu.config import FILE_INDEX_ORDER, FFVDConfig
    from ffvd_tpu.data import create_dataset, load_warmstart
    from ffvd_tpu.eval import (collect_posterior, predict_summary, rmse_nll,
                               save_results_npz)
    from ffvd_tpu.inference.trainer import Trainer
    from ffvd_tpu.inference.particle_gibbs import make_pg_fn
    from ffvd_tpu.model.params import (SSMData, adapt_warmstart_xdim,
                                       init_params_from_warmstart)

    if args.n_layers != 1:
        # The reference parses --n_layers but its deep path is dead code:
        # Layer.fixed_mean is never applied (dgp_model.py:101-102 commented),
        # and the kernels[l+1][0] indexing breaks for the live multi-output
        # kernel lists.  Single-layer is the only functioning configuration.
        raise NotImplementedError(
            "n_layers > 1: the reference's deep-GP path is non-functional "
            "dead code (SURVEY.md §2.7); only the single-layer GPSSM is "
            "supported")

    dataset = FILE_INDEX_ORDER[args.file_index]
    cfg = FFVDConfig(
        dataset=dataset, case=args.case_val, num_inducing=args.num_inducing,
        x_dim=args.x_dims, iterations=args.iterations,
        num_posterior_samples=args.samples,
        posterior_sample_spacing=args.posterior_sample_spacing,
        prior_type=args.prior_type, kernel_type=args.kernel_type,
        kernel_train_flag=args.kernel_train_flag, file_id=args.file_id,
        hyperparameter_sampling=args.hyperparameter_sampling,
        prng_impl=args.prng_impl, pg_particles=100, seed=args.seed)

    print(f"#### {dataset} | case C{cfg.case} | {platform} {precision} ####")

    dtype = jnp.float64 if precision == "fp64" else jnp.float32
    ds = create_dataset(dataset)
    ws = load_warmstart(dataset, cfg.file_id)
    params = init_params_from_warmstart(ws, dtype=dtype)
    if cfg.x_dim != params.x_dim:
        params = adapt_warmstart_xdim(params, cfg.x_dim,
                                      control_dim=ds.control.shape[1],
                                      seed=cfg.seed)
    if cfg.num_inducing != params.z.shape[0]:
        from ffvd_tpu.parallel.multidataset import _resize_inducing
        params = _resize_inducing(params, cfg.num_inducing, cfg.seed)
    data = SSMData(y=jnp.asarray(ds.y_train, dtype=dtype),
                   control=jnp.asarray(ds.control, dtype=dtype))

    pg_fn = None
    if cfg.case_config.x_pg:
        pg_fn = make_pg_fn(cfg, data)
    trainer = Trainer(cfg, data, pg_fn=pg_fn)
    state = trainer.init_state(params)
    key = jax.random.key(cfg.seed, impl=cfg.prng_impl)
    key, k_train, k_eval = jax.random.split(key, 3)

    t0 = time.time()
    state, nlls = trainer.run(state, cfg.total_iterations, k_train,
                              chunk_size=args.chunk_size)
    train_time = time.time() - t0
    print(f"trained {cfg.total_iterations} iters in {train_time:.2f}s "
          f"({cfg.total_iterations / train_time:.1f} it/s); "
          f"nll {float(nlls[0]):.4f} -> {float(nlls[-1]):.4f}")

    t1 = time.time()
    xs, vs, state = collect_posterior(trainer, state, ds.n_test, k_eval)
    predict_y, predict_y_var, fit_y = predict_summary(state.params, xs, vs)
    rmse, nll = rmse_nll(jnp.asarray(ds.y_test, dtype=dtype), predict_y,
                         predict_y_var, ds.y_train_std)
    eval_time = time.time() - t1
    print(f"RMSE: {float(rmse):.6f}  NLL: {float(nll):.6f}  "
          f"(eval {eval_time:.2f}s)")

    fileid = datetime.now().strftime("%Y_%m_%d_%H_%M_%S_%f") \
        + f"file_id{args.file_id}"
    case = cfg.case_config.name
    out = os.path.join(
        args.results_dir, dataset,
        f"{case}VFE_result_{dataset}_{fileid}.npz_results.npz")
    save_results_npz(
        out, params=state.params, fit_y=fit_y, predict_y=predict_y,
        predict_y_var=predict_y_var, y_test=ds.y_test, y_train=ds.y_train,
        y_train_std=ds.y_train_std, case=case,
        ll_seq=[-float(v) for v in nlls[:: max(1, len(nlls) // 512)]],
        running_time_seq=[train_time], pg_num=cfg.pg_particles)
    print(f"saved {out}")
    return {"rmse": float(rmse), "nll": float(nll),
            "train_time": train_time, "final_elbo": -float(nlls[-1])}


if __name__ == "__main__":
    main()
