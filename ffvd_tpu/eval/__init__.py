from ffvd_tpu.eval.rollout import collect_posterior, predict_summary, rmse_nll
from ffvd_tpu.eval.results import save_results_npz
from ffvd_tpu.eval.ensemble import (chain_moments, ensemble_evaluate,
                                    fit_ensemble, pool_moments)

__all__ = ["collect_posterior", "predict_summary", "rmse_nll",
           "save_results_npz", "chain_moments", "ensemble_evaluate",
           "fit_ensemble", "pool_moments"]
