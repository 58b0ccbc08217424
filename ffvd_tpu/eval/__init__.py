from ffvd_tpu.eval.rollout import collect_posterior, predict_summary, rmse_nll
from ffvd_tpu.eval.results import save_results_npz

__all__ = ["collect_posterior", "predict_summary", "rmse_nll",
           "save_results_npz"]
