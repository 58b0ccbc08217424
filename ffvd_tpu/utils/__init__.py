from ffvd_tpu.utils.checkpoint import CheckpointManager
from ffvd_tpu.utils.metrics import MetricsLogger, elbo_report

__all__ = ["CheckpointManager", "MetricsLogger", "elbo_report"]
