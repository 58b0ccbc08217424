from ffvd_tpu.utils.checkpoint import CheckpointManager
from ffvd_tpu.utils.metrics import (MetricsLogger, TensorBoardSink,
                                    elbo_report)

__all__ = ["CheckpointManager", "MetricsLogger", "TensorBoardSink",
           "elbo_report"]
