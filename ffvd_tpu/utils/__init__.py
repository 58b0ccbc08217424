from ffvd_tpu.utils.checkpoint import CheckpointManager
from ffvd_tpu.utils.compile_cache import enable_compilation_cache
from ffvd_tpu.utils.metrics import (MetricsLogger, TensorBoardSink,
                                    elbo_report)

__all__ = ["CheckpointManager", "MetricsLogger", "TensorBoardSink",
           "elbo_report", "enable_compilation_cache"]
