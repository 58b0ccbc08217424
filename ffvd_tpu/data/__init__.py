from ffvd_tpu.data.loaders import create_dataset, DATASET_FILES
from ffvd_tpu.data.warmstart import load_warmstart, list_warmstarts

__all__ = ["create_dataset", "DATASET_FILES", "load_warmstart", "list_warmstarts"]
