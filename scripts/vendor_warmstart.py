"""Vendor a dataset + its default warm start into ffvd_tpu/data/vendored/.

Produces the reduced warm-start npz scheme proven in round 4
(tests/test_round4_features.py::test_vendored_warmstart_matches_full_file):
``x_samples_training`` is replaced by its posterior mean with the sample
axis kept at size 1 — ``init_params_from_warmstart`` takes exactly that
mean, so params built from the reduced file are bit-identical to the full
file — and the large keys the loader never reads (Ucov_chol_ini,
x_samples_testing, y_samples_*, As/bs/S_chols) are dropped.  ~45 KB per
warm start instead of ~4 MB.

Usage:  python scripts/vendor_warmstart.py <dataset> [file_id=3]
Reads from $FFVD_DATA_DIR / $FFVD_WARMSTART_DIR (default: the
/root/reference checkout); writes into the in-tree vendored dir and
updates MANIFEST.json.
"""

import json
import shutil
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ffvd_tpu.data.loaders import DATASET_FILES, VENDORED_DIR, data_dir
from ffvd_tpu.data.warmstart import list_warmstarts

# Keys the reduced npz keeps: everything load_warmstart requires plus the
# small bookkeeping fields the round-4 reduced files carry.
KEEP_KEYS = (
    "qx1_mu_ini", "qx1_cov_chol_ini", "Umu_ini", "Q_sqrt_ini",
    "kernel_variance", "kernel_lengthscales", "C_val", "d_val",
    "R_chol_val", "Z_val", "observation_std", "factnonlin_loglikelihood",
    "observations", "observations_test",
)


def vendor(dataset: str, file_id: int = 3) -> None:
    manifest_path = VENDORED_DIR / "MANIFEST.json"
    manifest = json.loads(manifest_path.read_text()) \
        if manifest_path.exists() else {}

    # 1. raw dataset file, byte-for-byte
    fname, _kind = DATASET_FILES[dataset]
    src = data_dir() / fname
    shutil.copyfile(src, VENDORED_DIR / fname)
    print(f"vendored {fname} ({src.stat().st_size} bytes)")

    # 2. reduced warm start
    full = list_warmstarts(dataset)[file_id]
    with np.load(full, allow_pickle=True) as z:
        reduced = {k: np.asarray(z[k]) for k in KEEP_KEYS if k in z.files}
        xs = np.asarray(z["x_samples_training"])
    reduced["x_samples_training"] = xs.mean(axis=1, keepdims=True)
    out = VENDORED_DIR / Path(full).name
    np.savez_compressed(out, **reduced)
    print(f"vendored {out.name} ({out.stat().st_size} bytes, "
          f"full file {Path(full).stat().st_size})")

    manifest[out.name] = {
        "dataset": dataset,
        "file_id": file_id,
        "source": f"github.com/xuhuifan/FFVD Factnonlin_ini/{Path(full).name}",
        "note": "x_samples_training reduced to its posterior mean (sample "
                "axis kept at size 1; init_params_from_warmstart's mean "
                "over that axis is bit-identical to the full file); unused "
                "large keys dropped",
    }
    manifest_path.write_text(json.dumps(manifest, indent=1))


if __name__ == "__main__":
    vendor(sys.argv[1], int(sys.argv[2]) if len(sys.argv) > 2 else 3)
