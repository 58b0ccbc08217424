"""Factnonlin warm-start checkpoint loader.

The reference mandates a warm start from a pre-trained factorized-non-linear
model stored as npz (FFVD_Main.py:212-229, key schema verified against the 95
files in ``Factnonlin_ini/``).  File selection there depends on unsorted glob
order (FFVD_Main.py:386) — fixed here by sorting (SURVEY.md §2.7).

Keys used: qx1_mu_ini (D,), qx1_cov_chol_ini (D,D), Umu_ini (D,M),
Ucov_chol_ini (D,M,M), Q_sqrt_ini (D,), kernel_variance (D,),
kernel_lengthscales (D,Din), C_val (P,D), d_val (P,), R_chol_val (P,P),
Z_val (M,Din), x_samples_training (N,S,D), plus bookkeeping fields.
"""

from __future__ import annotations

import glob
import os
from pathlib import Path
from typing import List, Optional

import numpy as np

REQUIRED_KEYS = (
    "qx1_mu_ini", "Umu_ini", "Q_sqrt_ini", "kernel_variance",
    "kernel_lengthscales", "C_val", "d_val", "Z_val", "R_chol_val",
    "x_samples_training",
)


def warmstart_dir() -> Path:
    env = os.environ.get("FFVD_WARMSTART_DIR")
    if env:
        return Path(env)
    ref = Path(os.environ.get("FFVD_REFERENCE_DIR", "/root/reference"))
    return ref / "Factnonlin_ini"


def list_warmstarts(dataset: str, root: Optional[Path] = None) -> List[str]:
    root = root or warmstart_dir()
    pattern = str(root / f"factnonlin_initialized_10000_{dataset}*.npz")
    return sorted(glob.glob(pattern))


def _vendored_warmstart(dataset: str, file_id: int) -> Optional[str]:
    """Offline fallback: the vendored set ships the DEFAULT warm start
    (file_id=3) for all six datasets (see data/vendored/MANIFEST.json;
    x_samples_training is pre-reduced to its posterior mean, which
    init_params_from_warmstart's mean over the sample axis reproduces
    bit-identically — scripts/vendor_warmstart.py)."""
    import json
    from ffvd_tpu.data.loaders import VENDORED_DIR
    manifest = VENDORED_DIR / "MANIFEST.json"
    if not manifest.exists():
        return None
    for fname, meta in json.loads(manifest.read_text()).items():
        if (meta.get("dataset") == dataset
                and meta.get("file_id") == file_id
                and (VENDORED_DIR / fname).exists()):
            return str(VENDORED_DIR / fname)
    return None


def load_warmstart(dataset: str, file_id: int = 3,
                   root: Optional[Path] = None) -> dict:
    """Load warm-start file #file_id (sorted order) for a dataset."""
    files = list_warmstarts(dataset, root)
    if not files and root is None:
        vendored = _vendored_warmstart(dataset, file_id)
        if vendored is not None:
            files = [vendored]
            file_id = 0
    if not files:
        raise FileNotFoundError(
            f"no warm-start npz for {dataset!r} under "
            f"{root or warmstart_dir()} and no vendored fallback (the "
            "default file_id=3 warm start ships in-tree for all six "
            "datasets — data/vendored/MANIFEST.json; other file_ids need "
            "a checkout): point $FFVD_WARMSTART_DIR at the "
            "Factnonlin_ini/ directory of an upstream FFVD checkout "
            "(github.com/xuhuifan/FFVD), or run scripts/fetch_data.sh to "
            "clone it (README.md 'Data provenance').")
    if not 0 <= file_id < len(files):
        raise IndexError(
            f"file_id {file_id} out of range: {len(files)} warm-start files "
            f"exist for {dataset!r}")
    path = files[file_id]
    with np.load(path, allow_pickle=True) as z:
        out = {k: np.asarray(z[k]) for k in z.files}
    missing = [k for k in REQUIRED_KEYS if k not in out]
    if missing:
        raise KeyError(f"warm-start {path} missing keys {missing}")
    out["__path__"] = path
    return out
