"""System-identification dataset loaders.

Rebuild of ``create_dataset`` (FFVD_Main.py:134-171): six small time series,
column u = control input, column y = observation; control z-normalized by
full-series stats, observations z-normalized by the *train-half* stats, then
a 50/50 chronological train/test split.

Data files are read from ``$FFVD_DATA_DIR`` (default: the upstream
``data/`` directory if present next to ``$FFVD_REFERENCE_DIR`` or at
/root/reference).  All SIX datasets plus their default (file_id=3) warm
starts are vendored under ``ffvd_tpu/data/vendored/`` (~350 KB total;
warm starts in the reduced-npz form proven bit-identical through
``init_params_from_warmstart``) so a fresh clone runs every benchmark
fully offline — see vendored/MANIFEST.json for provenance and
``scripts/vendor_warmstart.py`` for the reduction.  Non-default warm
starts (file_id != 3) still need an upstream checkout or
``scripts/fetch_data.sh``.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import Optional

import numpy as np

DATASET_FILES = {
    "ballbeam": ("ballbeam.dat", "dat"),
    "dryer": ("dryer.dat", "dat"),
    "flutter": ("flutter.dat", "dat"),
    "actuator": ("actuator.mat", "mat_up"),
    "drive": ("drive.mat", "mat_u1z1"),
    "gas_furnace": ("gas_furnace.csv", "csv"),
}


@dataclasses.dataclass(frozen=True)
class Dataset:
    name: str
    y_train: np.ndarray          # (N, 1) normalized
    y_test: np.ndarray           # (N_test, 1) normalized
    control: np.ndarray          # (N_total, U) normalized; U may be 0
    y_train_std: float
    y_train_mean: float
    control_mean: float
    control_std: float

    @property
    def n_train(self) -> int:
        return self.y_train.shape[0]

    @property
    def n_test(self) -> int:
        return self.y_test.shape[0]


def data_dir() -> Path:
    env = os.environ.get("FFVD_DATA_DIR")
    if env:
        return Path(env)
    ref = Path(os.environ.get("FFVD_REFERENCE_DIR", "/root/reference"))
    return ref / "data"


VENDORED_DIR = Path(__file__).parent / "vendored"


def _read_raw(name: str, root: Optional[Path] = None):
    fname, kind = DATASET_FILES[name]
    root = root or data_dir()
    path = root / fname
    if not path.exists() and root == data_dir():
        # Offline fallback: all six datasets ship in-tree (module
        # docstring / vendored/MANIFEST.json).  An explicit ``root``
        # argument is never silently redirected.
        vendored = VENDORED_DIR / fname
        if vendored.exists():
            path = vendored
    if not path.exists():
        raise FileNotFoundError(
            f"dataset file {path} not found and not in the vendored set. "
            "Point $FFVD_DATA_DIR at the data/ directory of an upstream "
            "FFVD checkout (github.com/xuhuifan/FFVD), or run "
            "scripts/fetch_data.sh to clone it (README.md 'Data "
            "provenance').")
    if kind == "dat":
        arr = np.loadtxt(path)
        u, y = arr[:, 0:1], arr[:, 1:2]
    elif kind == "csv":
        arr = np.genfromtxt(path, delimiter=",", skip_header=1)
        u, y = arr[:, 0:1], arr[:, 1:2]
    elif kind == "mat_up":
        import scipy.io
        mat = scipy.io.loadmat(path)
        u, y = mat["u"], mat["p"]
    elif kind == "mat_u1z1":
        import scipy.io
        mat = scipy.io.loadmat(path)
        u, y = mat["u1"], mat["z1"]
    else:  # pragma: no cover
        raise ValueError(kind)
    return np.asarray(u, dtype=np.float64), np.asarray(y, dtype=np.float64)


def create_dataset(name: str, root: Optional[Path] = None) -> Dataset:
    """Load + normalize + split, matching FFVD_Main.py:134-171 semantics."""
    if name not in DATASET_FILES:
        raise ValueError(f"unknown dataset {name!r}; options: {sorted(DATASET_FILES)}")
    u, y = _read_raw(name, root)
    c_mean, c_std = float(np.mean(u)), float(np.std(u))
    control = (u - c_mean) / c_std
    lens = y.shape[0]
    half = lens // 2
    y_std = float(np.std(y[:half]))
    y_mean = float(np.mean(y[:half]))
    obs = (y - y_mean) / y_std
    return Dataset(
        name=name,
        y_train=obs[:half],
        y_test=obs[half:],
        control=control,
        y_train_std=y_std,
        y_train_mean=y_mean,
        control_mean=c_mean,
        control_std=c_std,
    )
