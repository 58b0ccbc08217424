"""Test harness: force a virtual 8-device CPU mesh and fp64.

Must run before jax initializes a backend, hence the env mutation at import
time.  Parity tests compare against fp64 TF golden fixtures; sharding tests
use the 8 virtual CPU devices.
"""

import os

# Force CPU hard: this image pre-sets JAX_PLATFORMS=axon and an .axon_site
# sitecustomize that re-prepends the axon (TPU) platform, so setdefault is
# not enough — tests must never touch the single shared TPU chip.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from pathlib import Path  # noqa: E402

GOLDEN_DIR = Path(__file__).parent / "golden"


def pytest_collection_modifyitems(config, items):
    """Two-tier suite: everything not explicitly marked ``slow`` gets the
    ``quick`` marker, so `-m quick` is the <=2-min developer tier and the
    plain run is the full suite (pyproject [tool.pytest.ini_options])."""
    for item in items:
        if "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)


def golden_files():
    return sorted(GOLDEN_DIR.glob("golden_*.npz"))


@pytest.fixture(params=[p.name for p in golden_files()])
def golden(request):
    with np.load(GOLDEN_DIR / request.param, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}


@pytest.fixture(scope="session")
def ballbeam():
    from ffvd_tpu.data import create_dataset
    return create_dataset("ballbeam")
