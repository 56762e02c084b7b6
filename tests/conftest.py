"""Test harness: run everything on a virtual 8-device CPU mesh.

Mirrors the build plan (SURVEY.md §4): multi-chip behavior is validated with
``xla_force_host_platform_device_count`` since only one real TPU chip exists.
Pallas kernels run in interpreter mode on CPU (handled inside the ops layer).
"""

import os

# Force CPU: the session's sitecustomize (PYTHONPATH=/root/.axon_site)
# pre-imports jax and registers the axon TPU plugin before any user code, so
# JAX_PLATFORMS in the environment is too late — override via jax.config.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from spada_tpu.io.mtx import load_mtx  # noqa: E402
from spada_tpu.io.workloads import GemmWorkload  # noqa: E402

CARI = os.path.join(os.path.dirname(__file__), "..", "matrices", "cari.mtx")


@pytest.fixture(scope="session")
def cari():
    return load_mtx(CARI)


@pytest.fixture(scope="session")
def cari_workload(cari):
    return GemmWorkload.from_matrix("cari", cari)
