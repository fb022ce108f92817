"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding is validated on host CPU devices (SURVEY.md §4); the real
TPU is exercised by bench.py and the driver's compile checks.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import pytest

DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> pathlib.Path:
    return DATA
