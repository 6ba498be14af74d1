"""Test configuration: force CPU with 8 virtual devices.

Tests run CPU-only (the standard JAX stand-in for a TPU pod slice:
``--xla_force_host_platform_device_count=8`` gives pjit/shard_map tests a
fake 8-chip mesh).  NOTE: in this environment the TPU plugin ignores the
``JAX_PLATFORMS`` env var, so the platform must be forced via
``jax.config.update`` after import (before any backend touch).
TPU-only tests are marked ``tpu`` and skipped here.
"""

import os
import sys
from pathlib import Path

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "tpu: requires real TPU hardware")
    config.addinivalue_line("markers", "slow: long-running training test")


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run tests marked slow (full e2e trainings; ~10 extra minutes)",
    )


def pytest_collection_modifyitems(config, items):
    """Default suite stays fast and CPU-only: ``slow`` tests are skipped
    unless --runslow (or an explicit -m) selects them, and ``tpu`` tests
    always need an explicit ``-m tpu`` (this suite pins JAX to CPU)."""
    skip_tpu = pytest.mark.skip(reason="needs real TPU; run pytest -m tpu")
    m_expr = str(config.getoption("-m") or "")
    explicit_m = bool(m_expr)
    skip_slow = pytest.mark.skip(reason="slow e2e test; pass --runslow")
    for item in items:
        # tpu tests opt in only via an -m expression that NAMES the tpu
        # marker (a generic `-m "not slow"` must not un-skip them: this
        # suite pins JAX to CPU and the kernels would fail there)
        if "tpu" in item.keywords and "tpu" not in m_expr:
            item.add_marker(skip_tpu)
        elif ("slow" in item.keywords and not explicit_m
              and not config.getoption("--runslow")):
            item.add_marker(skip_slow)


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on CPU; got " + str(jax.devices())
    )
