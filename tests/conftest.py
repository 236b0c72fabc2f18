"""Test config: run everything on CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The env var alone is not enough under the axon TPU plugin; force via config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8

import subprocess  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Build the native loader if missing/stale so tests/test_fastloader.py runs
# by default instead of skipping (VERDICT r3 #7). Best-effort: if the
# toolchain is absent the 9 loader tests fall back to their skip marker.
_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "csrc")
try:
    subprocess.run(["make", "-C", _CSRC, "-q"], capture_output=True,
                   check=True)
except (OSError, subprocess.CalledProcessError):
    try:
        subprocess.run(["make", "-C", _CSRC], capture_output=True,
                       timeout=120)
    except Exception:
        pass


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-pipeline / composed-oracle tests (minutes each on the "
        "1-core sandbox). `pytest -m 'not slow'` is the fast tier "
        "(<10 min); the full suite stays the merge gate.")


@pytest.fixture
def rng():
    return np.random.RandomState(0)
