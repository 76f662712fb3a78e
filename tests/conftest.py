import os
import sys

from tempfile import NamedTemporaryFile, mkdtemp
from shutil import rmtree

# Tests run on a virtual multi-device CPU mesh; real-TPU behavior is covered
# by bench.py and __graft_entry__.py which the driver runs on hardware.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# this build of jax does not honor the JAX_PLATFORMS env var; force via config
jax.config.update("jax_platforms", "cpu")

# float64 on the CPU mesh lets parity tests compare against the float64
# reference implementation at tight tolerances; the float32 device path is
# tested separately.
jax.config.update("jax_enable_x64", True)

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

REFERENCE_SRC = "/root/reference/src"

import pytest  # noqa: E402


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_SRC)


@pytest.fixture(scope="session")
def reference_speech():
    """The reference numpy implementation, used as a test oracle only."""
    if not has_reference():
        pytest.skip("reference implementation not available")
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    import pydrobert.speech  # noqa: F401

    return pydrobert.speech


@pytest.fixture
def temp_file_1_name():
    temp = NamedTemporaryFile(suffix="_1", delete=False)
    temp.close()
    yield temp.name
    if os.path.exists(temp.name):
        os.remove(temp.name)


@pytest.fixture
def temp_file_2_name():
    temp = NamedTemporaryFile(suffix="_2", delete=False)
    temp.close()
    yield temp.name
    if os.path.exists(temp.name):
        os.remove(temp.name)


@pytest.fixture
def temp_dir():
    dir_name = mkdtemp()
    yield dir_name
    rmtree(dir_name)


# --------------------------------------------------------------------------
# test tiers: the exhaustive parity/fuzz sweeps live in tests/slow_tests.txt
# and are excluded from the default run (pyproject addopts `-m "not slow"`);
# `pytest tests/ -m slow` covers them.  Full suite = both tiers.
# --------------------------------------------------------------------------

def _slow_entries():
    path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    entries = set()
    with open(path) as f:
        for line in f:
            line = line.split("#", 1)[0].strip()
            if line:
                entries.add(line)
    return entries


def pytest_collection_modifyitems(config, items):
    entries = _slow_entries()
    marker = pytest.mark.slow
    for item in items:
        base = item.nodeid.split("[", 1)[0]
        # nodeids are relative to the rootdir; normalize to tests/...
        if not base.startswith("tests/"):
            base = "tests/" + base.split("tests/")[-1]
        if base in entries:
            item.add_marker(marker)
