"""Test config: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding is validated on a host-platform device mesh
(xla_force_host_platform_device_count) since tests run without TPU pods.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon sitecustomize force-registers the TPU platform and overrides
# JAX_PLATFORMS; pin the config back to CPU before any backend initializes.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_DIR = pathlib.Path("/root/reference")
TEST_FILES = REFERENCE_DIR / "test_files"
GOLDEN_DIR = pathlib.Path("/tmp/golden")
ORACLE = pathlib.Path("/tmp/refbuild/basisu")


@pytest.fixture(scope="session")
def test_files():
    if not TEST_FILES.is_dir():
        pytest.skip("reference test_files not available")
    return TEST_FILES


@pytest.fixture(scope="session")
def golden_dir():
    """Golden files produced by the reference CLI (oracle)."""
    GOLDEN_DIR.mkdir(exist_ok=True)
    return GOLDEN_DIR


@pytest.fixture(scope="session")
def oracle():
    if not ORACLE.exists():
        pytest.skip("reference oracle binary not built")
    return ORACLE


@pytest.fixture(scope="session")
def kodim23_basis(golden_dir, oracle, test_files):
    """Reference-encoded kodim23 ETC1S q128 .basis file."""
    import subprocess
    out = golden_dir / "kodim23.basis"
    if not out.exists():
        subprocess.run(
            [str(oracle), str(test_files / "kodim23.png"), "-q", "128", "-basis"],
            cwd=golden_dir, check=True, capture_output=True)
    return out.read_bytes()
