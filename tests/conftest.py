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
def k23_crop_uastc(golden_dir, oracle, test_files):
    """Reference-encoded UASTC .basis of a kodim23 crop + its RGBA unpack.

    Each artifact (crop PNG, .basis, unpacked PNG) is checked and produced
    independently, so partial state left by another test/session never
    leaves a later consumer without its input.
    """
    import subprocess

    import numpy as np
    from PIL import Image

    src = golden_dir / "k23_crop.png"
    if not src.exists():
        img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))
        Image.fromarray(img[:128, :160]).save(src)
    out = golden_dir / "k23_crop_uastc.basis"
    if not out.exists():
        subprocess.run([str(oracle), "-uastc", str(src), "-basis",
                        "-output_file", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
    unp = golden_dir / "k23_crop_uastc_unpacked_rgba_RGBA32_0_0000.png"
    if not unp.exists():
        subprocess.run([str(oracle), "-unpack", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
    return out.read_bytes(), np.asarray(Image.open(unp).convert("RGBA"))


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
