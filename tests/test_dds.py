"""DDS transcoder conformance vs the reference oracle's -unpack."""

import pathlib
import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.formats.constants import (
    TranscoderTextureFormat as TF)
from basis_universal_tpu.transcoder import DdsTranscoder

TEST_FILES = pathlib.Path("/root/reference/test_files")


@pytest.fixture(scope="module")
def dds_golden(golden_dir, oracle):
    d = golden_dir / "dds"
    d.mkdir(exist_ok=True)
    for name in ("kodim01.dds", "texarray_alpha_0.dds"):
        marker = d / f"{name}.done"
        if not marker.exists():
            subprocess.run([str(oracle), "-unpack", str(TEST_FILES / name)],
                           cwd=d, check=True, capture_output=True,
                           timeout=1200)
            marker.write_bytes(b"1")
    return d


@pytest.mark.parametrize("name,fmt,layers", [
    ("kodim01", "BC1", 1),
    ("texarray_alpha_0", "BC7", 3),
])
def test_decode_rgba_pixel_exact(dds_golden, name, fmt, layers):
    t = DdsTranscoder((TEST_FILES / f"{name}.dds").read_bytes())
    assert t.get_format() == fmt
    assert t.get_layers() == layers
    for layer in range(layers):
        rgba = t.transcode_image_level(0, layer, 0, TF.RGBA32)
        ref = np.asarray(Image.open(
            dds_golden / (f"{name}_unpacked_rgba_RGBA32_face_0_"
                          f"layer_{layer:04d}.png")).convert("RGBA"))
        np.testing.assert_array_equal(rgba, ref)


def test_transcode_targets(dds_golden):
    """BC1 DDS re-encodes to block targets with sane shapes + quality."""
    t = DdsTranscoder((TEST_FILES / "kodim01.dds").read_bytes())
    etc1 = t.transcode_image_level(0, 0, 0, TF.ETC1_RGB)
    assert etc1.shape == (128, 192, 8)
    bc7 = t.transcode_image_level(0, 0, 0, TF.BC7_RGBA)
    assert bc7.shape == (128, 192, 16)
    # round-trip sanity: ETC1 re-encode stays within lossy-transcode range
    from basis_universal_tpu.ops import gpu_unpack

    src = t.decode_rgba(0, 0, 0)
    dec = gpu_unpack.unpack_bc1(
        np.frombuffer(np.ascontiguousarray(
            t.transcode_image_level(0, 0, 0, TF.BC1_RGB)), np.uint8
        ).reshape(-1, 8))
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    img = blocks_to_image(dec.reshape(128, 192, 4, 4, 4), 768, 512)
    mse = ((img[..., :3].astype(np.float64)
            - src[..., :3].astype(np.float64)) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 30.0


def test_mip_chain_parse():
    """Synthetic RGBA8 DX10 DDS with mips: full image table + decode."""
    import struct

    w0, h0, mips = 32, 64, 3
    hdr = bytearray(148)
    struct.pack_into("<I", hdr, 0, 0x20534444)
    struct.pack_into("<7I", hdr, 4, 124, 0x000A1007, h0, w0, 0, 0, mips)
    struct.pack_into("<II", hdr, 76, 32, 0x4)          # pfSize, DDPF_FOURCC
    hdr[84:88] = b"DX10"
    struct.pack_into("<5I", hdr, 128, 28, 3, 0, 1, 0)  # RGBA8 UNORM, 2D
    payload = b""
    for lvl in range(mips):
        w, h = max(1, w0 >> lvl), max(1, h0 >> lvl)
        img = np.full((h, w, 4), 10 + lvl, np.uint8)
        payload += img.tobytes()
    t = DdsTranscoder(bytes(hdr) + payload)
    assert t.get_levels() == mips
    for lvl in range(mips):
        rgba = t.transcode_image_level(lvl, 0, 0, TF.RGBA32)
        assert rgba.shape == (max(1, h0 >> lvl), max(1, w0 >> lvl), 4)
        assert (rgba == 10 + lvl).all()
