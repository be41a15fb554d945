"""Encode → decode round trips through our own stack, and conformance of our
encoder's output against the reference transcoder (via the oracle CLI)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu import compressor
from basis_universal_tpu.codecs.etc1s.stream import (
    decode_palettes,
    decode_slice,
    decode_tables,
)
from basis_universal_tpu.formats.basis_file import BasisFile
from basis_universal_tpu.ops.etc1 import (
    blocks_to_image,
    decode_blocks_to_rgba,
    pack_etc1_blocks,
)
from basis_universal_tpu.utils.crc import crc16


def _decode_etc1s_basis(data):
    f = BasisFile(data)
    assert f.validate_crcs()
    cb = decode_palettes(f.header.total_endpoints, f.endpoint_cb_data,
                         f.header.total_selectors, f.selector_cb_data)
    t = decode_tables(f.tables_data)
    outs = []
    for i, s in enumerate(f.slices):
        e, sel = decode_slice(f.slice_data(i), s.num_blocks_x, s.num_blocks_y,
                              t, f.header.total_endpoints, f.header.total_selectors)
        blocks = decode_blocks_to_rgba(e, sel, cb.color5, cb.inten5, cb.selectors)
        img = blocks_to_image(blocks, s.orig_width, s.orig_height)
        # also check the unpacked-slice CRC
        phys = pack_etc1_blocks(e, sel, cb.color5, cb.inten5, cb.selectors)
        assert crc16(phys.tobytes()) == s.slice_data_crc16
        outs.append(img)
    return outs


def _psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0


@pytest.fixture(scope="module")
def small_image(test_files):
    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))
    return img[:128, :160]  # small crop keeps CPU-mode tests quick


def test_roundtrip_small(small_image):
    params = compressor.CompressorParams(quality_level=192, effort=2)
    out = compressor.compress(small_image, params)
    imgs = _decode_etc1s_basis(out.basis_data)
    assert len(imgs) == 1
    p = _psnr(imgs[0][..., :3], small_image)
    assert p > 27.0, p


def test_roundtrip_odd_size(small_image):
    img = small_image[:37, :51]
    out = compressor.compress(img, compressor.CompressorParams(quality_level=255, effort=2))
    dec = _decode_etc1s_basis(out.basis_data)[0]
    assert dec.shape[:2] == (37, 51)
    assert _psnr(dec[..., :3], img) > 27.0


def test_roundtrip_solid_color():
    img = np.full((16, 16, 3), 77, dtype=np.uint8)
    out = compressor.compress(img, compressor.CompressorParams(quality_level=10, effort=0))
    dec = _decode_etc1s_basis(out.basis_data)[0]
    assert _psnr(dec[..., :3], img) > 40.0


def test_roundtrip_1x1():
    img = np.full((1, 1, 3), 200, dtype=np.uint8)
    out = compressor.compress(img, compressor.CompressorParams(quality_level=10, effort=0))
    dec = _decode_etc1s_basis(out.basis_data)[0]
    assert dec.shape[:2] == (1, 1)
    assert _psnr(dec[..., :3], img) > 30.0


def test_roundtrip_mipmaps(small_image):
    params = compressor.CompressorParams(quality_level=128, effort=1, mip_gen=True)
    out = compressor.compress(small_image, params)
    f = BasisFile(out.basis_data)
    assert f.header.total_slices > 1
    imgs = _decode_etc1s_basis(out.basis_data)
    assert imgs[1].shape[:2] == (64, 80)


def test_oracle_accepts_our_file(small_image, oracle, tmp_path):
    """The reference transcoder unpacking our .basis file proves
    spec-conformance of the encoder output."""
    out = compressor.compress(
        small_image, compressor.CompressorParams(quality_level=192, effort=2))
    p = tmp_path / "ours.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    # RGBA32 is the exact (non-re-encoded) transcode target; the oracle's
    # unpack of our file must match our own decode pixel-for-pixel.
    unpacked = list(tmp_path.glob("*unpacked_rgb_RGBA32*.png"))
    assert unpacked, list(tmp_path.iterdir())
    ref_img = np.asarray(Image.open(unpacked[0]).convert("RGB"))
    ours = _decode_etc1s_basis(out.basis_data)[0][..., :3]
    np.testing.assert_array_equal(ref_img, ours)
