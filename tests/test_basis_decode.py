"""End-to-end decode validation against a reference-encoded .basis file.

This is the strongest conformance oracle available: if our container parser,
Huffman decoder, ETC1S codebook/slice stream decoder, and block math are all
byte-correct, PSNR vs the source image must land at the reference's quality
level (~35 dB for kodim23 at q128).
"""

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.codecs.etc1s.stream import (
    decode_palettes,
    decode_slice,
    decode_tables,
)
from basis_universal_tpu.formats.basis_file import BasisFile
from basis_universal_tpu.formats.constants import BasisTexFormat
from basis_universal_tpu.ops.etc1 import (
    blocks_to_image,
    decode_blocks_to_rgba,
    pack_etc1_blocks,
    unpack_etc1_blocks,
)


@pytest.fixture(scope="module")
def decoded(kodim23_basis):
    f = BasisFile(kodim23_basis)
    assert f.tex_format == BasisTexFormat.ETC1S
    assert f.validate_crcs()
    cb = decode_palettes(
        f.header.total_endpoints, f.endpoint_cb_data,
        f.header.total_selectors, f.selector_cb_data)
    tables = decode_tables(f.tables_data)
    s = f.slices[0]
    e_idx, s_idx = decode_slice(
        f.slice_data(0), s.num_blocks_x, s.num_blocks_y, tables,
        f.header.total_endpoints, f.header.total_selectors)
    return f, cb, e_idx, s_idx


def test_header_fields(kodim23_basis):
    f = BasisFile(kodim23_basis)
    s = f.slices[0]
    assert (s.orig_width, s.orig_height) == (768, 512)
    assert (s.num_blocks_x, s.num_blocks_y) == (192, 128)
    assert f.header.total_endpoints > 0
    assert f.header.total_selectors > 0


def test_decode_to_rgba_psnr(decoded, test_files):
    f, cb, e_idx, s_idx = decoded
    blocks = decode_blocks_to_rgba(e_idx, s_idx, cb.color5, cb.inten5, cb.selectors)
    img = blocks_to_image(blocks, 768, 512)[..., :3].astype(np.float64)
    src = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"), dtype=np.float64)
    mse = np.mean((img - src) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    # reference golden for kodim23 ETC1S q128 is ~35 dB RGB avg
    assert psnr > 33.0, psnr


def test_etc1_pack_unpack_consistent(decoded):
    """Physical ETC1 output must decode to the same pixels as direct decode."""
    f, cb, e_idx, s_idx = decoded
    direct = decode_blocks_to_rgba(e_idx, s_idx, cb.color5, cb.inten5, cb.selectors)
    physical = pack_etc1_blocks(e_idx, s_idx, cb.color5, cb.inten5, cb.selectors)
    via_etc1 = unpack_etc1_blocks(physical)
    np.testing.assert_array_equal(direct, via_etc1)


def test_unpacked_slice_crc16_bit_exact(decoded):
    """slice_data_crc16 is the CRC of the unpacked physical ETC1 blocks
    (encoder/basisu_backend.cpp:664) — matching it proves our entire decode
    path (container → Huffman → slice stream → block packing) is bit-exact
    vs the reference."""
    from basis_universal_tpu.utils.crc import crc16

    f, cb, e_idx, s_idx = decoded
    physical = pack_etc1_blocks(e_idx, s_idx, cb.color5, cb.inten5, cb.selectors)
    assert crc16(physical.tobytes()) == f.slices[0].slice_data_crc16
