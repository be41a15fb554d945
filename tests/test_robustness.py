"""Corrupt/truncated-input robustness (SURVEY §5.3).

The reference transcoder is fuzz-hardened: every read is bounds-checked and
corrupt data fails cleanly (basisu_transcoder.cpp). Our contract: public
decode entry points raise CorruptFileError/ValueError (or succeed, for
benign bitflips) — never segfault, hang, or leak struct.error/IndexError.
"""

import numpy as np
import pytest

from basis_universal_tpu import compressor
from basis_universal_tpu.formats.constants import (
    BasisTexFormat, TranscoderTextureFormat as TF)
from basis_universal_tpu.transcoder import (
    BasisTranscoder, DdsTranscoder, Ktx2Transcoder)
from basis_universal_tpu.utils.errors import CorruptFileError


def _image():
    rng = np.random.default_rng(7)
    base = rng.integers(40, 200, (1, 1, 3), np.uint8)
    img = np.clip(base + rng.integers(-40, 40, (32, 32, 3)), 0, 255)
    return img.astype(np.uint8)


@pytest.fixture(scope="module")
def valid_files():
    img = _image()
    out = {}
    p = compressor.CompressorParams(quality_level=128, effort=0)
    o = compressor.compress(img, p)
    out["etc1s.basis"] = o.basis_data
    out["etc1s.ktx2"] = o.ktx2_data
    p = compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=0)
    out["uastc.basis"] = compressor.compress(img, p).basis_data
    p = compressor.CompressorParams(
        tex_format=BasisTexFormat.XUASTC_LDR_4x4, effort=0, quality_level=100)
    out["xuastc.ktx2"] = compressor.compress(img, p).ktx2_data
    p = compressor.CompressorParams(
        tex_format=BasisTexFormat.XUBC7, effort=0)
    out["xubc7.ktx2"] = compressor.compress(img, p).ktx2_data
    return out


def _open_and_decode(data: bytes):
    """Full decode path: parse container, start transcoding, decode level 0."""
    if data[:4] == b"\xabKTX":
        t = Ktx2Transcoder(data)
        t.start_transcoding()
        return t.transcode_image_level(0, 0, 0, TF.RGBA32)
    t = BasisTranscoder(data)
    t.start_transcoding()
    return t.transcode_image_level(0, 0, TF.RGBA32)


def _assert_clean(data: bytes):
    """Decode must either succeed (ndarray) or raise a ValueError family
    error — anything else (struct.error, IndexError, segfault, hang) is a
    robustness bug."""
    try:
        out = _open_and_decode(data)
    except (ValueError, NotImplementedError):
        return  # clean rejection (CorruptFileError is a ValueError)
    assert isinstance(out, np.ndarray)


# ---------------------------------------------------------------------------
# truncation
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["etc1s.basis", "etc1s.ktx2", "uastc.basis",
                                  "xuastc.ktx2", "xubc7.ktx2"])
@pytest.mark.parametrize("frac", [0.0, 0.02, 0.25, 0.5, 0.9, 0.999])
def test_truncated(valid_files, name, frac):
    data = valid_files[name]
    _assert_clean(data[:max(0, int(len(data) * frac))])


# ---------------------------------------------------------------------------
# bit flips
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("name", ["etc1s.basis", "etc1s.ktx2", "uastc.basis",
                                  "xuastc.ktx2", "xubc7.ktx2"])
@pytest.mark.parametrize("pos_frac", [0.0, 0.1, 0.3, 0.5, 0.7, 0.95])
def test_bitflip(valid_files, name, pos_frac):
    data = bytearray(valid_files[name])
    pos = min(len(data) - 1, int(len(data) * pos_frac))
    data[pos] ^= 0xA5
    _assert_clean(bytes(data))


def test_bitflip_sweep_header(valid_files):
    """Flip every byte of each header region one at a time."""
    for name in ("etc1s.basis", "xuastc.ktx2"):
        data = valid_files[name]
        for pos in range(0, min(96, len(data))):
            mut = bytearray(data)
            mut[pos] ^= 0xFF
            _assert_clean(bytes(mut))


# ---------------------------------------------------------------------------
# garbage / empty / wrong container
# ---------------------------------------------------------------------------

def test_empty():
    _assert_clean(b"")


def test_short_garbage():
    _assert_clean(b"\x00" * 13)
    _assert_clean(b"sB\x13\x00garbage")


def test_random_bytes():
    rng = np.random.default_rng(11)
    for n in (64, 500, 4096):
        _assert_clean(rng.integers(0, 256, n, np.uint8).tobytes())


def test_random_with_valid_magics():
    rng = np.random.default_rng(12)
    ktx2_magic = bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30,
                        0xBB, 0x0D, 0x0A, 0x1A, 0x0A])
    body = rng.integers(0, 256, 600, np.uint8).tobytes()
    _assert_clean(ktx2_magic + body)
    _assert_clean(b"sB" + body)   # .basis sig
    with pytest.raises((ValueError, NotImplementedError)):
        DdsTranscoder(b"DDS " + body[:200]).decode_rgba(0, 0, 0)


def test_dds_truncated():
    # minimal valid-looking DDS header then truncated payload
    import struct
    hdr = bytearray(128)
    hdr[0:4] = b"DDS "
    struct.pack_into("<I", hdr, 4, 124)
    struct.pack_into("<7I", hdr, 8, 0x0002100F, 16, 16, 0, 0, 0, 1)
    struct.pack_into("<I", hdr, 76, 32)
    struct.pack_into("<I", hdr, 80, 0x4)          # FOURCC
    hdr[84:88] = b"DXT1"
    try:
        DdsTranscoder(bytes(hdr)).decode_rgba(0, 0, 0)
    except (ValueError, NotImplementedError):
        pass


def test_corrupt_error_is_value_error():
    assert issubclass(CorruptFileError, ValueError)
