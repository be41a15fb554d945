"""XUASTC LDR decode conformance vs the reference oracle.

Drives the full-zstd syntax across block sizes, DCT quality, alpha and the
shipped golden file; every decode must be pixel-exact against the oracle's
own unpack (the XUASTC spec demands deterministic decode)."""

import pathlib
import struct
import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.codecs.astc import xuastc_ldr
from basis_universal_tpu.formats import ktx2 as K

TEST_FILES = pathlib.Path("/root/reference/test_files")


def _oracle_xuastc(golden_dir, oracle, src: str, mode: str, name: str,
                   extra=()):
    out = golden_dir / f"{name}.ktx2"
    if not out.exists():
        subprocess.run(
            [str(oracle), mode, "-xuastc_zstd", *extra, str(TEST_FILES / src),
             "-ktx2", "-output_file", str(out)],
            check=True, capture_output=True, timeout=1200)
        subprocess.run([str(oracle), "-unpack", str(out)],
                       cwd=golden_dir, check=True, capture_output=True,
                       timeout=1200)
    return out


def _ref_unpack_rgba(golden_dir, name: str):
    cands = sorted(golden_dir.glob(f"{name}_unpacked_rgba_ASTC*.png")) or \
        sorted(golden_dir.glob(f"{name}_unpacked_rgb_ASTC*.png"))
    return np.asarray(Image.open(cands[0]).convert("RGBA"))


def _ref_astc_payload(golden_dir, name: str):
    ktx = sorted(golden_dir.glob(f"{name}_transcoded_ASTC*.ktx"))[0]
    raw = ktx.read_bytes()
    kv = struct.unpack_from("<I", raw, 60)[0]
    imgsize = struct.unpack_from("<I", raw, 64 + kv)[0]
    return np.frombuffer(raw, np.uint8, imgsize, 64 + kv + 4).reshape(-1, 16)


CASES = [
    ("kodim23.png", "-ldr_4x4i", (), "xu_k23_4x4"),
    ("kodim23.png", "-ldr_6x6i", (), "xu_k23_6x6"),
    ("kodim23.png", "-ldr_4x4i", ("-quality", "60"), "xu_k23_4x4_q60"),
    ("kodim23.png", "-ldr_6x6i", ("-quality", "40"), "xu_k23_6x6_q40"),
    ("alpha0.png", "-ldr_8x8i", (), "xu_a0_8x8"),
    ("kodim23.png", "-ldr_12x12i", (), "xu_k23_12x12"),
]


@pytest.mark.parametrize("src,mode,extra,name", CASES)
def test_decode_pixel_exact(golden_dir, oracle, src, mode, extra, name):
    _oracle_xuastc(golden_dir, oracle, src, mode, name, extra)
    data = K.Ktx2File((golden_dir / f"{name}.ktx2").read_bytes()).level_data(0)
    c, rgba = xuastc_ldr.decode_rgba(data)
    ref = _ref_unpack_rgba(golden_dir, name)
    if not c.has_alpha:
        ref = ref.copy()
        ref[..., 3] = 255
    np.testing.assert_array_equal(rgba, ref)


def test_shipped_golden_zstd(golden_dir, oracle):
    src = TEST_FILES / "base_xuastc_zstd.ktx2"
    dst = golden_dir / "base_xuastc_zstd.ktx2"
    if not dst.exists():
        dst.write_bytes(src.read_bytes())
        subprocess.run([str(oracle), "-unpack", str(dst)], cwd=golden_dir,
                       check=True, capture_output=True, timeout=1200)
    data = K.Ktx2File(dst.read_bytes()).level_data(0)
    c, rgba = xuastc_ldr.decode_rgba(data)
    assert (c.block_w, c.block_h) == (5, 4)
    assert c.use_dct
    ref = _ref_unpack_rgba(golden_dir, "base_xuastc_zstd").copy()
    ref[..., 3] = 255
    np.testing.assert_array_equal(rgba, ref)


def test_physical_astc_alpha_byte_exact(golden_dir, oracle):
    """Alpha file's reconstructed physical ASTC matches the oracle's
    transcoded payload byte-for-byte."""
    _oracle_xuastc(golden_dir, oracle, "alpha0.png", "-ldr_8x8i", "xu_a0_8x8")
    data = K.Ktx2File(
        (golden_dir / "xu_a0_8x8.ktx2").read_bytes()).level_data(0)
    _, ours = xuastc_ldr.decode_astc_physical(data)
    ref = _ref_astc_payload(golden_dir, "xu_a0_8x8")
    assert (ours == ref).all()


def test_shipped_golden_arith(golden_dir, oracle):
    """The FullArith decode-stability golden file decodes pixel-exact."""
    src = TEST_FILES / "base_xuastc_arith.ktx2"
    dst = golden_dir / "base_xuastc_arith.ktx2"
    if not dst.exists():
        dst.write_bytes(src.read_bytes())
        subprocess.run([str(oracle), "-unpack", str(dst)], cwd=golden_dir,
                       check=True, capture_output=True, timeout=1200)
    data = K.Ktx2File(dst.read_bytes()).level_data(0)
    assert data[0] & 3 == xuastc_ldr.SYNTAX_FULL_ARITH
    c, rgba = xuastc_ldr.decode_rgba(data)
    ref = _ref_unpack_rgba(golden_dir, "base_xuastc_arith").copy()
    if not c.has_alpha:
        ref[..., 3] = 255
    np.testing.assert_array_equal(rgba, ref)


@pytest.mark.parametrize("syntax_flag,name", [
    ("-xuastc_hybrid", "xu_k23_4x4_hyb"),
    ("-xuastc_arith", "xu_k23_4x4_arith"),
])
def test_decode_arith_syntaxes(golden_dir, oracle, syntax_flag, name):
    out = golden_dir / f"{name}.ktx2"
    if not out.exists():
        subprocess.run(
            [str(oracle), "-ldr_4x4i", syntax_flag, "-quality", "70",
             str(TEST_FILES / "kodim23.png"), "-ktx2",
             "-output_file", str(out)],
            check=True, capture_output=True, timeout=1200)
        subprocess.run([str(oracle), "-unpack", str(out)], cwd=golden_dir,
                       check=True, capture_output=True, timeout=1200)
    data = K.Ktx2File(out.read_bytes()).level_data(0)
    c, rgba = xuastc_ldr.decode_rgba(data)
    ref = _ref_unpack_rgba(golden_dir, name).copy()
    ref[..., 3] = 255
    np.testing.assert_array_equal(rgba, ref)


def test_encode_oracle_conformance(golden_dir, oracle):
    """Our XUASTC encoder's KTX2 is accepted by the reference transcoder and
    decodes to exactly the pixels our own decoder produces."""
    from basis_universal_tpu import compressor
    from basis_universal_tpu.formats.constants import BasisTexFormat

    img = np.asarray(
        Image.open(TEST_FILES / "kodim23.png").convert("RGBA"))[:128, :160]
    params = compressor.CompressorParams(
        tex_format=BasisTexFormat.XUASTC_LDR_4x4)
    out = compressor.compress(img, params)
    p = golden_dir / "ours_xu_k23crop.ktx2"
    p.write_bytes(out.ktx2_data)
    subprocess.run([str(oracle), "-unpack", str(p)], cwd=golden_dir,
                   check=True, capture_output=True, timeout=1200)
    ref = _ref_unpack_rgba(golden_dir, "ours_xu_k23crop").copy()
    ref[..., 3] = 255
    data = K.Ktx2File(out.ktx2_data).level_data(0)
    c, ours = xuastc_ldr.decode_rgba(data)
    np.testing.assert_array_equal(ours, ref)
    # README envelope: lossless supercompression beats raw 8 bpp ASTC
    assert len(out.ktx2_data) * 8 / (128 * 160) < 8.0


@pytest.mark.parametrize("syntax", ["hybrid", "arith"])
def test_encode_arith_syntaxes_roundtrip(syntax):
    """Encode-side FullArith / HybridArithZstd: pixel-identical to the
    full-zstd emission of the same plan (same blocks, different entropy
    syntax; reference syntax ids basisu_transcoder_internal.h:2177-2184)."""
    from basis_universal_tpu.codecs.astc import xuastc_encode

    img = np.asarray(
        Image.open(TEST_FILES / "kodim23.png").convert("RGBA"))[:96, :132]
    base = xuastc_encode.encode_image(img, 6, 6, has_alpha=False,
                                      srgb=False, effort=1)
    _, rgba0 = xuastc_ldr.decode_rgba(base)
    data = xuastc_encode.encode_image(img, 6, 6, has_alpha=False,
                                      srgb=False, effort=1, syntax=syntax)
    assert data[0] & 3 == (1 if syntax == "hybrid" else 0)
    _, rgba = xuastc_ldr.decode_rgba(data)
    np.testing.assert_array_equal(rgba, rgba0)
    # lossy DCT emission through the arith layer too
    lossy0 = xuastc_encode.encode_image(img, 6, 6, has_alpha=False,
                                        srgb=False, effort=1,
                                        dct_quality=50.0)
    lossy = xuastc_encode.encode_image(img, 6, 6, has_alpha=False,
                                       srgb=False, effort=1,
                                       dct_quality=50.0, syntax=syntax)
    _, l0 = xuastc_ldr.decode_rgba(lossy0)
    _, l1 = xuastc_ldr.decode_rgba(lossy)
    np.testing.assert_array_equal(l1, l0)


def test_encode_arith_oracle_conformance(golden_dir, oracle):
    """Our FullArith-syntax KTX2 is accepted by the reference transcoder
    and matches our own decode pixel-exactly; 'auto' picks the smallest
    syntax (the reference's per-image pick)."""
    from basis_universal_tpu import compressor
    from basis_universal_tpu.formats.constants import BasisTexFormat

    img = np.asarray(
        Image.open(TEST_FILES / "kodim23.png").convert("RGBA"))[:96, :132]
    params = compressor.CompressorParams(
        tex_format=BasisTexFormat.XUASTC_LDR_6x6, quality_level=100,
        xuastc_syntax="auto")
    out = compressor.compress(img, params)
    data = K.Ktx2File(out.ktx2_data).level_data(0)
    assert data[0] & 3 in (0, 1)        # an arith syntax won on this crop
    p = golden_dir / "ours_xu_arith_k23crop.ktx2"
    p.write_bytes(out.ktx2_data)
    subprocess.run([str(oracle), "-unpack", str(p)], cwd=golden_dir,
                   check=True, capture_output=True, timeout=1200)
    ref = _ref_unpack_rgba(golden_dir, "ours_xu_arith_k23crop").copy()
    ref[..., 3] = 255
    c, ours = xuastc_ldr.decode_rgba(data)
    np.testing.assert_array_equal(ours, ref)


def test_encode_solid_and_runs_roundtrip():
    """Synthetic image exercising SOLID blocks and RUN coding."""
    from basis_universal_tpu.codecs.astc import xuastc_encode

    img = np.zeros((64, 64, 4), dtype=np.uint8)
    img[..., :3] = 40
    img[..., 3] = 255
    img[20:40, 8:56, 0] = 200            # a band of non-solid content
    img[20:40, 8:56, 1] = np.arange(48, dtype=np.uint8)[None, :] * 3
    stream = xuastc_encode.encode_image(img, 4, 4, has_alpha=False,
                                        srgb=False)
    c, rgba = xuastc_ldr.decode_rgba(stream)
    assert c.width == 64 and not c.has_alpha
    # solid regions must round-trip exactly
    np.testing.assert_array_equal(rgba[:16, :, :3], img[:16, :, :3])


def test_ktx2_transcoder_xuastc_path(golden_dir, oracle):
    from basis_universal_tpu.formats.constants import (
        TranscoderTextureFormat as TF)
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    _oracle_xuastc(golden_dir, oracle, "kodim23.png", "-ldr_6x6i",
                   "xu_k23_6x6")
    t = Ktx2Transcoder((golden_dir / "xu_k23_6x6.ktx2").read_bytes())
    fmt = t.get_basis_tex_format()
    assert fmt is not None and fmt.name == "XUASTC_LDR_6x6"
    rgba = t.transcode_image_level(0, 0, 0, TF.RGBA32)
    ref = _ref_unpack_rgba(golden_dir, "xu_k23_6x6").copy()
    ref[..., 3] = 255
    np.testing.assert_array_equal(rgba, ref)


def test_ktx2_array_and_mips(golden_dir, oracle):
    """Multi-slice KTX2 (SGD per-slice descs): oracle arrays/mips decode
    pixel-exact, and our multi-layer encode round-trips through the
    oracle."""
    import subprocess

    import numpy as np
    from PIL import Image

    from basis_universal_tpu import compressor
    from basis_universal_tpu.formats.constants import (
        BasisTexFormat, TranscoderTextureFormat as TF)
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    arr = golden_dir / "xu_arr.ktx2"
    if not arr.exists():
        subprocess.run(
            [str(oracle), "-ldr_4x4i", "-tex_array",
             str(TEST_FILES / "kodim03.png"), str(TEST_FILES / "kodim23.png"),
             "-ktx2", "-output_file", str(arr)],
            check=True, capture_output=True, timeout=1200)
        subprocess.run([str(oracle), "-unpack", str(arr)], cwd=golden_dir,
                       check=True, capture_output=True, timeout=1200)
    t = Ktx2Transcoder(arr.read_bytes())
    assert t.get_layers() == 2
    for lay in range(2):
        ours = t.transcode_image_level(0, lay, 0, TF.RGBA32)
        ref = np.asarray(Image.open(
            golden_dir / ("xu_arr_unpacked_rgba_ASTC_LDR_4X4_RGBA_"
                          f"face_0_layer_{lay:04d}.png")).convert("RGBA"))
        np.testing.assert_array_equal(ours, ref)

    # our own 2-layer encode: reference CLI must unpack it identically
    i0 = np.asarray(Image.open(
        TEST_FILES / "kodim03.png").convert("RGBA"))[:64, :80]
    i1 = np.asarray(Image.open(
        TEST_FILES / "kodim23.png").convert("RGBA"))[:64, :80]
    out = compressor.compress([i0, i1], compressor.CompressorParams(
        tex_format=BasisTexFormat.XUASTC_LDR_4x4))
    p = golden_dir / "xu_ours_arr.ktx2"
    p.write_bytes(out.ktx2_data)
    subprocess.run([str(oracle), "-unpack", str(p)], cwd=golden_dir,
                   check=True, capture_output=True, timeout=1200)
    t2 = Ktx2Transcoder(out.ktx2_data)
    for lay in range(2):
        ours = t2.transcode_image_level(0, lay, 0, TF.RGBA32)
        ref = np.asarray(Image.open(
            golden_dir / ("xu_ours_arr_unpacked_rgba_ASTC_LDR_4X4_RGBA_"
                          f"face_0_layer_{lay:04d}.png")).convert("RGBA"))
        np.testing.assert_array_equal(ours, ref)


def test_transcode_deblocking_matches_oracle(golden_dir, oracle):
    """KTX2 DeblockFilterID-driven CPU deblock on non-ASTC targets
    (basisu_transcoder.h:273-280, deblock_block_region_interior
    .cpp:42428): a >=10x8 reference file carries the key and our RGBA32
    transcode must match basisu -unpack pixel-exactly; a 6x6 file carries
    no key and must stay unfiltered."""
    from basis_universal_tpu.formats.constants import (
        TranscoderTextureFormat as TF)
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    for mode, name, want_key in (("-ldr_10x10i", "xu_deblock_10x10", 1),
                                 ("-ldr_6x6i", "xu_nodeblock_6x6", 0)):
        _oracle_xuastc(golden_dir, oracle, "kodim23.png", mode, name,
                       ("-quality", "75"))
        tr = Ktx2Transcoder((golden_dir / f"{name}.ktx2").read_bytes())
        tr.start_transcoding()
        assert tr.get_deblocking_filter_index() == want_key
        ours = tr.transcode_image_level(0, 0, 0, TF.RGBA32)
        ref_png = sorted(
            golden_dir.glob(f"{name}_unpacked_rgba_RGBA32*.png"))[0]
        ref = np.asarray(Image.open(ref_png).convert("RGBA"))
        np.testing.assert_array_equal(ours[..., :3], ref[..., :3])
