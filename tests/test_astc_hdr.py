"""General ASTC decoder (LDR + HDR) and UASTC HDR 4x4 decode conformance."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.codecs.astc import helpers as ah
from basis_universal_tpu.formats.basis_file import BasisFile
from basis_universal_tpu.formats.constants import (
    BasisTexFormat,
    TranscoderTextureFormat as TF,
)
from basis_universal_tpu.ops.etc1 import blocks_to_image
from basis_universal_tpu.transcoder import BasisTranscoder
from basis_universal_tpu.utils.image_io import load_exr


def test_general_astc_ldr_decode_matches_uastc(k23_crop_uastc):
    """The general ASTC decoder on our (byte-exact) ASTC repack must match
    the oracle-exact UASTC decoder pixel-for-pixel."""
    from basis_universal_tpu.codecs.uastc import astc_pack, decode as ud

    f = BasisFile(k23_crop_uastc[0])
    blocks = np.frombuffer(f.slice_data(0), dtype=np.uint8).reshape(-1, 16)[:512]
    astc = astc_pack.uastc_blocks_to_astc(blocks)
    ref = ud.decode_rgba(blocks)
    got = ah.decode_blocks_rgba8(astc, srgb=False)
    np.testing.assert_array_equal(ref, got)


@pytest.fixture(scope="module")
def oracle_hdr(golden_dir, oracle, test_files):
    out = golden_dir / "mem_hdr.basis"
    if not out.exists():
        subprocess.run(
            [str(oracle), "-hdr_4x4", str(test_files / "memorial.exr"),
             "-basis", "-output_file", str(out)],
            cwd=golden_dir, check=True, capture_output=True)
        subprocess.run([str(oracle), "-unpack", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
    ref = load_exr(golden_dir / "mem_hdr_hdr_unpacked_rgb_RGB_HALF_0_0000.exr")
    return out.read_bytes(), ref


def test_uastc_hdr_decode_bit_exact(oracle_hdr):
    data, ref = oracle_hdr
    tr = BasisTranscoder(data)
    assert tr.tex_format == BasisTexFormat.UASTC_HDR_4x4
    half = tr.transcode_image_level(0, 0, TF.RGB_HALF)
    ours = half.view(np.float16).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)


def test_uastc_hdr_targets(oracle_hdr):
    data, ref = oracle_hdr
    tr = BasisTranscoder(data)
    rgba_half = tr.transcode_image_level(0, 0, TF.RGBA_HALF)
    assert rgba_half.shape[-1] == 4
    assert (rgba_half[..., 3] == 0x3C00).all()  # alpha = 1.0
    astc = tr.transcode_image_level(0, 0, TF.ASTC_HDR_4x4_RGBA)
    assert astc.shape[-1] == 16
    e5 = tr.transcode_image_level(0, 0, TF.RGB_9E5)
    assert e5.dtype == np.uint32
    # 9E5 decode sanity: reconstruct and compare magnitudes
    m0 = (e5 & 511).astype(np.float32)
    ex = ((e5 >> 27) & 31).astype(np.float32) - 15 - 9
    r = m0 * np.exp2(ex)
    err = np.abs(r - ref[..., 0])
    rel = err / np.maximum(np.abs(ref[..., 0]), 1e-3)
    assert float(np.median(rel)) < 0.01


def test_exr_zip_loader(oracle_hdr, golden_dir):
    """The ZIP-compressed EXR reader (fixed prefix-sum predictor).
    Depends on oracle_hdr, which produces the unpacked EXR it reads."""
    ref = load_exr(golden_dir / "mem_hdr_hdr_unpacked_rgb_RGB_HALF_0_0000.exr")
    assert np.isfinite(ref).all()
    assert 100.0 < float(ref.max()) < 300.0


def test_hdr_encoder_roundtrip_and_oracle(test_files, oracle, tmp_path):
    """Our UASTC HDR encoder: round trip quality + oracle conformance
    (the reference unpacks our .basis/.ktx2 and matches our decode exactly)."""
    from basis_universal_tpu import compressor

    src = load_exr(test_files / "memorial.exr")[:128, :128]
    out = compressor.compress([src], compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_HDR_4x4, effort=2))
    tr = BasisTranscoder(out.basis_data)
    ours = tr.transcode_image_level(0, 0, TF.RGB_HALF).view(np.float16).astype(np.float32)
    mse = ((ours - src) ** 2).mean()
    rel_psnr = 10 * np.log10(float(src.max()) ** 2 / mse)
    assert rel_psnr > 45.0, rel_psnr

    p = tmp_path / "hdr.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    unp = list(tmp_path.glob("*unpacked_rgb_RGB_HALF*.exr"))
    assert unp
    ref = load_exr(unp[0])
    np.testing.assert_array_equal(ours, ref)

    p2 = tmp_path / "hdr.ktx2"
    p2.write_bytes(out.ktx2_data)
    r2 = subprocess.run([str(oracle), "-unpack", str(p2)],
                        cwd=tmp_path, capture_output=True, text=True)
    assert r2.returncode == 0, r2.stdout + r2.stderr


def test_bc6h_target(oracle_hdr):
    """UASTC HDR -> BC6H: decode our mode-11 blocks and compare with the
    ASTC decode ('typically a fraction of a dB' class conversion)."""
    from basis_universal_tpu.codecs.astc import hdr_encode

    data, ref = oracle_hdr
    tr = BasisTranscoder(data)
    bc6h = tr.transcode_image_level(0, 0, TF.BC6H)
    by, bx = bc6h.shape[:2]
    dec = hdr_encode.unpack_bc6h_mode11(bc6h.reshape(-1, 16))
    img = blocks_to_image(dec.reshape(by, bx, 4, 4, 3),
                          ref.shape[1], ref.shape[0])
    ours = img.view(np.float16).astype(np.float32)
    mse = ((ours - ref) ** 2).mean()
    rel_psnr = 10 * np.log10(float(ref.max()) ** 2 / mse)
    assert rel_psnr > 50.0, rel_psnr


def test_exr_piz_loader(golden_dir, oracle, test_files):
    """PIZ-compressed EXR reading (16-bit Huffman + 2D wavelet + LUT):
    our decode of Desk.exr must agree with the reference's tinyexr read
    to within UASTC-HDR codec loss (the only oracle available)."""
    ours = load_exr(test_files / "Desk.exr")
    assert ours.shape == (874, 644, 3)
    assert np.isfinite(ours).all()
    assert 200.0 < float(ours.max()) < 300.0

    d = golden_dir / "piz"
    d.mkdir(exist_ok=True)
    half = d / "desk_hdr_unpacked_rgb_RGB_HALF_0_0000.exr"
    if not half.exists():
        subprocess.run(
            [str(oracle), "-hdr_4x4", str(test_files / "Desk.exr"),
             "-basis", "-output_file", str(d / "desk.basis")],
            cwd=d, check=True, capture_output=True)
        subprocess.run([str(oracle), "-unpack", str(d / "desk.basis")],
                       cwd=d, check=True, capture_output=True)
    ref = load_exr(half)
    mse = ((ours - ref) ** 2).mean()
    rel = 10 * np.log10(float(ours.max()) ** 2 / mse)
    assert rel > 40.0, rel


@pytest.fixture(scope="module")
def oracle_hdr_6x6(golden_dir, oracle, test_files):
    out = golden_dir / "mem_hdr6.basis"
    if not out.exists():
        subprocess.run(
            [str(oracle), "-hdr_6x6", str(test_files / "memorial.exr"),
             "-basis", "-output_file", str(out)],
            cwd=golden_dir, check=True, capture_output=True)
        subprocess.run([str(oracle), "-unpack", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
    ref = load_exr(golden_dir / "mem_hdr6_hdr_unpacked_rgb_RGB_HALF_0_0000.exr")
    return out.read_bytes(), ref


def test_astc_hdr_6x6_decode_bit_exact(oracle_hdr_6x6):
    """ASTC HDR 6x6 .basis (raw 16-byte 6x6 HDR blocks incl. HDR
    void-extents) decodes bit-exactly vs the reference."""
    data, ref = oracle_hdr_6x6
    tr = BasisTranscoder(data)
    assert tr.tex_format == BasisTexFormat.ASTC_HDR_6x6
    half = tr.transcode_image_level(0, 0, TF.RGB_HALF)
    ours = half.view(np.float16).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)
    # passthrough + BC6H targets exist
    astc = tr.transcode_image_level(0, 0, TF.ASTC_HDR_6x6_RGBA)
    assert astc.shape[-1] == 16
    bc6h = tr.transcode_image_level(0, 0, TF.BC6H)
    assert bc6h.shape == (192, 128, 16)


def test_astc_hdr_6x6_ktx2_decode(oracle_hdr_6x6, golden_dir, oracle, test_files):
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    data, ref = oracle_hdr_6x6
    out = golden_dir / "mem_hdr6.ktx2"
    if not out.exists():
        subprocess.run(
            [str(oracle), "-hdr_6x6", str(test_files / "memorial.exr"),
             "-output_file", str(out)],
            cwd=golden_dir, check=True, capture_output=True)
    k = Ktx2Transcoder(out.read_bytes())
    half = k.transcode_image_level(0, 0, 0, TF.RGB_HALF)
    np.testing.assert_array_equal(
        half.view(np.float16).astype(np.float32), ref)


def test_astc_hdr_6x6_encode_oracle(oracle, tmp_path, test_files):
    """Our ASTC HDR 6x6 encoder (CEM 11, multi-grid weight candidates):
    oracle unpacks both containers and matches our decode exactly."""
    from basis_universal_tpu import compressor

    src = load_exr(test_files / "memorial.exr")[:192, :192]
    out = compressor.compress([src], compressor.CompressorParams(
        tex_format=BasisTexFormat.ASTC_HDR_6x6, effort=2))
    tr = BasisTranscoder(out.basis_data)
    assert tr.tex_format == BasisTexFormat.ASTC_HDR_6x6
    half = tr.transcode_image_level(0, 0, TF.RGB_HALF)
    ours = half.view(np.float16).astype(np.float32)
    mse = ((ours - src) ** 2).mean()
    rel = 10 * np.log10(float(src.max()) ** 2 / mse)
    assert rel > 27.0, rel  # 3.56bpp on a dark, detailed crop
    assert len(out.basis_data) < 192 * 192 * 0.5  # ~3.6 bpp vs 8 bpp 4x4

    for name, payload in (("h.basis", out.basis_data),
                          ("h.ktx2", out.ktx2_data)):
        p = tmp_path / name
        p.write_bytes(payload)
        r = subprocess.run([str(oracle), "-unpack", str(p)],
                           cwd=tmp_path, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr
    ref = load_exr(sorted(tmp_path.glob("h_hdr_unpacked_rgb_RGB_HALF*exr"))[0])
    np.testing.assert_array_equal(ours, ref)


def test_uastc_hdr_6x6_intermediate_decode(golden_dir, oracle, test_files):
    """The supercompressed UASTC HDR 6x6 intermediate stream decodes
    bit-exactly vs the reference's decode_6x6_hdr."""
    out = golden_dir / "mem6i.basis"
    if not out.exists():
        subprocess.run(
            [str(oracle), "-hdr_6x6i", str(test_files / "memorial.exr"),
             "-basis", "-output_file", str(out)],
            cwd=golden_dir, check=True, capture_output=True)
        subprocess.run([str(oracle), "-unpack", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
    ref = load_exr(golden_dir / "mem6i_hdr_unpacked_rgb_RGB_HALF_0_0000.exr")
    tr = BasisTranscoder(out.read_bytes())
    assert tr.tex_format == BasisTexFormat.UASTC_HDR_6x6_INTERMEDIATE
    half = tr.transcode_image_level(0, 0, TF.RGB_HALF)
    np.testing.assert_array_equal(
        half.view(np.float16).astype(np.float32), ref)
    bc6h = tr.transcode_image_level(0, 0, TF.BC6H)
    assert bc6h.shape == (192, 128, 16)


def test_uastc_hdr_6x6i_astc_passthrough(golden_dir, oracle):
    """The generic log→physical packer: reference decodes our packed
    6x6 HDR blocks to exactly the intermediate stream's pixels."""
    from basis_universal_tpu.formats import basis_file as bf
    from basis_universal_tpu.utils.crc import crc16

    data = (golden_dir / "mem6i.basis").read_bytes()
    tr = BasisTranscoder(data)
    phys = tr.transcode_image_level(0, 0, TF.ASTC_HDR_6x6_RGBA)
    half = tr.transcode_image_level(0, 0, TF.RGB_HALF)
    nby, nbx = phys.shape[:2]
    info = tr.get_image_level_info(0, 0)
    descs = [bf.SliceDesc(
        image_index=0, level_index=0, flags=0,
        orig_width=info.orig_width, orig_height=info.orig_height,
        num_blocks_x=nbx, num_blocks_y=nby,
        slice_data_crc16=crc16(phys.tobytes()))]
    wrapped = bf.write_basis_file(
        BasisTexFormat.ASTC_HDR_6x6, descs, [phys.tobytes()])
    tr2 = BasisTranscoder(wrapped)
    half2 = tr2.transcode_image_level(0, 0, TF.RGB_HALF)
    np.testing.assert_array_equal(half, half2)


def test_uastc_hdr_6x6i_encode_oracle(oracle, tmp_path, test_files):
    """Our intermediate encoder (BLOCK/RUN/SOLID, modes 0/9/10): the
    reference unpacks both containers (.basis + scheme-4 KTX2) and matches
    our decode exactly."""
    from basis_universal_tpu import compressor
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    src = load_exr(test_files / "memorial.exr")[:192, :192]
    out = compressor.compress([src], compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_HDR_6x6_INTERMEDIATE))
    tr = BasisTranscoder(out.basis_data)
    ours = tr.transcode_image_level(0, 0, TF.RGB_HALF) \
        .view(np.float16).astype(np.float32)
    k = Ktx2Transcoder(out.ktx2_data)
    np.testing.assert_array_equal(
        k.transcode_image_level(0, 0, 0, TF.RGB_HALF)
        .view(np.float16).astype(np.float32), ours)
    mse = ((ours - src) ** 2).mean()
    assert 10 * np.log10(float(src.max()) ** 2 / mse) > 26.0

    for name, payload in (("i.basis", out.basis_data),
                          ("i.ktx2", out.ktx2_data)):
        p = tmp_path / name
        p.write_bytes(payload)
        r = subprocess.run([str(oracle), "-unpack", str(p)],
                           cwd=tmp_path, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr
    ref = load_exr(sorted(tmp_path.glob("i_hdr_unpacked_rgb_RGB_HALF*exr"))[0])
    np.testing.assert_array_equal(ours, ref)


def test_uastc_hdr_mipmaps_oracle(oracle, tmp_path, test_files):
    """HDR mip chain (linear float kaiser): oracle unpacks every level and
    level 1 matches our decode exactly."""
    from basis_universal_tpu import compressor

    src = load_exr(test_files / "memorial.exr")[:128, :128]
    out = compressor.compress([src], compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_HDR_4x4, effort=1, mip_gen=True))
    tr = BasisTranscoder(out.basis_data)
    assert tr.get_total_image_levels(0) == 8
    p = tmp_path / "m.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    ref = load_exr(sorted(tmp_path.glob("m_hdr_unpacked_rgb_RGB_HALF_1*exr"))[0])
    ours = tr.transcode_image_level(0, 1, TF.RGB_HALF) \
        .view(np.float16).astype(np.float32)
    np.testing.assert_array_equal(ours, ref)
