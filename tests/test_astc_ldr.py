"""Standard ASTC LDR 4x4..12x12 .basis decode conformance (pixel-exact vs
the reference transcoder's own unpack of reference-encoded files)."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.formats.constants import (
    BasisTexFormat,
    TranscoderTextureFormat as TF,
)
from basis_universal_tpu.transcoder import BasisTranscoder

SIZES = ["5x5", "6x6", "8x8", "10x6", "12x12"]


@pytest.fixture(scope="module")
def astc_ldr_golden(golden_dir, oracle, test_files):
    d = golden_dir / "astc_ldr"
    d.mkdir(exist_ok=True)
    src = d / "src.png"
    if not src.exists():
        img = np.asarray(
            Image.open(test_files / "kodim23.png").convert("RGB"))[:96, :144]
        Image.fromarray(img).save(src)
    for s in SIZES:
        out = d / f"b{s}.basis"
        if not out.exists():
            subprocess.run([str(oracle), f"-ldr_{s}", str(src), "-basis",
                            "-output_file", str(out)],
                           cwd=d, check=True, capture_output=True)
            subprocess.run([str(oracle), "-unpack", str(out)],
                           cwd=d, check=True, capture_output=True)
    return d


@pytest.mark.parametrize("size", SIZES)
def test_astc_ldr_decode_pixel_exact(astc_ldr_golden, size):
    d = astc_ldr_golden
    tr = BasisTranscoder((d / f"b{size}.basis").read_bytes())
    assert tr.tex_format == getattr(BasisTexFormat, f"ASTC_LDR_{size}")
    img = tr.transcode_image_level(0, 0, TF.RGBA32)
    # the RGBA32 unpack is deblocked by the oracle for >=10x8 blocks
    # (basisu_transcoder.cpp:43142) — comparing against it locks our
    # transcode-time deblock filter down too
    ref = np.asarray(Image.open(sorted(
        d.glob(f"b{size}_unpacked_rgba_RGBA32*.png"))[0]).convert("RGBA"))
    np.testing.assert_array_equal(img, ref)


def test_astc_ldr_block_targets(astc_ldr_golden):
    """Block-compressed targets re-encode from the decoded RGBA."""
    d = astc_ldr_golden
    tr = BasisTranscoder((d / "b6x6.basis").read_bytes())
    src = np.asarray(Image.open(d / "src.png").convert("RGB")).astype(np.float64)
    bc1 = tr.transcode_image_level(0, 0, TF.BC1_RGB)
    assert bc1.shape[-1] == 8
    from basis_universal_tpu.ops import gpu_unpack
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    by, bx = bc1.shape[:2]
    dec = blocks_to_image(
        gpu_unpack.unpack_bc1(bc1.reshape(-1, 8)).reshape(by, bx, 4, 4, 4),
        src.shape[1], src.shape[0])
    mse = ((dec[..., :3].astype(np.float64) - src) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 30.0


def test_astc_ldr_ktx2_decode(astc_ldr_golden, golden_dir, oracle):
    """Standard-ASTC KTX2 (VkFormat-identified, Zstd) decodes identically
    to the .basis path."""
    d = astc_ldr_golden
    out = d / "b6x6.ktx2"
    if not out.exists():
        subprocess.run([str(oracle), "-ldr_6x6", str(d / "src.png"),
                        "-output_file", str(out)],
                       cwd=d, check=True, capture_output=True)
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    k = Ktx2Transcoder(out.read_bytes())
    img = k.transcode_image_level(0, 0, 0, TF.RGBA32)
    ref = np.asarray(Image.open(
        d / "b6x6_unpacked_rgba_ASTC_LDR_6X6_RGBA_0000.png").convert("RGBA"))
    np.testing.assert_array_equal(img, ref)


def test_astc_ldr_4x4_encode_oracle(oracle, tmp_path, test_files):
    """Our ASTC LDR 4x4 encode (UASTC search + byte-exact repack): the
    reference unpacks both containers and matches our decode exactly."""
    from basis_universal_tpu import compressor

    img = np.asarray(Image.open(
        test_files / "kodim23.png").convert("RGB"))[:128, :128]
    out = compressor.compress(img, compressor.CompressorParams(
        tex_format=BasisTexFormat.ASTC_LDR_4x4, effort=2))
    tr = BasisTranscoder(out.basis_data)
    assert tr.tex_format == BasisTexFormat.ASTC_LDR_4x4
    dec = tr.transcode_image_level(0, 0, TF.RGBA32)
    mse = ((dec[..., :3].astype(np.float64) - img) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 40.0

    from basis_universal_tpu.transcoder import Ktx2Transcoder

    k = Ktx2Transcoder(out.ktx2_data)
    np.testing.assert_array_equal(k.transcode_image_level(0, 0, 0, TF.RGBA32),
                                  dec)
    for name, payload in (("a.basis", out.basis_data),
                          ("a.ktx2", out.ktx2_data)):
        p = tmp_path / name
        p.write_bytes(payload)
        r = subprocess.run([str(oracle), "-unpack", str(p)],
                           cwd=tmp_path, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr
    ref = np.asarray(Image.open(sorted(
        tmp_path.glob("a_unpacked_rgba_ASTC_LDR_4X4*png"))[0]).convert("RGBA"))
    np.testing.assert_array_equal(dec, ref)


@pytest.mark.parametrize("size", ["6x6", "8x8", "12x12"])
def test_astc_ldr_direct_encode_oracle(oracle, tmp_path, test_files, size):
    """The direct CEM 8/12 encoder for non-4x4 footprints: oracle unpacks
    our .basis and matches our decode exactly; quality sane for the bpp."""
    from basis_universal_tpu import compressor

    img = np.asarray(Image.open(
        test_files / "kodim23.png").convert("RGB"))[:126, :250]
    fmt = getattr(BasisTexFormat, f"ASTC_LDR_{size}")
    out = compressor.compress(img, compressor.CompressorParams(
        tex_format=fmt, effort=1))
    tr = BasisTranscoder(out.basis_data)
    assert tr.tex_format == fmt
    dec = tr.transcode_image_level(0, 0, TF.RGBA32)
    mse = ((dec[..., :3].astype(np.float64) - img) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 36.0

    p = tmp_path / "a.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    ref = np.asarray(Image.open(sorted(
        tmp_path.glob("a_unpacked_rgba_RGBA32*png"))[0]).convert("RGBA"))
    np.testing.assert_array_equal(dec, ref)


def test_xuastc_container_parse(golden_dir, oracle, test_files):
    """XUASTC LDR full-zstd container layer (round-2 groundwork): the
    stream split + raw-bits metadata parse on a reference-encoded file."""
    from basis_universal_tpu.codecs.astc import xuastc_ldr
    from basis_universal_tpu.formats.basis_file import BasisFile

    d = golden_dir / "astc_ldr"
    d.mkdir(exist_ok=True)
    src = d / "src.png"
    if not src.exists():
        img = np.asarray(
            Image.open(test_files / "kodim23.png").convert("RGB"))[:96, :144]
        Image.fromarray(img).save(src)
    out = d / "x6x6i.basis"
    if not out.exists():
        subprocess.run([str(oracle), "-ldr_6x6i", "-xuastc_zstd", str(src),
                        "-basis", "-output_file", str(out)],
                       cwd=d, check=True, capture_output=True)
    f = BasisFile(out.read_bytes())
    c = xuastc_ldr.parse_container(f.slice_data(0))
    assert (c.block_w, c.block_h) == (6, 6)
    assert (c.width, c.height) == (144, 96)
    assert c.syntax == xuastc_ldr.SYNTAX_FULL_ZSTD
    assert c.streams["mode_bytes"]
    # full decode (round 2): pixel dimensions survive the round trip
    _, rgba = xuastc_ldr.decode_rgba(f.slice_data(0))
    assert rgba.shape == (96, 144, 4)
