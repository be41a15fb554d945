"""PVRTC1 4bpp transcode conformance (bit-exact vs the reference).

The reference CLI's -unpack mode writes a KTX1 per transcode target plus
the software-decoded PNGs, giving us both levels of oracle check:
  - our ETC1S/UASTC → PVRTC1 transcode bytes == the reference's KTX payload
  - our PVRTC1 software decoder == the reference's unpacked PNGs
"""

import struct
import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.formats.constants import TranscoderTextureFormat as TF
from basis_universal_tpu.ops import pvrtc1
from basis_universal_tpu.transcoder import BasisTranscoder


def _ktx1_payload(path):
    d = path.read_bytes()
    assert d[:4] == b"\xabKTX"
    kv_bytes = struct.unpack("<I", d[60:64])[0]
    ofs = 64 + kv_bytes
    size = struct.unpack("<I", d[ofs:ofs + 4])[0]
    return d[ofs + 4:ofs + 4 + size]


@pytest.fixture(scope="module")
def pvrtc_golden(golden_dir, oracle, test_files):
    """Oracle-encode a 256x128 (pow2, non-square block grid) crop as ETC1S
    and UASTC, with and without alpha, and unpack every PVRTC1 target."""
    d = golden_dir / "pvrtc1"
    d.mkdir(exist_ok=True)
    rgb_png = d / "p2.png"
    rgba_png = d / "p2a.png"
    if not rgb_png.exists():
        img = np.asarray(
            Image.open(test_files / "kodim23.png").convert("RGB"))[:128, :256]
        Image.fromarray(img).save(rgb_png)
        rng = np.random.default_rng(7)
        a = np.clip(rng.normal(170, 60, img.shape[:2]), 0, 255).astype(np.uint8)
        Image.fromarray(np.dstack([img, a]), "RGBA").save(rgba_png)
    jobs = {
        "etc1s_rgb": ([str(rgb_png)], "p2_etc1s"),
        "etc1s_rgba": ([str(rgba_png)], "p2a_etc1s"),
        "uastc_rgb": (["-uastc", str(rgb_png)], "p2_uastc"),
        "uastc_rgba": (["-uastc", str(rgba_png)], "p2a_uastc"),
    }
    for args, stem in jobs.values():
        out = d / f"{stem}.basis"
        if not out.exists():
            subprocess.run([str(oracle), *args, "-basis",
                            "-output_file", str(out)],
                           cwd=d, check=True, capture_output=True)
            subprocess.run([str(oracle), "-unpack", str(out)],
                           cwd=d, check=True, capture_output=True)
    return d, jobs


@pytest.mark.parametrize("src,fmt", [
    ("etc1s_rgb", TF.PVRTC1_4_RGB),
    ("etc1s_rgba", TF.PVRTC1_4_RGBA),
    ("uastc_rgb", TF.PVRTC1_4_RGB),
    ("uastc_rgba", TF.PVRTC1_4_RGBA),
])
def test_pvrtc1_transcode_bit_exact(pvrtc_golden, src, fmt):
    d, jobs = pvrtc_golden
    stem = jobs[src][1]
    name = "PVRTC1_4_RGB" if fmt == TF.PVRTC1_4_RGB else "PVRTC1_4_RGBA"
    ref = _ktx1_payload(d / f"{stem}_transcoded_{name}_0000.ktx")
    tr = BasisTranscoder((d / f"{stem}.basis").read_bytes())
    ours = np.asarray(tr.transcode_image_level(0, 0, fmt)).tobytes()
    assert ours == ref


def test_pvrtc1_decoder_pixel_exact(pvrtc_golden):
    d, jobs = pvrtc_golden
    # opaque
    data = _ktx1_payload(d / "p2_etc1s_transcoded_PVRTC1_4_RGB_0000.ktx")
    ref = np.asarray(
        Image.open(d / "p2_etc1s_unpacked_rgb_PVRTC1_4_RGB_0000.png")
        .convert("RGB"))
    dec = pvrtc1.unpack_pvrtc1_4(data, 256, 128)
    np.testing.assert_array_equal(dec[..., :3], ref)
    # alpha
    data = _ktx1_payload(d / "p2a_etc1s_transcoded_PVRTC1_4_RGBA_0000.ktx")
    ref = np.dstack([
        np.asarray(Image.open(
            d / "p2a_etc1s_unpacked_rgb_PVRTC1_4_RGBA_0000.png").convert("RGB")),
        np.asarray(Image.open(
            d / "p2a_etc1s_unpacked_a_PVRTC1_4_RGBA_0000.png").convert("L"))])
    dec = pvrtc1.unpack_pvrtc1_4(data, 256, 128)
    np.testing.assert_array_equal(dec, ref)


def test_pvrtc1_quality_sane(pvrtc_golden):
    """Round-trip PSNR: PVRTC1 is the lowest-quality target by design, but
    should still be a recognizable image (> 25 dB on this crop)."""
    d, jobs = pvrtc_golden
    tr = BasisTranscoder((d / "p2_etc1s.basis").read_bytes())
    data = np.asarray(tr.transcode_image_level(0, 0, TF.PVRTC1_4_RGB)).tobytes()
    dec = pvrtc1.unpack_pvrtc1_4(data, 256, 128)[..., :3].astype(np.float64)
    src = np.asarray(Image.open(d / "p2.png").convert("RGB")).astype(np.float64)
    mse = ((dec - src) ** 2).mean()
    psnr = 10 * np.log10(255.0 ** 2 / mse)
    assert psnr > 25.0, psnr


def test_pvrtc1_rejects_non_pow2():
    with pytest.raises(ValueError):
        pvrtc1.etc1s_to_pvrtc1_4_rgb(
            np.zeros((3, 4), np.int32), np.zeros((3, 4), np.int32),
            np.zeros((1, 3), np.int32), np.zeros(1, np.int32),
            np.zeros((1, 16), np.int32))


def test_pvrtc1_swizzle_square_and_rect():
    sw = pvrtc1.swizzle_indices(4, 4)
    assert sorted(sw.ravel().tolist()) == list(range(16))
    assert sw[0, 0] == 0 and sw[1, 1] == 3
    sw = pvrtc1.swizzle_indices(64, 32)  # non-square: linear tail on x
    assert sorted(sw.ravel().tolist()) == list(range(64 * 32))


# ---------------------------------------------------------------------------
# FXT1 (shares the pow2 golden fixtures)
# ---------------------------------------------------------------------------


def test_fxt1_decoder_pixel_exact(pvrtc_golden):
    from basis_universal_tpu.ops import gpu_unpack

    d, jobs = pvrtc_golden
    data = _ktx1_payload(d / "p2_etc1s_transcoded_FXT1_RGB_0000.ktx")
    blocks = np.frombuffer(data, np.uint8).reshape(32, 32, 16)
    ref = np.asarray(Image.open(
        d / "p2_etc1s_unpacked_rgb_FXT1_RGB_0000.png").convert("RGB"))
    dec = gpu_unpack.unpack_fxt1(blocks, 256, 128)
    np.testing.assert_array_equal(dec[..., :3], ref)


@pytest.mark.parametrize("src", ["etc1s_rgb", "uastc_rgb"])
def test_fxt1_transcode_near_lossless_vs_bc1(pvrtc_golden, src):
    """FXT1 CC_MIXED repacks our DXT1 output; only the lerp rounding
    differs (+1/3 rounding), so decoded pixels stay within ±1 of BC1."""
    from basis_universal_tpu.ops import gpu_unpack
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    d, jobs = pvrtc_golden
    stem = jobs[src][1]
    tr = BasisTranscoder((d / f"{stem}.basis").read_bytes())
    fxt = np.asarray(tr.transcode_image_level(0, 0, TF.FXT1_RGB))
    assert fxt.shape == (32, 32, 16)
    ours = gpu_unpack.unpack_fxt1(fxt, 256, 128)
    bc1 = np.asarray(tr.transcode_image_level(0, 0, TF.BC1_RGB))
    bimg = blocks_to_image(
        gpu_unpack.unpack_bc1(bc1.reshape(-1, 8)).reshape(32, 64, 4, 4, 4),
        256, 128)
    delta = np.abs(ours[..., :3].astype(int) - bimg[..., :3].astype(int))
    assert delta.max() <= 1
    src_px = np.asarray(
        Image.open(d / "p2.png").convert("RGB")).astype(np.float64)
    mse = ((ours[..., :3].astype(np.float64) - src_px) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 30.0


# ---------------------------------------------------------------------------
# PVRTC2 (shares the pow2 golden fixtures; PVRTC2 doesn't need pow2 but
# the fixture files already cover both codecs and alpha variants)
# ---------------------------------------------------------------------------


def test_pvrtc2_rgb_transcode_bit_exact(pvrtc_golden):
    d, jobs = pvrtc_golden
    ref = _ktx1_payload(d / "p2_etc1s_transcoded_PVRTC2_4_RGB_0000.ktx")
    tr = BasisTranscoder((d / "p2_etc1s.basis").read_bytes())
    ours = np.asarray(tr.transcode_image_level(0, 0, TF.PVRTC2_4_RGB))
    assert ours.tobytes() == ref


def test_pvrtc2_decoder_pixel_exact(pvrtc_golden):
    from basis_universal_tpu.ops import pvrtc2
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    d, jobs = pvrtc_golden
    data = _ktx1_payload(d / "p2_etc1s_transcoded_PVRTC2_4_RGB_0000.ktx")
    ref = np.asarray(Image.open(
        d / "p2_etc1s_unpacked_rgb_PVRTC2_4_RGB_0000.png").convert("RGB"))
    dec = pvrtc2.unpack_pvrtc2(np.frombuffer(data, np.uint8).reshape(-1, 8))
    img = blocks_to_image(dec.reshape(32, 64, 4, 4, 4), 256, 128)
    np.testing.assert_array_equal(img[..., :3], ref)
    # translucent blocks
    data = _ktx1_payload(d / "p2a_etc1s_transcoded_PVRTC2_4_RGBA_0000.ktx")
    ref = np.dstack([
        np.asarray(Image.open(
            d / "p2a_etc1s_unpacked_rgb_PVRTC2_4_RGBA_0000.png").convert("RGB")),
        np.asarray(Image.open(
            d / "p2a_etc1s_unpacked_a_PVRTC2_4_RGBA_0000.png").convert("L"))])
    dec = pvrtc2.unpack_pvrtc2(np.frombuffer(data, np.uint8).reshape(-1, 8))
    img = blocks_to_image(dec.reshape(32, 64, 4, 4, 4), 256, 128)
    np.testing.assert_array_equal(img, ref)


def test_pvrtc2_rgba_quality(pvrtc_golden):
    """Our translucent construction is not bit-identical to the
    reference's 4D-PCA path; require PSNR within 0.6 dB of it."""
    from basis_universal_tpu.ops import pvrtc2
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    d, jobs = pvrtc_golden
    src = np.asarray(Image.open(d / "p2a.png").convert("RGBA")).astype(np.float64)
    tr = BasisTranscoder((d / "p2a_etc1s.basis").read_bytes())
    ours = np.asarray(tr.transcode_image_level(0, 0, TF.PVRTC2_4_RGBA))
    img = blocks_to_image(
        pvrtc2.unpack_pvrtc2(ours.reshape(-1, 8)).reshape(32, 64, 4, 4, 4),
        256, 128).astype(np.float64)
    ref = np.dstack([
        np.asarray(Image.open(
            d / "p2a_etc1s_unpacked_rgb_PVRTC2_4_RGBA_0000.png").convert("RGB")),
        np.asarray(Image.open(
            d / "p2a_etc1s_unpacked_a_PVRTC2_4_RGBA_0000.png").convert("L"))
    ]).astype(np.float64)
    psnr = lambda m: 10 * np.log10(255.0 ** 2 / m)  # noqa: E731
    p_ours = psnr(((img - src) ** 2).mean())
    p_ref = psnr(((ref - src) ** 2).mean())
    assert p_ours > p_ref - 0.6, (p_ours, p_ref)


def test_pvrtc2_uastc_path(pvrtc_golden):
    from basis_universal_tpu.ops import pvrtc2
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    d, jobs = pvrtc_golden
    src = np.asarray(Image.open(d / "p2.png").convert("RGB")).astype(np.float64)
    tr = BasisTranscoder((d / "p2_uastc.basis").read_bytes())
    ours = np.asarray(tr.transcode_image_level(0, 0, TF.PVRTC2_4_RGB))
    img = blocks_to_image(
        pvrtc2.unpack_pvrtc2(ours.reshape(-1, 8)).reshape(32, 64, 4, 4, 4),
        256, 128)[..., :3].astype(np.float64)
    mse = ((img - src) ** 2).mean()
    assert 10 * np.log10(255.0 ** 2 / mse) > 38.0
