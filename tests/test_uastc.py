"""UASTC LDR 4x4: decode conformance vs the oracle, encoder round trips,
container wiring, and transcode targets."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu import compressor
from basis_universal_tpu.codecs.uastc import decode as ud
from basis_universal_tpu.codecs.uastc import encode as ue
from basis_universal_tpu.codecs.uastc import tables as T
from basis_universal_tpu.formats.basis_file import BasisFile
from basis_universal_tpu.formats.constants import (
    BasisTexFormat,
    TranscoderTextureFormat as TF,
)
from basis_universal_tpu.ops.etc1 import blocks_to_image, image_to_blocks
from basis_universal_tpu.transcoder import BasisTranscoder, Ktx2Transcoder


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0


@pytest.fixture(scope="module")
def oracle_uastc(k23_crop_uastc):
    """Shared session fixture (conftest.k23_crop_uastc): (.basis, RGBA)."""
    return k23_crop_uastc


def test_decode_oracle_exact(oracle_uastc):
    data, ref_rgba = oracle_uastc
    f = BasisFile(data)
    assert f.tex_format == BasisTexFormat.UASTC_LDR_4x4
    s = f.slices[0]
    blocks = np.frombuffer(f.slice_data(0), dtype=np.uint8).reshape(-1, 16)
    rgba = ud.decode_rgba(blocks)
    img = blocks_to_image(rgba.reshape(s.num_blocks_y, s.num_blocks_x, 4, 4, 4),
                          s.orig_width, s.orig_height)
    np.testing.assert_array_equal(img, ref_rgba)


def test_decode_oracle_exact_alpha(golden_dir, oracle, test_files):
    src = test_files / "alpha0.png"
    out = golden_dir / "alpha0_uastc.basis"
    if not out.exists():
        subprocess.run([str(oracle), "-uastc", str(src), "-basis",
                        "-output_file", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
        subprocess.run([str(oracle), "-unpack", str(out)],
                       cwd=golden_dir, check=True, capture_output=True)
    unp = sorted(golden_dir.glob("alpha0_uastc_unpacked_rgba_RGBA32*.png"))[0]
    ref = np.asarray(Image.open(unp).convert("RGBA"))
    tr = BasisTranscoder(out.read_bytes())
    ours = tr.transcode_image_level(0, 0, TF.RGBA32)
    np.testing.assert_array_equal(ours, ref)


def test_encode_roundtrip_quality(test_files):
    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGBA"))[:128, :160]
    px = image_to_blocks(img).astype(np.float32)
    by, bx = px.shape[:2]
    ub = ue.encode_blocks(px.reshape(-1, 16, 4), effort=2, has_alpha=False)
    rgba = ud.decode_rgba(ub)
    out = blocks_to_image(rgba.reshape(by, bx, 4, 4, 4), 160, 128)
    assert _psnr(out[..., :3], img[..., :3]) > 38.0


def test_encode_alpha_quality(test_files):
    img = np.asarray(Image.open(test_files / "alpha0.png").convert("RGBA"))[:64, :64]
    px = image_to_blocks(img).astype(np.float32)
    by, bx = px.shape[:2]
    ub = ue.encode_blocks(px.reshape(-1, 16, 4), effort=2, has_alpha=True)
    rgba = ud.decode_rgba(ub)
    out = blocks_to_image(rgba.reshape(by, bx, 4, 4, 4), 64, 64)
    assert _psnr(out[..., 3], img[..., 3]) > 35.0


def test_our_uastc_basis_accepted_by_oracle(test_files, oracle, tmp_path):
    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))[:64, :96]
    params = compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=2)
    out = compressor.compress(img, params)
    p = tmp_path / "ours_uastc.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    unp = list(tmp_path.glob("*unpacked_rgba_RGBA32*.png"))
    assert unp
    ref = np.asarray(Image.open(unp[0]).convert("RGBA"))
    tr = BasisTranscoder(out.basis_data)
    ours = tr.transcode_image_level(0, 0, TF.RGBA32)
    np.testing.assert_array_equal(ref, ours)


def test_our_uastc_ktx2_roundtrip(test_files, oracle, tmp_path):
    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))[:64, :96]
    params = compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=1)
    out = compressor.compress(img, params)
    tr = Ktx2Transcoder(out.ktx2_data)
    assert tr.get_basis_tex_format() == BasisTexFormat.UASTC_LDR_4x4
    rgba = tr.transcode_image_level(0, 0, 0, TF.RGBA32)
    assert _psnr(rgba[..., :3], img) > 38.0
    # oracle accepts the zstd-supercompressed KTX2
    p = tmp_path / "ours_uastc.ktx2"
    p.write_bytes(out.ktx2_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr


def test_uastc_transcode_targets(oracle_uastc):
    data, ref_rgba = oracle_uastc
    tr = BasisTranscoder(data)
    rgba = tr.transcode_image_level(0, 0, TF.RGBA32)
    from basis_universal_tpu.ops import gpu_unpack

    bc7 = tr.transcode_image_level(0, 0, TF.BC7_RGBA)
    by, bx = bc7.shape[:2]
    dec = gpu_unpack.unpack_bc7_mode5(bc7.reshape(-1, 16)).reshape(by, bx, 4, 4, 4)
    img = blocks_to_image(dec, rgba.shape[1], rgba.shape[0])
    assert _psnr(img[..., :3], rgba[..., :3]) > 33.0

    bc1 = tr.transcode_image_level(0, 0, TF.BC1_RGB)
    dec1 = gpu_unpack.unpack_bc1(bc1.reshape(-1, 8)).reshape(by, bx, 4, 4, 4)
    img1 = blocks_to_image(dec1, rgba.shape[1], rgba.shape[0])
    assert _psnr(img1[..., :3], rgba[..., :3]) > 28.0


def test_astc_repack_byte_exact(oracle_uastc, golden_dir, oracle):
    """Our UASTC -> ASTC physical repack must be byte-identical to the
    reference transcoder's own ASTC output (lossless, deterministic)."""
    import struct

    data, _ = oracle_uastc
    # the oracle -unpack run produced the transcoded ASTC .ktx alongside
    ktx = sorted(golden_dir.glob("k23_crop_uastc_transcoded_ASTC*\
.ktx".replace("\\", "")))
    assert ktx, list(golden_dir.iterdir())
    raw = ktx[0].read_bytes()
    kvd = struct.unpack_from("<I", raw, 12 + 12 * 4)[0]
    ofs = 12 + 13 * 4 + kvd
    (imgsize,) = struct.unpack_from("<I", raw, ofs)
    ref_blocks = np.frombuffer(raw, np.uint8, imgsize, ofs + 4).reshape(-1, 16)

    from basis_universal_tpu.codecs.uastc import astc_pack

    f = BasisFile(data)
    blocks = np.frombuffer(f.slice_data(0), dtype=np.uint8).reshape(-1, 16)
    ours = astc_pack.uastc_blocks_to_astc(blocks)
    np.testing.assert_array_equal(ours, ref_blocks)


def test_etc1s_astc_target(kodim23_basis):
    tr = BasisTranscoder(kodim23_basis)
    astc = tr.transcode_image_level(0, 0, TF.ASTC_4x4_RGBA)
    assert astc.shape == (128, 192, 16)


def test_uastc_multisubset_modes_oracle(oracle, tmp_path):
    """Modes 3 (3-subset) and 7 (2-subset, BC7-3 common partitions) at
    effort 4 on synthetic 3-band blocks: both must be selected and the
    reference must decode our file to exactly our pixels."""
    import collections
    import subprocess

    from basis_universal_tpu import compressor
    from basis_universal_tpu.codecs.uastc import tables as T
    from basis_universal_tpu.formats.basis_file import BasisFile
    from basis_universal_tpu.formats.constants import (
        BasisTexFormat, TranscoderTextureFormat as TF)
    from basis_universal_tpu.transcoder import BasisTranscoder

    rng = np.random.default_rng(0)
    h, w = 64, 64
    img = np.zeros((h, w, 3), np.uint8)
    cols = np.array([[255, 30, 20], [20, 255, 40], [40, 30, 255]])
    for by in range(h // 4):
        for bx in range(w // 4):
            for row in range(4):
                band = min(row, 2) if (bx % 2 == 0) else (row % 3)
                img[by * 4 + row, bx * 4:bx * 4 + 4] = cols[(band + by) % 3]
    img = np.clip(img.astype(int) + rng.integers(-12, 13, img.shape),
                  0, 255).astype(np.uint8)
    out = compressor.compress(img, compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=4))

    f = BasisFile(out.basis_data)
    blocks = np.frombuffer(f.slice_data(0), np.uint8).reshape(-1, 16)
    lo = blocks.view("<u8").reshape(-1, 2)[:, 0]
    modes = np.full(len(lo), -1)
    for m in sorted(range(19), key=lambda m: T.MODE_HUFF_CODES[m][1]):
        code, size = T.MODE_HUFF_CODES[m]
        modes = np.where((modes < 0) & ((lo & ((1 << size) - 1)) == code),
                         m, modes)
    hist = collections.Counter(modes.tolist())
    assert hist[3] > 0 and hist[7] > 0, hist

    tr = BasisTranscoder(out.basis_data)
    dec = tr.transcode_image_level(0, 0, TF.RGBA32)[..., :3]
    p = tmp_path / "m3.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    from PIL import Image as PILImage
    ref = np.asarray(PILImage.open(
        sorted(tmp_path.glob("*unpacked_rgb_ASTC_LDR*png"))[0]).convert("RGB"))
    np.testing.assert_array_equal(dec, ref)


def test_uastc_dualplane_alpha_modes_oracle(oracle, tmp_path):
    """Dual-plane alpha modes 11/13/17 at effort 4: each must win on its
    bait image and the reference must decode our files exactly."""
    import collections
    import subprocess

    from PIL import Image as PILImage

    from basis_universal_tpu import compressor
    from basis_universal_tpu.codecs.uastc import tables as T
    from basis_universal_tpu.formats.basis_file import BasisFile
    from basis_universal_tpu.formats.constants import (
        BasisTexFormat, TranscoderTextureFormat as TF)
    from basis_universal_tpu.transcoder import BasisTranscoder

    rng = np.random.default_rng(1)
    yy, xx = np.indices((64, 64))
    grad = ((xx * 255) // 63).astype(np.uint8)
    g = (yy * 3 + 40).astype(np.uint8)
    two_tone = np.where((rng.random((64, 64)) > 0.5)[..., None],
                        [210, 60, 35], [40, 120, 200]).astype(np.uint8)
    baits = {
        13: np.dstack([two_tone,
                       np.where(rng.random((64, 64)) > 0.5, 230, 25)
                       .astype(np.uint8)]),
        17: np.dstack([g, g, g, grad]),
    }
    for want_mode, img in baits.items():
        out = compressor.compress(img, compressor.CompressorParams(
            tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=4))
        f = BasisFile(out.basis_data)
        blocks = np.frombuffer(f.slice_data(0), np.uint8).reshape(-1, 16)
        lo = blocks.view("<u8").reshape(-1, 2)[:, 0]
        modes = np.full(len(lo), -1)
        for m in sorted(range(19), key=lambda m: T.MODE_HUFF_CODES[m][1]):
            code, size = T.MODE_HUFF_CODES[m]
            modes = np.where(
                (modes < 0) & ((lo & ((1 << size) - 1)) == code), m, modes)
        hist = collections.Counter(modes.tolist())
        assert hist[want_mode] > 0, (want_mode, hist)

        tr = BasisTranscoder(out.basis_data)
        dec = tr.transcode_image_level(0, 0, TF.RGBA32)
        p = tmp_path / f"dp{want_mode}.basis"
        p.write_bytes(out.basis_data)
        r = subprocess.run([str(oracle), "-unpack", str(p)],
                           cwd=tmp_path, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr
        ref_rgb = np.asarray(PILImage.open(sorted(
            tmp_path.glob(f"dp{want_mode}*unpacked_rgb_ASTC_LDR*png"))[0])
            .convert("RGB"))
        ref_a = np.asarray(PILImage.open(sorted(
            tmp_path.glob(f"dp{want_mode}*unpacked_a_ASTC_LDR*png"))[0])
            .convert("L"))
        np.testing.assert_array_equal(dec[..., :3], ref_rgb)
        np.testing.assert_array_equal(dec[..., 3], ref_a)


def test_uastc_rdo_rate_distortion(oracle, tmp_path, test_files):
    """UASTC RDO (full-block LZ replacement): meaningful size cut, bounded
    PSNR loss, and the reference still decodes our file exactly."""
    import subprocess

    from PIL import Image as PILImage

    from basis_universal_tpu import compressor
    from basis_universal_tpu.formats.constants import (
        BasisTexFormat, TranscoderTextureFormat as TF)
    from basis_universal_tpu.transcoder import BasisTranscoder

    img = np.asarray(PILImage.open(
        test_files / "kodim23.png").convert("RGB"))[:256, :256]

    def run(q):
        out = compressor.compress(img, compressor.CompressorParams(
            tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=2,
            rdo_uastc_quality=q))
        tr = BasisTranscoder(out.basis_data)
        dec = tr.transcode_image_level(0, 0, TF.RGBA32)[..., :3]
        mse = ((dec.astype(np.float64) - img) ** 2).mean()
        return out, dec, 10 * np.log10(255.0 ** 2 / mse)

    base, _, psnr0 = run(0.0)
    rdo, dec, psnr1 = run(1.0)
    assert len(rdo.ktx2_data) < 0.85 * len(base.ktx2_data), \
        (len(rdo.ktx2_data), len(base.ktx2_data))
    assert psnr0 - psnr1 < 5.0, (psnr0, psnr1)

    p = tmp_path / "rdo.basis"
    p.write_bytes(rdo.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    ref = np.asarray(PILImage.open(sorted(
        tmp_path.glob("*unpacked_rgb_ASTC_LDR*png"))[0]).convert("RGB"))
    np.testing.assert_array_equal(dec, ref)


def test_uastc_cubemap_oracle(oracle, tmp_path, test_files):
    """UASTC cubemap (6 faces): the oracle accepts both containers."""
    from PIL import Image as PILImage

    from basis_universal_tpu import compressor
    from basis_universal_tpu.formats.constants import (
        BasisTexFormat, BasisTextureType)

    img = np.asarray(PILImage.open(
        test_files / "kodim23.png").convert("RGBA"))[:64, :64]
    faces = [np.roll(img, i * 7, axis=0) for i in range(6)]
    out = compressor.compress(faces, compressor.CompressorParams(
        tex_format=BasisTexFormat.UASTC_LDR_4x4, effort=1,
        tex_type=BasisTextureType.CUBEMAP_ARRAY))
    for name, payload in (("c.basis", out.basis_data),
                          ("c.ktx2", out.ktx2_data)):
        p = tmp_path / name
        p.write_bytes(payload)
        r = subprocess.run([str(oracle), "-unpack", str(p)],
                           cwd=tmp_path, capture_output=True, text=True)
        assert r.returncode == 0, r.stdout + r.stderr
