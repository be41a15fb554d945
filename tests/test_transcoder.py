"""Transcoder API + output-format conversion validation.

Strategy: decode the reference-encoded kodim23.ktx2 through our Ktx2Transcoder
into each target format, decode those blocks with our validation unpackers,
and require the result to track the exact ETC1S RGBA closely (the conversions
are near-lossless by construction). Our own KTX2 output must be accepted by
the reference CLI.
"""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu import compressor
from basis_universal_tpu.formats.constants import TranscoderTextureFormat as TF
from basis_universal_tpu.ops import gpu_unpack
from basis_universal_tpu.ops.etc1 import blocks_to_image, unpack_etc1_blocks
from basis_universal_tpu.transcoder import BasisTranscoder, Ktx2Transcoder


@pytest.fixture(scope="module")
def ktx2_tr(test_files):
    data = (test_files / "kodim23.ktx2").read_bytes()
    tr = Ktx2Transcoder(data)
    tr.start_transcoding()
    return tr


@pytest.fixture(scope="module")
def rgba_ref(ktx2_tr):
    return ktx2_tr.transcode_image_level(0, 0, 0, TF.RGBA32)


def _psnr(a, b):
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0


def test_rgba32(ktx2_tr, rgba_ref, test_files):
    src = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))
    assert rgba_ref.shape == (512, 768, 4)
    assert _psnr(rgba_ref[..., :3], src) > 34.0


def test_etc1(ktx2_tr, rgba_ref):
    blocks = ktx2_tr.transcode_image_level(0, 0, 0, TF.ETC1_RGB)
    img = blocks_to_image(unpack_etc1_blocks(blocks), 768, 512)
    np.testing.assert_array_equal(img, rgba_ref)


def test_bc1(ktx2_tr, rgba_ref):
    blocks = ktx2_tr.transcode_image_level(0, 0, 0, TF.BC1_RGB)
    by, bx = blocks.shape[:2]
    dec = gpu_unpack.unpack_bc1(blocks.reshape(-1, 8)).reshape(by, bx, 4, 4, 4)
    img = blocks_to_image(dec, 768, 512)
    p = _psnr(img[..., :3], rgba_ref[..., :3])
    assert p > 32.0, p  # BC1 from ETC1S: small re-quantization loss only


def test_bc7(ktx2_tr, rgba_ref):
    blocks = ktx2_tr.transcode_image_level(0, 0, 0, TF.BC7_RGBA)
    by, bx = blocks.shape[:2]
    dec = gpu_unpack.unpack_bc7_mode5(blocks.reshape(-1, 16)).reshape(by, bx, 4, 4, 4)
    img = blocks_to_image(dec, 768, 512)
    p = _psnr(img[..., :3], rgba_ref[..., :3])
    assert p > 40.0, p  # BC7 m5 is near-lossless for ETC1S


def test_bc3_bc4_bc5(ktx2_tr, rgba_ref):
    bc3 = ktx2_tr.transcode_image_level(0, 0, 0, TF.BC3_RGBA)
    by, bx = bc3.shape[:2]
    dec = gpu_unpack.unpack_bc3(bc3.reshape(-1, 16)).reshape(by, bx, 4, 4, 4)
    img = blocks_to_image(dec, 768, 512)
    assert _psnr(img[..., :3], rgba_ref[..., :3]) > 32.0
    assert (img[..., 3] == 255).all()

    bc4 = ktx2_tr.transcode_image_level(0, 0, 0, TF.BC4_R)
    dec4 = gpu_unpack.unpack_bc4(bc4.reshape(-1, 8)).reshape(by, bx, 4, 4)
    g = blocks_to_image(dec4[..., None], 768, 512)[..., 0]
    assert _psnr(g, rgba_ref[..., 1]) > 40.0  # BC4 of green channel

    bc5 = ktx2_tr.transcode_image_level(0, 0, 0, TF.BC5_RG)
    dec5 = gpu_unpack.unpack_bc5(bc5.reshape(-1, 16)).reshape(by, bx, 4, 4, 4)
    img5 = blocks_to_image(dec5, 768, 512)
    assert _psnr(img5[..., 0], rgba_ref[..., 0]) > 40.0


def test_565_4444(ktx2_tr, rgba_ref):
    v565 = ktx2_tr.transcode_image_level(0, 0, 0, TF.RGB565)
    r = ((v565 >> 11) & 31).astype(np.int64)
    r8 = (r << 3) | (r >> 2)
    assert _psnr(r8, rgba_ref[..., 0]) > 35.0
    v4444 = ktx2_tr.transcode_image_level(0, 0, 0, TF.RGBA4444)
    a = (v4444 & 15).astype(np.int64)
    assert (a == 15).all()  # opaque


def test_basis_transcoder_api(kodim23_basis):
    tr = BasisTranscoder(kodim23_basis)
    assert tr.validate_file_checksums()
    assert tr.get_total_images() == 1
    info = tr.get_image_level_info(0, 0)
    assert (info.orig_width, info.orig_height) == (768, 512)
    img = tr.transcode_image_level(0, 0, TF.RGBA32)
    assert img.shape == (512, 768, 4)


def test_our_ktx2_accepted_by_oracle(test_files, oracle, tmp_path):
    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))[:64, :64]
    out = compressor.compress(img, compressor.CompressorParams(quality_level=128, effort=1))
    p = tmp_path / "ours.ktx2"
    p.write_bytes(out.ktx2_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    unpacked = list(tmp_path.glob("*unpacked_rgb_RGBA32*.png"))
    assert unpacked
    ref_img = np.asarray(Image.open(unpacked[0]).convert("RGB"))
    tr = Ktx2Transcoder(out.ktx2_data)
    ours = tr.transcode_image_level(0, 0, 0, TF.RGBA32)[..., :3]
    np.testing.assert_array_equal(ref_img, ours)


def test_our_ktx2_mipmapped_roundtrip(test_files):
    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))[:64, :96]
    out = compressor.compress(
        img, compressor.CompressorParams(quality_level=128, effort=1, mip_gen=True))
    tr = Ktx2Transcoder(out.ktx2_data)
    assert tr.get_levels() > 1
    lvl1 = tr.transcode_image_level(1, 0, 0, TF.RGBA32)
    assert lvl1.shape[:2] == (32, 48)


def test_eac_r11_rg11(ktx2_tr, rgba_ref):
    r11 = ktx2_tr.transcode_image_level(0, 0, 0, TF.ETC2_EAC_R11)
    by, bx = r11.shape[:2]
    dec = gpu_unpack.unpack_eac_r11(r11.reshape(-1, 8)).reshape(by, bx, 4, 4)
    img = blocks_to_image(dec[..., None], 768, 512)[..., 0]
    assert _psnr(img, rgba_ref[..., 0]) > 40.0

    rg11 = ktx2_tr.transcode_image_level(0, 0, 0, TF.ETC2_EAC_RG11)
    decg = gpu_unpack.unpack_eac_r11(rg11.reshape(-1, 16)[:, 8:]).reshape(by, bx, 4, 4)
    img_g = blocks_to_image(decg[..., None], 768, 512)[..., 0]
    assert _psnr(img_g, rgba_ref[..., 1]) > 40.0


def test_global_codebooks_mode(test_files, oracle, tmp_path):
    """Encode file B reusing file A's codebooks; decode via
    set_global_codebooks (SURVEY A.4)."""
    import numpy as np
    from PIL import Image

    from basis_universal_tpu import compressor
    from basis_universal_tpu.codecs.etc1s.stream import decode_palettes
    from basis_universal_tpu.formats.basis_file import BasisFile
    from basis_universal_tpu.formats.constants import HeaderFlags
    from basis_universal_tpu.transcoder import BasisTranscoder

    img_a = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))[:96, :96]
    img_b = np.asarray(Image.open(test_files / "kodim03.png").convert("RGB"))[:96, :96]
    out_a = compressor.compress(img_a, compressor.CompressorParams(
        quality_level=192, effort=1))
    fa = BasisFile(out_a.basis_data)
    cb = decode_palettes(fa.header.total_endpoints, fa.endpoint_cb_data,
                         fa.header.total_selectors, fa.selector_cb_data)
    out_b = compressor.compress(img_b, compressor.CompressorParams(
        quality_level=192, effort=1,
        global_codebooks=(cb.color5, cb.inten5, cb.selectors)))
    fb = BasisFile(out_b.basis_data)
    assert fb.header.flags & HeaderFlags.USES_GLOBAL_CODEBOOK
    assert fb.header.endpoint_cb_file_size == 0
    assert len(out_b.basis_data) < len(out_a.basis_data)  # no palettes inside

    tr_a = BasisTranscoder(out_a.basis_data)
    tr_b = BasisTranscoder(out_b.basis_data)
    with pytest.raises(ValueError):
        tr_b.start_transcoding()
    tr_b.set_global_codebooks(tr_a)
    rgba = tr_b.transcode_image_level(0, 0, TF.RGBA32)
    assert _psnr(rgba[..., :3], img_b) > 24.0


def test_atc(ktx2_tr, rgba_ref):
    atc = ktx2_tr.transcode_image_level(0, 0, 0, TF.ATC_RGB)
    by, bx = atc.shape[:2]
    dec = gpu_unpack.unpack_atc(atc.reshape(-1, 8)).reshape(by, bx, 4, 4, 4)
    img = blocks_to_image(dec, 768, 512)
    assert _psnr(img[..., :3], rgba_ref[..., :3]) > 31.0
    atc_a = ktx2_tr.transcode_image_level(0, 0, 0, TF.ATC_RGBA)
    assert atc_a.shape == (by, bx, 16)
