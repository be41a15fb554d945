"""ETC1S alpha-slice support: encode RGBA → two slices per level, decode
alpha back, oracle conformance."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu import compressor
from basis_universal_tpu.formats.basis_file import BasisFile
from basis_universal_tpu.formats.constants import (
    HeaderFlags,
    TranscoderTextureFormat as TF,
)
from basis_universal_tpu.transcoder import BasisTranscoder, Ktx2Transcoder


@pytest.fixture(scope="module")
def alpha_img(test_files):
    img = np.asarray(Image.open(test_files / "alpha0.png").convert("RGBA"))
    return img[:128, :128]


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0


def test_alpha_roundtrip(alpha_img):
    out = compressor.compress(
        alpha_img, compressor.CompressorParams(quality_level=192, effort=2))
    f = BasisFile(out.basis_data)
    assert f.header.flags & HeaderFlags.HAS_ALPHA_SLICES
    assert f.header.total_slices == 2
    assert f.slices[1].has_alpha

    tr = BasisTranscoder(out.basis_data)
    rgba = tr.transcode_image_level(0, 0, TF.RGBA32)
    assert _psnr(rgba[..., :3], alpha_img[..., :3]) > 25.0
    assert _psnr(rgba[..., 3], alpha_img[..., 3]) > 30.0

    # KTX2 path too
    k = Ktx2Transcoder(out.ktx2_data)
    rgba2 = k.transcode_image_level(0, 0, 0, TF.RGBA32)
    np.testing.assert_array_equal(rgba, rgba2)


def test_alpha_oracle(alpha_img, oracle, tmp_path):
    out = compressor.compress(
        alpha_img, compressor.CompressorParams(quality_level=192, effort=2))
    p = tmp_path / "ours.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    unpacked = list(tmp_path.glob("*unpacked_rgba_RGBA32*.png"))
    assert unpacked
    ref = np.asarray(Image.open(unpacked[0]).convert("RGBA"))
    tr = BasisTranscoder(out.basis_data)
    ours = tr.transcode_image_level(0, 0, TF.RGBA32)
    np.testing.assert_array_equal(ref, ours)


def test_alpha_formats(alpha_img):
    out = compressor.compress(
        alpha_img, compressor.CompressorParams(quality_level=128, effort=1))
    tr = BasisTranscoder(out.basis_data)
    rgba = tr.transcode_image_level(0, 0, TF.RGBA32)
    from basis_universal_tpu.ops import gpu_unpack
    from basis_universal_tpu.ops.etc1 import blocks_to_image

    bc3 = tr.transcode_image_level(0, 0, TF.BC3_RGBA)
    by, bx = bc3.shape[:2]
    dec = gpu_unpack.unpack_bc3(bc3.reshape(-1, 16)).reshape(by, bx, 4, 4, 4)
    img = blocks_to_image(dec, *alpha_img.shape[1::-1])
    assert _psnr(img[..., 3], rgba[..., 3]) > 35.0

    b7 = tr.transcode_image_level(0, 0, TF.BC7_RGBA)
    dec7 = gpu_unpack.unpack_bc7_mode5(b7.reshape(-1, 16)).reshape(by, bx, 4, 4, 4)
    img7 = blocks_to_image(dec7, *alpha_img.shape[1::-1])
    assert _psnr(img7[..., 3], rgba[..., 3]) > 35.0

    etc2 = tr.transcode_image_level(0, 0, TF.ETC2_RGBA)
    a = gpu_unpack.unpack_eac_a8(etc2.reshape(-1, 16)[:, :8]).reshape(by, bx, 4, 4)
    img_a = blocks_to_image(a[..., None], *alpha_img.shape[1::-1])[..., 0]
    assert _psnr(img_a, rgba[..., 3]) > 30.0
