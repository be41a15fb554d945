"""Texture arrays, video frames (conditional replenishment), cubemaps."""

import subprocess

import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu import compressor
from basis_universal_tpu.formats.basis_file import BasisFile
from basis_universal_tpu.formats.constants import (
    BasisTexFormat,
    BasisTextureType,
    SliceDescFlags,
    TranscoderTextureFormat as TF,
)
from basis_universal_tpu.transcoder import BasisTranscoder


def _psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse) if mse > 0 else 99.0


@pytest.fixture(scope="module")
def frames(test_files):
    base = np.asarray(Image.open(test_files / "kodim23.png").convert("RGB"))[:64, :96]
    frames = [base]
    for i in range(1, 4):
        f = base.copy()
        f[: 8 * i, : 8 * i] = 255 - f[: 8 * i, : 8 * i]  # animate a corner
        frames.append(f)
    return frames


def test_texture_array(frames):
    params = compressor.CompressorParams(quality_level=128, effort=1,
                                         tex_type=BasisTextureType.TEX_2D_ARRAY)
    out = compressor.compress(frames, params)
    f = BasisFile(out.basis_data)
    assert f.header.total_images == 4
    tr = BasisTranscoder(out.basis_data)
    for i, src in enumerate(frames):
        rgba = tr.transcode_image_level(i, 0, TF.RGBA32)
        assert _psnr(rgba[..., :3], src) > 26.0


def test_video_cr_roundtrip(frames):
    params = compressor.CompressorParams(
        quality_level=128, effort=1,
        tex_type=BasisTextureType.VIDEO_FRAMES)
    out = compressor.compress(frames, params)
    f = BasisFile(out.basis_data)
    assert f.header.tex_type == BasisTextureType.VIDEO_FRAMES
    assert f.header.us_per_frame > 0
    assert f.slices[0].is_iframe and not f.slices[1].is_iframe
    tr = BasisTranscoder(out.basis_data)
    for i, src in enumerate(frames):
        rgba = tr.transcode_image_level(i, 0, TF.RGBA32)
        assert _psnr(rgba[..., :3], src) > 26.0, i
    # P-frames should be smaller than the I-frame (static background → CR)
    assert f.slices[1].file_size < f.slices[0].file_size


def test_video_oracle(frames, oracle, tmp_path):
    params = compressor.CompressorParams(
        quality_level=128, effort=1,
        tex_type=BasisTextureType.VIDEO_FRAMES)
    out = compressor.compress(frames, params)
    p = tmp_path / "vid.basis"
    p.write_bytes(out.basis_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    # compare every frame pixel-exact against the oracle's unpack
    tr = BasisTranscoder(out.basis_data)
    for i in range(len(frames)):
        unp = tmp_path / f"vid_unpacked_rgb_RGBA32_0_{i:04}.png"
        ref = np.asarray(Image.open(unp).convert("RGB"))
        ours = tr.transcode_image_level(i, 0, TF.RGBA32)[..., :3]
        np.testing.assert_array_equal(ref, ours, err_msg=f"frame {i}")


def test_video_ktx2(frames, oracle, tmp_path):
    """KTX2 video: P-frames must chain prev-frame indices
    (basisu_transcoder.cpp:20593 state threading)."""
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    params = compressor.CompressorParams(
        quality_level=128, effort=1,
        tex_type=BasisTextureType.VIDEO_FRAMES)
    out = compressor.compress(frames, params)
    p = tmp_path / "vid.ktx2"
    p.write_bytes(out.ktx2_data)
    r = subprocess.run([str(oracle), "-unpack", str(p)],
                       cwd=tmp_path, capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    tr = Ktx2Transcoder(out.ktx2_data)
    tr.start_transcoding()
    assert tr.is_video()
    assert tr.get_layers() == len(frames)
    pngs = sorted(tmp_path.glob("vid_unpacked_rgb_RGBA32_*.png"))
    assert len(pngs) == len(frames)
    # decode out of order on purpose: random access must still chain P-frames
    for i in reversed(range(len(frames))):
        ref = np.asarray(Image.open(pngs[i]).convert("RGB"))
        ours = tr.transcode_image_level(0, i, 0, TF.RGBA32)[..., :3]
        np.testing.assert_array_equal(ref, ours, err_msg=f"frame {i}")


def test_cubemap_ktx2(frames, test_files):
    faces = [frames[i % len(frames)] for i in range(6)]
    params = compressor.CompressorParams(
        quality_level=128, effort=1,
        tex_type=BasisTextureType.CUBEMAP_ARRAY)
    out = compressor.compress(faces, params)
    from basis_universal_tpu.transcoder import Ktx2Transcoder

    tr = Ktx2Transcoder(out.ktx2_data)
    assert tr.get_faces() == 6
    for face in range(6):
        rgba = tr.transcode_image_level(0, 0, face, TF.RGBA32)
        assert _psnr(rgba[..., :3], faces[face]) > 26.0
