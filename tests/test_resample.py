"""Resampler filter bank + mip options (encoder/basisu_resample_filters.cpp,
basis_compressor::generate_mipmaps options)."""

import numpy as np
import pytest

from basis_universal_tpu.ops import resample as R


@pytest.mark.parametrize("name", sorted(R.FILTERS) + ["box", "tent", "kaiser"])
def test_kernel_normalized_and_shapes(name):
    for scale in (2, 3, 4):
        k = R._filter_kernel(name, scale)
        assert abs(float(k.sum()) - 1.0) < 1e-5
    img = np.random.default_rng(0).integers(
        0, 256, (32, 24, 4), dtype=np.uint8)
    out = R.resample(img, 12, 16, filter=name)
    assert out.shape == (16, 12, 4)


def test_flat_image_invariant():
    """Every filter must reproduce a constant image exactly."""
    img = np.full((16, 16, 3), 77, np.uint8)
    for name in sorted(R.FILTERS):
        out = R.resample(img, 8, 8, filter=name, srgb=False)
        assert (out == 77).all(), name


def test_premultiplied_stops_transparent_bleed():
    img = np.zeros((8, 8, 4), np.uint8)
    img[:4] = [255, 0, 0, 255]
    img[4:] = [0, 255, 0, 0]          # fully transparent green
    pm = R.resample(img, 4, 4, filter="tent", srgb=False, premultiplied=True)
    npm = R.resample(img, 4, 4, filter="tent", srgb=False, premultiplied=False)
    # at the boundary row the premultiplied result weighs the green by a=0
    assert int(pm[1, 0, 1]) <= int(npm[1, 0, 1])


def test_wrap_vs_clamp():
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :2] = 255
    w = R.resample(img, 8, 8, filter="lanczos3", srgb=False, wrap=True)
    c = R.resample(img, 8, 8, filter="lanczos3", srgb=False, wrap=False)
    assert (w != c).any()


def test_renormalize_normal_map():
    n = np.full((8, 8, 3), 128, np.uint8)
    n[2, 2] = [180, 200, 90]
    out = R.renormalize_normal_map(n)
    v = out[2, 2].astype(np.float64) * 2.0 / 255.0 - 1.0
    assert abs(np.linalg.norm(v) - 1.0) < 0.08
    # neutral texels untouched (reference early-out at (128,128,128))
    assert (out[0, 0] == 128).all()


def test_mip_chain_options_through_compressor_params():
    from basis_universal_tpu.ops.resample import generate_mipmaps

    img = np.random.default_rng(1).integers(
        0, 256, (32, 32, 4), dtype=np.uint8)
    mips = generate_mipmaps(img, 1, filter="mitchell", premultiplied=True,
                            renormalize=False, wrap=True)
    assert [m.shape[:2] for m in mips] == [
        (16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
