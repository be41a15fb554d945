"""Resampler filter bank + mip options (encoder/basisu_resample_filters.cpp,
basis_compressor::generate_mipmaps options)."""

import numpy as np
import pytest

from basis_universal_tpu.ops import resample as R


@pytest.mark.parametrize("name", sorted(R.FILTERS) + ["box", "tent", "kaiser"])
def test_contribs_normalized_and_shapes(name):
    for n_src, n_dst in ((32, 16), (24, 11), (13, 32)):
        src, w = R._axis_contribs(n_src, n_dst, name, wrap=False)
        assert src.shape == w.shape and src.shape[0] == n_dst
        assert (np.abs(w.sum(1) - 1.0) < 1e-5).all()
        assert (src >= 0).all() and (src < n_src).all()
    img = np.random.default_rng(0).integers(
        0, 256, (32, 24, 4), dtype=np.uint8)
    out = R.resample(img, 12, 16, filter=name)
    assert out.shape == (16, 12, 4)


def test_polyphase_non_pow2_and_upsample():
    """Fractional ratios and magnification must both work (the reference's
    Resampler handles any src/dst ratio, encoder/basisu_resampler.cpp)."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (25, 37, 4), dtype=np.uint8)
    down = R.resample(img, 14, 9, filter="kaiser", srgb=False)
    assert down.shape == (9, 14, 4)
    up = R.resample(img, 74, 50, filter="catmullrom", srgb=False)
    assert up.shape == (50, 74, 4)
    # mean brightness preserved within a few codes either way
    assert abs(float(down.mean()) - float(img.mean())) < 6.0
    assert abs(float(up.mean()) - float(img.mean())) < 3.0


def test_linear_ramp_preserved_exactly():
    """A linear ramp resampled to half size must stay linear (polyphase
    fractional phase correctness; integer-decimation misaligns centers)."""
    ramp = np.tile(np.arange(0, 256, 2, dtype=np.uint8)[None, :, None],
                   (16, 1, 3))
    out = R.resample(ramp, 64, 8, filter="tent", srgb=False)
    d = np.diff(out[4, :, 0].astype(np.int64))
    assert d.min() >= 2 and d.max() <= 6


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
