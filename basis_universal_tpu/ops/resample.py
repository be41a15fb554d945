"""Mipmap generation / image resampling as batched array ops.

Replaces the reference's separable polyphase resampler
(encoder/basisu_resampler.cpp, filters in basisu_resample_filters.cpp:23-290).
Round 1 provides box + tent + kaiser-windowed-sinc separable filters with
optional sRGB-correct filtering; the filter bank widens in later phases.
"""

import numpy as np

_SRGB_TO_LINEAR = None


def _srgb_to_linear_lut():
    global _SRGB_TO_LINEAR
    if _SRGB_TO_LINEAR is None:
        x = np.arange(256, dtype=np.float64) / 255.0
        lin = np.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)
        _SRGB_TO_LINEAR = lin.astype(np.float32)
    return _SRGB_TO_LINEAR


def _linear_to_srgb(x):
    x = np.clip(x, 0.0, 1.0)
    return np.where(x <= 0.0031308, x * 12.92, 1.055 * x ** (1 / 2.4) - 0.055)


def _filter_kernel(name: str, scale: int):
    if name == "box":
        k = np.ones(scale, dtype=np.float64)
    elif name == "tent":
        k = 1.0 - np.abs(np.arange(2 * scale) - (2 * scale - 1) / 2.0) / scale
        k = np.maximum(k, 0)
    elif name == "kaiser":
        n = 4 * scale
        t = (np.arange(n) - (n - 1) / 2.0) / scale
        sinc = np.sinc(t)
        k = sinc * np.kaiser(n, 4.0)
    else:
        raise ValueError(f"unknown filter {name}")
    return (k / k.sum()).astype(np.float32)


def _downsample_axis(img: np.ndarray, axis: int, out_size: int, kernel: np.ndarray):
    """Separable convolution + decimation along one axis (edge-clamped)."""
    n = img.shape[axis]
    scale = max(1, n // out_size)
    k = kernel
    pad = len(k) // 2
    idx = np.arange(out_size) * scale + (scale - 1) / 2.0
    taps = np.arange(len(k)) - pad
    src = np.clip(np.round(idx[:, None] + taps[None, :]).astype(np.int64), 0, n - 1)
    moved = np.moveaxis(img, axis, 0)
    # gather then weighted sum (simple and correct)
    gathered = moved[src]                       # (out, taps, ...)
    out = np.tensordot(gathered, k, axes=([1], [0]))
    return np.moveaxis(out, 0, axis)


def resample(img: np.ndarray, out_w: int, out_h: int, filter: str = "kaiser",
             srgb: bool = True) -> np.ndarray:
    """Downsample an (H, W, C) uint8 image to (out_h, out_w, C)."""
    img = np.asarray(img)
    h, w = img.shape[:2]
    if srgb:
        f = _srgb_to_linear_lut()[img]
        if img.shape[-1] == 4:  # alpha filters linearly
            f[..., 3] = img[..., 3].astype(np.float32) / 255.0
    else:
        f = img.astype(np.float32) / 255.0
    ky = _filter_kernel(filter, max(1, h // out_h))
    kx = _filter_kernel(filter, max(1, w // out_w))
    f = _downsample_axis(f, 0, out_h, ky)
    f = _downsample_axis(f, 1, out_w, kx)
    if srgb:
        if img.shape[-1] == 4:
            a = f[..., 3]
            f = _linear_to_srgb(f)
            f[..., 3] = a
        else:
            f = _linear_to_srgb(f)
    return np.clip(np.round(f * 255.0), 0, 255).astype(np.uint8)


def generate_mipmaps(img: np.ndarray, smallest_dimension: int = 1,
                     filter: str = "kaiser", srgb: bool = True):
    """Full mip chain below the base level (basis_compressor::generate_mipmaps,
    encoder/basisu_comp.cpp:2095-2146)."""
    levels = []
    h, w = img.shape[:2]
    # reference loops while max(w,h) > smallest_dimension (basisu_comp.cpp:2104)
    while max(h, w) > smallest_dimension:
        h, w = max(1, h // 2), max(1, w // 2)
        levels.append(resample(img, w, h, filter=filter, srgb=srgb))
        if h == 1 and w == 1:
            break
    return levels


def resample_hdr(img: np.ndarray, out_w: int, out_h: int,
                 filter: str = "kaiser") -> np.ndarray:
    """Downsample an (H, W, C) float32 linear-light image (HDR mip path:
    no sRGB transfer, no quantization)."""
    f = np.asarray(img, dtype=np.float32)
    h, w = f.shape[:2]
    ky = _filter_kernel(filter, max(1, h // out_h))
    kx = _filter_kernel(filter, max(1, w // out_w))
    f = _downsample_axis(f, 0, out_h, ky)
    f = _downsample_axis(f, 1, out_w, kx)
    return np.maximum(f, 0.0)


def generate_mipmaps_hdr(img: np.ndarray, smallest_dimension: int = 1,
                         filter: str = "kaiser"):
    levels = []
    h, w = img.shape[:2]
    while max(h, w) > smallest_dimension:
        h, w = max(1, h // 2), max(1, w // 2)
        levels.append(resample_hdr(img, w, h, filter=filter))
        if h == 1 and w == 1:
            break
    return levels
