"""Image quality metrics as batched JAX ops.

Replaces the reference's image_metrics / psnr_hvs_metrics / SSIM
(encoder/basisu_enc.h:3848, :3940; basisu_ssim.cpp): per-channel and
601/709-luma PSNR, gaussian-window SSIM, and PSNR-HVS-M (8x8 DCT with CSF
weighting and masking). Everything works on (H, W, C) arrays and jits.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def psnr(a, b, max_val: float = 255.0):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    mse = jnp.mean((a - b) ** 2)
    return jnp.where(mse > 0, 10.0 * jnp.log10(max_val * max_val / mse), 99.0)


def luma_601(rgb):
    rgb = jnp.asarray(rgb, jnp.float32)
    return (rgb[..., 0] * 0.299 + rgb[..., 1] * 0.587 + rgb[..., 2] * 0.114)


def luma_709(rgb):
    rgb = jnp.asarray(rgb, jnp.float32)
    return (rgb[..., 0] * 0.2126 + rgb[..., 1] * 0.7152 + rgb[..., 2] * 0.0722)


def image_metrics(a, b):
    """Dict of PSNRs mirroring image_stats fields (basisu_comp.h:75-163)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    out = {
        "rgb_psnr": psnr(a[..., :3], b[..., :3]),
        "y601_psnr": psnr(luma_601(a[..., :3]), luma_601(b[..., :3])),
        "y709_psnr": psnr(luma_709(a[..., :3]), luma_709(b[..., :3])),
    }
    if a.shape[-1] == 4 and b.shape[-1] == 4:
        out["a_psnr"] = psnr(a[..., 3], b[..., 3])
        out["rgba_psnr"] = psnr(a, b)
    return out


def _gaussian_kernel(size=11, sigma=1.5):
    x = np.arange(size) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("max_val",))
def ssim(a, b, max_val: float = 255.0):
    """Mean SSIM over a gaussian 11x11 window (single channel or mean-RGB)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a = luma_601(a)
        b = luma_601(b)
    k = jnp.asarray(_gaussian_kernel())
    win = k[None, None]

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[None, None], win, (1, 1), "VALID")[0, 0]

    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu_a, mu_b = filt(a), filt(b)
    sa = filt(a * a) - mu_a * mu_a
    sb = filt(b * b) - mu_b * mu_b
    sab = filt(a * b) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * sab + c2)) / (
        (mu_a ** 2 + mu_b ** 2 + c1) * (sa + sb + c2))
    return jnp.mean(s)


# --- PSNR-HVS-M -------------------------------------------------------------
# 8x8 DCT CSF weights (Nill/PSNR-HVS-M standard table)
_CSF = np.array([
    [1.6084, 2.3396, 2.5735, 1.6084, 1.0723, 0.6434, 0.5046, 0.4219],
    [2.1446, 2.1446, 1.8382, 1.3545, 0.9898, 0.4437, 0.4289, 0.4679],
    [1.8382, 1.9796, 1.6084, 1.0723, 0.6434, 0.4515, 0.3730, 0.4596],
    [1.8382, 1.5138, 1.1698, 0.8874, 0.5046, 0.2958, 0.3217, 0.4151],
    [1.4297, 1.1698, 0.6955, 0.4596, 0.3785, 0.2361, 0.2499, 0.3344],
    [1.0723, 0.7353, 0.4679, 0.3973, 0.3217, 0.2778, 0.2505, 0.3344],
    [0.5252, 0.3973, 0.3217, 0.2778, 0.2499, 0.2209, 0.2261, 0.2744],
    [0.3570, 0.3344, 0.2744, 0.2499, 0.2261, 0.2113, 0.2140, 0.2170],
], dtype=np.float32)

_MASK = _CSF * 0.7


def _dct_matrix(n=8):
    k = np.arange(n)
    m = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m[0] *= 1.0 / np.sqrt(2.0)
    return m.astype(np.float32)


@jax.jit
def psnr_hvs_m(a, b):
    """PSNR-HVS-M on the 601 luma (DCT-domain CSF weighting with contrast
    masking), matching the metric family of psnr_hvs_metrics
    (encoder/basisu_enc.h:3940)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 3:
        a = luma_601(a)
        b = luma_601(b)
    h, w = a.shape
    h8, w8 = h - h % 8, w - w % 8
    a = a[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    b = b[:h8, :w8].reshape(h8 // 8, 8, w8 // 8, 8).transpose(0, 2, 1, 3)
    d = jnp.asarray(_dct_matrix())
    A = jnp.einsum("ij,nmjk,lk->nmil", d, a, d)
    B = jnp.einsum("ij,nmjk,lk->nmil", d, b, d)
    csf = jnp.asarray(_CSF)
    mask_w = jnp.asarray(_MASK)
    # masking energy per block from the reference (masked) image
    e_a = jnp.sum((A * mask_w) ** 2, axis=(-1, -2)) - (A[..., 0, 0] * mask_w[0, 0]) ** 2
    e_b = jnp.sum((B * mask_w) ** 2, axis=(-1, -2)) - (B[..., 0, 0] * mask_w[0, 0]) ** 2
    m = jnp.sqrt(jnp.minimum(e_a, e_b) / 64.0)[..., None, None]
    diff = jnp.abs(A - B)
    diff = jnp.maximum(diff - m / jnp.maximum(csf, 1e-6), 0.0)
    # DC and near-DC terms are not masked
    diff = diff.at[..., 0, 0].set(jnp.abs(A - B)[..., 0, 0])
    werr = (diff * csf) ** 2
    mse = jnp.mean(werr)
    return jnp.where(mse > 0, 10.0 * jnp.log10(255.0 ** 2 / mse), 99.0)


# --- HDR metrics -------------------------------------------------------------
# float-space, log2, half-float-space PSNRs (image_metrics::calc(imagef,log)
# and ::calc_half, encoder/basisu_enc.cpp:1917-2090) and Delta-E ITP
# (BT.2100 ICtCp with the ITP Ct*0.5 scaling, the 6x6 HDR encoder's internal
# error space, encoder/basisu_astc_hdr_6x6_enc.cpp:143-317).

# ITU-R BT.2100-2 PQ constants
_PQ_M1 = 0.1593017578125     # (2610 / 2^14) / 100
_PQ_M2 = 78.84375            # (2523 / 32) * 100... spec: 2523/4096*128
_PQ_C1 = 0.8359375           # 3424 / 2^12
_PQ_C2 = 18.8515625          # 2413 / 128
_PQ_C3 = 18.6875             # 2392 / 128

# REC2020_to_LMS * REC709_to_2020 (reference basisu_astc_hdr_6x6_enc.cpp:287)
_REC709_TO_LMS = np.array([
    [0.2958097, 0.6230863, 0.0811040],
    [0.1562512, 0.7272980, 0.1164508],
    [0.0351435, 0.1565601, 0.8082964]], np.float32)
# BT.2100 spec matrix (rec2020/bt2100 gamut inputs)
_REC2020_TO_LMS = np.array([
    [0.412109375, 0.52392578125, 0.06396484375],
    [0.166748046875, 0.720458984375, 0.11279296875],
    [0.024169921875, 0.075439453125, 0.900390625]], np.float32)
# L'M'S' -> I (T = 0.5*Ct) P, ITP variant
_LMS_TO_ITP = np.array([
    [0.5, 0.5, 0.0],
    [0.806884765625, -1.6617431640625, 0.8548583984375],
    [4.378173828125, -4.24560546875, -0.132568359375]], np.float32)


def pq_oetf(y):
    """Linear absolute luminance (nits-scaled: 1.0 == 100 nits x 100) -> PQ."""
    L = jnp.maximum(jnp.asarray(y, jnp.float32), 0.0) * (1.0 / 10000.0)
    num = L ** _PQ_M1
    return ((_PQ_C1 + _PQ_C2 * num) / (1.0 + _PQ_C3 * num)) ** _PQ_M2


def linear_rgb_to_itp(rgb, rec2020: bool = False):
    """(..., 3) linear RGB -> ITP (I, T, P); REC709 gamut unless rec2020."""
    m = _REC2020_TO_LMS if rec2020 else _REC709_TO_LMS
    lms = jnp.einsum("...c,kc->...k", jnp.asarray(rgb, jnp.float32),
                     jnp.asarray(m))
    return jnp.einsum("...c,kc->...k", pq_oetf(lms), jnp.asarray(_LMS_TO_ITP))


def delta_e_itp(a, b, rec2020: bool = False):
    """Per-pixel Delta-E ITP (BT.2124: 720 * euclidean ITP distance)."""
    ia = linear_rgb_to_itp(a, rec2020)
    ib = linear_rgb_to_itp(b, rec2020)
    return 720.0 * jnp.sqrt(jnp.sum((ia - ib) ** 2, axis=-1))


def hdr_image_metrics(a, b, rec2020: bool = False):
    """Dict of HDR metrics for (H, W, 3+) float32 linear images:
      rgb_psnr       float-space PSNR, max_val 1.0 (calc(imagef))
      log2_rgb_psnr  PSNR of log2(max(x,0)+1) deltas (calc(..., log=true))
      half_rgb_psnr  PSNR of half-float bit-pattern deltas, max 65535
                     (calc_half)
      mean/max_delta_itp  Delta-E ITP statistics (the 6x6 encoder's space)
    """
    a = np.asarray(a, np.float32)[..., :3]
    b = np.asarray(b, np.float32)[..., :3]
    d = a - b
    rms = float(np.sqrt(np.mean(np.float64(d) ** 2)))
    log2d = np.log2(np.maximum(a, 0) + 1.0) - np.log2(np.maximum(b, 0) + 1.0)
    log2_rms = float(np.sqrt(np.mean(np.float64(log2d) ** 2)))
    ha = a.astype(np.float16).view(np.uint16).astype(np.int64)
    hb = b.astype(np.float16).view(np.uint16).astype(np.int64)
    half_rms = float(np.sqrt(np.mean(np.float64(np.abs(ha - hb)) ** 2)))

    def _psnr(r, max_val):
        if r == 0:
            return 1000.0
        return float(np.clip(np.log10(max_val / r) * 20.0, 0.0, 1000.0))

    de = np.asarray(delta_e_itp(a, b, rec2020))
    return {
        "rgb_psnr": _psnr(rms, 1.0),
        "log2_rgb_psnr": _psnr(log2_rms, 1.0),
        "half_rgb_psnr": _psnr(half_rms, 65535.0),
        "mean_delta_itp": float(de.mean()),
        "max_delta_itp": float(de.max()),
    }
