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
