"""UASTC LDR 4x4 encoder: batched mode search on device, vectorized pack.

TPU-first re-design of encode_uastc (encoder/basisu_uastc_enc.cpp): instead
of per-block divergent mode trials, every candidate mode is evaluated for
every block as dense array math (principal-axis endpoints, LS refinement,
all-levels weight argmin) and a single argmin picks the winner; effort
selects the candidate mode set. Packing mirrors pack_uastc
(basisu_uastc_enc.cpp:110-360) with numpy uint64 lanes, grouped by mode.

Round-1 mode set: solid (8), single-subset RGB (0, 1, 5, 18), RGBA
(10, 12, 14), LA (15). Multi-subset and dual-plane modes land next.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.etc1 import ETC1_INTEN_TABLES
from . import tables as T

# (mode, weight_bits, endpoint_range, comps)
RGB_MODES = [(0, 4, 19, 3), (1, 2, 20, 3), (5, 3, 20, 3), (18, 5, 11, 3)]
RGBA_MODES = [(10, 4, 13, 4), (12, 3, 19, 4), (14, 2, 20, 4)]
LA_MODES = [(15, 4, 20, 2)]

ALL_MODES = RGB_MODES + RGBA_MODES + LA_MODES


@functools.lru_cache(maxsize=None)
def quant_luts(ep_range: int):
    """(inverse LUT target→code, forward LUT code→unquantized) as numpy."""
    unq = T.color_unquant_table(ep_range).astype(np.int32)
    targets = np.arange(256)
    inv = np.argmin(np.abs(unq[None, :] - targets[:, None]), axis=1).astype(np.int32)
    return inv, unq


def _weight_levels(wb: int) -> np.ndarray:
    return T.weight_unquant_table(wb).astype(np.float32)


def _mode_trial(px, wb: int, ep_range: int, comps: int, ls_iters: int):
    """Evaluate one single-subset single-plane mode for all blocks.

    px: (B,16,4) f32. Returns (err (B,), ep_codes (B, comps*2) int32,
    weights (B,16) int32).
    comps==3 → RGB (alpha forced 255), 4 → RGBA, 2 → LA.
    """
    b = px.shape[0]
    inv_lut, unq_lut = quant_luts(ep_range)
    inv = jnp.asarray(inv_lut)
    unq = jnp.asarray(unq_lut.astype(np.float32))
    wlev = jnp.asarray(_weight_levels(wb))          # (L,)
    nlev = wlev.shape[0]

    if comps == 2:  # LA: channels = (luma, alpha)
        luma = (px[..., 0] + px[..., 1] + px[..., 2]) * (1.0 / 3.0)
        v = jnp.stack([luma, px[..., 3]], axis=-1)  # (B,16,2)
    elif comps == 3:
        v = px[..., :3]
    else:
        v = px

    # principal axis via power iteration on the covariance
    mean = jnp.mean(v, axis=1, keepdims=True)
    c = v - mean
    cov = jnp.einsum("bif,big->bfg", c, c)
    d0 = jnp.ones((b, comps), dtype=jnp.float32)

    def power(dir_, _):
        dir_ = jnp.einsum("bfg,bg->bf", cov, dir_)
        dir_ = dir_ / (jnp.linalg.norm(dir_, axis=-1, keepdims=True) + 1e-6)
        return dir_, None

    axis, _ = jax.lax.scan(power, d0, None, length=6)
    proj = jnp.einsum("bif,bf->bi", c, axis)        # (B,16)
    lo_f = mean[:, 0] + axis * jnp.min(proj, 1, keepdims=True)
    hi_f = mean[:, 0] + axis * jnp.max(proj, 1, keepdims=True)

    def quant_pair(lo_f, hi_f):
        lo_i = jnp.clip(jnp.round(lo_f), 0, 255).astype(jnp.int32)
        hi_i = jnp.clip(jnp.round(hi_f), 0, 255).astype(jnp.int32)
        lo_c = inv[lo_i]
        hi_c = inv[hi_i]
        return lo_c, hi_c, unq[lo_c], unq[hi_c]

    def best_weights(lo_u, hi_u):
        # reconstruction for every weight level: (B,L,comps)
        rec = (lo_u[:, None, :] * (64.0 - wlev)[None, :, None]
               + hi_u[:, None, :] * wlev[None, :, None] + 32.0) * (1.0 / 64.0)
        d = v[:, :, None, :] - rec[:, None, :, :]   # (B,16,L,C)
        e = jnp.sum(d * d, axis=-1)
        w = jnp.argmin(e, axis=-1)                  # (B,16)
        return w.astype(jnp.int32), jnp.sum(jnp.min(e, axis=-1), axis=-1)

    lo_c, hi_c, lo_u, hi_u = quant_pair(lo_f, hi_f)
    w, err = best_weights(lo_u, hi_u)

    for _ in range(ls_iters):
        # least squares endpoints given weights
        a_k = (64.0 - wlev[w]) * (1.0 / 64.0)       # (B,16)
        b_k = wlev[w] * (1.0 / 64.0)
        A = jnp.sum(a_k * a_k, 1)
        Bm = jnp.sum(a_k * b_k, 1)
        C = jnp.sum(b_k * b_k, 1)
        P = jnp.einsum("bi,bic->bc", a_k, v)
        Q = jnp.einsum("bi,bic->bc", b_k, v)
        det = A * C - Bm * Bm
        ok = jnp.abs(det) > 1e-6
        lo_n = jnp.where(ok[:, None], (C[:, None] * P - Bm[:, None] * Q)
                         / jnp.where(ok, det, 1.0)[:, None], lo_f)
        hi_n = jnp.where(ok[:, None], (A[:, None] * Q - Bm[:, None] * P)
                         / jnp.where(ok, det, 1.0)[:, None], hi_f)
        lo_c2, hi_c2, lo_u2, hi_u2 = quant_pair(
            jnp.clip(lo_n, 0, 255), jnp.clip(hi_n, 0, 255))
        w2, err2 = best_weights(lo_u2, hi_u2)
        better = err2 < err
        lo_c = jnp.where(better, lo_c2.T, lo_c.T).T
        hi_c = jnp.where(better, hi_c2.T, hi_c.T).T
        lo_u = jnp.where(better[:, None], lo_u2, lo_u)
        hi_u = jnp.where(better[:, None], hi_u2, hi_u)
        w = jnp.where(better[:, None], w2, w)
        err = jnp.minimum(err, err2)

    # full-pixel error (include the channels the mode can't represent)
    if comps == 3:
        aerr = jnp.sum((px[..., 3] - 255.0) ** 2, axis=-1)
        err = err + aerr
    elif comps == 2:
        # reconstruct gray; error against actual RGB
        l_rec = (lo_u[:, 0][:, None] * (64.0 - wlev[w]) + hi_u[:, 0][:, None] * wlev[w] + 32.0) * (1.0 / 64.0)
        d_rgb = px[..., :3] - l_rec[..., None]
        a_rec = (lo_u[:, 1][:, None] * (64.0 - wlev[w]) + hi_u[:, 1][:, None] * wlev[w] + 32.0) * (1.0 / 64.0)
        d_a = px[..., 3] - a_rec
        err = jnp.sum(d_rgb * d_rgb, axis=(1, 2)) + jnp.sum(d_a * d_a, axis=1)

    # interleave lo/hi codes: [c0lo, c0hi, c1lo, c1hi, ...]
    ep = jnp.stack([lo_c, hi_c], axis=-1).reshape(b, comps * 2)
    return err, ep.astype(jnp.int32), w


@functools.partial(jax.jit, static_argnames=("modes", "ls_iters"))
def _search_device(px, modes: tuple, ls_iters: int):
    errs, eps, ws = [], [], []
    for (mode, wb, ep_range, comps) in modes:
        e, ep, w = _mode_trial(px, wb, ep_range, comps, ls_iters)
        errs.append(e)
        ep_pad = jnp.zeros((px.shape[0], 8), jnp.int32).at[:, :comps * 2].set(ep)
        eps.append(ep_pad)
        ws.append(w)
    # solid-color candidate
    mean = jnp.clip(jnp.round(jnp.mean(px, axis=1)), 0, 255)
    solid_err = jnp.sum((px - mean[:, None, :]) ** 2, axis=(1, 2))
    errs.append(solid_err)
    err_mat = jnp.stack(errs, axis=1)                       # (B, M+1)
    best = jnp.argmin(err_mat, axis=1).astype(jnp.int32)
    eps_all = jnp.stack(eps, axis=1)                        # (B, M, 8)
    ws_all = jnp.stack(ws, axis=1)                          # (B, M, 16)
    return best, eps_all, ws_all, mean.astype(jnp.int32)


# --- ETC1 hint computation (cheap): one ETC1S fit per block -----------------

@functools.lru_cache(maxsize=None)
def _solid_etc1_luts():
    """(err, base5) tables indexed [inten*4+sel, target 0..255]."""
    inten = ETC1_INTEN_TABLES  # (8,4)
    base5 = np.arange(32)
    base8 = (base5 << 3) | (base5 >> 2)
    errs = np.zeros((32, 256), dtype=np.int32)
    bests = np.zeros((32, 256), dtype=np.int32)
    for i in range(8):
        for s in range(4):
            vals = np.clip(base8 + inten[i, s], 0, 255)      # (32,)
            t = np.arange(256)
            d = np.abs(vals[None, :] - t[:, None])
            bests[i * 4 + s] = np.argmin(d, axis=1)
            errs[i * 4 + s] = np.min(d, axis=1)
    return errs, bests


def _solid_hints(rgb):
    """Best (inten, selector, base555) for solid blocks (pack_etc1_block_
    solid_color analog, encoder/basisu_etc.h:1110). rgb: (N,3) int."""
    errs, bests = _solid_etc1_luts()
    e = (errs[:, rgb[:, 0]].astype(np.int64) ** 2
         + errs[:, rgb[:, 1]].astype(np.int64) ** 2
         + errs[:, rgb[:, 2]].astype(np.int64) ** 2)         # (32,N)
    combo = np.argmin(e, axis=0)                             # (N,)
    inten, sel = combo >> 2, combo & 3
    base = np.stack([bests[combo, rgb[:, c]] for c in range(3)], -1)
    return inten, sel, base


def encode_blocks(px_rgba: np.ndarray, effort: int = 2,
                  has_alpha: bool = True) -> np.ndarray:
    """Encode (B,16,4) float32 RGBA pixels → (B,16) uint8 UASTC blocks."""
    b = px_rgba.shape[0]
    modes = list(RGB_MODES)
    if has_alpha:
        modes += RGBA_MODES + LA_MODES
    if effort <= 1:
        modes = [m for m in modes if m[0] in (0, 10, 15)]
    ls_iters = 1 if effort <= 3 else 2
    modes_t = tuple(modes)

    best, eps, ws, mean = jax.device_get(_search_device(
        jnp.asarray(px_rgba, dtype=jnp.float32), modes_t, ls_iters))

    # etc1 hints from a quick per-block ETC1S-style fit of the RGB mean/range
    # (affects only ETC1/ETC2 transcode quality, not UASTC correctness)
    from ...ops import etc1s_encode as eops

    etc1 = jax.device_get(
        eops.encode_blocks(jnp.asarray(px_rgba[..., :3], jnp.float32), radius=0))
    etc1_inten = etc1["inten"].astype(np.int32)

    out = np.zeros((b, 16), dtype=np.uint8)
    solid_idx = np.flatnonzero(best == len(modes))
    if solid_idx.size:
        out[solid_idx] = _pack_solid(mean[solid_idx],
                                     px_rgba[solid_idx, 0, 3].astype(np.int32))
    for mi, (mode, wb, ep_range, comps) in enumerate(modes):
        idx = np.flatnonzero(best == mi)
        if not idx.size:
            continue
        out[idx] = _pack_mode(
            mode, wb, ep_range, comps,
            eps[idx, mi, :comps * 2], ws[idx, mi], etc1_inten[idx])
    return out


def _wr(lanes, ofs: int, vals, n: int):
    """Write n bits of vals at static offset into (N,2) uint64 lanes."""
    if n == 0:
        return ofs
    v = vals.astype(np.uint64) & np.uint64((1 << n) - 1)
    if ofs < 64:
        lanes[:, 0] |= v << np.uint64(ofs)
        if ofs + n > 64:
            lanes[:, 1] |= v >> np.uint64(64 - ofs)
    else:
        lanes[:, 1] |= v << np.uint64(ofs - 64)
    return ofs + n


def _lanes_to_bytes(lanes):
    return lanes.view(np.uint8).reshape(-1, 16)


def _pack_solid(rgb, alpha):
    n = rgb.shape[0]
    lanes = np.zeros((n, 2), dtype=np.uint64)
    code, size = T.MODE_HUFF_CODES[T.MODE_SOLID]
    ofs = _wr(lanes, 0, np.full(n, code), size)
    for c in range(3):
        ofs = _wr(lanes, ofs, rgb[:, c], 8)
    ofs = _wr(lanes, ofs, alpha, 8)
    inten, sel, base = _solid_hints(rgb)
    ofs = _wr(lanes, ofs, np.ones(n), 1)            # etc1 diff
    ofs = _wr(lanes, ofs, inten, 3)
    ofs = _wr(lanes, ofs, sel, 2)
    for c in range(3):
        ofs = _wr(lanes, ofs, base[:, c], 5)
    return _lanes_to_bytes(lanes)


def _pack_mode(mode, wb, ep_range, comps, eps, ws, etc1_inten):
    """Pack one single-subset, single-plane mode group."""
    n = eps.shape[0]
    eps = eps.copy()
    ws = ws.copy()
    lanes = np.zeros((n, 2), dtype=np.uint64)
    code, size = T.MODE_HUFF_CODES[mode]
    ofs = _wr(lanes, 0, np.full(n, code), size)

    # hints (zeros = valid conservative defaults; etc1 inten from quick fit)
    if T.MODE_HAS_BC1_HINT0[mode]:
        ofs = _wr(lanes, ofs, np.zeros(n), 1)
    if T.MODE_HAS_BC1_HINT1[mode]:
        ofs = _wr(lanes, ofs, np.zeros(n), 1)
    ofs = _wr(lanes, ofs, np.zeros(n), 1)            # flip
    ofs = _wr(lanes, ofs, np.ones(n), 1)             # diff
    ofs = _wr(lanes, ofs, etc1_inten, 3)             # inten0
    ofs = _wr(lanes, ofs, etc1_inten, 3)             # inten1
    if T.MODE_HAS_ETC1_BIAS[mode]:
        ofs = _wr(lanes, ofs, np.zeros(n), 5)
    if T.MODE_HAS_ALPHA[mode]:
        ofs = _wr(lanes, ofs, np.full(n, 0x10), 8)   # EAC mult=1 table=0

    # anchor texel 0: if weight MSB set, invert weights + swap endpoints
    flip = (ws[:, 0] >> (wb - 1)) & 1
    wmax = (1 << wb) - 1
    ws = np.where(flip[:, None] == 1, wmax - ws, ws)
    for c in range(comps):
        lo = eps[:, c * 2].copy()
        hi = eps[:, c * 2 + 1].copy()
        eps[:, c * 2] = np.where(flip == 1, hi, lo)
        eps[:, c * 2 + 1] = np.where(flip == 1, lo, hi)

    # endpoints: trit/quint bundles first, then raw bits
    total_values = comps * 2
    ep_bits, ep_trits, ep_quints = T.BISE_RANGE_TABLE[ep_range]
    if ep_trits or ep_quints:
        mul = 3 if ep_trits else 5
        bundle = 5 if ep_trits else 3
        tq = eps >> ep_bits                          # (N, total_values)
        i = 0
        while i < total_values:
            cnt = min(bundle, total_values - i)
            accum = np.zeros(n, dtype=np.int64)
            m = 1
            for k in range(cnt):
                accum += tq[:, i + k].astype(np.int64) * m
                m *= mul
            if cnt == bundle:
                nb = 8 if ep_trits else 7
            elif ep_trits:
                nb = {1: 2, 2: 4, 3: 5, 4: 7}[cnt]
            else:
                nb = {1: 3, 2: 5}[cnt]
            ofs = _wr(lanes, ofs, accum, nb)
            i += cnt
    for i in range(total_values):
        ofs = _wr(lanes, ofs, eps[:, i] & ((1 << ep_bits) - 1), ep_bits)

    # weights (single plane, anchor texel 0 gets wb-1 bits)
    for i in range(16):
        nb = wb - (1 if i == 0 else 0)
        ofs = _wr(lanes, ofs, ws[:, i], nb)
    assert ofs <= 128, (mode, ofs)
    return _lanes_to_bytes(lanes)
