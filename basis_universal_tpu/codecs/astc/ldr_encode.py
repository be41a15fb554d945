"""Direct ASTC LDR encoder for arbitrary block sizes (5x4..12x12).

A v1 single-partition encoder: CEM 8 (RGB) or CEM 12 (RGBA) endpoints from
a principal-axis line fit, per-texel weights projected onto the line, and
several candidate weight grids (full-res down to 3x3) fit by least squares
against the spec §18.11 infill, the winner chosen by reconstructed error.
The 4x4 member of the family uses the higher-quality UASTC mode search +
byte-exact repack instead (compressor._compress_astc_ldr).

Parity: the reference encodes its ASTC/XUASTC LDR 4x4-12x12 modes with a
shared ASTC encoder (astc_ldr.cpp family); this is the TPU-port's host
fallback — dense and simple, validated through the reference transcoder.
"""

import functools

import numpy as np

from ..uastc import astc_pack
from ..uastc import tables as T
from . import helpers as ah
from .hdr_encode import _find_block_mode, _infill_matrix


@functools.lru_cache(maxsize=None)
def _grid_configs(bw: int, bh: int) -> tuple:
    """Candidate (grid_w, grid_h, weight_range, weight_bits) per block size
    (plain-bit ISE ranges only; all verified to satisfy the 24..96 weight
    bit constraint and leave room for endpoints)."""
    cands = []
    for gw, gh in {(bw, bh), (5, 5), (4, 4), (4, 3), (3, 3), (6, 5),
                   (6, 6), (8, 5), (5, 4)}:
        if gw > bw or gh > bh:
            continue
        for rng, wb in ((5, 3), (2, 2), (0, 1)):
            nw = gw * gh
            nwb = nw * wb
            if not (24 <= nwb <= 96):
                continue
            # need >= 13 bits/endpoint headroom check at pack time instead
            try:
                _find_block_mode(gw, gh, rng)
            except ValueError:
                continue
            cands.append((gw, gh, rng, wb))
    # prefer denser grids first (better quality), cap candidate count
    cands.sort(key=lambda c: -(c[0] * c[1] * c[3]))
    return tuple(cands[:6])


@functools.lru_cache(maxsize=None)
def _endpoint_range(n_vals: int, weight_bits: int) -> int:
    """The decoder-inferred endpoint ISE range: largest range whose cost
    fits the bits left after config + weights."""
    remaining = 128 - 17 - weight_bits
    best = -1
    for r in range(4, 21):
        if ah.ise_sequence_bits(n_vals, r) <= remaining:
            best = r
    if best < 4:
        raise ValueError("no endpoint range fits")
    return best


@functools.lru_cache(maxsize=None)
def _quant_tables(rng: int):
    unq = np.asarray(T.color_unquant_table(rng), dtype=np.int64)
    inv = np.argmin(np.abs(unq[None, :] - np.arange(256)[:, None]), axis=1)
    return inv.astype(np.int64), unq


def encode_blocks_plan(px: np.ndarray, bw: int, bh: int,
                       has_alpha: bool, effort: int = 1) -> dict:
    """Candidate search only: returns the per-block encode decisions
    without packing, shared by the physical-ASTC writer and the XUASTC
    entropy layer. Keys: config (B,) index into configs;
    configs [(gw, gh, weight_rng, weight_bits, ep_rng)]; endpoints (list
    of per-block CEM-ordered ISE values, s0<=s1 ordering applied);
    codes (list of per-block weight ISE symbols, inverted on swap)."""
    plan = _encode_blocks_core(px, bw, bh, has_alpha, effort)
    return plan


def _encode_blocks_core(px: np.ndarray, bw: int, bh: int,
                        has_alpha: bool, effort: int = 1) -> dict:
    b = px.shape[0]
    nt = bw * bh
    pxf = px.astype(np.float64)
    cem = 12 if has_alpha else 8
    comps = 4 if has_alpha else 3
    v = pxf[..., :comps]

    # principal-axis endpoints
    mean = v.mean(axis=1, keepdims=True)
    c = v - mean
    cov = np.einsum("bif,big->bfg", c, c)
    d = np.ones((b, comps))
    for _ in range(6):
        d = np.einsum("bfg,bg->bf", cov, d)
        d /= np.linalg.norm(d, axis=-1, keepdims=True) + 1e-9
    proj = np.einsum("bif,bf->bi", c, d)
    lo = np.clip(mean[:, 0] + d * proj.min(1, keepdims=True), 0, 255)
    hi = np.clip(mean[:, 0] + d * proj.max(1, keepdims=True), 0, 255)

    # continuous ideal texel weights
    dd = hi - lo
    num = ((v - lo[:, None, :]) * dd[:, None, :]).sum(-1)
    den = np.maximum((dd * dd).sum(-1), 1e-9)
    w_tex = np.clip(64.0 * num / den[:, None], 0, 64)       # (B,nt)

    configs = _grid_configs(bw, bh)
    n_vals = 6 if cem == 8 else 8
    cand = []
    for (gw, gh, rng, wb) in configs:
        ep_rng = _endpoint_range(n_vals, gw * gh * wb)
        inv, unq = _quant_tables(ep_rng)
        lo_c = inv[np.clip(np.round(lo), 0, 255).astype(np.int64)]
        hi_c = inv[np.clip(np.round(hi), 0, 255).astype(np.int64)]
        lo_u = unq[lo_c].astype(np.float64)
        hi_u = unq[hi_c].astype(np.float64)
        m, pinv = _infill_matrix(gw, gh, bw, bh)
        grid_f = np.clip(w_tex @ pinv.T, 0, 64)
        levels = np.array([ah.dequant_weight(x, rng) for x in range(1 << wb)])
        codes = np.abs(grid_f[..., None] - levels).argmin(-1)
        gq = levels[codes]
        up = np.clip((gq @ (m.T * 64.0) + 32).astype(np.int64) >> 6, 0, 64)
        rec = (lo_u[:, None, :] * (64 - up[..., None])
               + hi_u[:, None, :] * up[..., None] + 32) // 64
        err = ((rec - v) ** 2).sum(axis=(1, 2))
        if not has_alpha:
            err = err + ((pxf[..., 3] - 255.0) ** 2).sum(-1)
        cand.append((err, codes, lo_c, hi_c, ep_rng))
    best = np.argmin(np.stack([cc[0] for cc in cand], 1), axis=1)

    endpoints = [None] * b
    out_codes = [None] * b
    cfg_list = []
    for ci, (gw, gh, rng, wb) in enumerate(configs):
        err, codes, lo_c, hi_c, ep_rng = cand[ci]
        cfg_list.append((gw, gh, rng, wb, ep_rng))
        idx = np.flatnonzero(best == ci)
        if not idx.size:
            continue
        _, unq = _quant_tables(ep_rng)
        wmax = (1 << wb) - 1
        for i in idx:
            lc, hc, cd = lo_c[i], hi_c[i], codes[i]
            s0 = int(unq[lc[0]] + unq[lc[1]] + unq[lc[2]])
            s1 = int(unq[hc[0]] + unq[hc[1]] + unq[hc[2]])
            if s0 > s1:
                lc, hc = hc, lc
                cd = wmax - cd
            vals = []
            for comp in range(3):
                vals += [int(lc[comp]), int(hc[comp])]
            if cem == 12:
                vals += [int(lc[3]), int(hc[3])]
            endpoints[i] = vals
            out_codes[i] = cd
    return dict(config=best, configs=cfg_list, endpoints=endpoints,
                codes=out_codes, cem=cem)


def encode_blocks_ldr(px: np.ndarray, bw: int, bh: int,
                      has_alpha: bool, effort: int = 1) -> np.ndarray:
    """(B, bh*bw, 4) uint8 RGBA → (B, 16) ASTC LDR blocks."""
    plan = _encode_blocks_core(px, bw, bh, has_alpha, effort)
    b = px.shape[0]
    out = np.zeros((b, 16), dtype=np.uint8)
    for i in range(b):
        gw, gh, rng, wb, ep_rng = plan["configs"][plan["config"][i]]
        out[i] = _pack_ldr_block(
            plan["cem"], gw, gh, rng, wb, ep_rng,
            plan["endpoints"][i], plan["codes"][i])
    return out


def _pack_ldr_block(cem, gw, gh, rng, wb, ep_rng, vals, codes):
    """One CEM 8/12 single-partition block (endpoint ordering already
    applied by the plan so the decoder's blue-contract path stays off)."""
    wmax = (1 << wb) - 1

    w = astc_pack._BlockWriter()
    w.put(_find_block_mode(gw, gh, rng), 11)
    w.put(0, 2)
    w.put(cem, 4)
    astc_pack._ise_encode(w, vals, ep_rng)
    # weights reversed from bit 127
    wbits = 0
    nwb = gw * gh * wb
    for i, cval in enumerate(codes):
        wbits |= (int(cval) & wmax) << (wb * i)
    rev = astc_pack._reverse_bits64(wbits, nwb)
    w.put_at(rev, nwb, 128 - nwb)
    return np.frombuffer(w.to_bytes(), dtype=np.uint8)
