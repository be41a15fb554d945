"""UASTC HDR 4x4 encoder: batched CEM-11 direct fit in qlog space.

TPU-first reformulation of the UASTC HDR 4x4 encoder
(encoder/basisu_uastc_hdr_4x4_enc.cpp): blocks are standard ASTC HDR —
we emit CEM 11 (HDR RGB direct) single-partition blocks with a 4x4 3-bit
weight grid and 8-bit (ISE range 20) endpoint values, the one layout whose
inferred endpoint range is exactly byte-valued so the CEM-11 mode/flag bits
survive quantization. Endpoints are per-channel qlog min/max (the maj=3
'direct' submode: R,G qlog8 pairs + B qlog7 pair); weights are a dense
8-level argmin in qlog16 space. Effort scales the refinement passes.
"""

import functools

import numpy as np

from . import helpers as ah


@functools.lru_cache(maxsize=None)
def _qlog16_to_half_lut() -> np.ndarray:
    k = np.arange(65536, dtype=np.int64)
    e = (k & 0xF800) >> 11
    m = k & 0x7FF
    mt = np.where(m < 512, 3 * m, np.where(m >= 1536, 5 * m - 2048, 4 * m - 512))
    return ((e << 10) + (mt >> 3)).astype(np.uint16)


@functools.lru_cache(maxsize=None)
def _half_to_qlog16_lut() -> np.ndarray:
    """Inverse LUT: half bits (non-negative, finite) → qlog16.
    qlog16_to_half is monotonic non-decreasing; invert by first occurrence."""
    fwd = _qlog16_to_half_lut().astype(np.int64)
    inv = np.zeros(0x8000, dtype=np.uint16)
    # first qlog producing each half value (fwd is non-decreasing)
    firsts = np.searchsorted(fwd, np.arange(0x8000), side="left")
    inv[:] = np.clip(firsts, 0, 65535)
    return inv


def half_to_qlog16(half_bits: np.ndarray) -> np.ndarray:
    h = np.asarray(half_bits, dtype=np.uint16)
    return _half_to_qlog16_lut()[np.clip(h, 0, 0x7FFF).astype(np.int64)]


def float_to_half_bits(f: np.ndarray) -> np.ndarray:
    return np.asarray(np.clip(f, 0, 65504.0), dtype=np.float16).view(np.uint16)


def encode_blocks_hdr(px_half: np.ndarray, effort: int = 1) -> np.ndarray:
    """(B,16,3) uint16 half bits → (B,16) uint8 ASTC HDR (CEM 11) blocks."""
    b = px_half.shape[0]
    q16 = half_to_qlog16(px_half).astype(np.int64)          # (B,16,3)
    q12 = q16 >> 4

    # endpoints: per-channel qlog12 min/max (direct submode precision:
    # R,G at qlog8 (12-bit value quantized to top 8 bits), B at qlog7)
    lo12 = q12.min(axis=1)                                  # (B,3)
    hi12 = q12.max(axis=1)
    prec = np.array([4, 4, 5])                              # shift per channel
    lo_q = lo12 >> prec                                     # floor for lo
    hi_q = -(-hi12 >> prec.astype(np.int64))                # ceil for hi
    hi_q = np.minimum(hi_q, np.array([255, 255, 127]))
    lo12r = lo_q << prec
    hi12r = hi_q << prec

    # weights: choose 3-bit weight per texel minimizing qlog16 error
    wlev = np.array([ah.dequant_weight(v, 5) for v in range(8)])  # (8,)
    le = (lo12r << 4)[:, None, :, None]                     # (B,1,3,1)
    he = (hi12r << 4)[:, None, :, None]
    rec = (le * (64 - wlev) + he * wlev + 32) >> 6          # (B,1,3,8)
    # compare in half space (the decode target)
    lut = _qlog16_to_half_lut().astype(np.int64)
    rec_h = lut[np.clip(rec, 0, 65535)]
    d = rec_h - lut[np.clip(q16, 0, 65535)][..., None]      # (B,16,3,8)
    err = (d * d).sum(axis=2)                               # (B,16,8)
    w = np.argmin(err, axis=-1).astype(np.int64)            # (B,16)

    if effort >= 2:
        # one refinement pass: least squares endpoints given weights (in
        # qlog16 space), re-quantized, weights re-chosen
        a_k = (64 - wlev[w]) / 64.0
        b_k = wlev[w] / 64.0
        A = (a_k * a_k).sum(1)
        Bm = (a_k * b_k).sum(1)
        C = (b_k * b_k).sum(1)
        P = np.einsum("bi,bic->bc", a_k, q16.astype(np.float64))
        Q = np.einsum("bi,bic->bc", b_k, q16.astype(np.float64))
        det = A * C - Bm * Bm
        ok = np.abs(det) > 1e-6
        dd = np.where(ok, det, 1.0)
        lo_n = np.clip((C[:, None] * P - Bm[:, None] * Q) / dd[:, None], 0, 65535)
        hi_n = np.clip((A[:, None] * Q - Bm[:, None] * P) / dd[:, None], 0, 65535)
        lo_q2 = np.clip(np.round(lo_n / 16.0).astype(np.int64) >> prec, 0, None)
        hi_q2 = np.minimum(-(-np.round(hi_n / 16.0).astype(np.int64) >> prec),
                           np.array([255, 255, 127]))
        lo12r2 = lo_q2 << prec
        hi12r2 = np.maximum(hi_q2 << prec, lo12r2)
        le2 = (lo12r2 << 4)[:, None, :, None]
        he2 = (hi12r2 << 4)[:, None, :, None]
        rec2 = (le2 * (64 - wlev) + he2 * wlev + 32) >> 6
        rec2_h = lut[np.clip(rec2, 0, 65535)]
        d2 = rec2_h - lut[np.clip(q16, 0, 65535)][..., None]
        err2 = (d2 * d2).sum(axis=2)
        w2 = np.argmin(err2, axis=-1).astype(np.int64)
        better = err2.min(-1).sum(-1) < err.min(-1).sum(-1)
        lo_q = np.where(better[:, None] & ok[:, None], lo_q2, lo_q)
        hi_q = np.where(better[:, None] & ok[:, None], hi_q2, hi_q)
        w = np.where(better[:, None] & ok[:, None], w2, w)

    # pack: CEM 11 maj=3 direct submode endpoint byte values
    # v0,v1 = R lo/hi qlog8; v2,v3 = G lo/hi qlog8; v4,v5 = B lo/hi qlog7|0x80
    eps = np.zeros((b, 6), dtype=np.int64)
    eps[:, 0] = lo_q[:, 0]
    eps[:, 1] = hi_q[:, 0]
    eps[:, 2] = lo_q[:, 1]
    eps[:, 3] = hi_q[:, 1]
    eps[:, 4] = lo_q[:, 2] | 0x80   # maj-component bits (1,1) => direct
    eps[:, 5] = hi_q[:, 2] | 0x80

    return _pack_cem11_blocks(eps, w)


# --- BC6H (unsigned half) mode-11 real-time encode ---------------------------

BC6H_WEIGHT4 = np.array([0, 4, 9, 13, 17, 21, 26, 30, 34, 38, 43, 47, 51, 55,
                         60, 64], dtype=np.int64)


def _half_to_bc6h_unq(h: np.ndarray) -> np.ndarray:
    """Inverse of BC6H's unsigned finish: half = (x * 31) >> 6 →
    x ≈ ceil(half * 64 / 31), clamped to the 16-bit unquantized domain."""
    h = np.asarray(h, dtype=np.int64)
    return np.clip((h * 64 + 30) // 31, 0, 0xFFFF)


def _bc6h_unq_to_half(x: np.ndarray) -> np.ndarray:
    return ((np.asarray(x, dtype=np.int64) * 31) >> 6).astype(np.uint16)


def _bc6h_dequant10(q: np.ndarray) -> np.ndarray:
    """bc6h_dequantize(val, 10, unsigned)."""
    q = np.asarray(q, dtype=np.int64)
    return np.where(q == 0, 0,
                    np.where(q == 1023, 0xFFFF, ((q << 16) + 0x8000) >> 10))


def halfs_to_bc6h(px_half: np.ndarray) -> np.ndarray:
    """(B,16,3) uint16 half bits → (B,16) BC6H mode-11 blocks (one region,
    10-bit endpoints, 4-bit indices). Real-time class encoder."""
    b = px_half.shape[0]
    unq = _half_to_bc6h_unq(px_half)                      # (B,16,3) 0..FFFF
    lo = unq.min(axis=1)                                  # (B,3)
    hi = unq.max(axis=1)
    lo_q = lo >> 6                                        # 10-bit
    hi_q = -(-hi >> 6)
    hi_q = np.minimum(hi_q, 1023)
    lo_d = _bc6h_dequant10(lo_q)                          # decode-side values
    hi_d = _bc6h_dequant10(hi_q)
    # reconstruction for all 16 weights: (B,1,3,16)
    rec = (lo_d[:, None, :, None] * (64 - BC6H_WEIGHT4)
           + hi_d[:, None, :, None] * BC6H_WEIGHT4 + 32) >> 6
    rec_h = _bc6h_unq_to_half(rec).astype(np.int64)
    d = rec_h - px_half[..., None].astype(np.int64)
    err = (d * d).sum(axis=2)                             # (B,16,16w)
    idx = np.argmin(err, axis=-1).astype(np.int64)        # (B,16)
    # anchor texel 0 must have index < 8 (MSB implicit): swap ends + invert
    flip = idx[:, 0] >= 8
    idx = np.where(flip[:, None], 15 - idx, idx)
    l2 = np.where(flip[:, None], hi_q, lo_q)
    h2 = np.where(flip[:, None], lo_q, hi_q)

    lanes = np.zeros((b, 2), dtype=np.uint64)

    def wr(ofs, vals, nb):
        v = vals.astype(np.uint64) & np.uint64((1 << nb) - 1)
        if ofs < 64:
            lanes[:, 0] |= v << np.uint64(ofs)
            if ofs + nb > 64:
                lanes[:, 1] |= v >> np.uint64(64 - ofs)
        else:
            lanes[:, 1] |= v << np.uint64(ofs - 64)
        return ofs + nb

    ofs = wr(0, np.full(b, 0b00011), 5)                   # mode 11
    for c in range(3):
        ofs = wr(ofs, l2[:, c], 10)
    for c in range(3):
        ofs = wr(ofs, h2[:, c], 10)
    ofs = wr(ofs, idx[:, 0], 3)                           # anchor: 3 bits
    for i in range(1, 16):
        ofs = wr(ofs, idx[:, i], 4)
    assert ofs == 128
    return lanes.view(np.uint8).reshape(b, 16)


def unpack_bc6h_mode11(blocks) -> np.ndarray:
    """Validation decoder for our mode-11 BC6H blocks → (N,4,4,3) half bits."""
    blk = np.asarray(blocks, dtype=np.uint8).reshape(-1, 16)
    lanes = blk.view(np.uint64).reshape(-1, 2)
    n = blk.shape[0]

    def rd(ofs, nb):
        if ofs + nb <= 64:
            return (lanes[:, 0] >> np.uint64(ofs)) & np.uint64((1 << nb) - 1)
        if ofs >= 64:
            return (lanes[:, 1] >> np.uint64(ofs - 64)) & np.uint64((1 << nb) - 1)
        return ((lanes[:, 0] >> np.uint64(ofs))
                | (lanes[:, 1] << np.uint64(64 - ofs))) & np.uint64((1 << nb) - 1)

    assert (rd(0, 5) == 0b00011).all(), "not mode-11 blocks"
    ofs = 5
    lo = np.zeros((n, 3), dtype=np.int64)
    hi = np.zeros((n, 3), dtype=np.int64)
    for c in range(3):
        lo[:, c] = rd(ofs, 10).astype(np.int64); ofs += 10
    for c in range(3):
        hi[:, c] = rd(ofs, 10).astype(np.int64); ofs += 10
    idx = np.zeros((n, 16), dtype=np.int64)
    idx[:, 0] = rd(ofs, 3).astype(np.int64); ofs += 3
    for i in range(1, 16):
        idx[:, i] = rd(ofs, 4).astype(np.int64); ofs += 4
    lo_d = _bc6h_dequant10(lo)
    hi_d = _bc6h_dequant10(hi)
    w = BC6H_WEIGHT4[idx]                                 # (N,16)
    rec = (lo_d[:, None, :] * (64 - w)[..., None]
           + hi_d[:, None, :] * w[..., None] + 32) >> 6
    return _bc6h_unq_to_half(rec).reshape(n, 4, 4, 3)


def _pack_cem11_blocks(eps: np.ndarray, weights: np.ndarray) -> np.ndarray:
    """Pack single-partition CEM-11 blocks: 4x4 grid, 3-bit weights
    (range 5), byte endpoints (inferred ISE range 20)."""
    n = eps.shape[0]
    lanes = np.zeros((n, 2), dtype=np.uint64)

    def wr(ofs, vals, nb):
        v = vals.astype(np.uint64) & np.uint64((1 << nb) - 1)
        if ofs < 64:
            lanes[:, 0] |= v << np.uint64(ofs)
            if ofs + nb > 64:
                lanes[:, 1] |= v >> np.uint64(64 - ofs)
        else:
            lanes[:, 1] |= v << np.uint64(ofs - 64)
        return ofs + nb

    # block mode: grid 4x4, weight range 5 (3-bit plain), single plane.
    # Using decode row 0 (W = 4+w2, H = 2+h2): W=4 -> w2=0, H=4 -> h2=2;
    # range 5 => p=(5-... p-2 => p = (range)+2 when P=0: range 5 <= 5 means
    # P=1? weight_ise_range = (p - 2) + (P ? 6 : 0); range 5 needs P=0,p=7.
    p = 7  # p0..p2 bits
    # row0 layout: p0 at bit4, p1 at bit0, p2 at bit1; W bits 7-8, H bits 5-6
    bm = 0
    bm |= (p & 1) << 4        # p0
    bm |= ((p >> 1) & 1) << 0  # p1
    bm |= ((p >> 2) & 1) << 1  # p2
    # ensure bits[1:0] != 0 to select row family 0..4: p1/p2 at bits 0,1
    bm |= 0 << 9              # P flag
    bm |= 0 << 10             # Dp
    bm |= 0 << 7              # W - 4 = 0
    bm |= 2 << 5              # H - 2 = 2
    ofs = wr(0, np.full(n, bm), 11)
    ofs = wr(ofs, np.zeros(n), 2)             # partitions - 1 = 0
    ofs = wr(ofs, np.full(n, 11), 4)          # CEM 11
    for i in range(6):
        ofs = wr(ofs, eps[:, i], 8)
    # weights: 3-bit plain ISE, reversed bitstream from bit 127 down
    wstream = np.zeros(n, dtype=np.uint64)
    for i in range(16):
        wstream |= (weights[:, i].astype(np.uint64) & np.uint64(7)) << np.uint64(3 * i)
    # reverse the 48-bit stream
    rev = np.zeros(n, dtype=np.uint64)
    tmp = wstream.copy()
    for _ in range(48):
        rev = (rev << np.uint64(1)) | (tmp & np.uint64(1))
        tmp >>= np.uint64(1)
    lanes[:, 1] |= rev << np.uint64(128 - 48 - 64)
    out = lanes.view(np.uint8).reshape(n, 16)
    return out


# --- ASTC HDR 6x6 encode (CEM 11 direct, 5x5 weight grid) --------------------


@functools.lru_cache(maxsize=None)
def _find_block_mode(grid_w: int, grid_h: int, wrange: int) -> int:
    """Brute-force the 11-bit block mode whose decode gives the requested
    weight grid + range, single plane (uses our spec decoder as truth)."""
    for bm in range(2048):
        blk16 = bytearray(16)
        blk16[0] = bm & 0xFF
        blk16[1] = (bm >> 8) & 7
        cfg = ah.decode_block_mode_fields(bm)
        if cfg is None:
            continue
        gw, gh, rng, dual = cfg
        if (gw, gh, rng, dual) == (grid_w, grid_h, wrange, False):
            return bm
    raise ValueError(f"no block mode for {grid_w}x{grid_h} range {wrange}")


@functools.lru_cache(maxsize=None)
def _infill_matrix(grid_w: int, grid_h: int, bw: int, bh: int) -> tuple:
    """(M, pinv(M)): per-texel weights as a linear map of grid weights
    (float model of the spec §18.11 infill)."""
    cols = []
    for j in range(grid_w * grid_h):
        grid = np.zeros(grid_w * grid_h, dtype=np.int64)
        grid[j] = 64
        up = ah.upsample_weights(grid, grid_w, grid_h, bw, bh)
        cols.append(np.asarray(up, dtype=np.float64) / 64.0)
    m = np.stack(cols, axis=1)                              # (bw*bh, gw*gh)
    return m, np.linalg.pinv(m)


def encode_blocks_hdr_6x6(px_half: np.ndarray, effort: int = 1) -> np.ndarray:
    """(B,36,3) uint16 half bits → (B,16) uint8 ASTC HDR 6x6 blocks.

    CEM 11 direct endpoints (qlog8/qlog8/qlog7 min/max per channel), 5x5
    2-bit weight grid fit by least squares against the §18.11 infill and
    requantized.  A basic single-partition encoder (the reference's 6x6
    encoder, encoder/basisu_astc_hdr_6x6_enc.cpp, adds partitions, more
    grids and RDO — future refinement)."""
    b = px_half.shape[0]
    q16 = half_to_qlog16(px_half).astype(np.int64)          # (B,36,3)
    q12 = q16 >> 4
    lo12 = q12.min(axis=1)
    hi12 = q12.max(axis=1)
    prec = np.array([4, 4, 5])
    lo_q = lo12 >> prec
    hi_q = np.minimum(-(-hi12 >> prec.astype(np.int64)),
                      np.array([255, 255, 127]))
    le = (lo_q << prec) << 4                                # qlog16 (B,3)
    he = (hi_q << prec) << 4

    # continuous ideal texel weights via per-channel LS projection
    d = (he - le).astype(np.float64)                        # (B,3)
    num = ((q16 - le[:, None, :]) * d[:, None, :]).sum(-1)  # (B,36)
    den = np.maximum((d * d).sum(-1), 1e-9)
    w_tex = np.clip(64.0 * num / den[:, None], 0, 64)

    lut = _qlog16_to_half_lut().astype(np.int64)
    tgt_h = lut[np.clip(q16, 0, 65535)]                     # (B,36,3)

    # candidate weight-grid configs (plain-bit ISE ranges only): the
    # per-block argmin picks the grid whose infilled reconstruction wins
    configs = [(6, 6, 0, 1), (5, 5, 2, 2), (4, 4, 5, 3)]    # (gw,gh,rng,bits)
    if effort >= 2:
        configs.append((3, 3, 5, 3))
    cand_codes, cand_err = [], []
    for (gw, gh, rng, wb) in configs:
        m, pinv = _infill_matrix(gw, gh, 6, 6)
        grid_f = np.clip(w_tex @ pinv.T, 0, 64)             # (B,g)
        levels = np.array([ah.dequant_weight(v, rng)
                           for v in range(1 << wb)])
        codes = np.abs(grid_f[..., None] - levels).argmin(-1)
        # exact §18.11 infill of the dequantized grid, then half-space SSE
        gq = levels[codes]                                   # (B,g)
        up = np.clip((gq @ (m.T * 64.0) + 32).astype(np.int64) >> 6, 0, 64)
        rec = (le[:, None, :] * (64 - up[..., None])
               + he[:, None, :] * up[..., None] + 32) >> 6
        rec_h = lut[np.clip(rec, 0, 65535)]
        cand_err.append(((rec_h - tgt_h) ** 2).sum(axis=(1, 2)))
        cand_codes.append(codes)
    best = np.argmin(np.stack(cand_err, axis=1), axis=1)    # (B,)

    eps = np.zeros((b, 6), dtype=np.int64)
    eps[:, 0] = lo_q[:, 0]
    eps[:, 1] = hi_q[:, 0]
    eps[:, 2] = lo_q[:, 1]
    eps[:, 3] = hi_q[:, 1]
    eps[:, 4] = lo_q[:, 2] | 0x80
    eps[:, 5] = hi_q[:, 2] | 0x80

    out = np.zeros((b, 16), dtype=np.uint8)
    for ci, (gw, gh, rng, wb) in enumerate(configs):
        idx = np.flatnonzero(best == ci)
        if not idx.size:
            continue
        out[idx] = _pack_cem11_generic(
            eps[idx], cand_codes[ci][idx], gw, gh, rng, wb)
    return out


def _pack_cem11_generic(eps, codes, gw, gh, rng, wb):
    """Pack single-partition CEM-11 blocks with an arbitrary plain-bit
    weight grid (inferred endpoint range 20)."""
    n = eps.shape[0]
    lanes = np.zeros((n, 2), dtype=np.uint64)

    def wr(ofs, vals, nb):
        v = vals.astype(np.uint64) & np.uint64((1 << nb) - 1)
        if ofs < 64:
            lanes[:, 0] |= v << np.uint64(ofs)
            if ofs + nb > 64:
                lanes[:, 1] |= v >> np.uint64(64 - ofs)
        else:
            lanes[:, 1] |= v << np.uint64(ofs - 64)
        return ofs + nb

    bm = _find_block_mode(gw, gh, rng)
    ofs = wr(0, np.full(n, bm), 11)
    ofs = wr(ofs, np.zeros(n), 2)
    ofs = wr(ofs, np.full(n, 11), 4)
    for i in range(6):
        ofs = wr(ofs, eps[:, i], 8)
    nw = gw * gh
    nwb = nw * wb
    assert 24 <= nwb <= 96 and ofs + nwb <= 128
    wstream = np.zeros(n, dtype=np.uint64)
    for i in range(nw):
        wstream |= (codes[:, i].astype(np.uint64)
                    & np.uint64((1 << wb) - 1)) << np.uint64(wb * i)
    rev = np.zeros(n, dtype=np.uint64)
    tmp = wstream.copy()
    for _ in range(nwb):
        rev = (rev << np.uint64(1)) | (tmp & np.uint64(1))
        tmp >>= np.uint64(1)
    if nwb <= 64:
        lanes[:, 1] |= rev << np.uint64(128 - nwb - 64)
    else:  # pragma: no cover - all current configs fit in the top lane
        lanes[:, 1] |= rev >> np.uint64(nwb - 64)
        lanes[:, 0] |= rev << np.uint64(128 - nwb)
    return lanes.view(np.uint8).reshape(n, 16)
