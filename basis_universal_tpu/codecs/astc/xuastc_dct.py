"""XUASTC weight-grid DCT decode (IDCT + adaptive quantization).

Parity: grid_weight_dct (transcoder/basisu_transcoder_internal.h:1860,
basisu_transcoder.cpp:26875-27355) and the orthonormal DCT-III transforms of
transcoder/basisu_idct.h. The unrolled per-size reference transforms are
plain orthonormal cosine bases — here they are float32 numpy matrices (the
reference's own debug build checks its fast path against a naive variant at
1.25e-3 tolerance, so the transform is specified mathematically, not
bit-wise).
"""

import functools
import math

import numpy as np

from . import xuastc_tables as XT

DEADZONE_ALPHA = 0.5
SCALED_WEIGHT_BASE_CODING_SCALE = 0.5
DCT_RUN_LEN_EOB_SYM_INDEX = 64
DCT_MEAN_LEVELS0 = 9
DCT_MEAN_LEVELS1 = 33

# JPEG baseline luma quant matrix with a modified DC entry
# (basisu_transcoder.cpp:26933)
BASELINE_JPEG_Y = np.array([
    [4, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.float32)

# scale_quant_steps(levels) results (basisu_transcoder.cpp:27164)
SCALE_QUANT_STEPS = [1.51333141, 1.41198814, 1.35588217, 1.31743157,
                     1.28835952, 1.24573100, 1.21481407, 1.19067919,
                     1.15431654, 1.12734985, 1.10601568, 1.07348967]


@functools.lru_cache(maxsize=None)
def zigzag_order(width: int, height: int):
    """Diagonal zigzag scan with alternating direction
    (generate_zigzag_order, basisu_transcoder.cpp:26875)."""
    order = []
    for s in range(width + height - 1):
        x_start = 0 if s < height else s - height + 1
        x_end = s if s < width else width - 1
        diag = [x + (s - x) * width for x in range(x_start, x_end + 1)]
        order.extend(reversed(diag) if (s & 1) else diag)
    return order


@functools.lru_cache(maxsize=None)
def _idct_matrix(n: int) -> np.ndarray:
    """M[k, x] = alpha(k) cos(pi (2x+1) k / 2n) — the reference's exact
    float32 literals (extracted from basisu_idct.h; they carry codegen
    rounding noise, so recomputing via cos() drifts by ulps and flips
    weights on .5 boundaries)."""
    import pathlib

    data = np.load(pathlib.Path(__file__).with_name("xuastc_idct.npz"))
    return data[str(n)]


def idct2(coeffs: np.ndarray) -> np.ndarray:
    """(gh, gw) DCT coefficients → spatial samples.

    Matches idct_2d (basisu_transcoder.cpp:26477) to the last float32
    rounding: columns first then rows, accumulating in k-order."""
    gh, gw = coeffs.shape
    src = coeffs.astype(np.float32)
    mc = _idct_matrix(gh)
    tmp = np.zeros((gh, gw), dtype=np.float32)
    for k in range(gh):
        tmp += mc[k][:, None] * src[k][None, :]
    mr = _idct_matrix(gw)
    out = np.zeros((gh, gw), dtype=np.float32)
    for v in range(gw):
        out += tmp[:, v][:, None] * mr[v][None, :]
    return out


def get_num_weight_dc_levels(weight_ise_range: int) -> int:
    scale = SCALED_WEIGHT_BASE_CODING_SCALE
    if weight_ise_range <= 5:       # BISE_8_LEVELS
        scale = 1.0 / 8.0
    return int(64.0 * scale) + 1


def compute_level_scale(q: float, span_len: float,
                        weight_ise_range: int) -> np.float32:
    # float32 throughout: the level scale feeds integer quant steps, and a
    # float64 intermediate can flip a step by one vs the reference
    f = np.float32
    q = min(max(f(q), f(1.0)), f(100.0))
    if q < f(50.0):
        level_scale = f(5000.0) / q
    else:
        level_scale = f(200.0) - f(2.0) * q
    level_scale = level_scale * f(1.0 / 100.0)
    adaptive = f(64.0) / max(f(span_len), f(14.0))
    adaptive = adaptive * f(SCALE_QUANT_STEPS[weight_ise_range])
    return f(level_scale * adaptive)


def sample_quant(q: float, level_scale: float, bw: int, bh: int,
                 x: int, y: int) -> int:
    if q >= 100.0:
        return 1
    sx = np.float32(8.0 / bw)
    sy = np.float32(8.0 / bh)
    rx = min(np.float32(x) * sx, np.float32(7.0))
    ry = min(np.float32(y) * sy, np.float32(7.0))
    i0, j0 = int(rx), int(ry)
    i1, j1 = min(i0 + 1, 7), min(j0 + 1, 7)
    ti = rx - np.float32(i0)
    tj = ry - np.float32(j0)
    a = (1 - ti) * BASELINE_JPEG_Y[j0][i0] + ti * BASELINE_JPEG_Y[j0][i1]
    b = (1 - ti) * BASELINE_JPEG_Y[j1][i0] + ti * BASELINE_JPEG_Y[j1][i1]
    base = (1 - tj) * a + tj * b
    return max(1, int(np.float32(base) * np.float32(level_scale)
                      + np.float32(0.5)))


def dequant_deadzone(qv: int, L: int, alpha: float, x: int, y: int) -> float:
    if (x == 1 and y == 0) or (x == 0 and y == 1):
        return float(qv) * float(L)
    if qv == 0 or L <= 0:
        return 0.0
    tau = alpha * float(L)
    mag = tau + float(abs(qv)) * float(L)
    return -mag if qv < 0 else mag


def get_max_span_len(blk, cems_mod) -> float:
    """AQ span length (grid_weight_dct::get_max_span_len) for plane 0/1.

    blk: object with cems, endpoints, endpoint_ise_range, num_partitions,
    dual_plane, ccs. Returns (span_plane0, span_plane1)."""
    f = np.float32
    cem = blk.cems[0]
    if blk.dual_plane:
        l, h = cems_mod.decode_endpoints(cem, blk.endpoints,
                                         blk.endpoint_ise_range)
        s_other = f(0.0)
        s_sel = f(0.0)
        for c in range(4):
            d = (f(h[c]) - f(l[c])) * (f(h[c]) - f(l[c]))
            if c == blk.ccs:
                s_sel = s_sel + d
            else:
                s_other = s_other + d
        return f(math.sqrt(s_other)), f(math.sqrt(s_sel))
    nvals = XT.cem_num_values(cem)
    span = f(0.0)
    for p in range(blk.num_partitions):
        l, h = cems_mod.decode_endpoints(
            cem, blk.endpoints[nvals * p:nvals * (p + 1)],
            blk.endpoint_ise_range)
        acc = f(0.0)
        for c in range(4):
            acc = acc + (f(h[c]) - f(l[c])) * (f(h[c]) - f(l[c]))
        span = max(span, f(math.sqrt(acc)))
    return span, span


def decode_block_weights_from_syms(q: float, plane_index: int, blk,
                                   block_width: int, block_height: int,
                                   dc_sym: int, coeffs, span_len: float):
    """IDCT path of grid_weight_dct::decode_block_weights (dct_syms input,
    i.e. the full-zstd syntax). Writes ISE weight symbols into blk.weights
    for the given plane. coeffs: list of (num_zeros, coeff)."""
    gw, gh = blk.grid_width, blk.grid_height
    total = gw * gh
    num_planes = 2 if blk.dual_plane else 1
    wtab = XT.weight_tab(blk.weight_ise_range).val_to_ise

    level_scale = compute_level_scale(q, span_len, blk.weight_ise_range)
    scale = SCALED_WEIGHT_BASE_CODING_SCALE
    if blk.weight_ise_range <= 5:
        scale = 1.0 / 8.0
    mean_weight = np.float32(dc_sym) / np.float32(scale)

    zz = zigzag_order(gw, gh)
    dct = np.zeros(total, dtype=np.float32)
    zig_idx = 1
    for run_len, coeff in coeffs:
        if run_len + zig_idx > total:
            raise ValueError("XUASTC DCT run overflow")
        zig_idx += run_len
        if zig_idx >= total:
            break
        di = zz[zig_idx]
        y, x = di // gw, di % gw
        quant = sample_quant(q, level_scale, block_width, block_height, x, y)
        dct[di] = dequant_deadzone(coeff, quant, DEADZONE_ALPHA, x, y)
        zig_idx += 1

    idct = idct2(dct.reshape(gh, gw)).reshape(-1)
    for i in range(total):
        x = float(mean_weight + idct[i])
        # fast_roundf_int: round half away from zero (transcoder.cpp:23977)
        v = int(x + 0.5) if x >= 0.0 else int(x - 0.5)
        blk.weights[i * num_planes + plane_index] = int(
            wtab[min(max(v, 0), 64)])
