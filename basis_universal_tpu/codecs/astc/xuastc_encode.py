"""XUASTC LDR full-zstd encoder (v1).

Produces the supercompressed "JPEG for ASTC" stream decoded by
xuastc_ldr.decode_log_blocks (spec: xuastc_ldr_decompress_image_full_zstd,
transcoder/basisu_transcoder.cpp:27633). The per-block ASTC search reuses
the direct LDR encoder's candidate machinery (ldr_encode.py: batched
principal-axis endpoints + grid infill fits — the TPU-idiomatic dense scan);
this module adds the XUASTC entropy layer:

  - RAW blocks with trial-mode coding (tm hash / truncated binary)
  - BISE endpoint emission into the raw-bits stream
  - rank-space weight DPCM into the per-width side streams
  - SOLID blocks (DPCM vs the previous block's midpoint predictor)
  - RUN coding of repeated blocks
  - the 21-length full-zstd container (Zstd side streams)

v1 encodes without the weight-grid DCT (use_dct=0): quality equals the
direct ASTC encoder's, and the entropy layer is lossless on top of it.
"""

import numpy as np

from ..uastc.tables import BISE_RANGE_TABLE
from . import ldr_encode
from . import xuastc_cems as XC
from . import xuastc_tables as XT


class _LsbWriter:
    """bitwise_coder analog (LSB-first across bytes)."""

    def __init__(self):
        self.buf = bytearray()
        self.bit = 0
        self.acc = 0

    def put(self, value: int, nbits: int):
        self.acc |= (value & ((1 << nbits) - 1)) << self.bit
        self.bit += nbits
        while self.bit >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.bit -= 8

    def put_truncated_binary(self, value: int, n: int):
        k = n.bit_length() - 1
        u = (1 << (k + 1)) - n
        if value < u:
            self.put(value, k)
        else:
            v = value + u
            self.put(v >> 1, k)
            self.put(v & 1, 1)

    def to_bytes(self) -> bytes:
        out = bytes(self.buf)
        if self.bit:
            out += bytes([self.acc & 0xFF])
        return out


class _SimpleWriter:
    """simplified_bitwise_decoder's encode side: LSB-first within a byte,
    fields never cross byte boundaries (all users write uniform widths that
    divide 8)."""

    def __init__(self):
        self.buf = bytearray()
        self.bit = 8  # force new byte on first put

    def put(self, value: int, nbits: int):
        if self.bit + nbits > 8:
            self.buf.append(0)
            self.bit = 0
        self.buf[-1] |= (value & ((1 << nbits) - 1)) << self.bit
        self.bit += nbits

    def to_bytes(self) -> bytes:
        return bytes(self.buf)


def encode_values(w: _LsbWriter, vals, ise_range: int):
    """Inverse of decode_values (basisu_transcoder.cpp:23287): all
    trit/quint bundles first, then the per-value low bits."""
    bits, trits, quints = BISE_RANGE_TABLE[ise_range]
    n = len(vals)
    if trits or quints:
        bundle = 5 if trits else 3
        mul = 3 if trits else 5
        total_tqs = (n + bundle - 1) // bundle
        for i in range(total_tqs):
            nb = 8 if trits else 7
            if i == total_tqs - 1:
                rem = n - (total_tqs - 1) * bundle
                if trits:
                    nb = {1: 2, 2: 4, 3: 5, 4: 7}.get(rem, nb)
                else:
                    nb = {1: 3, 2: 5}.get(rem, nb)
            accum = 0
            for j in reversed(range(bundle)):
                idx = i * bundle + j
                t = (vals[idx] >> bits) if idx < n else 0
                accum = accum * mul + t
            w.put(accum, nb)
    mask = (1 << bits) - 1
    for v in vals:
        w.put(v & mask, bits)


def _tm_lookup(block_size_index: int):
    tms = XT.encoder_trial_modes(block_size_index)
    return {(t.grid_width, t.grid_height, t.cem, t.ccs_index,
             t.endpoint_ise_range, t.weight_ise_range, t.num_parts): i
            for i, t in enumerate(tms)}, len(tms)


class _BlkShim:
    """log_astc_block-shaped view of one planned block for the weight-grid
    DCT helpers (xuastc_dct.get_max_span_len / code / decode)."""

    __slots__ = ("cems", "endpoints", "endpoint_ise_range", "num_partitions",
                 "dual_plane", "ccs", "grid_width", "grid_height",
                 "weight_ise_range", "weights")

    def __init__(self, cem, eps, ep_rng, gw, gh, wrng, weights):
        self.cems = (cem,)
        self.endpoints = list(eps)
        self.endpoint_ise_range = ep_rng
        self.num_partitions = 1
        self.dual_plane = False
        self.ccs = -1
        self.grid_width = gw
        self.grid_height = gh
        self.weight_ise_range = wrng
        self.weights = list(weights)


def encode_image(rgba: np.ndarray, block_w: int, block_h: int,
                 has_alpha: bool, srgb: bool, effort: int = 1,
                 dct_quality=None) -> bytes:
    """(H, W, 4) uint8 → full-zstd XUASTC LDR stream.

    dct_quality: None = lossless entropy layer; 1-100 = weight-grid DCT
    quantization at that JPEG-style quality (the reference's m_dct_quality,
    encoder/basisu_astc_ldr_encode.h:46; stream contract decoded by
    xuastc_ldr.decode_log_blocks and the reference transcoder)."""
    import zstandard

    h, w = rgba.shape[:2]
    nbx = -(-w // block_w)
    nby = -(-h // block_h)
    pad = np.pad(rgba, ((0, nby * block_h - h), (0, nbx * block_w - w),
                        (0, 0)), mode="edge")
    px = pad.reshape(nby, block_h, nbx, block_w, 4).transpose(
        0, 2, 1, 3, 4).reshape(nby * nbx, block_h * block_w, 4)

    bsi = XT.ASTC_BLOCK_SIZES.index((block_w, block_h))
    lookup, n_tms = _tm_lookup(bsi)
    cem = 12 if has_alpha else 8

    plan = ldr_encode.encode_blocks_plan(px, block_w, block_h, has_alpha,
                                         effort=effort)

    # streams
    raw = _LsbWriter()
    mode_w = _SimpleWriter()
    solid_w = _SimpleWriter()
    w2 = _SimpleWriter()
    w3 = _SimpleWriter()
    w4 = _SimpleWriter()
    w8 = _SimpleWriter()
    mean0_w = _SimpleWriter()
    mean1_w = _SimpleWriter()
    run_w = _SimpleWriter()
    coeff_w = _SimpleWriter()
    sign_w = _SimpleWriter()

    use_dct = dct_quality is not None and 0.0 < float(dct_quality) <= 100.0
    raw.put(0x01, 5)                      # FULL_ZSTD_HEADER_MARKER
    raw.put(bsi, 4)
    raw.put(1 if srgb else 0, 1)
    raw.put(w, 16)
    raw.put(h, 16)
    raw.put(1 if has_alpha else 0, 1)
    raw.put(1 if use_dct else 0, 1)
    if use_dct:
        q = float(dct_quality)
        raw.put(int(round(q * 2.0)), 8)   # dct_q stored in half-steps
    else:
        q = 0.0

    tm_hash = [-1] * XT.TM_HASH_SIZE

    solid = np.all(px == px[:, :1, :], axis=(1, 2))
    uniq_color = px[:, 0, :]

    # per-block emitted state for solid prediction / runs
    prev_fields = None                    # last emitted block tuple
    run_left = 0

    def weight_writer(n_levels):
        if n_levels <= 4:
            return w2, 2, (3 if n_levels == 4 else None)
        if n_levels <= 8:
            return w3, 4, (7 if n_levels == 8 else None)
        if n_levels <= 16:
            return w4, 4, (15 if n_levels == 16 else None)
        return w8, 8, None

    # precompute per-block emit tuples so runs can compare cheaply.
    # tuple: ("raw", tm_index, endpoints, weight_codes, n_weights,
    #         weight_range, dct_syms-or-None)
    from . import xuastc_dct as XD

    coeff_thresh_cache = {}
    tuples = []
    for bi in range(nbx * nby):
        if solid[bi]:
            tuples.append(("solid", tuple(int(v) for v in uniq_color[bi])))
            continue
        ci = plan["config"][bi]
        gw, gh, wrng, wb, ep_rng = plan["configs"][ci]
        key = (gw, gh, cem, -1, ep_rng, wrng, 1)
        tm_index = lookup.get(key)
        if tm_index is None:
            raise ValueError(f"no trial mode for config {key}")
        eps = tuple(int(v) for v in plan["endpoints"][bi])
        codes = tuple(int(v) for v in plan["codes"][bi])
        dct_syms = None
        if use_dct:
            blk = _BlkShim(cem, eps, ep_rng, gw, gh, wrng, codes)
            span = XD.get_max_span_len(blk, XC)[0]
            dc_sym, ndc, coeffs, max_mag = XD.code_block_weights(
                q, 0, blk, block_w, block_h, span)
            # fallback gates (compress_image_full_zstd,
            # encoder/basisu_astc_ldr_encode.cpp:12671-12696)
            thresh = coeff_thresh_cache.setdefault(
                (gw, gh), (gw * gh * 45 + 64) >> 7)
            ncoded = sum(1 for _, c in coeffs if c is not None)
            if coeffs and max_mag <= 255 and ncoded <= thresh:
                dct_syms = (dc_sym, ndc, tuple(coeffs))
            # reconstruct the post-quant weights the decoder will see (the
            # reference replaces the block's weights before emission even
            # when the block later falls back to DPCM)
            blk.weights = [0] * (gw * gh)
            XD.decode_block_weights_from_syms(
                q, 0, blk, block_w, block_h, dc_sym,
                [c for c in coeffs if c[1] is not None], span)
            codes = tuple(int(v) for v in blk.weights)
        tuples.append(("raw", tm_index, eps, codes, gw * gh, wrng,
                       dct_syms))

    prev_mid = None                      # decoded midpoint for solid DPCM

    def solid_pred(i):
        # the decoder predicts from the LEFT neighbor, else the one ABOVE
        bx, by = i % nbx, i // nbx
        if bx:
            prev = tuples[i - 1]
        elif by:
            prev = tuples[i - nbx]
        else:
            return (0, 0, 0, 0)
        if prev[0] == "solid":
            return prev[1]
        _, tm_index, eps = prev[:3]
        tms = XT.encoder_trial_modes(bsi)
        t = tms[tm_index]
        pl, ph = XC.decode_endpoints(cem, list(eps), t.endpoint_ise_range)
        return tuple((pl[i] + ph[i] + 1) >> 1 for i in range(4))

    i = 0
    n_blocks = nbx * nby
    prev_tuple = None
    while i < n_blocks:
        bx = i % nbx
        by = i // nbx
        t = tuples[i]
        # run detection: identical to previous emitted block, same row
        if prev_tuple is not None and bx != 0 and t == prev_tuple:
            run_len = 1
            max_run = min(64, nbx - bx)
            while (run_len < max_run and i + run_len < n_blocks
                   and tuples[i + run_len] == prev_tuple):
                run_len += 1
            mode_w.put(0b01 | ((run_len - 1) << 2), 8)
            i += run_len
            continue

        if t[0] == "solid":
            pred = solid_pred(i)
            r, g, b, a = t[1]
            mode_w.put(0b0011, 8)
            solid_w.put((r - pred[0]) & 0xFF, 8)
            solid_w.put((g - pred[1]) & 0xFF, 8)
            solid_w.put((b - pred[2]) & 0xFF, 8)
            if has_alpha:
                solid_w.put((a - pred[3]) & 0xFF, 8)
        else:
            _, tm_index, eps, codes, nw, wrng, dct_syms = t
            hit = tm_hash[XT.tm_hash_index(tm_index)] == tm_index
            mode_byte = 0b110                     # RAW, cfg_reuse=3
            if hit:
                mode_byte |= 1 << 6               # TM_HASH_HIT
            if dct_syms is not None:
                mode_byte |= 1 << 7               # XUASTC_LDR_MODE_BYTE_USE_DCT
            mode_w.put(mode_byte, 8)
            if hit:
                raw.put(XT.tm_hash_index(tm_index), XT.TM_HASH_BITS)
            else:
                raw.put_truncated_binary(tm_index, n_tms)
                tm_hash[XT.tm_hash_index(tm_index)] = tm_index
            tms = XT.encoder_trial_modes(bsi)
            encode_values(raw, list(eps), tms[tm_index].endpoint_ise_range)
            if dct_syms is not None:
                # DCT symbol streams (compress_image_full_zstd weight
                # emission, encoder/basisu_astc_ldr_encode.cpp:12708-12748)
                dc_sym, ndc, coeffs = dct_syms
                from . import xuastc_dct as _XD
                if ndc == _XD.DCT_MEAN_LEVELS1:
                    mean1_w.put(dc_sym, 8)
                else:
                    mean0_w.put(dc_sym, 4)
                for num_zeros, coeff in coeffs:
                    if coeff is None:             # EOB
                        run_w.put(_XD.DCT_RUN_LEN_EOB_SYM_INDEX, 8)
                    else:
                        run_w.put(num_zeros, 8)
                        sign_w.put(1 if coeff < 0 else 0, 1)
                        coeff_w.put(abs(coeff) - 1, 8)
            else:
                # weight DPCM (rank space; plain-bit ranges: rank == symbol)
                wtab = XT.weight_tab(wrng)
                n_levels = int(wtab.ise_to_val.shape[0])
                wr, nb, _mask = weight_writer(n_levels)
                prev_w = n_levels // 2
                for cidx in range(nw):
                    cur = int(wtab.ise_to_rank[codes[cidx]])
                    wr.put((cur - prev_w) % n_levels, nb)
                    prev_w = cur
        prev_tuple = t
        i += 1

    raw.put(0xAF, 8)                      # FINAL_SYNC_MARKER

    cctx = zstandard.ZstdCompressor(level=19)
    raw_bytes = raw.to_bytes()
    streams = {name: b"" for name in [
        "mode_bytes", "solid_dpcm_bytes", "endpoint_dpcm_reuse_indices",
        "use_bc_bits", "endpoint_dpcm_3bit", "endpoint_dpcm_4bit",
        "endpoint_dpcm_5bit", "endpoint_dpcm_6bit", "endpoint_dpcm_7bit",
        "endpoint_dpcm_8bit", "mean0_bits", "mean1_bytes", "run_bytes",
        "coeff_bytes", "sign_bits", "weight2_bits", "weight3_bits",
        "weight4_bits", "weight8_bytes"]}
    streams["mode_bytes"] = mode_w.to_bytes()
    streams["solid_dpcm_bytes"] = solid_w.to_bytes()
    streams["weight2_bits"] = w2.to_bytes()
    streams["weight3_bits"] = w3.to_bytes()
    streams["weight4_bits"] = w4.to_bytes()
    streams["weight8_bytes"] = w8.to_bytes()
    streams["mean0_bits"] = mean0_w.to_bytes()
    streams["mean1_bytes"] = mean1_w.to_bytes()
    streams["run_bytes"] = run_w.to_bytes()
    streams["coeff_bytes"] = coeff_w.to_bytes()
    streams["sign_bits"] = sign_w.to_bytes()

    import struct

    comp = {}
    for name, data in streams.items():
        if name == "sign_bits":
            comp[name] = data                     # stored raw
        else:
            comp[name] = cctx.compress(data) if data else b""

    order = ["mode_bytes", "solid_dpcm_bytes", "endpoint_dpcm_reuse_indices",
             "use_bc_bits", "endpoint_dpcm_3bit", "endpoint_dpcm_4bit",
             "endpoint_dpcm_5bit", "endpoint_dpcm_6bit",
             "endpoint_dpcm_7bit", "endpoint_dpcm_8bit", "mean0_bits",
             "mean1_bytes", "run_bytes", "coeff_bytes", "sign_bits",
             "weight2_bits", "weight3_bits", "weight4_bits",
             "weight8_bytes"]
    lens = [len(raw_bytes)] + [len(comp[n]) for n in order] + [0]
    out = bytearray()
    out.append(2)                                 # SYNTAX_FULL_ZSTD
    out += struct.pack("<21I", *lens)
    out += raw_bytes
    for n in order:
        out += comp[n]
    return bytes(out)
