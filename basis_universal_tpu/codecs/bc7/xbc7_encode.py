"""XUBC7 encoder v1: lossless BC7 supercompression.

Behavioral parity with the reference's xbc7 encode path (the encoder side
of transcoder/basisu_xbc7_decoder.h's format): given physical BC7 blocks,
emit the blob container (0xB7 magic, varint directory, per-blob Zstd) that
xbc7_decode reconstructs BYTE-EXACTLY.

v1 writes the lossless subset of the syntax:
  - CMD_REPEAT_LAST / CMD_REPEAT_UPPER when a block's physical bytes equal
    its left/upper neighbor (within the stripe tile),
  - CMD_SOLID_DPCM when the canonical solid encoding reproduces the block,
  - otherwise CMD_NEW_CONFIG + EP_RAW endpoints + absolute raw weights
    (wt_mode 0), which transports the logical block verbatim.

Stripes are the format's parallel-decode axis: blocks are coded per-stripe
with neighbor references clipped to the stripe tile, and a seek table
(byte/bit start offsets per stream) lets the decoder run stripes
concurrently — mirrored from xbc7_decode._decode_stripe.
"""

import math
import struct

import numpy as np

from . import logical as L
from .xbc7_decode import (
    BLOB_MAGIC_BEGIN, BLOB_MAGIC_END,
    B_HEADER, B_COMMANDS, B_CONFIG, B_PART2, B_PART3, B_PREDICTORS,
    B_DC_SMALL, B_AC, B_SIGNS, B_PBITS,
    B_EP_FINE_R, B_EP_COARSE_R,
    B_EP_RAW, B_RAW_WEIGHTS, B_SOLID_DELTAS, B_SEEK,
    B_WT_RESID2, B_WT_RESID3, B_WT_RESID4,
    CMD_REPEAT_LAST, CMD_REPEAT_UPPER, CMD_SOLID_DPCM, CMD_NEW_CONFIG,
    CMD_REUSE_LEFT, CMD_REUSE_UPPER, CMD_REUSE_LDIAG, CMD_REUSE_RDIAG,
    EP_RAW, EP_DPCM_LEFT, EP_DPCM_UP, EP_DPCM_LDIAG, EP_DPCM_RDIAG,
    CAND_ABSOLUTE, CAND_LU_BLEND, CAND_GRADIENT, CAND_MED,
    CAND_FIRST_XY_DELTA, TOTAL_CANDIDATES, ONE,
    dct_forward_weights, dct_inverse_weights,
    eval_weight_predictor, _stripe_ranges,
)

# weight predictor shortlist: absolute + copy-left/up + the structural
# predictors that win most often (full 50-candidate search is the
# reference's encode-side speed/ratio knob; this subset captures the bulk
# of the gain at ~10% of the eval cost)
_WT_CANDS = (CAND_FIRST_XY_DELTA + 0,   # copy left block
             CAND_FIRST_XY_DELTA + 7,   # copy upper block
             CAND_LU_BLEND, CAND_GRADIENT, CAND_MED)


def _resid_cost(r: int, modulus: int) -> float:
    """Approximate entropy-coded size (bits) of a wrapped residual byte."""
    m = min(r, modulus - r)
    return 1.0 + 2.0 * math.log2(1.0 + m)


class _LsbBitWriter:
    """LSB-first bit writer sharing one buffer across stripes (the decoder's
    _LsbBits reads absolute bit offsets, so stripe streams are bit-packed
    back to back with no alignment)."""

    def __init__(self):
        self.bytes = bytearray()
        self.bit = 0

    def put(self, v: int, n: int):
        for i in range(n):
            if self.bit == len(self.bytes) * 8:
                self.bytes.append(0)
            if (v >> i) & 1:
                self.bytes[self.bit >> 3] |= 1 << (self.bit & 7)
            self.bit += 1


def _ep_dpcm_residuals(pred_blk, pred_subset, blk, subset, has_alpha):
    """Inverse of L.endpoint_dpcm_decode: residual bytes (+ per-byte cost
    moduli) and pbit residuals that reconstruct blk.endpoints[subset]
    exactly through the decoder."""
    pred = L.unpack_endpoints(pred_blk, pred_subset)
    if pred_blk.is_dual_plane():
        pccs = pred_blk.get_color_component_selector()
        pred[0][pccs], pred[0][3] = pred[0][3], pred[0][pccs]
        pred[1][pccs], pred[1][3] = pred[1][3], pred[1][pccs]
    ccs = blk.get_color_component_selector()
    if blk.is_dual_plane():
        pred[0][ccs], pred[0][3] = pred[0][3], pred[0][ccs]
        pred[1][ccs], pred[1][3] = pred[1][3], pred[1][ccs]

    packed_lo, packed_hi, packed_pbits = L.pack_endpoints_int(
        blk.mode, pred[0], pred[1])
    num_comps = blk.get_num_comps()
    fmt = L.ENDPOINT_FORMATS[blk.mode]
    g_channel, a_channel = 1, 3
    if blk.is_dual_plane():
        a_channel = ccs
        if ccs == 1:
            g_channel = 3

    num_residuals = num_comps * 2
    if (not has_alpha) and blk.mode == 6:
        num_residuals = 6

    delta = [0] * 8
    moduli = [256] * 8
    for c in range(num_residuals >> 1):
        nb = blk.endpoint_bits[c == 3]
        mask = (1 << nb) - 1
        delta[c * 2 + 0] = (int(blk.endpoints[subset][0][c])
                            - packed_lo[c]) & mask
        delta[c * 2 + 1] = (int(blk.endpoints[subset][1][c])
                            - packed_hi[c]) & mask
        if c == g_channel or c == a_channel:
            moduli[c * 2] = moduli[c * 2 + 1] = mask + 1
    res = list(delta)
    for c in range(num_residuals >> 1):
        if c == g_channel or c == a_channel:
            continue
        res[c * 2 + 0] = (delta[c * 2 + 0] - delta[g_channel * 2 + 0]) & 0xFF
        res[c * 2 + 1] = (delta[c * 2 + 1] - delta[g_channel * 2 + 1]) & 0xFF
    rp = [(int(blk.pbits[subset * fmt[2] + p]) - packed_pbits[p]) & 1
          for p in range(fmt[2])]
    return res[:num_residuals], moduli[:num_residuals], rp


def _encode_stripe(stripe, nbx, log_blks, phys, has_alpha, streams, bits,
                   global_q=100):
    first_row, n_rows = stripe
    end_row = first_row + n_rows
    tile = (0, first_row, nbx - 1, end_row - 1)
    gq_fx = global_q * ONE

    def neighbor(nx, ny):
        if tile[0] <= nx <= tile[2] and tile[1] <= ny <= tile[3]:
            return log_blks[ny][nx]
        return None

    commands = streams[B_COMMANDS]
    configs = streams[B_CONFIG]
    part2 = streams[B_PART2]
    part3 = streams[B_PART3]
    predictors = streams[B_PREDICTORS]
    solid_deltas = streams[B_SOLID_DELTAS]
    dc_coeffs = streams[B_DC_SMALL]
    ac_coeffs = streams[B_AC]
    coeff_signs = bits[B_SIGNS]
    raw_weights = streams[B_RAW_WEIGHTS]
    wt_resid = {2: streams[B_WT_RESID2], 3: streams[B_WT_RESID3],
                4: streams[B_WT_RESID4]}
    ep_fine = [streams[B_EP_FINE_R + c] for c in range(4)]
    ep_coarse = [streams[B_EP_COARSE_R + c] for c in range(4)]
    ep_raw = bits[B_EP_RAW]
    pbits_r = bits[B_PBITS]

    for by in range(first_row, end_row):
        for bx in range(nbx):
            i = by * nbx + bx
            pbytes = phys[i]
            left = neighbor(bx - 1, by)
            up = neighbor(bx, by - 1)
            ldiag = neighbor(bx - 1, by - 1)
            rdiag = neighbor(bx + 1, by - 1)

            if left is not None and phys[i - 1] == pbytes:
                commands.append(CMD_REPEAT_LAST)
                log_blks[by][bx] = left.copy()
                continue
            if up is not None and phys[i - nbx] == pbytes:
                commands.append(CMD_REPEAT_UPPER)
                log_blks[by][bx] = up.copy()
                continue

            blk = L.unpack_phys(pbytes)

            # canonical solid: only when the solid encoding reproduces the
            # input bytes (keeps the stream lossless at the BC7-byte level)
            px = L.unpack_rgba(blk)
            if (px == px[0]).all():
                solid = L.create_solid_blk([int(c) for c in px[0]])
                if L.pack_phys(solid) == pbytes:
                    commands.append(CMD_SOLID_DPCM)
                    preds = [0, 0, 0, 0]
                    num = 0
                    if left is not None:
                        lp = L.unpack_rgba(left)
                        for y in range(4):
                            q = lp[3 + y * 4]
                            for c in range(4):
                                preds[c] += int(q[c])
                        num += 4
                    if up is not None:
                        upx = L.unpack_rgba(up)
                        for x in range(4):
                            q = upx[x + 3 * 4]
                            for c in range(4):
                                preds[c] += int(q[c])
                        num += 4
                    if num:
                        preds = [(p + num // 2) // num for p in preds]
                    for c in range(4 if has_alpha else 3):
                        solid_deltas.append((int(px[0][c]) - preds[c]) & 0xFF)
                    log_blks[by][bx] = solid
                    continue

            # ---- config: reuse a matching neighbor's (mode, rot, sel)
            cmd = CMD_NEW_CONFIG
            for rc, nb_blk in ((CMD_REUSE_LEFT, left), (CMD_REUSE_UPPER, up),
                               (CMD_REUSE_LDIAG, ldiag),
                               (CMD_REUSE_RDIAG, rdiag)):
                if (nb_blk is not None and nb_blk.mode == blk.mode
                        and nb_blk.dp_rotation_index == blk.dp_rotation_index
                        and nb_blk.mode4_index_selector
                        == blk.mode4_index_selector):
                    cmd = rc
                    break

            # ---- endpoints: best DPCM predictor vs raw (cost in bits)
            fmt = L.ENDPOINT_FORMATS[blk.mode]
            num_comps = blk.get_num_comps()
            raw_bits = blk.num_partitions * 2 * sum(
                blk.endpoint_bits[c == 3] for c in range(num_comps)) \
                + blk.num_pbits
            best = (EP_RAW, float(raw_bits), None)
            # no-alpha mode-6 DPCM decode forces A endpoints to 127; only
            # lossless when the input block already carries them
            dpcm_ok = not ((not has_alpha) and blk.mode == 6
                           and not (blk.endpoints[0][0][3] == 127
                                    and blk.endpoints[0][1][3] == 127))
            for em, pred_blk in ((EP_DPCM_LEFT, left), (EP_DPCM_UP, up),
                                 (EP_DPCM_LDIAG, ldiag),
                                 (EP_DPCM_RDIAG, rdiag)):
                if pred_blk is None or not dpcm_ok:
                    continue
                cost = 0.0
                payload = []
                for subset in range(blk.num_partitions):
                    res, mods, rp = _ep_dpcm_residuals(
                        pred_blk, 0, blk, subset, has_alpha)
                    cost += sum(_resid_cost(r, m)
                                for r, m in zip(res, mods)) + len(rp)
                    payload.append((res, rp))
                if cost < best[1]:
                    best = (em, cost, payload)

            ep_mode = best[0]
            cmd_pos = len(commands)
            commands.append(cmd | (ep_mode << 3))
            if cmd == CMD_NEW_CONFIG:
                cfg = blk.mode
                if blk.num_planes == 2:
                    cfg |= blk.dp_rotation_index << 3
                if blk.mode == 4:
                    cfg |= blk.mode4_index_selector << 5
                configs.append(cfg)
            if blk.num_partitions == 2:
                part2.append(blk.pattern_index)
            elif blk.num_partitions == 3:
                part3.append(blk.pattern_index)

            if ep_mode == EP_RAW:
                for subset in range(blk.num_partitions):
                    for c in range(num_comps):
                        for e in range(2):
                            ep_raw.put(int(blk.endpoints[subset][e][c]),
                                       blk.endpoint_bits[c == 3])
                for pb in range(blk.num_pbits):
                    ep_raw.put(int(blk.pbits[pb]), 1)
            else:
                fine = blk.endpoint_bits[0] >= 6
                for res, rp in best[2]:
                    for k in range(0, len(res), 2):
                        strm = (ep_fine if fine else ep_coarse)[k >> 1]
                        strm.append(res[k])
                        strm.append(res[k + 1])
                    for p in rp:
                        pbits_r.put(p, 1)

            # ---- weights
            planes = blk.num_planes

            # lossless candidate scan (also the q<100 fallback: when the
            # DPCM path is estimated smaller than the DCT path it is
            # Pareto-better — less rate AND zero added distortion)
            wt_best = (CAND_ABSOLUTE, float(sum(
                32 if blk.weight_bits[p] == 2 else 64 for p in range(planes))),
                None)
            for cand in _WT_CANDS:
                cost = 0.0
                plane_preds = []
                ok = True
                for p in range(planes):
                    preds = eval_weight_predictor(cand, 0, bx, by, tile,
                                                  log_blks, p)
                    if preds is None:
                        ok = False
                        break
                    nb = blk.weight_bits[p]
                    mask = (1 << nb) - 1
                    for k in range(16):
                        s = (int(blk.weights[p][k])
                             - L.quant_weight(preds[k], nb)) & mask
                        cost += _resid_cost(s, mask + 1)
                    plane_preds.append(preds)
                if ok and cost < wt_best[1]:
                    wt_best = (cand, cost, plane_preds)

            if global_q < 100:
                # lossy weight-grid DCT (the reference's m_dct_q < 100 path,
                # encoder/basisu_xbc7_encode.h:31): evaluate ABSOLUTE + the
                # predictor shortlist through the EXACT forward quantizer,
                # pick the min coded size (small weight-error tiebreak), and
                # reconstruct closed-loop so downstream predictions chain on
                # decoded state.
                wt_choice = None
                for cand in (CAND_ABSOLUTE,) + _WT_CANDS:
                    plane_preds = []
                    plane_syms = []
                    cost = 0.0
                    ok = True
                    for p in range(planes):
                        preds = None
                        if cand != CAND_ABSOLUTE:
                            preds = eval_weight_predictor(
                                cand, 0, bx, by, tile, log_blks, p)
                            if preds is None:
                                ok = False
                                break
                        dc, ac = dct_forward_weights(gq_fx, p, preds, blk)
                        cost += 8.0 + (1.0 if cand != CAND_ABSOLUTE else 0.0)
                        for _run, c in ac:
                            cost += 8.0 if c == 0x7FFF else 17.0
                        plane_preds.append(preds)
                        plane_syms.append((dc, ac))
                    if not ok:
                        continue
                    trial = blk.copy()
                    err = 0.0
                    for p in range(planes):
                        dc, ac = plane_syms[p]
                        dct_inverse_weights(gq_fx, p, plane_preds[p], dc, ac,
                                            trial)
                        wb = blk.weight_bits[p]
                        for k in range(16):
                            dv = (L.dequant_weight(int(trial.weights[p][k]), wb)
                                  - L.dequant_weight(int(blk.weights[p][k]), wb))
                            err += dv * dv
                    score = cost + 0.02 * err
                    if wt_choice is None or score < wt_choice[0]:
                        wt_choice = (score, cand, plane_preds, plane_syms,
                                     trial, cost)
                if wt_choice is not None and wt_choice[5] < wt_best[1]:
                    _, cand, plane_preds, plane_syms, trial, _ = wt_choice
                    commands[cmd_pos] |= 0x40       # wt_mode = DCT
                    predictors.append(cand)
                    for p in range(planes):
                        dc, ac = plane_syms[p]
                        dc_coeffs.append(abs(dc))
                        if cand != CAND_ABSOLUTE:
                            coeff_signs.put(1 if dc < 0 else 0, 1)
                        for run, c in ac:
                            if c == 0x7FFF:
                                ac_coeffs.append(0xFF)
                            else:
                                ac_coeffs.append(run)
                                ac_coeffs.append(abs(c))
                                coeff_signs.put(1 if c < 0 else 0, 1)
                    log_blks[by][bx] = trial
                    continue
                # fall through to the lossless emission below

            cand = wt_best[0]
            predictors.append(cand)
            for p in range(planes):
                nb = blk.weight_bits[p]
                mask = (1 << nb) - 1
                if cand == CAND_ABSOLUTE:
                    syms = [int(blk.weights[p][k]) for k in range(16)]
                    strm = raw_weights
                else:
                    preds = wt_best[2][p]
                    syms = [(int(blk.weights[p][k])
                             - L.quant_weight(preds[k], nb)) & mask
                            for k in range(16)]
                    strm = wt_resid[nb]
                if nb == 2:
                    for k in range(0, 16, 4):
                        strm.append(syms[k] | (syms[k + 1] << 2)
                                    | (syms[k + 2] << 4) | (syms[k + 3] << 6))
                else:
                    for k in range(0, 16, 2):
                        strm.append(syms[k] | (syms[k + 1] << 4))
            log_blks[by][bx] = blk


def encode_blocks(phys_blocks, width: int, height: int,
                  num_stripes: int = 0, quality: int = 100) -> bytes:
    """Physical BC7 blocks ((N,16) uint8 / list of 16-byte chunks), row-major
    → XUBC7 blob container. quality 100 (default) is lossless —
    xbc7_decode.decode_bc7 returns the input bytes; 1-99 enables the lossy
    weight-grid DCT (the reference's m_dct_q,
    encoder/basisu_xbc7_encode.h:31) at that quality."""
    import zstandard

    quality = int(quality) if 1 <= int(quality) <= 99 else 100
    nbx = (width + 3) // 4
    nby = (height + 3) // 4
    phys = [bytes(bytearray(b)) for b in phys_blocks]
    if len(phys) != nbx * nby:
        raise ValueError("block count mismatch")
    if not num_stripes:
        num_stripes = min(nby, 8)
    num_stripes = max(1, min(num_stripes, nby))

    # has_alpha from decoded content (affects solid-delta channel count)
    has_alpha = False
    for b in phys:
        if (L.unpack_rgba(L.unpack_phys(b))[:, 3] != 255).any():
            has_alpha = True
            break

    log_blks = [[None] * nbx for _ in range(nby)]
    bit_ids = (B_SIGNS, B_PBITS, B_EP_RAW)
    streams = {bid: bytearray() for bid in range(1, 26) if bid not in bit_ids}
    bits = {bid: _LsbBitWriter() for bid in bit_ids}

    stripes = _stripe_ranges(nby, num_stripes)
    # start offset of every stripe in every stream (bytes; bits for bit blobs)
    starts = {bid: [] for bid in range(1, 26)}
    for s in range(num_stripes):
        for bid in range(1, 26):
            starts[bid].append(bits[bid].bit if bid in bit_ids
                               else len(streams[bid]))
        _encode_stripe(stripes[s], nbx, log_blks, phys, has_alpha,
                       streams, bits, global_q=quality)

    blobs = {B_HEADER: struct.pack("<HHBBB", width, height, quality,
                                   1 if has_alpha else 0, num_stripes)}
    for bid, buf in streams.items():
        if buf:
            blobs[bid] = bytes(buf)
    for bid in bit_ids:
        if bits[bid].bytes:
            blobs[bid] = bytes(bits[bid].bytes)

    if num_stripes > 1:
        n_streams = 25
        num_entries = num_stripes * n_streams
        deltas = [0] * num_entries
        for bid in range(1, 26):
            prev = 0
            for st in range(num_stripes):
                e = st * n_streams + (bid - 1)
                deltas[e] = starts[bid][st] - prev
                prev = starts[bid][st]
        tbl = bytearray(num_entries * 4)
        for e, d in enumerate(deltas):
            tbl[e] = d & 0xFF
            tbl[num_entries + e] = (d >> 8) & 0xFF
            tbl[2 * num_entries + e] = (d >> 16) & 0xFF
            tbl[3 * num_entries + e] = (d >> 24) & 0xFF
        blobs[B_SEEK] = bytes(tbl)

    cctx = zstandard.ZstdCompressor(level=19)
    out = bytearray([BLOB_MAGIC_BEGIN, len(blobs)])

    def varint(v):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                out.append(b | 0x80)
            else:
                out.append(b)
                return

    for bid in sorted(blobs):
        payload = blobs[bid]
        comp = cctx.compress(payload)
        if len(comp) < len(payload):
            out.append(bid | 0x80)
            varint(len(payload))
            varint(len(comp))
            out += comp
        else:
            out.append(bid)
            varint(len(payload))
            out += payload
    out.append(BLOB_MAGIC_END)
    return bytes(out)
