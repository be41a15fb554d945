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

import struct

import numpy as np

from . import logical as L
from .xbc7_decode import (
    BLOB_MAGIC_BEGIN, BLOB_MAGIC_END,
    B_HEADER, B_COMMANDS, B_CONFIG, B_PART2, B_PART3, B_PREDICTORS,
    B_DC_SMALL, B_AC, B_SIGNS, B_PBITS,
    B_EP_RAW, B_RAW_WEIGHTS, B_SOLID_DELTAS, B_SEEK,
    CMD_REPEAT_LAST, CMD_REPEAT_UPPER, CMD_SOLID_DPCM, CMD_NEW_CONFIG,
    EP_RAW, CAND_ABSOLUTE, _stripe_ranges,
)


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


def _encode_stripe(stripe, nbx, log_blks, phys, has_alpha, streams, bits):
    first_row, n_rows = stripe
    end_row = first_row + n_rows
    tile = (0, first_row, nbx - 1, end_row - 1)

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
    raw_weights = streams[B_RAW_WEIGHTS]
    ep_raw = bits[B_EP_RAW]

    for by in range(first_row, end_row):
        for bx in range(nbx):
            i = by * nbx + bx
            pbytes = phys[i]
            left = neighbor(bx - 1, by)
            up = neighbor(bx, by - 1)

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

            # raw block: new config, EP_RAW, absolute raw weights
            commands.append(CMD_NEW_CONFIG | (EP_RAW << 3))
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

            num_comps = blk.get_num_comps()
            for subset in range(blk.num_partitions):
                for c in range(num_comps):
                    for e in range(2):
                        ep_raw.put(int(blk.endpoints[subset][e][c]),
                                   blk.endpoint_bits[c == 3])
            for pb in range(blk.num_pbits):
                ep_raw.put(int(blk.pbits[pb]), 1)

            predictors.append(CAND_ABSOLUTE)
            for p in range(blk.num_planes):
                nb = blk.weight_bits[p]
                w = [int(blk.weights[p][k]) for k in range(16)]
                if nb == 2:
                    for k in range(0, 16, 4):
                        raw_weights.append(w[k] | (w[k + 1] << 2)
                                           | (w[k + 2] << 4) | (w[k + 3] << 6))
                else:
                    for k in range(0, 16, 2):
                        raw_weights.append(w[k] | (w[k + 1] << 4))
            log_blks[by][bx] = blk


def encode_blocks(phys_blocks, width: int, height: int,
                  num_stripes: int = 0) -> bytes:
    """Physical BC7 blocks ((N,16) uint8 / list of 16-byte chunks), row-major
    → XUBC7 blob container. Lossless: xbc7_decode.decode_bc7 returns the
    input bytes."""
    import zstandard

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
                       streams, bits)

    blobs = {B_HEADER: struct.pack("<HHBBB", width, height, 100,
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
