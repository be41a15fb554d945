"""XUASTC LDR (supercompressed ASTC LDR 4x4-12x12) — container layer.

Round-2 groundwork: this module parses the full-zstd syntax's stream
container (parity: transcoder/basisu_transcoder_internal.h
xuastc_ldr_full_zstd_header:1500 and basisu_transcoder.cpp
xuastc_ldr_decompress_image_full_zstd:27633) — the 1-byte syntax marker,
the 21-length header, the uncompressed raw-bits metadata stream, and the
20 Zstd side streams (mode bytes, solid DPCM, endpoint DPCM 3..8-bit,
use-BC bits, DCT mean/run/coeff/sign streams, weight 2/3/4/8-bit
streams).

The per-block decode (run/solid/raw commands, config-reuse + tm hash,
endpoint DPCM with BC-interop, DCT weight grids) is NOT implemented yet —
see basisu_transcoder.cpp:27800-28560.  decode() raises
NotImplementedError after validating/splitting the container so tests can
lock the stream-layout parsing down now.
"""

import dataclasses
import struct
from typing import Dict

SYNTAX_FULL_ARITH = 0
SYNTAX_HYBRID_ARITH_ZSTD = 1
SYNTAX_FULL_ZSTD = 2

_STREAM_NAMES = [
    "mode_bytes", "solid_dpcm_bytes", "endpoint_dpcm_reuse_indices",
    "use_bc_bits", "endpoint_dpcm_3bit", "endpoint_dpcm_4bit",
    "endpoint_dpcm_5bit", "endpoint_dpcm_6bit", "endpoint_dpcm_7bit",
    "endpoint_dpcm_8bit", "mean0_bits", "mean1_bytes", "run_bytes",
    "coeff_bytes", "sign_bits", "weight2_bits", "weight3_bits",
    "weight4_bits", "weight8_bytes",
]

# g_astc_block_sizes order (astc_helpers::NUM_ASTC_BLOCK_SIZES = 14)
ASTC_BLOCK_SIZES = [(4, 4), (5, 4), (5, 5), (6, 5), (6, 6), (8, 5), (8, 6),
                    (8, 8), (10, 5), (10, 6), (10, 8), (10, 10), (12, 10),
                    (12, 12)]


@dataclasses.dataclass
class XuastcContainer:
    syntax: int
    block_w: int
    block_h: int
    width: int
    height: int
    has_alpha: bool
    srgb_decode: bool
    use_dct: bool
    dct_q: float
    raw_bits: bytes                 # remaining metadata/bit stream
    raw_bits_start_bit: int         # bit offset where block data resumes
    streams: Dict[str, bytes]       # decompressed side streams


class _LsbReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.buf = 0
        self.nbits = 0

    def get(self, n: int) -> int:
        while self.nbits < n:
            c = self.data[self.pos] if self.pos < len(self.data) else 0
            self.pos += 1
            self.buf |= c << self.nbits
            self.nbits += 8
        v = self.buf & ((1 << n) - 1)
        self.buf >>= n
        self.nbits -= n
        return v

    def bit_position(self) -> int:
        return self.pos * 8 - self.nbits


def parse_container(data: bytes) -> XuastcContainer:
    """Validate + split a full-zstd XUASTC LDR slice into its streams."""
    import zstandard

    if len(data) < 1 + 21 * 4:
        raise ValueError("XUASTC stream too small")
    syntax = data[0] & 3
    if syntax != SYNTAX_FULL_ZSTD:
        raise NotImplementedError(
            f"XUASTC syntax {syntax} (arith/hybrid) not supported yet")
    lens = struct.unpack_from("<21I", data, 1)
    raw_bits_len = lens[0]
    stream_lens = lens[1:20]        # 19 side streams + unused tail
    if not raw_bits_len or not stream_lens[0]:
        # reference rejects empty raw_bits/mode_bytes (transcoder.cpp:27649)
        raise ValueError("XUASTC stream has empty raw_bits or mode_bytes")
    pos = 1 + 21 * 4
    raw_bits = data[pos:pos + raw_bits_len]
    pos += raw_bits_len

    dctx = zstandard.ZstdDecompressor()
    streams = {}
    for name, ln in zip(_STREAM_NAMES, stream_lens):
        if not ln:
            streams[name] = b""
        elif name == "sign_bits":
            # sign_bits is stored RAW, not Zstd (transcoder.cpp:27716-27721)
            streams[name] = data[pos:pos + ln]
            pos += ln
        else:
            streams[name] = dctx.decompress(
                data[pos:pos + ln], max_output_size=1 << 28)
            pos += ln
    if pos > len(data):
        raise ValueError("XUASTC stream truncated")

    br = _LsbReader(raw_bits)
    if br.get(5) != 0x01:  # FULL_ZSTD_HEADER_MARKER
        raise ValueError("bad XUASTC raw-bits marker")
    bsi = br.get(4)
    if bsi >= len(ASTC_BLOCK_SIZES):
        raise ValueError("bad ASTC block size index")
    bw, bh = ASTC_BLOCK_SIZES[bsi]
    srgb = bool(br.get(1))
    width = br.get(16)
    height = br.get(16)
    has_alpha = bool(br.get(1))
    use_dct = bool(br.get(1))
    int_q = br.get(8) if use_dct else 0
    dct_q = int_q / 2.0
    if use_dct and not (0.0 < dct_q <= 100.0):
        raise ValueError("invalid XUASTC DCT global quality factor")
    return XuastcContainer(
        syntax=syntax, block_w=bw, block_h=bh, width=width, height=height,
        has_alpha=has_alpha, srgb_decode=srgb, use_dct=use_dct, dct_q=dct_q,
        raw_bits=raw_bits, raw_bits_start_bit=br.bit_position(),
        streams=streams)


def decode(data: bytes):
    """Full decode → pixels (round 2: per-block command loop, endpoint
    DPCM, DCT weight grids — basisu_transcoder.cpp:27800+)."""
    c = parse_container(data)
    raise NotImplementedError(
        f"XUASTC LDR {c.block_w}x{c.block_h} block decode not implemented "
        "yet (container parses cleanly)")
