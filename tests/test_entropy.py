import numpy as np
import pytest

from basis_universal_tpu.entropy.bitio import BitReader, BitWriter
from basis_universal_tpu.entropy.huffman import (
    HuffmanDecoder,
    HuffmanEncoder,
    compute_code_lengths,
    read_huffman_table,
)
from basis_universal_tpu.utils.crc import crc16


def test_crc16_known_values():
    # Pin behavior: reference crc16 is ~xmodem(data, ~crc).
    assert crc16(b"") == 0
    # independently computed with the reference bit-by-bit algorithm
    def ref_crc16(data, crc=0):
        crc = (~crc) & 0xFFFF
        for byte in data:
            q = (byte ^ (crc >> 8)) & 0xFF
            k = ((q >> 4) ^ q) & 0xFF
            crc = (((crc << 8) ^ k ^ (k << 5) ^ (k << 12))) & 0xFFFF
        return (~crc) & 0xFFFF
    for data in [b"a", b"123456789", bytes(range(256)), b"basis"]:
        assert crc16(data) == ref_crc16(data)


def test_bitwriter_reader_roundtrip():
    rng = np.random.default_rng(0)
    n = 5000
    nbits = rng.integers(1, 25, n)
    vals = [int(rng.integers(0, 1 << b)) for b in nbits]
    w = BitWriter()
    w.put_bits_array(np.array(vals, dtype=np.uint64), nbits.astype(np.uint8))
    data = w.to_bytes()
    r = BitReader(data)
    for v, b in zip(vals, nbits):
        assert r.get_bits(int(b)) == v


def test_vlc_roundtrip():
    vals = [0, 1, 7, 15, 16, 100, 12345, 1 << 20]
    for chunk in (4, 7):
        w = BitWriter()
        for v in vals:
            w.put_vlc(v, chunk)
        r = BitReader(w.to_bytes())
        for v in vals:
            assert r.decode_vlc(chunk) == v


def test_vlc_array_matches_scalar():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 1 << 18, 500)
    for chunk in (4, 7):
        w1 = BitWriter()
        for v in vals:
            w1.put_vlc(int(v), chunk)
        w2 = BitWriter()
        w2.put_vlc_array(vals, chunk)
        assert w1.to_bytes() == w2.to_bytes()


@pytest.mark.parametrize("nsyms,seed", [(2, 0), (8, 1), (300, 2), (4000, 3)])
def test_huffman_roundtrip(nsyms, seed):
    rng = np.random.default_rng(seed)
    freqs = rng.integers(0, 1000, nsyms)
    freqs[0] = 1  # ensure at least one used
    enc = HuffmanEncoder(freqs)
    syms = rng.choice(np.flatnonzero(freqs > 0), 2000)
    w = BitWriter()
    enc.write_table(w)
    enc.put_syms(w, syms)
    r = BitReader(w.to_bytes())
    dec = read_huffman_table(r)
    out = [dec.decode(r) for _ in range(len(syms))]
    np.testing.assert_array_equal(out, syms)


def test_huffman_skewed_depth_limit():
    # Fibonacci-like freqs force deep trees; must clamp to 16 bits, stay
    # complete (Kraft == 1), and still round-trip.
    freqs = [1, 1]
    while len(freqs) < 40:
        freqs.append(freqs[-1] + freqs[-2])
    lengths = compute_code_lengths(np.array(freqs))
    assert lengths.max() <= 16
    kraft = np.sum(1.0 / (2.0 ** lengths[lengths > 0].astype(np.float64)))
    assert abs(kraft - 1.0) < 1e-12
    enc = HuffmanEncoder(np.array(freqs))
    syms = np.arange(len(freqs))
    w = BitWriter()
    enc.write_table(w)
    enc.put_syms(w, syms)
    r = BitReader(w.to_bytes())
    dec = read_huffman_table(r)
    out = [dec.decode(r) for _ in range(len(syms))]
    np.testing.assert_array_equal(out, syms)


def test_huffman_single_symbol():
    freqs = np.zeros(10, dtype=np.int64)
    freqs[7] = 42
    enc = HuffmanEncoder(freqs)
    w = BitWriter()
    enc.write_table(w)
    enc.put_syms(w, [7, 7, 7])
    r = BitReader(w.to_bytes())
    dec = read_huffman_table(r)
    assert [dec.decode(r) for _ in range(3)] == [7, 7, 7]
