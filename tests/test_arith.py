"""Arithmetic coder roundtrip tests (entropy/arith.py).

Bitstream-level conformance vs the reference coder is exercised by the
XUASTC golden-file decode tests (the reference's base_xuastc_arith.ktx2 can
only decode if every model update matches); these tests cover the coder in
isolation.
"""

import random

from basis_universal_tpu.entropy import arith


def test_raw_bits_roundtrip():
    rng = random.Random(1)
    enc = arith.ArithEncoder()
    vals = []
    for _ in range(5000):
        n = rng.randint(1, 20)
        v = rng.getrandbits(n)
        vals.append((v, n))
        enc.put_bits(v, n)
    data = enc.flush()
    dec = arith.ArithDecoder(data)
    for v, n in vals:
        assert dec.get_bits(n) == v


def test_bit_model_roundtrip():
    rng = random.Random(2)
    enc = arith.ArithEncoder()
    models_e = [arith.BitModel() for _ in range(3)]
    bits = []
    for i in range(20000):
        m = i % 3
        # skewed distribution per model so adaption kicks in
        b = 1 if rng.random() < (0.1 + 0.3 * m) else 0
        bits.append((m, b))
        enc.encode_bit(b, models_e[m])
    data = enc.flush()
    models_d = [arith.BitModel() for _ in range(3)]
    dec = arith.ArithDecoder(data)
    for m, b in bits:
        assert dec.decode_bit(models_d[m]) == b
    # adaptive coding must beat raw storage on skewed input
    assert len(data) < 20000 / 8


def test_data_model_roundtrip():
    rng = random.Random(3)
    for num_syms, faster in ((5, False), (256, True), (2048, False)):
        enc = arith.ArithEncoder()
        dm_e = arith.DataModel(num_syms, faster)
        syms = [min(int(rng.expovariate(0.1)), num_syms - 1)
                for _ in range(4000)]
        for s in syms:
            enc.encode_sym(s, dm_e)
        data = enc.flush()
        dm_d = arith.DataModel(num_syms, faster)
        dec = arith.ArithDecoder(data)
        for s in syms:
            assert dec.decode_sym(dm_d) == s


def test_value_codes_roundtrip():
    rng = random.Random(4)
    enc = arith.ArithEncoder()
    ctxs_e = arith.GammaContexts()
    ops = []
    for _ in range(3000):
        kind = rng.randint(0, 3)
        if kind == 0:
            n = rng.randint(2, 100)
            v = rng.randint(0, n - 1)
            enc.put_truncated_binary(v, n)
        elif kind == 1:
            m = rng.randint(1, 8)
            v = rng.randint(0, (40 << m) - 1) & ((64 << m) - 1)
            v = min(v, (64 << m) - 1)
            enc.put_rice(v, m)
        elif kind == 2:
            v = rng.randint(1, 60000)
            enc.put_gamma(v, ctxs_e)
            m = n = None
        else:
            v = rng.randint(0, 1)
            enc.put_bit(v)
        ops.append((kind, v, n if kind == 0 else (m if kind == 1 else None)))
    data = enc.flush()
    dec = arith.ArithDecoder(data)
    ctxs_d = arith.GammaContexts()
    for kind, v, p in ops:
        if kind == 0:
            assert dec.decode_truncated_binary(p) == v
        elif kind == 1:
            assert dec.decode_rice(p) == v
        elif kind == 2:
            assert dec.decode_gamma(ctxs_d) == v
        else:
            assert dec.get_bit() == v


def test_mixed_stream_roundtrip():
    rng = random.Random(5)
    enc = arith.ArithEncoder()
    bm = arith.BitModel()
    dm = arith.DataModel(100)
    ops = []
    for _ in range(10000):
        kind = rng.randint(0, 2)
        if kind == 0:
            v = 1 if rng.random() < 0.2 else 0
            enc.encode_bit(v, bm)
        elif kind == 1:
            v = rng.randint(0, 99)
            enc.encode_sym(v, dm)
        else:
            v = rng.getrandbits(7)
            enc.put_bits(v, 7)
        ops.append((kind, v))
    data = enc.flush()
    dec = arith.ArithDecoder(data)
    bm2 = arith.BitModel()
    dm2 = arith.DataModel(100)
    for kind, v in ops:
        if kind == 0:
            assert dec.decode_bit(bm2) == v
        elif kind == 1:
            assert dec.decode_sym(dm2) == v
        else:
            assert dec.get_bits(7) == v
