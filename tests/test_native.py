"""Differential tests: native C++ entropy runtime vs Python reference."""

import numpy as np
import pytest

from basis_universal_tpu import native
from basis_universal_tpu.codecs.etc1s import backend, stream


@pytest.fixture(scope="module", autouse=True)
def require_native():
    if not native.available():
        pytest.skip("native runtime unavailable")


def test_collect_matches_python():
    rng = np.random.default_rng(7)
    for E, S in [(7, 5), (300, 200), (1, 1)]:
        for trial in range(30):
            by, bx = rng.integers(1, 12, 2)
            e = rng.integers(0, E, (by, bx)).astype(np.int32)
            s = rng.integers(0, S, (by, bx)).astype(np.int32)
            if trial % 3 == 1:
                e[:] = e[0, 0]
                s[:] = s[0, 0]
            k1, v1, *f1 = backend._collect_slice_symbols(e, s, E, S)
            k2, v2, *f2 = backend._collect_slice_symbols_native(e, s, E, S)
            np.testing.assert_array_equal(k1, k2)
            np.testing.assert_array_equal(v1, v2)
            for a, b in zip(f1, f2):
                np.testing.assert_array_equal(a, b)


def test_emit_and_decode_match_python():
    rng = np.random.default_rng(8)
    E, S = 50, 40
    by, bx = 16, 24
    e = rng.integers(0, E, (by, bx)).astype(np.int32)
    s = rng.integers(0, S, (by, bx)).astype(np.int32)
    s[5:9] = s[0, 0]  # force selector runs
    tables_b, slices_b = backend.encode_slices([e], [s], E, S)
    t = stream.decode_tables(tables_b)
    e_n, s_n = stream._decode_slice_native(slices_b[0], bx, by, t, E, S, False, None)
    e_p, s_p = stream._decode_slice_py(slices_b[0], bx, by, t, E, S)
    np.testing.assert_array_equal(e_n, e_p)
    np.testing.assert_array_equal(s_n, s_p)
    np.testing.assert_array_equal(e_n, e)
    np.testing.assert_array_equal(s_n, s)


def test_native_decodes_reference_golden(kodim23_basis, test_files):
    """End-to-end on a reference-produced file through the native decoder."""
    from basis_universal_tpu.formats.basis_file import BasisFile
    from basis_universal_tpu.codecs.etc1s.stream import decode_palettes, decode_tables

    f = BasisFile(kodim23_basis)
    cb = decode_palettes(f.header.total_endpoints, f.endpoint_cb_data,
                         f.header.total_selectors, f.selector_cb_data)
    t = decode_tables(f.tables_data)
    sd = f.slices[0]
    e_n, s_n = stream._decode_slice_native(
        f.slice_data(0), sd.num_blocks_x, sd.num_blocks_y, t,
        f.header.total_endpoints, f.header.total_selectors, False, None)
    e_p, s_p = stream._decode_slice_py(
        f.slice_data(0), sd.num_blocks_x, sd.num_blocks_y, t,
        f.header.total_endpoints, f.header.total_selectors)
    np.testing.assert_array_equal(e_n, e_p)
    np.testing.assert_array_equal(s_n, s_p)


def test_huffman_build_matches_python():
    from basis_universal_tpu.entropy import huffman as H
    from basis_universal_tpu.entropy.bitio import BitReader, BitWriter

    rng = np.random.default_rng(11)
    for nsyms in (2, 17, 300, 4000):
        freqs = rng.integers(0, 1000, nsyms)
        freqs[0] = 1
        enc = H.HuffmanEncoder(freqs)          # native path
        py_len = H.compute_code_lengths(np.asarray(freqs, np.int64))
        py_codes = H.assign_canonical_codes(py_len)
        np.testing.assert_array_equal(enc.lengths, py_len)
        np.testing.assert_array_equal(enc.codes, py_codes)
        # serialized table decodes identically
        w = BitWriter()
        enc.write_table(w)
        r = BitReader(w.to_bytes())
        dec = H.read_huffman_table(r)
        np.testing.assert_array_equal(
            dec.lengths, py_len[: np.flatnonzero(py_len).max() + 1])
