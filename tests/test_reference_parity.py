"""Encoder competitiveness vs the reference at identical settings.

Gates our size/PSNR against the cached oracle table
(tests/reference_parity.json, regenerated via
`python -m basis_universal_tpu.testing.reference_parity --regen`).
A fast subset runs in CI; the full grid runs via the module CLI.
"""

import pytest

from basis_universal_tpu.testing import reference_parity as rp

# Rows currently inside the gates; grow this list as the encoder closes the
# remaining gaps (low-quality ETC1S size excess, UASTC mode-search quality —
# run `python -m basis_universal_tpu.testing.reference_parity` for the full
# picture).
FAST_GRID = [
    ("etc1s", "kodim03.png", 128, 1),
    ("etc1s", "kodim23.png", 128, 1),
    ("etc1s", "kodim03.png", 255, 1),
]


@pytest.fixture(scope="module")
def reference_table():
    table = rp.load_reference()
    if table is None:
        pytest.skip("no cached reference parity table")
    return table


@pytest.mark.parametrize("codec,image,quality,effort", FAST_GRID)
def test_parity_fast(reference_table, codec, image, quality, effort):
    rows = rp.run_parity(grid=[(codec, image, quality, effort)],
                         reference=reference_table,
                         progress=lambda *_: None)
    assert rows, "grid row missing from cached reference table"
    bad = rp.check_rows(rows)
    assert not bad, bad
