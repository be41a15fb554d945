"""Reference-parity regression harness.

The codec sweep (codec_sweep.py) gates against OUR OWN golden table; this
module gates against the REFERENCE ENCODER's results at the same
(image, codec, quality, effort) grid — the actual competitiveness bar
(reference runner: basisu_tool.cpp:7610-8050; tolerances :7039-7042,
:7950-7960: PSNR ±0.125 dB, size ±4.5% — we gate with our own thresholds
below and tighten as the encoder improves).

Oracle results are produced by running the reference CLI (/tmp/refbuild/
basisu) and are CACHED in tests/reference_parity.json (they are
deterministic), so the parity test runs without the oracle binary.
Regenerate after intentional reference-grid changes with:

    python -m basis_universal_tpu.testing.reference_parity --regen

Both sides are measured identically: the encoded file is decoded by OUR
transcoder (bit-exactness vs the reference transcoder is covered by the
conformance tests) and PSNR computed by ops/metrics.py.
"""

import dataclasses
import json
import pathlib
import subprocess
import tempfile
from typing import Dict, List, Optional

import numpy as np

ORACLE = pathlib.Path("/tmp/refbuild/basisu")
TEST_FILES = pathlib.Path("/root/reference/test_files")
CACHE = pathlib.Path(__file__).resolve().parents[2] / "tests" / "reference_parity.json"

# Gate thresholds (ours vs reference at the same settings). The north star
# is PSNR within 0.1 dB and size within 4.5%; the gates start looser and
# ratchet DOWN as the encoder closes the gap — tightening them is a
# deliberate commit, loosening them is a regression.
MAX_PSNR_DEFICIT_DB = 0.30   # ours may be at most this much below reference
MAX_SIZE_EXCESS_REL = 0.08   # ours may be at most this much larger

DEFAULT_GRID = [
    # (codec, image, quality, effort)
    *[("etc1s", img, q, 1)
      for img in ("kodim01.png", "kodim03.png", "kodim18.png", "kodim23.png")
      for q in (10, 50, 128, 255)],
    *[("etc1s", img, 128, 3) for img in ("kodim03.png", "kodim23.png")],
    *[("uastc", img, 0, 2)
      for img in ("kodim03.png", "kodim23.png", "alpha0.png")],
]


@dataclasses.dataclass
class ParityRow:
    codec: str
    image: str
    quality: int
    effort: int
    ref_size: int
    ref_rgb_psnr: float
    our_size: int
    our_rgb_psnr: float

    def key(self):
        return f"{self.codec}:{self.image}:q{self.quality}:e{self.effort}"

    @property
    def psnr_delta(self):
        return self.our_rgb_psnr - self.ref_rgb_psnr

    @property
    def size_rel(self):
        return self.our_size / max(self.ref_size, 1) - 1.0


def _load_image(name: str):
    from PIL import Image

    return np.asarray(Image.open(TEST_FILES / name).convert("RGBA"))


def _psnr_of_basis(data: bytes, src_rgba: np.ndarray) -> float:
    from ..formats.constants import TranscoderTextureFormat as TF
    from ..ops import metrics
    from ..transcoder import BasisTranscoder

    tr = BasisTranscoder(data)
    rgba = tr.transcode_image_level(0, 0, TF.RGBA32)
    m = metrics.image_metrics(rgba, src_rgba)
    return round(float(m["rgb_psnr"]), 3)


def _oracle_encode(codec: str, image: str, quality: int, effort: int) -> bytes:
    """Run the reference CLI; returns the .basis bytes."""
    with tempfile.TemporaryDirectory() as td:
        out = pathlib.Path(td) / "out.basis"
        cmd = [str(ORACLE), str(TEST_FILES / image), "-basis",
               "-output_file", str(out)]
        if codec == "etc1s":
            cmd += ["-q", str(quality), "-comp_level", str(effort)]
        elif codec == "uastc":
            cmd += ["-uastc", "-uastc_level", str(effort)]
        else:
            raise ValueError(codec)
        subprocess.run(cmd, check=True, capture_output=True, timeout=600)
        return out.read_bytes()


def _our_encode(codec: str, img: np.ndarray, quality: int, effort: int) -> bytes:
    from .. import compressor
    from ..formats.constants import BasisTexFormat

    fmt = {"etc1s": BasisTexFormat.ETC1S,
           "uastc": BasisTexFormat.UASTC_LDR_4x4}[codec]
    params = compressor.CompressorParams(
        tex_format=fmt, quality_level=quality, effort=effort)
    return compressor.compress(img, params).basis_data


def regen_reference(grid=None, progress=print) -> Dict[str, dict]:
    """Run the oracle over the grid and write the cache file."""
    if not ORACLE.exists():
        raise RuntimeError(f"oracle not built at {ORACLE}")
    table = {}
    for codec, image, q, e in grid or DEFAULT_GRID:
        src = _load_image(image)
        data = _oracle_encode(codec, image, q, e)
        key = f"{codec}:{image}:q{q}:e{e}"
        table[key] = {
            "size": len(data),
            "rgb_psnr": _psnr_of_basis(data, src),
        }
        progress(f"ref {key}: {table[key]['size']} B {table[key]['rgb_psnr']} dB")
    CACHE.write_text(json.dumps(table, indent=1, sort_keys=True) + "\n")
    return table


def load_reference() -> Optional[Dict[str, dict]]:
    if not CACHE.exists():
        return None
    return json.loads(CACHE.read_text())


def run_parity(grid=None, reference=None, progress=print) -> List[ParityRow]:
    reference = reference or load_reference()
    if reference is None:
        raise RuntimeError("no cached reference table; run --regen")
    rows = []
    for codec, image, q, e in grid or DEFAULT_GRID:
        key = f"{codec}:{image}:q{q}:e{e}"
        if key not in reference:
            continue
        src = _load_image(image)
        data = _our_encode(codec, src, q, e)
        row = ParityRow(
            codec=codec, image=image, quality=q, effort=e,
            ref_size=reference[key]["size"],
            ref_rgb_psnr=reference[key]["rgb_psnr"],
            our_size=len(data),
            our_rgb_psnr=_psnr_of_basis(data, src))
        rows.append(row)
        progress(f"{key}: ours {row.our_size} B {row.our_rgb_psnr} dB | "
                 f"ref {row.ref_size} B {row.ref_rgb_psnr} dB | "
                 f"Δpsnr {row.psnr_delta:+.3f} size {row.size_rel:+.1%}")
    return rows


def check_rows(rows: List[ParityRow]) -> List[str]:
    """Returns a list of violation strings (empty = all rows in tolerance)."""
    bad = []
    for r in rows:
        if r.psnr_delta < -MAX_PSNR_DEFICIT_DB:
            bad.append(f"{r.key()}: PSNR {r.our_rgb_psnr} vs ref "
                       f"{r.ref_rgb_psnr} ({r.psnr_delta:+.3f} dB)")
        if r.size_rel > MAX_SIZE_EXCESS_REL:
            bad.append(f"{r.key()}: size {r.our_size} vs ref {r.ref_size} "
                       f"({r.size_rel:+.1%})")
    return bad


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--regen", action="store_true",
                    help="re-run the oracle and rewrite the cached table")
    args = ap.parse_args(argv)
    if args.regen:
        regen_reference()
    rows = run_parity()
    bad = check_rows(rows)
    if bad:
        print("\nVIOLATIONS:")
        for b in bad:
            print(" ", b)
        return 1
    print(f"\nall {len(rows)} rows within tolerance "
          f"(PSNR deficit <= {MAX_PSNR_DEFICIT_DB} dB, "
          f"size excess <= {MAX_SIZE_EXCESS_REL:.1%})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
