"""Codec regression sweep (the reference's -test_codecs analog,
basisu_tool.cpp:7610-8050): drive the compressor over codec x quality x
effort x image grids, record KTX2 size + PSNRs, and compare against a golden
table with the reference's tolerances (PSNR +-0.125 dB tightened to our
deterministic pipeline; size +-4.5% relative)."""

import dataclasses
import json
import pathlib
from typing import List, Optional

import numpy as np

from .. import compressor
from ..formats.constants import BasisTexFormat, TranscoderTextureFormat as TF
from ..ops import metrics
from ..transcoder import Ktx2Transcoder

PSNR_TOLERANCE_DB = 0.125
SIZE_TOLERANCE_REL = 0.045
SIZE_TOLERANCE_MIN_BYTES = 1024

DEFAULT_IMAGES = ["kodim03.png", "kodim23.png", "alpha0.png"]
DEFAULT_QUALITIES = [10, 50, 100, 192, 255]
DEFAULT_EFFORTS = [1]
DEFAULT_CODECS = ["etc1s", "uastc", "astc_ldr_6x6", "astc_ldr_12x12"]

_CODEC_FORMATS = {
    "etc1s": BasisTexFormat.ETC1S,
    "uastc": BasisTexFormat.UASTC_LDR_4x4,
    "astc_ldr_4x4": BasisTexFormat.ASTC_LDR_4x4,
    "astc_ldr_6x6": BasisTexFormat.ASTC_LDR_6x6,
    "astc_ldr_12x12": BasisTexFormat.ASTC_LDR_12x12,
}


@dataclasses.dataclass
class SweepRow:
    codec: str
    image: str
    quality: int
    effort: int
    ktx2_size: int
    rgb_psnr: float
    rgba_psnr: float

    def key(self):
        return f"{self.codec}:{self.image}:q{self.quality}:e{self.effort}"


def run_sweep(test_files_dir, images=None, qualities=None, efforts=None,
              codecs=None, progress=print) -> List[SweepRow]:
    from PIL import Image

    test_files_dir = pathlib.Path(test_files_dir)
    rows = []
    for name in images or DEFAULT_IMAGES:
        p = test_files_dir / name
        if not p.exists():
            continue
        img = np.asarray(Image.open(p).convert("RGBA"))
        for codec in codecs or DEFAULT_CODECS:
            fmt = _CODEC_FORMATS[codec]
            for effort in efforts or DEFAULT_EFFORTS:
                for q in qualities or DEFAULT_QUALITIES:
                    if codec != "etc1s" and q != (qualities or DEFAULT_QUALITIES)[-1]:
                        continue  # only ETC1S has a quality knob
                    params = compressor.CompressorParams(
                        tex_format=fmt, quality_level=q, effort=effort)
                    out = compressor.compress(img, params)
                    tr = Ktx2Transcoder(out.ktx2_data)
                    rgba = tr.transcode_image_level(0, 0, 0, TF.RGBA32)
                    m = metrics.image_metrics(rgba, img)
                    row = SweepRow(
                        codec=codec, image=name, quality=q, effort=effort,
                        ktx2_size=len(out.ktx2_data),
                        rgb_psnr=round(float(m["rgb_psnr"]), 3),
                        rgba_psnr=round(float(m.get("rgba_psnr", m["rgb_psnr"])), 3))
                    rows.append(row)
                    progress(f"{row.key()}: {row.ktx2_size} B, "
                             f"{row.rgb_psnr:.2f}/{row.rgba_psnr:.2f} dB")
    return rows


def save_golden(rows: List[SweepRow], path):
    data = {r.key(): dataclasses.asdict(r) for r in rows}
    pathlib.Path(path).write_text(json.dumps(data, indent=1, sort_keys=True))


def check_against_golden(rows: List[SweepRow], path) -> List[str]:
    """Returns a list of failure strings (empty = pass)."""
    golden = json.loads(pathlib.Path(path).read_text())
    failures = []
    for r in rows:
        g = golden.get(r.key())
        if g is None:
            failures.append(f"{r.key()}: no golden entry")
            continue
        size_tol = max(SIZE_TOLERANCE_MIN_BYTES * SIZE_TOLERANCE_REL,
                       g["ktx2_size"] * SIZE_TOLERANCE_REL)
        if abs(r.ktx2_size - g["ktx2_size"]) > max(size_tol, 64):
            failures.append(
                f"{r.key()}: size {r.ktx2_size} vs golden {g['ktx2_size']}")
        for field in ("rgb_psnr", "rgba_psnr"):
            if abs(getattr(r, field) - g[field]) > PSNR_TOLERANCE_DB:
                failures.append(
                    f"{r.key()}: {field} {getattr(r, field)} vs golden {g[field]}")
    return failures
