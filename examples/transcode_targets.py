"""Transcode example: one .basis/.ktx2 file -> every GPU target it supports.

  python examples/transcode_targets.py texture.ktx2
"""

import pathlib
import sys

from basis_universal_tpu.api import Transcoder
from basis_universal_tpu.formats.constants import TranscoderTextureFormat as TF

TARGETS = [
    TF.ETC1_RGB, TF.ETC2_RGBA, TF.BC1_RGB, TF.BC3_RGBA, TF.BC4_R,
    TF.BC5_RG, TF.BC7_RGBA, TF.ASTC_4x4_RGBA, TF.ATC_RGB,
    TF.PVRTC1_4_RGB, TF.FXT1_RGB, TF.ETC2_EAC_R11,
    TF.RGBA32, TF.RGB565, TF.RGBA4444,
]


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else None
    if src is None:
        # build a demo file first
        import numpy as np
        from PIL import Image

        from basis_universal_tpu.api import Encoder

        img = np.asarray(Image.open(
            "/root/reference/test_files/kodim03.png").convert("RGBA"))
        data = Encoder().compress(img, quality=128)
        print("encoded demo kodim03 ->", len(data), "bytes")
    else:
        data = pathlib.Path(src).read_bytes()

    tr = Transcoder()
    h = tr.open(data)
    print(f"{tr.get_width(h)}x{tr.get_height(h)}, "
          f"{tr.get_levels(h)} level(s)")
    for fmt in TARGETS:
        try:
            out = tr.transcode_tfmt(h, fmt)
        except Exception as e:                      # PVRTC1 needs pow2 etc.
            print(f"  {fmt.name:16} skipped ({type(e).__name__})")
            continue
        print(f"  {fmt.name:16} {out.shape} {out.dtype}")


if __name__ == "__main__":
    main()
