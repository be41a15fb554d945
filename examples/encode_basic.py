"""Basic encode example (the reference's examples/example.cpp analog):

  python examples/encode_basic.py input.png [output.ktx2]

Encodes a PNG to an ETC1S .KTX2, prints the stats, then transcodes it back
and reports PSNR.
"""

import pathlib
import sys

import numpy as np
from PIL import Image

from basis_universal_tpu.api import Encoder, Transcoder
from basis_universal_tpu.formats.constants import TranscoderTextureFormat as TF
from basis_universal_tpu.ops import metrics


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else \
        "/root/reference/test_files/kodim23.png"
    dst = sys.argv[2] if len(sys.argv) > 2 else \
        pathlib.Path(src).stem + ".ktx2"
    img = np.asarray(Image.open(src).convert("RGBA"))

    ktx2 = Encoder().compress(img, quality=128)
    pathlib.Path(dst).write_bytes(ktx2)
    bpt = len(ktx2) * 8.0 / (img.shape[0] * img.shape[1])
    print(f"wrote {dst}: {len(ktx2)} bytes ({bpt:.3f} bits/texel)")

    tr = Transcoder()
    h = tr.open(ktx2)
    rgba = tr.decode_rgba(h)
    m = metrics.image_metrics(rgba, img)
    print(f"round-trip rgb PSNR: {float(m['rgb_psnr']):.2f} dB")

    # GPU block formats come straight from the same handle
    bc7 = tr.transcode_tfmt(h, TF.BC7_RGBA)
    etc1 = tr.transcode_tfmt(h, TF.ETC1_RGB)
    print(f"BC7 blocks: {bc7.shape}, ETC1 blocks: {etc1.shape}")


if __name__ == "__main__":
    main()
