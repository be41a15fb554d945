"""User-facing API mirroring the reference Python bindings (basisu_py).

Encoder(...).compress(image, format, quality, effort, flags) → .basis/.KTX2
bytes; Transcoder().open/decode_rgba/transcode_tfmt over KTX2 (and .basis).
Quality is the unified 1-100 scale, effort the unified 0-10 scale
(python/basisu_py/constants.py:55-74); ETC1S maps quality onto its native
0-255 level exactly like the reference (basisu_comp.cpp:174).
"""

import numpy as np

from . import compressor as _comp
from .formats.constants import BasisTexFormat, TranscoderTextureFormat
from .transcoder import BasisTranscoder, Ktx2Transcoder


class BasisQuality:
    MIN = 1
    MAX = 100


class BasisEffort:
    MIN = 0
    MAX = 10
    SUPER_FAST = 0
    FAST = 2
    NORMAL = 5
    DEFAULT = 2
    SLOW = 8
    VERY_SLOW = 10


class BasisFlags:
    NONE = 0
    THREADED = 1 << 9
    KTX2_OUTPUT = 1 << 11
    SRGB = 1 << 13
    GEN_MIPS_CLAMP = 1 << 14
    GEN_MIPS_WRAP = 1 << 15
    Y_FLIP = 1 << 16
    PRINT_STATS = 1 << 18
    PRINT_STATUS = 1 << 19
    VALIDATE_OUTPUT = 1 << 22


class Encoder:
    """Texture encoder. backend is always the TPU-native JAX pipeline
    (the reference's NATIVE/WASM split does not apply)."""

    def __init__(self, backend: str = "auto"):
        self.backend_name = "JAX"

    def compress(self, image, format: int = -1,
                 quality: int = BasisQuality.MAX,
                 effort: int = BasisEffort.DEFAULT,
                 flags: int = BasisFlags.KTX2_OUTPUT | BasisFlags.SRGB) -> bytes:
        """Compress an image (numpy HxWx3/4 uint8 or PIL) → container bytes.

        format -1 selects ETC1S (LDR default until more codecs land).
        Returns .KTX2 bytes when KTX2_OUTPUT is set, else .basis bytes.
        """
        img = self._to_array(image)
        if format == -1:
            format = BasisTexFormat.ETC1S
        fmt = BasisTexFormat(format)
        if fmt not in (BasisTexFormat.ETC1S, BasisTexFormat.UASTC_LDR_4x4):
            raise NotImplementedError(f"{fmt.name} encoding not implemented yet")
        q100 = min(max(int(quality), 1), 100)
        etc1s_q = int(round((q100 / 100.0) * 255.0))
        if flags & BasisFlags.Y_FLIP:
            img = img[::-1]
        params = _comp.CompressorParams(
            tex_format=fmt,
            quality_level=max(1, etc1s_q),
            effort=min(max(int(effort), 0), 10),
            perceptual=bool(flags & BasisFlags.SRGB),
            mip_gen=bool(flags & (BasisFlags.GEN_MIPS_CLAMP | BasisFlags.GEN_MIPS_WRAP)),
        )
        out = _comp.compress(img, params)
        return out.ktx2_data if flags & BasisFlags.KTX2_OUTPUT else out.basis_data

    @staticmethod
    def _to_array(image) -> np.ndarray:
        if isinstance(image, np.ndarray):
            return image
        try:
            from PIL import Image

            if isinstance(image, Image.Image):
                return np.asarray(image.convert("RGBA"))
        except ImportError:
            pass
        raise TypeError(f"unsupported image type {type(image)!r}")


class Transcoder:
    """KTX2/.basis transcoder mirroring basisu_py.Transcoder."""

    def __init__(self, backend: str = "auto"):
        self.backend_name = "JAX"

    def open(self, data: bytes):
        if data[:12] == bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x32, 0x30,
                               0xBB, 0x0D, 0x0A, 0x1A, 0x0A]):
            h = Ktx2Transcoder(data)
        else:
            h = BasisTranscoder(data)
        h.start_transcoding()
        return h

    def close(self, handle):
        pass

    # introspection
    def get_width(self, h):
        return h.get_width() if isinstance(h, Ktx2Transcoder) else \
            h.get_image_level_info(0, 0).orig_width

    def get_height(self, h):
        return h.get_height() if isinstance(h, Ktx2Transcoder) else \
            h.get_image_level_info(0, 0).orig_height

    def get_levels(self, h):
        return h.get_levels() if isinstance(h, Ktx2Transcoder) else \
            h.get_total_image_levels(0)

    def get_layers(self, h):
        return h.get_layers() if isinstance(h, Ktx2Transcoder) else \
            h.get_total_images()

    def get_faces(self, h):
        return h.get_faces() if isinstance(h, Ktx2Transcoder) else 1

    def get_basis_tex_format(self, h):
        return h.get_basis_tex_format() if isinstance(h, Ktx2Transcoder) else h.tex_format

    def is_etc1s(self, h):
        return self.get_basis_tex_format(h) == BasisTexFormat.ETC1S

    def is_srgb(self, h):
        return h.is_srgb() if isinstance(h, Ktx2Transcoder) else True

    def get_key_values(self, h):
        return h.get_key_values() if isinstance(h, Ktx2Transcoder) else {}

    # decoding
    def decode_rgba(self, data_or_handle, level=0, layer=0, face=0) -> np.ndarray:
        h = self._handle(data_or_handle)
        return self._transcode(h, TranscoderTextureFormat.RGBA32, level, layer, face)

    def transcode_tfmt(self, data_or_handle, tfmt, level=0, layer=0, face=0):
        h = self._handle(data_or_handle)
        return self._transcode(h, TranscoderTextureFormat(tfmt), level, layer, face)

    def _handle(self, x):
        if isinstance(x, (bytes, bytearray)):
            return self.open(bytes(x))
        return x

    @staticmethod
    def _transcode(h, fmt, level, layer, face):
        if isinstance(h, Ktx2Transcoder):
            return h.transcode_image_level(level, layer, face, fmt)
        return h.transcode_image_level(layer, level, fmt)
