import numpy as np
import pytest
from PIL import Image

from basis_universal_tpu.api import BasisFlags, Encoder, Transcoder
from basis_universal_tpu.cli import main as cli_main
from basis_universal_tpu.formats.constants import (
    BasisTexFormat,
    TranscoderTextureFormat as TF,
)


@pytest.fixture(scope="module")
def img(test_files):
    return np.asarray(Image.open(test_files / "kodim23.png").convert("RGBA"))[:64, :96]


def test_encoder_transcoder_api(img):
    enc = Encoder()
    ktx2 = enc.compress(img, format=BasisTexFormat.ETC1S, quality=60,
                        effort=1)
    assert ktx2[:4] == bytes([0xAB, 0x4B, 0x54, 0x58])
    tr = Transcoder()
    h = tr.open(ktx2)
    assert tr.get_width(h) == 96 and tr.get_height(h) == 64
    assert tr.is_etc1s(h)
    assert tr.is_srgb(h)
    rgba = tr.decode_rgba(h)
    assert rgba.shape == (64, 96, 4)
    bc7 = tr.transcode_tfmt(h, TF.BC7_RGBA)
    assert bc7.shape == (16, 24, 16)


def test_encoder_default_format_auto_select(img):
    """format=-1 auto-selects like basisu_py codec.py:78-83: XUASTC LDR
    6x6 for uint8 input."""
    enc = Encoder()
    ktx2 = enc.compress(img, quality=100, effort=0)
    tr = Transcoder()
    h = tr.open(ktx2)
    assert tr.get_basis_tex_format(h) == BasisTexFormat.XUASTC_LDR_6x6
    assert tr.decode_rgba(h).shape == (64, 96, 4)


def test_encoder_basis_output(img):
    enc = Encoder()
    basis = enc.compress(img, format=BasisTexFormat.ETC1S, quality=60,
                         effort=1, flags=BasisFlags.SRGB)
    assert basis[:2] == b"sB"
    tr = Transcoder()
    h = tr.open(basis)
    assert tr.decode_rgba(h).shape == (64, 96, 4)


def test_cli_compress_unpack_compare(img, tmp_path, capsys):
    src = tmp_path / "in.png"
    Image.fromarray(img).save(src)
    assert cli_main([str(src), "-q", "128", "-output_path", str(tmp_path)]) == 0
    out = tmp_path / "in.ktx2"
    assert out.exists()
    assert cli_main(["-unpack", str(out), "-output_path", str(tmp_path)]) == 0
    png = tmp_path / "in_unpacked_rgba_0000.png"
    assert png.exists()
    assert cli_main(["-compare", str(src), str(png)]) == 0
    captured = capsys.readouterr().out
    assert "rgb_psnr" in captured and "ssim" in captured


def test_cli_version(capsys):
    assert cli_main(["-version"]) == 0
    assert "basis_universal_tpu" in capsys.readouterr().out


def test_encoder_uastc_format(img):
    enc = Encoder()
    ktx2 = enc.compress(img, format=BasisTexFormat.UASTC_LDR_4x4,
                        effort=1)
    tr = Transcoder()
    h = tr.open(ktx2)
    assert tr.get_basis_tex_format(h) == BasisTexFormat.UASTC_LDR_4x4
    rgba = tr.decode_rgba(h)
    assert rgba.shape == (64, 96, 4)


def test_codec_sweep_subset_against_golden():
    """Small sweep subset gated against the golden table (the full grid
    runs via `python -m basis_universal_tpu.cli -test_codecs`)."""
    import pathlib

    from basis_universal_tpu.testing import codec_sweep

    golden = pathlib.Path(__file__).parent / "golden_sweep.json"
    if not golden.exists():
        import pytest

        pytest.skip("no golden sweep table")
    rows = codec_sweep.run_sweep(
        "/root/reference/test_files", images=["kodim03.png"],
        qualities=[128], efforts=[1], codecs=["etc1s"],
        progress=lambda *_: None)
    assert rows
    failures = codec_sweep.check_against_golden(rows, golden)
    assert not failures, failures
