import numpy as np
import pytest

from basis_universal_tpu.utils import image_io


def test_load_qoi_matches_png(test_files):
    # kodim18 exists as both .png and .qoi in the reference fixtures
    from PIL import Image

    png = np.asarray(Image.open(test_files / "kodim18.png").convert("RGBA"))
    qoi = image_io.load_qoi(test_files / "kodim18.qoi")
    np.testing.assert_array_equal(png, qoi)


def test_load_dds_bc_roundtrip(test_files):
    rgba, info = image_io.load_dds(test_files / "kodim01.dds")
    assert info["width"] > 0 and info["height"] > 0
    if rgba is not None:
        assert rgba.shape == (info["height"], info["width"], 4)


def test_load_exr(test_files):
    hdr = image_io.load_image_hdr(test_files / "memorial.exr")
    assert hdr.dtype == np.float32
    assert hdr.ndim == 3 and hdr.shape[-1] == 3
    assert float(hdr.max()) > 1.0  # HDR content
    # PIZ-compressed files decode too (native Huffman + 2D wavelet)
    piz = image_io.load_image_hdr(test_files / "Desk.exr")
    assert piz.shape == (874, 644, 3) and np.isfinite(piz).all()


def test_write_dds_roundtrip(tmp_path, test_files):
    from PIL import Image

    from basis_universal_tpu.ops import transcode as tc
    from basis_universal_tpu.ops.etc1 import image_to_blocks

    img = np.asarray(Image.open(test_files / "kodim23.png").convert("RGBA"))[:64, :64]
    px = image_to_blocks(img).astype(np.float64).reshape(-1, 16, 4)
    bc1 = tc.rgba_blocks_to_bc1(px)
    p = tmp_path / "out.dds"
    image_io.write_dds(p, bc1.tobytes(), 64, 64, "BC1")
    rgba, info = image_io.load_dds(p)
    assert info["format"] == "BC1"
    mse = np.mean((rgba[..., :3].astype(np.float64) - img[..., :3]) ** 2)
    assert 10 * np.log10(255 ** 2 / mse) > 25.0


def test_write_ktx1(tmp_path):
    data = bytes(range(256)) * 4
    p = tmp_path / "x.ktx"
    image_io.write_ktx1(p, data, 32, 32, "BC1")
    raw = p.read_bytes()
    assert raw[:7] == bytes([0xAB, 0x4B, 0x54, 0x58, 0x20, 0x31, 0x31])
    assert data in raw


def test_telemetry():
    from basis_universal_tpu.utils import telemetry as tm

    t = tm.StageTimers()
    with t.stage("x"):
        pass
    assert "x" in t.report()
    assert tm.CONVARS.set("etc1s_endpoint_rdo_thresh", 2.0)
    assert tm.CONVARS.get("etc1s_endpoint_rdo_thresh") == 2.0
    assert not tm.CONVARS.set("nope", 1)
    assert any(c.name == "uastc_ls_iters" for c in tm.CONVARS.list())
    tm.CONVARS.set("etc1s_endpoint_rdo_thresh", 99.0)
    assert tm.CONVARS.get("etc1s_endpoint_rdo_thresh") == 4.0  # clamped
