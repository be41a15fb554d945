import numpy as np

from basis_universal_tpu.ops import metrics


def test_psnr_identity_and_known():
    a = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert float(metrics.psnr(a, a)) == 99.0
    b = a.astype(np.int32).copy()
    b[0, 0, 0] += 10
    p = float(metrics.psnr(a, np.clip(b, 0, 255)))
    mse = 100.0 / (64 * 64 * 3)
    assert abs(p - 10 * np.log10(255 ** 2 / mse)) < 1e-3


def test_ssim_bounds():
    rng = np.random.default_rng(1)
    a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    assert float(metrics.ssim(a, a)) > 0.999
    noise = np.clip(a.astype(np.int32) + rng.integers(-20, 20, a.shape), 0, 255)
    s = float(metrics.ssim(a, noise.astype(np.uint8)))
    assert 0.0 < s < 0.999


def test_psnr_hvs_m_ordering():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    small = np.clip(a.astype(np.int32) + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    big = np.clip(a.astype(np.int32) + rng.integers(-25, 26, a.shape), 0, 255).astype(np.uint8)
    p_small = float(metrics.psnr_hvs_m(a, small))
    p_big = float(metrics.psnr_hvs_m(a, big))
    assert p_small > p_big
    assert float(metrics.psnr_hvs_m(a, a)) == 99.0


def test_image_metrics_dict():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (32, 32, 4), dtype=np.uint8)
    b = np.clip(a.astype(np.int32) + rng.integers(-5, 6, a.shape), 0, 255).astype(np.uint8)
    m = metrics.image_metrics(a, b)
    assert set(m) == {"rgb_psnr", "y601_psnr", "y709_psnr", "a_psnr", "rgba_psnr"}
    for v in m.values():
        assert 20.0 < float(v) <= 99.0


def test_hdr_image_metrics():
    import numpy as np

    from basis_universal_tpu.ops import metrics

    rng = np.random.default_rng(0)
    a = rng.uniform(0, 80, (32, 32, 3)).astype(np.float32)
    b = np.abs(a + rng.normal(0, 0.5, a.shape).astype(np.float32))
    m = metrics.hdr_image_metrics(a, b)
    for k in ("rgb_psnr", "log2_rgb_psnr", "half_rgb_psnr",
              "mean_delta_itp", "max_delta_itp"):
        assert k in m
    assert 0 < m["rgb_psnr"] < 1000
    assert m["mean_delta_itp"] > 0
    ident = metrics.hdr_image_metrics(a, a)
    assert ident["rgb_psnr"] == 1000.0
    assert ident["max_delta_itp"] == 0.0


def test_pq_itp_reference_points():
    import numpy as np

    from basis_universal_tpu.ops import metrics

    # PQ(100 nits) = PQ(Y=100 * 1cd) with Y scaled so 10000 -> 1.0:
    # forwardPQ(100) ~= 0.508 (BT.2100 spec value for 100 nits)
    pq = float(np.asarray(metrics.pq_oetf(100.0)))
    assert abs(pq - 0.5081) < 1e-3
    # neutral gray maps to Ct=Cp=0 (L=M=S in both gamut matrices)
    itp = np.asarray(metrics.linear_rgb_to_itp(
        np.array([5.0, 5.0, 5.0], np.float32)))
    assert abs(itp[1]) < 1e-4 and abs(itp[2]) < 1e-4
