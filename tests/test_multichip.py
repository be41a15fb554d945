"""Multi-chip sharding: the REAL pipeline over the 8-device CPU mesh must
produce byte-identical .basis output to the single-device path."""

import numpy as np
import pytest

import jax


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    from basis_universal_tpu.parallel.mesh import texture_batch_mesh

    return texture_batch_mesh(devices[:8])


def test_compress_batch_sharded_matches_single(mesh8):
    from basis_universal_tpu import compressor
    from basis_universal_tpu.parallel.mesh import compress_batch_sharded

    rng = np.random.default_rng(42)
    # smooth-ish random textures (pure noise defeats clustering determinism
    # checks slowly; gradients keep the test fast)
    base = rng.integers(0, 256, (8, 8, 8, 3)).astype(np.uint8)
    imgs = [np.kron(b, np.ones((8, 8, 1), np.uint8)) for b in base]

    params = compressor.CompressorParams(quality_level=32, effort=1)
    single = compressor.compress_batch(imgs, params)
    sharded = compress_batch_sharded(imgs, params, mesh8)

    assert len(single) == len(sharded) == 8
    for a, b in zip(single, sharded):
        assert a.basis_data == b.basis_data
        assert a.ktx2_data == b.ktx2_data


def test_dryrun_multichip_runs_real_pipeline():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
