"""Pallas kernel correctness (interpret mode — runs on the CPU test mesh).

The TPU-compiled path is exercised by the benchmark/driver on real hardware;
these tests pin the kernel math itself against the XLA fallback formulation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from basis_universal_tpu.ops import pallas_etc1s


def _ref_palette_errs(px, pal):
    diff = pal[:, :, :, None, :] - px[:, None, None, :, :]
    d = (diff * diff).sum(-1)
    return d.min(2).sum(-1)


def test_palette_errs_matches_reference():
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (300, 16, 3)).astype(np.float32)
    pal = rng.uniform(0.0, 255.0, (300, 5, 4, 3)).astype(np.float32)
    got = np.asarray(pallas_etc1s.palette_errs(
        jnp.asarray(px), jnp.asarray(pal), interpret=True))
    want = _ref_palette_errs(px, pal)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_palette_errs_nonmultiple_lane_padding():
    # B not a multiple of the lane tile: zero-padded tail must not leak
    rng = np.random.default_rng(8)
    px = rng.integers(0, 256, (17, 16, 3)).astype(np.float32)
    pal = rng.uniform(0.0, 255.0, (17, 3, 4, 3)).astype(np.float32)
    got = np.asarray(pallas_etc1s.palette_errs(
        jnp.asarray(px), jnp.asarray(pal), interpret=True))
    np.testing.assert_allclose(got, _ref_palette_errs(px, pal), rtol=1e-5)
