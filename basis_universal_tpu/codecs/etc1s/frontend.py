"""ETC1S frontend: global endpoint/selector codebook generation on TPU.

TPU-native re-design of basisu_frontend (encoder/basisu_frontend.cpp:159-316):
the hierarchical VQ + iterative refinement pipeline becomes a sequence of
device kernels (see ops/etc1s_encode.py) — bisecting k-means init, Lloyd
iterations as distance matmuls on the MXU, per-cluster endpoint optimization
as a dense candidate scan with segment-sums, selector search as one-hot
matmuls. Host work is only small-array bookkeeping (dedup, index remapping).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import etc1s_encode as ops
from ...ops.etc1 import etc1s_palette


@dataclasses.dataclass
class FrontendParams:
    max_endpoint_clusters: int = 512
    max_selector_clusters: int = 512
    # effort 0-10 scales candidate radii and refinement iterations
    # (the reference's etc1s_compression_level 0-6 plays the same role)
    effort: int = 3
    perceptual: bool = True  # reserved; error metrics currently uniform RGB


@dataclasses.dataclass
class FrontendOutput:
    endpoint_color5: np.ndarray   # (E, 3) uint8
    endpoint_inten5: np.ndarray   # (E,) uint8
    selectors: np.ndarray         # (S, 16) uint8
    block_endpoints: np.ndarray   # (B,) int32
    block_selectors: np.ndarray   # (B,) int32


def _effort_knobs(effort: int):
    radius = 1 if effort <= 4 else 2
    kmeans_iters = 2 + min(effort, 6)
    refine_iters = 1 if effort <= 1 else (2 if effort <= 5 else 3)
    sel_iters = 2 + min(effort, 4)
    topk = 4 if effort <= 1 else (8 if effort <= 5 else 16)
    return radius, kmeans_iters, refine_iters, sel_iters, topk


def compress(pixels: np.ndarray, params: FrontendParams, seed: int = 0) -> FrontendOutput:
    """pixels: (B, 16, 3) float32 RGB in [0,255] (one entry per 4x4 block)."""
    assert pixels.ndim == 3 and pixels.shape[1:] == (16, 3)
    nblocks = pixels.shape[0]
    radius, kmeans_iters, refine_iters, sel_iters, topk = _effort_knobs(params.effort)
    num_e = int(min(params.max_endpoint_clusters, nblocks))
    num_s = int(min(params.max_selector_clusters, nblocks))
    topk = min(topk, num_e)

    px = jnp.asarray(pixels, dtype=jnp.float32)
    key = jax.random.PRNGKey(seed)

    # --- initial per-block encode → 6D endpoint training vectors
    init = ops.encode_blocks(px, radius=radius)
    vec6 = jnp.concatenate([init["low"], init["high"]], axis=-1) * (1.0 / 255.0)
    weights = jnp.ones(nblocks, dtype=jnp.float32)

    # --- endpoint clustering in 6D (init + Lloyd)
    seeds = ops.bisecting_init(vec6, weights, num_e, key)
    _, assign = ops.kmeans(vec6, weights, seeds, num_e, iters=kmeans_iters)

    # --- alternate cluster-endpoint optimization and exact reassignment
    color5 = inten = cb_pal = None
    for _ in range(refine_iters):
        one_cnt = jax.ops.segment_sum(jnp.ones(nblocks), assign, num_segments=num_e)
        mean_px = jax.ops.segment_sum(jnp.mean(px, axis=1), assign, num_segments=num_e)
        cluster_means = mean_px / jnp.maximum(one_cnt, 1.0)[:, None]
        color5, inten = ops.optimize_cluster_endpoints(
            px, assign, cluster_means, num_e, radius=radius)
        # codebook 6D vectors from the optimized endpoints
        cb_pal = _palette_jnp(color5, inten)                   # (C,4,3)
        cb_vec6 = jnp.concatenate([cb_pal[:, 0, :], cb_pal[:, 3, :]], -1) * (1.0 / 255.0)
        assign, _ = ops.refine_endpoint_assignment(
            px, vec6, cb_vec6, color5, inten, topk=topk)

    # --- host: drop empty clusters, dedup identical endpoints, remap
    assign_np = np.asarray(assign)
    color5_np = np.asarray(color5)
    inten_np = np.asarray(inten)
    used = np.zeros(num_e, dtype=bool)
    used[np.unique(assign_np)] = True
    packed = (color5_np[:, 0].astype(np.int64) << 16) | (color5_np[:, 1].astype(np.int64) << 11) \
        | (color5_np[:, 2].astype(np.int64) << 6) | inten_np.astype(np.int64)
    packed[~used] = -1
    uniq, remap_to_uniq = np.unique(packed, return_inverse=True)
    keep = uniq >= 0
    new_index = np.full(uniq.shape, -1, dtype=np.int64)
    new_index[keep] = np.arange(keep.sum())
    block_endpoints = new_index[remap_to_uniq[assign_np]].astype(np.int32)
    assert (block_endpoints >= 0).all()
    e_color5 = np.zeros((int(keep.sum()), 3), dtype=np.uint8)
    e_inten = np.zeros(int(keep.sum()), dtype=np.uint8)
    kept_vals = uniq[keep]
    e_color5[:, 0] = (kept_vals >> 16) & 31
    e_color5[:, 1] = (kept_vals >> 11) & 31
    e_color5[:, 2] = (kept_vals >> 6) & 31
    e_inten[:] = kept_vals & 7

    # --- selector phase (uses the fixed-size cluster palette so every device
    # shape is static across images; dedup only affects host-side indices)
    final_pal = cb_pal[assign]
    dists = ops.block_selector_distances(px, final_pal)        # (B,16,4)
    opt_sel = np.asarray(jnp.argmin(dists, axis=-1)).astype(np.uint8)

    # init codebook = most frequent optimal patterns, padded to a static
    # size (data-dependent sizes would recompile the device kernels per
    # image; duplicates are deduped after refinement)
    uniq_pat, counts = np.unique(opt_sel, axis=0, return_counts=True)
    order = np.argsort(-counts, kind="stable")
    ns = num_s
    init_pat = uniq_pat[order[:ns]].astype(np.int32)
    if init_pat.shape[0] < ns:
        reps = -(-ns // init_pat.shape[0])
        init_pat = np.tile(init_pat, (reps, 1))[:ns]
    patterns = jnp.asarray(init_pat)
    sel_assign = None
    for _ in range(sel_iters):
        sel_assign, _ = ops.find_best_selector_patterns(dists, patterns, ns)
        patterns = ops.update_selector_patterns(dists, sel_assign, ns)
    sel_assign, _ = ops.find_best_selector_patterns(dists, patterns, ns)

    # host: dedup selector patterns, drop empties, remap
    pat_np = np.asarray(patterns).astype(np.uint8)
    sel_np = np.asarray(sel_assign)
    used_s = np.zeros(ns, dtype=bool)
    used_s[np.unique(sel_np)] = True
    key_s = pat_np.astype(np.int64) @ (np.int64(4) ** np.arange(16, dtype=np.int64))
    key_s[~used_s] = -1
    uniq_s, first_idx, inv_s = np.unique(key_s, return_index=True, return_inverse=True)
    keep_s = uniq_s >= 0
    new_s = np.full(uniq_s.shape, -1, dtype=np.int64)
    new_s[keep_s] = np.arange(keep_s.sum())
    block_selectors = new_s[inv_s[sel_np]].astype(np.int32)
    assert (block_selectors >= 0).all()
    sel_cb = pat_np[first_idx[keep_s]]

    return FrontendOutput(
        endpoint_color5=e_color5,
        endpoint_inten5=e_inten,
        selectors=sel_cb,
        block_endpoints=block_endpoints,
        block_selectors=block_selectors,
    )


def _palette_jnp(color5, inten):
    from ...ops.etc1 import ETC1_INTEN_TABLES
    base8 = ops.expand5(color5).astype(jnp.float32)
    inten_tab = jnp.asarray(ETC1_INTEN_TABLES, dtype=jnp.float32)
    return jnp.clip(base8[:, None, :] + inten_tab[inten][:, :, None], 0, 255)
