"""Device-side ETC1S encoding ops (JAX/XLA on TPU).

TPU-first reformulation of the reference's ETC1S frontend hot loops
(basisu_frontend.cpp:159-316 and the OpenCL kernels in bin/ocl_kernels.cl,
whose semantics are described in SURVEY.md §A.5):

  - per-block ETC1S encode (etc1_optimizer cluster-fit scan loops)
      → dense candidate × intensity-table evaluation with argmin reduction
  - per-cluster endpoint optimization (encode_etc1s_from_pixel_cluster)
      → the same candidate scan with a segment-sum over cluster members
  - endpoint clusterization refinement (refine_endpoint_clusterization)
      → blocks × clusters distance matrix on the MXU + top-k/argmin
  - optimal selector-cluster search (find_optimal_selector_clusters...)
      → per-pixel distance tensor (B,64) @ one-hot selector patterns (64,S)

Divergent per-block control flow becomes "evaluate all candidates, argmin";
effort levels scale the candidate set size instead of changing control flow.
All shapes are static; images are padded to block multiples by the caller.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .etc1 import ETC1_INTEN_TABLES

_INTEN = jnp.asarray(ETC1_INTEN_TABLES, dtype=jnp.float32)  # (8,4)


def _candidate_deltas(radius: int) -> np.ndarray:
    """Integer 5-bit-space perturbations tried around the mean color.

    radius 1 → 27 candidates, radius 2 → 125. The reference's etc1_optimizer
    scans a similar neighborhood serially (encoder/basisu_etc.cpp); here all
    candidates are evaluated in parallel.
    """
    r = np.arange(-radius, radius + 1)
    d = np.stack(np.meshgrid(r, r, r, indexing="ij"), -1).reshape(-1, 3)
    # order by L1 norm so lower-effort prefixes are the best candidates
    d = d[np.argsort(np.abs(d).sum(1), kind="stable")]
    return d.astype(np.int32)


def expand5(c5):
    return (c5 << 3) | (c5 >> 2)


@functools.partial(jax.jit, static_argnames=("radius",))
def encode_blocks(pixels, radius: int = 1):
    """Per-block ETC1S encode.

    pixels: (B, 16, 3) float32 in [0, 255].
    Returns dict with color5 (B,3) int32, inten (B,) int32, err (B,) f32,
    selectors (B,16) int32, low/high (B,3) f32 (the 6D training vector).
    """
    deltas = jnp.asarray(_candidate_deltas(radius))  # (D,3)
    mean = jnp.mean(pixels, axis=1)  # (B,3)
    base5 = jnp.clip(jnp.round(mean * (31.0 / 255.0)).astype(jnp.int32), 0, 31)

    def eval_delta(delta):
        c5 = jnp.clip(base5 + delta[None, :], 0, 31)           # (B,3)
        base8 = expand5(c5).astype(jnp.float32)                # (B,3)
        # palette: (B, 8, 4, 3)
        pal = jnp.clip(base8[:, None, None, :] + _INTEN[None, :, :, None], 0.0, 255.0)
        # dist: (B, 8, 4, 16)
        diff = pal[:, :, :, None, :] - pixels[:, None, None, :, :]
        d = jnp.sum(diff * diff, axis=-1)
        per_pix = jnp.min(d, axis=2)                           # (B, 8, 16)
        err_bt = jnp.sum(per_pix, axis=-1)                     # (B, 8)
        best_t = jnp.argmin(err_bt, axis=-1)                   # (B,)
        best_err = jnp.take_along_axis(err_bt, best_t[:, None], 1)[:, 0]
        return best_err, best_t.astype(jnp.int32), c5

    errs, tables, c5s = jax.lax.map(eval_delta, jnp.asarray(deltas))
    best_d = jnp.argmin(errs, axis=0)                          # (B,)
    b = jnp.arange(pixels.shape[0])
    err = errs[best_d, b]
    inten = tables[best_d, b]
    color5 = c5s[best_d, b]                                    # (B,3)

    base8 = expand5(color5).astype(jnp.float32)
    pal = jnp.clip(base8[:, None, :] + _INTEN[inten][:, :, None], 0.0, 255.0)  # (B,4,3)
    diff = pal[:, None, :, :] - pixels[:, :, None, :]
    selectors = jnp.argmin(jnp.sum(diff * diff, -1), axis=-1).astype(jnp.int32)
    return {
        "color5": color5,
        "inten": inten,
        "err": err,
        "selectors": selectors,
        "low": pal[:, 0, :],
        "high": pal[:, 3, :],
    }


@functools.partial(jax.jit, static_argnames=("num_clusters", "radius"))
def optimize_cluster_endpoints(pixels, cluster_ids, cluster_means,
                               num_clusters: int, radius: int = 1):
    """Optimal (color5, inten) per endpoint cluster from member pixels.

    pixels: (B, 16, 3) f32; cluster_ids: (B,) int32; cluster_means: (C, 3).
    Returns color5 (C,3) int32, inten (C,) int32.

    Device analog of encode_etc1s_from_pixel_cluster (ocl_kernels.cl:1013):
    errors for every (candidate, table) accumulate over member pixels via
    segment-sum, then a single argmin picks the winner per cluster.
    """
    deltas = jnp.asarray(_candidate_deltas(radius))            # (D,3)
    base5 = jnp.clip(jnp.round(cluster_means * (31.0 / 255.0)).astype(jnp.int32), 0, 31)

    def eval_delta(delta):
        c5 = jnp.clip(base5 + delta[None, :], 0, 31)           # (C,3)
        base8 = expand5(c5).astype(jnp.float32)
        pal = jnp.clip(base8[:, None, None, :] + _INTEN[None, :, :, None], 0.0, 255.0)  # (C,8,4,3)
        blk_pal = pal[cluster_ids]                             # (B,8,4,3)
        diff = blk_pal[:, :, :, None, :] - pixels[:, None, None, :, :]
        d = jnp.sum(diff * diff, axis=-1)                      # (B,8,4,16)
        per_blk = jnp.sum(jnp.min(d, axis=2), axis=-1)         # (B,8)
        err_ct = jax.ops.segment_sum(per_blk, cluster_ids, num_segments=num_clusters)
        return err_ct, c5                                      # (C,8), (C,3)

    errs, c5s = jax.lax.map(eval_delta, deltas)                # (D,C,8), (D,C,3)
    flat = errs.transpose(1, 0, 2).reshape(num_clusters, -1)   # (C, D*8)
    best = jnp.argmin(flat, axis=-1)
    best_d, best_t = best // 8, best % 8
    c = jnp.arange(num_clusters)
    return c5s[best_d, c], best_t.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_clusters", "iters"))
def kmeans(vecs, weights, init_centroids, num_clusters: int, iters: int = 4):
    """Weighted Lloyd iterations; distances via the |a|²-2ab+|b|² matmul.

    vecs: (N, F) f32; weights: (N,); init_centroids: (C, F).
    Returns (centroids (C,F), assignment (N,)).
    """
    n = vecs.shape[0]
    w = weights[:, None]
    wv = vecs * w
    # the -2ab cross term dominates HBM traffic at (N, C) scale: compute it
    # as a bf16 MXU matmul with f32 accumulation (assignment only needs to
    # rank distances, and vecs are normalized to [0,1]).  Small codebooks
    # stay f32 — there the matmul is cheap and bf16 rounding noise costs
    # measurable PSNR at low quality levels.
    dt = jnp.bfloat16 if num_clusters >= 1024 else jnp.float32
    vecs_h = vecs.astype(dt)

    def step(centroids, _):
        cross = jax.lax.dot_general(
            vecs_h, centroids.astype(dt).T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (N, C)
        d = jnp.sum(centroids * centroids, -1)[None, :] - 2.0 * cross
        assign = jnp.argmin(d, axis=-1)
        # centroid update by segment-sum: no (N, C) one-hot materialization
        sums = jax.ops.segment_sum(wv, assign, num_segments=num_clusters)
        cnts = jax.ops.segment_sum(w[:, 0], assign, num_segments=num_clusters)
        new = jnp.where(cnts[:, None] > 0,
                        sums / jnp.maximum(cnts[:, None], 1e-9), centroids)
        return new, assign

    centroids, assigns = jax.lax.scan(step, init_centroids, None, length=iters)
    return centroids, assigns[-1]


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def bisecting_init(vecs, weights, num_clusters: int, key):
    """Hierarchical top-down split init (device analog of tree_vector_quant,
    encoder/basisu_enc.h:1547): repeatedly split every cluster along its
    principal axis until >= num_clusters, then trim to the most populated.

    Fully jitted: per-cluster moments via segment-sums (no one-hot
    materialization), principal axes by power iteration on the (C,F,F)
    scatter tensors. log2(num_clusters) unrolled rounds, static shapes.
    """
    n, f = vecs.shape
    rounds = max(1, int(np.ceil(np.log2(num_clusters))))
    assign = jnp.zeros(n, dtype=jnp.int32)
    w = weights
    wv = vecs * w[:, None]

    for r in range(rounds):
        c = 1 << r
        cnt = jax.ops.segment_sum(w, assign, num_segments=c)    # (C,)
        s1 = jax.ops.segment_sum(wv, assign, num_segments=c)    # (C,F)
        mean = s1 / jnp.maximum(cnt, 1e-9)[:, None]
        centered = vecs - mean[assign]
        outer = (centered[:, :, None] * centered[:, None, :]) * w[:, None, None]
        cov = jax.ops.segment_sum(outer.reshape(n, f * f), assign,
                                  num_segments=c).reshape(c, f, f)
        v0 = jnp.ones((c, f), dtype=vecs.dtype)

        def power(v, _):
            v = jnp.einsum("cfg,cg->cf", cov, v)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)
            return v, None

        axis, _ = jax.lax.scan(power, v0, None, length=8)
        proj = jnp.sum(centered * axis[assign], -1)             # (N,)
        assign = assign * 2 + (proj > 0).astype(jnp.int32)

    c = 1 << rounds
    cnt = jax.ops.segment_sum(w, assign, num_segments=c)
    s1 = jax.ops.segment_sum(wv, assign, num_segments=c)
    mean = s1 / jnp.maximum(cnt, 1e-9)[:, None]
    # keep the num_clusters most-populated leaves as k-means seeds
    top = jnp.argsort(-cnt)[:num_clusters]
    seeds = mean[top]
    # replace any empty seeds with random training vectors
    need = cnt[top] <= 0
    rnd = jax.random.choice(key, vecs, (num_clusters,))
    return jnp.where(need[:, None], rnd, seeds)


@functools.partial(jax.jit, static_argnames=("topk",))
def refine_endpoint_assignment(pixels, blk_vec6, cb_vec6, cb_color5, cb_inten,
                               topk: int = 8):
    """Reassign each block to its best endpoint cluster by exact block error.

    Device analog of refine_endpoint_clusterization (ocl_kernels.cl:1063):
    candidate shortlist by 6D codebook distance (MXU matmul + top-k), then
    exact ETC1S error over the shortlist, argmin.

    pixels (B,16,3), blk_vec6 (B,6), cb_vec6 (C,6), cb_color5 (C,3),
    cb_inten (C,). Returns (assignment (B,), err (B,)).
    """
    d6 = (jnp.sum(blk_vec6 * blk_vec6, -1, keepdims=True)
          - 2.0 * blk_vec6 @ cb_vec6.T
          + jnp.sum(cb_vec6 * cb_vec6, -1)[None, :])            # (B,C)
    _, cand = jax.lax.top_k(-d6, topk)                          # (B,K)

    base8 = expand5(cb_color5).astype(jnp.float32)              # (C,3)
    pal_all = jnp.clip(base8[:, None, :] + _INTEN[cb_inten][:, :, None], 0.0, 255.0)  # (C,4,3)
    pal = pal_all[cand]                                         # (B,K,4,3)
    diff = pal[:, :, :, None, :] - pixels[:, None, None, :, :]  # (B,K,4,16,3)
    d = jnp.sum(diff * diff, -1)                                # (B,K,4,16)
    err_k = jnp.sum(jnp.min(d, axis=2), -1)                     # (B,K)
    best = jnp.argmin(err_k, axis=-1)
    b = jnp.arange(pixels.shape[0])
    return cand[b, best], err_k[b, best]


@functools.partial(jax.jit, static_argnames=())
def block_selector_distances(pixels, pal):
    """d[b, i, k] = ||pixel_bi - pal_bk||² — the (B,16,4) tensor whose
    flattening drives all selector-search matmuls."""
    diff = pixels[:, :, None, :] - pal[:, None, :, :]
    return jnp.sum(diff * diff, -1)


@functools.partial(jax.jit, static_argnames=("num_patterns",))
def find_best_selector_patterns(dists, patterns, num_patterns: int):
    """For each block pick the codebook selector pattern with least error.

    dists: (B,16,4) from block_selector_distances.
    patterns: (S,16) int32 selector values.
    E[b,s] = Σ_i d[b,i,s_i] = (B,64) @ onehot(patterns) (64,S) → MXU matmul
    (device analog of find_optimal_selector_clusters_for_each_block,
    ocl_kernels.cl:1159).
    """
    b = dists.shape[0]
    d_flat = dists.reshape(b, 64)
    one = jax.nn.one_hot(patterns, 4, dtype=jnp.bfloat16)       # (S,16,4)
    p_flat = one.reshape(num_patterns, 64)
    # bf16 MXU matmul with f32 accumulation: the one-hot operand is exact
    # in bf16 and distances only need to rank, halving the HBM traffic of
    # the (B, S) product at large codebook sizes
    err = jax.lax.dot_general(
        d_flat.astype(jnp.bfloat16), p_flat.T,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    best = jnp.argmin(err, axis=-1)
    return best.astype(jnp.int32), jnp.min(err, axis=-1)


def rdo_neighbor_copy(px, assign, sel_assign, cb_pal, patterns,
                      left_idx, up_idx, e_thresh, s_thresh):
    """Rate-distortion neighbor reuse (device analog of the backend RDO
    loops, encoder/basisu_backend.cpp:830-1000): copy the left/up neighbor's
    endpoint cluster (then selector pattern) when the block error stays under
    thresh x current error. Matches become 2-bit predictor symbols / MTF
    history hits in the entropy stream. Runs INSIDE the frontend device
    program — left_idx/up_idx are flat neighbor indices (-1 = none).
    """
    def block_err(e_indices, sel_patterns):
        pal = cb_pal[e_indices]                                # (B,4,3)
        cols = jnp.take_along_axis(pal, sel_patterns[:, :, None], axis=1)
        d = px - cols
        return jnp.sum(d * d, axis=(1, 2))

    sel_pat = patterns[sel_assign]
    cur_err = block_err(assign, sel_pat)

    for nbr in (left_idx, up_idx):
        nb = jnp.maximum(nbr, 0)
        n_assign = assign[nb]
        n_err = block_err(n_assign, sel_pat)
        use = (n_err <= cur_err * e_thresh) & (nbr >= 0) & (cur_err > 0) \
            & (n_assign != assign)
        assign = jnp.where(use, n_assign, assign)
        cur_err = jnp.where(use, n_err, cur_err)

    sel_pat = patterns[sel_assign]
    cur_err = block_err(assign, sel_pat)
    for nbr in (left_idx, up_idx):
        nb = jnp.maximum(nbr, 0)
        n_sel = sel_assign[nb]
        n_pat = patterns[n_sel]
        n_err = block_err(assign, n_pat)
        use = (n_err <= cur_err * s_thresh) & (nbr >= 0) & (cur_err > 0) \
            & (n_sel != sel_assign)
        sel_assign = jnp.where(use, n_sel, sel_assign)
        cur_err = jnp.where(use, n_err, cur_err)
    return assign.astype(jnp.int32), sel_assign.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_patterns",))
def update_selector_patterns(dists, assign, num_patterns: int):
    """Recompute each selector cluster's optimal pattern.

    For cluster s and pixel position i: argmin_k Σ_{b∈s} d[b,i,k]
    (segment-sum over members, independent per position)."""
    sums = jax.ops.segment_sum(dists, assign, num_segments=num_patterns)  # (S,16,4)
    return jnp.argmin(sums, axis=-1).astype(jnp.int32)
