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

# Perceptual (luma-weighted) color metric — the device form of the
# reference's integer color_distance(perceptual=true, ...)
# (encoder/basisu_enc.h:1141): a PSD quadratic form dᵀKd with
# K = Aᵀ diag(128,26,3) A, A = [[14,45,5],[50,-45,-5],[-14,-45,59]]
# (rows = luma / Cr-ish / Cb-ish axes). Factored as ‖P d‖² so every
# existing squared-distance matmul/argmin becomes perceptual by
# transforming both operands through P once. Scaled so 1ᵀPᵀP1 = 3:
# gray deltas score exactly like the uniform metric, every gray-axis
# constant in the factorized ETC1S scan (u in intensity-table units,
# the 1/3 and 3.0 factors) is unchanged, and P@(1,1,1) = (√3, 0, 0) —
# the first transformed channel IS the luma axis.
_PERC_A = np.array([[14., 45., 5.], [50., -45., -5.], [-14., -45., 59.]])
_PERC_W = np.array([128., 26., 3.])
PERC_P = (np.sqrt(_PERC_W * (3.0 / 524288.0))[:, None]
          * _PERC_A).astype(np.float32)                     # (3,3)
_SQRT3 = float(np.sqrt(3.0))


def perceptual_transform(x):
    """y = P·x over the trailing RGB axis: plain squared distances in
    y-space equal the reference's perceptual color_distance (up to the
    global 3/2¹⁹ scale, which cancels in every ranking/ratio use)."""
    return x @ jnp.asarray(PERC_P).T


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


# Midpoints between consecutive intensity-table values: the unclipped
# optimal selector for a pixel with gray-axis offset u is the table value
# nearest to u, found by 3 threshold compares (tables are sorted ascending).
_INTEN_MID = (ETC1_INTEN_TABLES[:, :-1] + ETC1_INTEN_TABLES[:, 1:]) / 2.0  # (8,3)


def _gray_axis_minterm(u):
    """Σ_i min_k (t_k - u_i)² per intensity table, for u (..., 16) gray-axis
    offsets. Returns (..., 8).

    The ETC1S palette is base + t_k·(1,1,1), so the per-pixel min-over-
    selectors distance decomposes into a scalar function of the pixel's
    luma offset u_i = (Σ_ch x_ch - Σ_ch base_ch)/3 — this replaces the
    reference optimizer's per-channel 4-color scan
    (encoder/basisu_etc.cpp etc1_optimizer) with 8 threshold compares.
    Clipping to [0,255] is ignored during the scan (scores only rank
    candidates; the winner's palette/selectors are computed clipped).
    """
    mids = jnp.asarray(_INTEN_MID, dtype=jnp.float32)          # (8,3)
    tabs = _INTEN                                              # (8,4)
    uu = u[..., None, :]                                       # (...,1,16)
    k = ((uu > mids[:, 0, None]).astype(jnp.int32)
         + (uu > mids[:, 1, None]) + (uu > mids[:, 2, None]))  # (...,8,16)
    # select t_k without a gather: chained where on the 3 thresholds
    t0, t1, t2, t3 = tabs[:, 0], tabs[:, 1], tabs[:, 2], tabs[:, 3]
    tk = jnp.where(k == 0, t0[:, None],
                   jnp.where(k == 1, t1[:, None],
                             jnp.where(k == 2, t2[:, None], t3[:, None])))
    d = tk - uu
    return jnp.sum(d * d, axis=-1)                             # (...,8)


def _palette_errs(pixels, pal):
    """err[b,k] = Σ_i min_sel ||x_bi - pal_bks||² — exact clipped rescore.

    On TPU backends this runs as a fused Pallas kernel (block axis on
    lanes, no HBM temporaries); elsewhere the XLA broadcast fallback.
    pixels (B,16,3) f32, pal (B,K,4,3) f32 → (B,K) f32.
    """
    from . import pallas_etc1s

    if pallas_etc1s.use_pallas():
        return pallas_etc1s.palette_errs(pixels, pal)
    diff = pal[:, :, :, None, :] - pixels[:, None, None, :, :]  # (B,K,4,16,3)
    d = jnp.sum(diff * diff, -1)                                # (B,K,4,16)
    return jnp.sum(jnp.min(d, axis=2), -1)                      # (B,K)


def _block_moments(pixels, gvec=None):
    """Per-block sufficient statistics for the factorized candidate scan.

    gvec: optional (3,) gray-axis direction in the pixel space (P@(1,1,1)
    for perceptually transformed pixels); None means uniform RGB (1,1,1)."""
    luma = jnp.sum(pixels, axis=-1) if gvec is None else pixels @ gvec
    return dict(
        luma=luma,
        sum_l=jnp.sum(luma, axis=-1),                          # (B,)
        sum_l2=jnp.sum(luma * luma, axis=-1),                  # (B,)
        sum_x=jnp.sum(pixels, axis=1),                         # (B,3)
        sum_x2=jnp.sum(pixels * pixels, axis=(1, 2)),          # (B,)
    )


def _scan_block_errs(mom, base8, npix=16.0, gvec=None):
    """Factorized ETC1S candidate errors.

    mom: _block_moments dict (entries (B,...) or cluster-aggregated (C,...)).
    base8: (D, B, 3) f32 candidate base colors (unclipped scoring), in the
    SAME space as the moments (perceptually transformed when gvec is set).
    Returns err (D, B, 8) = Σ_i min_k ||x_i - (base + t_k·ĝ)||² without clip:
        Σ|x|² - 2 b·Σx + n|b|² - Σs²/3 + 3 Σ_i min_k (t_k - s_i/3)²,
    where s_i = luma_i - g·b. The 1/3 and 3 constants are |g|² = 3, which
    holds for uniform RGB (g=(1,1,1)) AND the perceptual transform (scaled
    so P@(1,1,1) has squared norm 3).
    """
    lb = (jnp.sum(base8, axis=-1) if gvec is None
          else base8 @ gvec)                                   # (D,B)
    q = (mom["sum_x2"][None] - 2.0 * jnp.einsum("dbc,bc->db", base8, mom["sum_x"])
         + npix * jnp.sum(base8 * base8, axis=-1))             # (D,B)
    su2 = (mom["sum_l2"][None] - 2.0 * lb * mom["sum_l"][None]
           + npix * lb * lb)                                   # (D,B)
    u = (mom["luma"][None] - lb[..., None]) * (1.0 / 3.0)      # (D,B,16)
    minterm = _gray_axis_minterm(u)                            # (D,B,8)
    return (q - su2 * (1.0 / 3.0))[..., None] + 3.0 * minterm


@functools.partial(jax.jit, static_argnames=("radius", "perceptual"))
def encode_blocks(pixels, radius: int = 1, perceptual: bool = False):
    """Per-block ETC1S encode.

    pixels: (B, 16, 3) float32 in [0, 255].
    perceptual: score candidates/selectors with the luma-weighted metric
    (the reference scores perceptual by default, basisu_frontend.cpp via
    color_distance(perceptual, ...)); quantization stays in RGB space.
    Returns dict with color5 (B,3) int32, inten (B,) int32, err (B,) f32,
    selectors (B,16) int32, low/high (B,3) f32 (the 6D training vector,
    RGB — callers transform for metric-space clustering).
    """
    from . import pallas_etc1s

    deltas = jnp.asarray(_candidate_deltas(radius))  # (D,3)
    mean = jnp.mean(pixels, axis=1)  # (B,3)
    base5 = jnp.clip(jnp.round(mean * (31.0 / 255.0)).astype(jnp.int32), 0, 31)
    gvec = jnp.asarray(PERC_P @ np.ones(3, np.float32)) if perceptual else None
    px_m = perceptual_transform(pixels) if perceptual else pixels

    d_, t_ = deltas.shape[0], 8
    if pallas_etc1s.use_pallas():
        flat = pallas_etc1s.factorized_scan(pixels, radius=radius,
                                            perceptual=perceptual)  # (B,D*8)
    else:
        c5s = jnp.clip(base5[None] + deltas[:, None, :], 0, 31)  # (D,B,3)
        mom = _block_moments(px_m, gvec)
        base8 = expand5(c5s).astype(jnp.float32)
        if perceptual:
            base8 = perceptual_transform(base8)
        err_dbt = _scan_block_errs(mom, base8, gvec=gvec)      # (D,B,8)
        flat = jnp.moveaxis(err_dbt, 1, 0).reshape(-1, d_ * t_)  # (B, D*8)
    # unclipped scores shortlist; exact clipped rescore picks the winner
    # (clipping shifts errors near the gamut edge enough to matter for PSNR)
    k_re = min(16, d_ * t_)
    _, cand = jax.lax.top_k(-flat, k_re)                       # (B,K)
    b = jnp.arange(pixels.shape[0])
    cand_d, cand_t = cand // 8, cand % 8
    if pallas_etc1s.use_pallas():
        # packed-descriptor rescore: the candidate palette never touches
        # HBM (TPU gathers are row-count-bound, so the (B,K,4,3) palette
        # gather costs ~10x the whole rescore kernel)
        c5k = jnp.clip(base5[:, None, :] + deltas[cand_d], 0, 31)  # (B,K,3)
        packed = (c5k[..., 0] | (c5k[..., 1] << 5) | (c5k[..., 2] << 10)
                  | (cand_t << 15))
        cerr = pallas_etc1s.palette_errs_packed(pixels, packed,
                                                perceptual=perceptual)
        kbest = jnp.argmin(cerr, axis=-1)
        err = cerr[b, kbest]
        pk = packed[b, kbest]
        inten = ((pk >> 15) & 7).astype(jnp.int32)
        color5 = jnp.stack([pk & 31, (pk >> 5) & 31, (pk >> 10) & 31], -1)
    else:
        cb8 = expand5(c5s[cand_d, b[:, None]]).astype(jnp.float32)  # (B,K,3)
        cpal = jnp.clip(cb8[:, :, None, :] + _INTEN[cand_t][..., None], 0.0, 255.0)  # (B,K,4,3)
        if perceptual:
            cpal = perceptual_transform(cpal)
        cerr = _palette_errs(px_m, cpal)                       # (B,K)
        kbest = jnp.argmin(cerr, axis=-1)
        err = cerr[b, kbest]
        inten = cand_t[b, kbest].astype(jnp.int32)
        color5 = c5s[cand_d[b, kbest], b]                      # (B,3)

    base8 = expand5(color5).astype(jnp.float32)
    pal = jnp.clip(base8[:, None, :] + _INTEN[inten][:, :, None], 0.0, 255.0)  # (B,4,3)
    pal_m = perceptual_transform(pal) if perceptual else pal
    # |x-c|² expanded through a batched einsum rather than a broadcasted
    # (B,16,4,3) subtract: the cross term runs as a small batched matmul and
    # the (B,16,4,3) diff tensor never materializes in HBM
    cross = jnp.einsum("bic,bkc->bik", px_m, pal_m)              # (B,16,4)
    d = jnp.sum(pal_m * pal_m, -1)[:, None, :] - 2.0 * cross
    selectors = jnp.argmin(d, axis=-1).astype(jnp.int32)
    return {
        "color5": color5,
        "inten": inten,
        "err": err,
        "selectors": selectors,
        "low": pal[:, 0, :],
        "high": pal[:, 3, :],
    }


@functools.partial(jax.jit, static_argnames=("num_clusters", "radius",
                                              "perceptual"))
def optimize_cluster_endpoints(pixels, cluster_ids, cluster_means,
                               num_clusters: int, radius: int = 1,
                               perceptual: bool = False):
    """Optimal (color5, inten) per endpoint cluster from member pixels.

    pixels: (B, 16, 3) f32 RGB; cluster_ids: (B,) int32; cluster_means: (C, 3)
    RGB. Returns color5 (C,3) int32, inten (C,) int32.

    Device analog of encode_etc1s_from_pixel_cluster (ocl_kernels.cl:1013):
    errors for every (candidate, table) accumulate over member pixels via
    segment-sum, then a single argmin picks the winner per cluster.
    """
    from . import pallas_etc1s

    deltas = jnp.asarray(_candidate_deltas(radius))            # (D,3)
    base5 = jnp.clip(jnp.round(cluster_means * (31.0 / 255.0)).astype(jnp.int32), 0, 31)
    c5s = jnp.clip(base5[None] + deltas[:, None, :], 0, 31)    # (D,C,3)
    d_ = deltas.shape[0]
    gvec = jnp.asarray(PERC_P @ np.ones(3, np.float32)) if perceptual else None

    if pallas_etc1s.use_pallas():
        # per-block factorized errors against the block's CLUSTER base
        # (q/su2 are linear in block moments, so the per-cluster error is
        # exactly the segment-sum of per-block rows)
        blk_err = pallas_etc1s.factorized_scan(
            pixels, base5=base5[cluster_ids].astype(jnp.float32),
            radius=radius, perceptual=perceptual)              # (B,D*8)
        flat = jax.ops.segment_sum(blk_err, cluster_ids,
                                   num_segments=num_clusters)  # (C,D*8)
    else:
        base8 = expand5(c5s).astype(jnp.float32)               # (D,C,3)
        if perceptual:
            base8 = perceptual_transform(base8)

        # factorized scan (see _scan_block_errs): the moment terms aggregate
        # to per-cluster sufficient statistics; only the gray-axis min-term
        # needs a per-pixel pass, segment-summed to clusters per candidate.
        mom = _block_moments(
            perceptual_transform(pixels) if perceptual else pixels, gvec)
        ones = jnp.ones(pixels.shape[0], dtype=jnp.float32)
        c_cnt = jax.ops.segment_sum(ones, cluster_ids, num_segments=num_clusters)
        c_sum_x = jax.ops.segment_sum(mom["sum_x"], cluster_ids, num_segments=num_clusters)
        c_sum_x2 = jax.ops.segment_sum(mom["sum_x2"], cluster_ids, num_segments=num_clusters)
        c_sum_l = jax.ops.segment_sum(mom["sum_l"], cluster_ids, num_segments=num_clusters)
        c_sum_l2 = jax.ops.segment_sum(mom["sum_l2"], cluster_ids, num_segments=num_clusters)
        npix = 16.0 * c_cnt                                    # (C,)

        lb = (jnp.sum(base8, axis=-1) if gvec is None
              else base8 @ gvec)                               # (D,C)
        q = (c_sum_x2[None] - 2.0 * jnp.einsum("dcx,cx->dc", base8, c_sum_x)
             + npix[None] * jnp.sum(base8 * base8, axis=-1))   # (D,C)
        su2 = (c_sum_l2[None] - 2.0 * lb * c_sum_l[None]
               + npix[None] * lb * lb)                         # (D,C)

        lb_blk = lb[:, cluster_ids]                            # (D,B)
        u = (mom["luma"][None] - lb_blk[..., None]) * (1.0 / 3.0)  # (D,B,16)
        minterm = _gray_axis_minterm(u)                        # (D,B,8)
        mt_ct = jax.ops.segment_sum(
            jnp.moveaxis(minterm, 0, 1).reshape(pixels.shape[0], d_ * 8),
            cluster_ids, num_segments=num_clusters)            # (C,D*8)
        errs = (q - su2 * (1.0 / 3.0)).T[:, :, None] \
            + 3.0 * mt_ct.reshape(num_clusters, d_, 8)         # (C,D,8)
        flat = errs.reshape(num_clusters, -1)                  # (C, D*8)
    # shortlist per cluster, then exact clipped rescore over member pixels
    k_re = min(16, d_ * 8)
    _, cand = jax.lax.top_k(-flat, k_re)                       # (C,K)
    c = jnp.arange(num_clusters)
    cand_d, cand_t = cand // 8, cand % 8
    if pallas_etc1s.use_pallas():
        c5k = jnp.clip(base5[:, None, :] + deltas[cand_d], 0, 31)  # (C,K,3)
        packed_c = (c5k[..., 0] | (c5k[..., 1] << 5)
                    | (c5k[..., 2] << 10) | (cand_t << 15))    # (C,K)
        pk_blocks = packed_c[cluster_ids]                      # (B,K) row gather
        berr = pallas_etc1s.palette_errs_packed(pixels, pk_blocks,
                                                perceptual=perceptual)
        cerr = jax.ops.segment_sum(berr, cluster_ids,
                                   num_segments=num_clusters)
        kbest = jnp.argmin(cerr, axis=-1)
        pk = packed_c[c, kbest]
        return (jnp.stack([pk & 31, (pk >> 5) & 31, (pk >> 10) & 31], -1),
                ((pk >> 15) & 7).astype(jnp.int32))
    cb8 = expand5(c5s[cand_d, c[:, None]]).astype(jnp.float32)  # (C,K,3)
    cpal = jnp.clip(cb8[:, :, None, :] + _INTEN[cand_t][..., None], 0.0, 255.0)  # (C,K,4,3)
    if perceptual:
        cpal = perceptual_transform(cpal)
        pixels = perceptual_transform(pixels)
    blk_pal = cpal[cluster_ids]                                # (B,K,4,3)
    berr = _palette_errs(pixels, blk_pal)                      # (B,K)
    cerr = jax.ops.segment_sum(berr, cluster_ids, num_segments=num_clusters)
    kbest = jnp.argmin(cerr, axis=-1)
    return (c5s[cand_d[c, kbest], c],
            cand_t[c, kbest].astype(jnp.int32))


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

    # raw-moment features computed ONCE: per round a single fused
    # segment-sum yields count/mean/covariance (cov = M2 - n·μμᵀ), and a
    # single gather of (axis, μ·axis) computes the split projections —
    # scatter/gather launches, not FLOPs, dominate this stage on TPU
    outer = (vecs[:, :, None] * vecs[:, None, :]).reshape(n, f * f)
    feats = jnp.concatenate([w[:, None], wv, outer * w[:, None]], -1)  # (N,1+F+F²)

    # all rounds run at the FINAL cluster count (empty high clusters are
    # harmless) so every round has identical shapes — the loop compiles to
    # ONE while-loop body instead of `rounds` unrolled copies, shrinking
    # the executable the serving transport has to handle per launch
    c_max = 1 << rounds

    def round_body(_r, assign):
        m = jax.ops.segment_sum(feats, assign, num_segments=c_max)
        cnt = m[:, 0]
        mean = m[:, 1:1 + f] / jnp.maximum(cnt, 1e-9)[:, None]
        m2 = m[:, 1 + f:].reshape(c_max, f, f)
        cov = m2 - cnt[:, None, None] * mean[:, :, None] * mean[:, None, :]
        v0 = jnp.ones((c_max, f), dtype=vecs.dtype)

        def power(v, _):
            v = jnp.einsum("cfg,cg->cf", cov, v)
            v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-9)
            return v, None

        axis, _ = jax.lax.scan(power, v0, None, length=4)
        thr = jnp.sum(mean * axis, -1)                          # (C,)
        ga = jnp.concatenate([axis, thr[:, None]], -1)[assign]  # (N,F+1)
        proj = jnp.sum(vecs * ga[:, :f], -1) - ga[:, f]
        return assign * 2 + (proj > 0).astype(jnp.int32)

    assign = jax.lax.fori_loop(0, rounds, round_body, assign)

    c = 1 << rounds
    m = jax.ops.segment_sum(feats[:, :1 + f], assign, num_segments=c)
    cnt = m[:, 0]
    mean = m[:, 1:] / jnp.maximum(cnt, 1e-9)[:, None]
    # keep the num_clusters most-populated leaves as k-means seeds
    top = jnp.argsort(-cnt)[:num_clusters]
    seeds = mean[top]
    # replace any empty seeds with random training vectors
    need = cnt[top] <= 0
    rnd = jax.random.choice(key, vecs, (num_clusters,))
    return jnp.where(need[:, None], rnd, seeds)


@functools.partial(jax.jit, static_argnames=("topk", "perceptual"))
def refine_endpoint_assignment(pixels, blk_vec6, cb_vec6, cb_color5, cb_inten,
                               topk: int = 8, perceptual: bool = False):
    """Reassign each block to its best endpoint cluster by exact block error.

    Device analog of refine_endpoint_clusterization (ocl_kernels.cl:1063):
    candidate shortlist by 6D codebook distance (MXU matmul + top-k), then
    exact ETC1S error over the shortlist, argmin.

    pixels (B,16,3) RGB, blk_vec6 (B,6), cb_vec6 (C,6) — the 6D vectors may
    live in any consistent space (the frontend passes perceptually
    transformed ones); the exact rescore honors `perceptual`.
    cb_color5 (C,3), cb_inten (C,). Returns (assignment (B,), err (B,)).
    """
    d6 = (jnp.sum(blk_vec6 * blk_vec6, -1, keepdims=True)
          - 2.0 * blk_vec6 @ cb_vec6.T
          + jnp.sum(cb_vec6 * cb_vec6, -1)[None, :])            # (B,C)
    # approx_min_k: TPU-native partial reduction — ~3x cheaper than the full
    # per-row sort of lax.top_k at C ~ thousands, and recall loss only
    # perturbs the shortlist tail (the exact rescore below picks the winner)
    _, cand = jax.lax.approx_min_k(d6, topk)                    # (B,K)

    from . import pallas_etc1s

    if pallas_etc1s.use_pallas():
        ptab = (cb_color5[:, 0] | (cb_color5[:, 1] << 5)
                | (cb_color5[:, 2] << 10) | (cb_inten << 15))   # (C,)
        err_k = pallas_etc1s.palette_errs_packed(
            pixels, ptab[cand], perceptual=perceptual)          # (B,K)
    else:
        base8 = expand5(cb_color5).astype(jnp.float32)          # (C,3)
        pal_all = jnp.clip(base8[:, None, :] + _INTEN[cb_inten][:, :, None], 0.0, 255.0)  # (C,4,3)
        if perceptual:
            pal_all = perceptual_transform(pal_all)
            pixels = perceptual_transform(pixels)
        pal = pal_all[cand]                                     # (B,K,4,3)
        err_k = _palette_errs(pixels, pal)                      # (B,K)
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
    from . import pallas_etc1s

    if pallas_etc1s.use_pallas():
        # fused matmul+argmin: the (B, S) error matrix never leaves VMEM
        return pallas_etc1s.find_best_selector_patterns(
            dists, patterns, num_patterns)
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
    sel_pat = patterns[sel_assign]                             # (B,16)
    lv, uv = jnp.maximum(left_idx, 0), jnp.maximum(up_idx, 0)

    # block error vs any endpoint's palette decomposes into a dot product of
    # per-block moments (grouped by the block's selector pattern) with a
    # per-endpoint feature (palette colors and their norms):
    #   err(e) = Σ|x|² - 2 Σ_k y_k·pal[e,k] + Σ_k m_k |pal[e,k]|²
    # with y_k = Σ_{i: s_i=k} x_i and m_k = |{i: s_i=k}|. This avoids the
    # (B,3,4,3) palette gather + take_along chain (slow scatter/gather on TPU).
    one = jax.nn.one_hot(sel_pat, 4, dtype=px.dtype)           # (B,16,4)
    y = jnp.einsum("bik,bic->bkc", one, px)                    # (B,4,3)
    m = jnp.sum(one, axis=1)                                   # (B,4)
    zfeat = jnp.concatenate([y.reshape(-1, 12), m], axis=-1)   # (B,16)
    efeat = jnp.concatenate(
        [-2.0 * cb_pal.reshape(-1, 12),
         jnp.sum(cb_pal * cb_pal, axis=-1)], axis=-1)          # (C,16)
    sx2 = jnp.sum(px * px, axis=(1, 2))                        # (B,)

    e_cand = jnp.stack([assign, assign[lv], assign[uv]], axis=1)   # (B,3)
    e_err = sx2[:, None] + jnp.einsum(
        "bf,bjf->bj", zfeat, efeat[e_cand])                    # (B,3)
    cur = e_err[:, 0]
    ok_l = (e_err[:, 1] <= cur * e_thresh) & (left_idx >= 0) & (cur > 0) \
        & (e_cand[:, 1] != assign)
    ok_u = (e_err[:, 2] <= cur * e_thresh) & (up_idx >= 0) & (cur > 0) \
        & (e_cand[:, 2] != assign)
    # both acceptable → take the lower-error neighbor
    pick_u = ok_u & (~ok_l | (e_err[:, 2] < e_err[:, 1]))
    pick_l = ok_l & ~pick_u
    assign = jnp.where(pick_l, e_cand[:, 1],
                       jnp.where(pick_u, e_cand[:, 2], assign))

    # selector candidates scored against the (possibly updated) endpoints
    dists = block_selector_distances(px, cb_pal[assign])       # (B,16,4)
    s_cand = jnp.stack([sel_assign, sel_assign[lv], sel_assign[uv]], axis=1)
    s_pat = patterns[s_cand]                                   # (B,3,16)
    # select dists[b,i,pat] via where-chain (take_along_axis on the minor
    # axis lowers to a pathologically slow gather on TPU)
    d0, d1, d2, d3 = (dists[:, None, :, k] for k in range(4))
    dsel = jnp.where(s_pat == 0, d0,
                     jnp.where(s_pat == 1, d1,
                               jnp.where(s_pat == 2, d2, d3)))
    s_err = jnp.sum(dsel, axis=-1)                             # (B,3)
    cur = s_err[:, 0]
    ok_l = (s_err[:, 1] <= cur * s_thresh) & (left_idx >= 0) & (cur > 0) \
        & (s_cand[:, 1] != sel_assign)
    ok_u = (s_err[:, 2] <= cur * s_thresh) & (up_idx >= 0) & (cur > 0) \
        & (s_cand[:, 2] != sel_assign)
    pick_u = ok_u & (~ok_l | (s_err[:, 2] < s_err[:, 1]))
    pick_l = ok_l & ~pick_u
    sel_assign = jnp.where(pick_l, s_cand[:, 1],
                           jnp.where(pick_u, s_cand[:, 2], sel_assign))
    return assign.astype(jnp.int32), sel_assign.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_patterns",))
def update_selector_patterns(dists, assign, num_patterns: int):
    """Recompute each selector cluster's optimal pattern.

    For cluster s and pixel position i: argmin_k Σ_{b∈s} d[b,i,k]
    (segment-sum over members, independent per position)."""
    sums = jax.ops.segment_sum(dists, assign, num_segments=num_patterns)  # (S,16,4)
    return jnp.argmin(sums, axis=-1).astype(jnp.int32)
