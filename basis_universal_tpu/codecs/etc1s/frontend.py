"""ETC1S frontend: global endpoint/selector codebook generation on TPU.

TPU-native re-design of basisu_frontend (encoder/basisu_frontend.cpp:159-316):
the hierarchical VQ + iterative refinement pipeline becomes a SINGLE jitted
device program (see ops/etc1s_encode.py for the kernels) — bisecting k-means
init, Lloyd iterations as distance matmuls on the MXU, per-cluster endpoint
optimization as a dense candidate scan with segment-sums, selector-codebook
init as a device sort/segment-count/top-k, selector search as one-hot
matmuls. Exactly one device→host transfer per image (sync latency over the
TPU tunnel dominates otherwise); host work is only small-array bookkeeping
(dedup, index remapping).
"""

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...ops import etc1s_encode as ops
from ...ops.etc1 import ETC1_INTEN_TABLES
from ...utils.transfer import device_put_chunked


@dataclasses.dataclass
class FrontendParams:
    max_endpoint_clusters: int = 512
    max_selector_clusters: int = 512
    # effort 0-10 scales candidate radii and refinement iterations
    # (the reference's etc1s_compression_level 0-6 plays the same role)
    effort: int = 3
    # luma-weighted error metric in every device scan (the reference's
    # default, color_distance(perceptual, ...) throughout basisu_frontend.cpp)
    perceptual: bool = True
    # neighbor-copy RDO thresholds (1.0 disables)
    endpoint_rdo_thresh: float = 1.0
    selector_rdo_thresh: float = 1.0


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
    # one refine pass costs <=0.02 dB vs two on the parity grid at effort 1
    # while saving ~25% of device time; higher efforts keep the ladder
    refine_iters = 1 if effort <= 1 else (2 if effort <= 2 else 3)
    sel_iters = 2 + min(effort, 4)
    # exact-reassign shortlist width: the 6D codebook distance misranks
    # saturated blocks, and the parity grid shows +0.1 dB from 4 -> 16
    topk = 16 if effort <= 5 else 32
    return radius, kmeans_iters, refine_iters, sel_iters, topk


def _palette_jnp(color5, inten):
    base8 = ops.expand5(color5).astype(jnp.float32)
    inten_tab = jnp.asarray(ETC1_INTEN_TABLES, dtype=jnp.float32)
    return jnp.clip(base8[:, None, :] + inten_tab[inten][:, :, None], 0, 255)


def _init_selector_patterns(opt_sel, num_s: int):
    """Device-side 'most frequent optimal patterns' init: pack each block's
    16 selector values into an int32 key, sort, run-length count, top-k."""
    b = opt_sel.shape[0]
    shifts = jnp.arange(16, dtype=jnp.int32) * 2
    packed = jnp.sum(opt_sel.astype(jnp.int32) << shifts[None, :], axis=1)
    skeys = jnp.sort(packed)
    is_new = jnp.concatenate(
        [jnp.ones(1, dtype=jnp.int32),
         (skeys[1:] != skeys[:-1]).astype(jnp.int32)])
    group = jnp.cumsum(is_new) - 1                           # (B,)
    counts = jax.ops.segment_sum(jnp.ones(b, jnp.int32), group, num_segments=b)
    values = jax.ops.segment_max(skeys, group, num_segments=b)
    _, top = jax.lax.top_k(counts, num_s)
    keys = values[top]                                       # (S,)
    pats = (keys[:, None] >> shifts[None, :]) & 3            # (S,16)
    return pats.astype(jnp.int32)


def _frontend_impl(px, seed, left_idx, up_idx, e_thresh, s_thresh, *,
                   num_e: int, num_s: int, radius: int,
                   kmeans_iters: int, refine_iters: int, sel_iters: int,
                   topk: int, rdo: bool, raw_image: bool = False,
                   init_sub: int = 1, perceptual: bool = False):
    """The full device pipeline: returns (assign, color5, inten, patterns,
    sel_assign) — everything the host needs for dedup + entropy coding.

    perceptual: all error metrics (candidate scans, clusterization,
    selector search, RDO) use the reference's luma-weighted color distance
    via ops.perceptual_transform — quantization stays in RGB space."""
    # callers ship either (B,16,3) blocks or, with raw_image, the padded
    # (H,W,3) uint8 image (3x smaller upload over the tunnel); block
    # extraction is a free device-side reshape/transpose
    if raw_image:
        h, w, _ = px.shape
        px = px.reshape(h // 4, 4, w // 4, 4, 3).transpose(0, 2, 1, 3, 4)
        px = px.reshape(-1, 16, 3)
    px = px.astype(jnp.float32)
    nblocks = px.shape[0]
    key = jax.random.PRNGKey(seed)

    def to_metric(x):
        return ops.perceptual_transform(x) if perceptual else x

    px_m = to_metric(px)

    init = ops.encode_blocks(px, radius=radius, perceptual=perceptual)
    # 6D clustering vectors stay RGB: the reference clusters in plain RGB
    # space (init_endpoint_training_vectors, basisu_frontend.cpp:825-866) and
    # applies the perceptual metric only in the exact error scans — k-means
    # in the luma-weighted space collapses chroma resolution (−2 dB RGB on
    # kodim23, A/B'd) because the Cb axis weight is 3/128 of luma's.
    vec6 = jnp.concatenate([init["low"], init["high"]], axis=-1) * (1.0 / 255.0)
    weights = jnp.ones(nblocks, dtype=jnp.float32)

    # bisecting init only needs REPRESENTATIVE seeds: run it on a strided
    # subsample (its per-round segment-sum over (N, 1+F+F²) features is
    # ~17% of the whole frontend at full N); the full-N k-means +
    # exact-rescore refinement below consumes every block
    seeds = ops.bisecting_init(vec6[::init_sub], weights[::init_sub],
                               num_e, key)
    _, assign = ops.kmeans(vec6, weights, seeds, num_e, iters=kmeans_iters)

    # refine + selector loops as lax.fori_loop: one body in the executable
    # instead of an unrolled copy per iteration (the serving transport's
    # per-launch cost scales with executable size)
    def refine_body(_i, carry):
        assign, _c5, _it = carry
        cnt = jax.ops.segment_sum(jnp.ones(nblocks), assign,
                                  num_segments=num_e)
        mean_px = jax.ops.segment_sum(jnp.mean(px, axis=1), assign,
                                      num_segments=num_e)
        cluster_means = mean_px / jnp.maximum(cnt, 1.0)[:, None]
        color5, inten = ops.optimize_cluster_endpoints(
            px, assign, cluster_means, num_e, radius=radius,
            perceptual=perceptual)
        cb_pal = _palette_jnp(color5, inten)                 # (C,4,3)
        cb_vec6 = jnp.concatenate(
            [cb_pal[:, 0, :], cb_pal[:, 3, :]], -1) * (1.0 / 255.0)
        assign, _ = ops.refine_endpoint_assignment(
            px, vec6, cb_vec6, color5, inten, topk=topk,
            perceptual=perceptual)
        return assign, color5, inten

    assign, color5, inten = jax.lax.fori_loop(
        0, refine_iters, refine_body,
        (assign, jnp.zeros((num_e, 3), jnp.int32),
         jnp.zeros((num_e,), jnp.int32)))
    cb_pal = _palette_jnp(color5, inten)
    cb_pal_m = to_metric(cb_pal)

    final_pal = cb_pal_m[assign]
    dists = ops.block_selector_distances(px_m, final_pal)    # (B,16,4)
    opt_sel = jnp.argmin(dists, axis=-1).astype(jnp.int32)

    patterns = _init_selector_patterns(opt_sel, num_s)

    def sel_body(_i, patterns):
        sel_assign, _ = ops.find_best_selector_patterns(dists, patterns,
                                                        num_s)
        return ops.update_selector_patterns(dists, sel_assign, num_s)

    patterns = jax.lax.fori_loop(0, sel_iters, sel_body, patterns)
    sel_assign, _ = ops.find_best_selector_patterns(dists, patterns, num_s)

    if rdo:
        assign, sel_assign = ops.rdo_neighbor_copy(
            px_m, assign, sel_assign, cb_pal_m, patterns,
            left_idx, up_idx, e_thresh, s_thresh)
    # pack everything into ONE densely bit-packed int32 array: a single
    # device->host transfer, and as few bytes as possible (the tunnel's
    # bandwidth, not its RTT, dominates the fetch cost):
    #   per block:    assign (<=2^16) | sel_assign << 16
    #   per endpoint: r5 | g5<<5 | b5<<10 | inten<<15
    #   per pattern:  16 x 2-bit selectors
    shifts2 = jnp.arange(16, dtype=jnp.int32) * 2
    packed = jnp.concatenate([
        assign.astype(jnp.int32) | (sel_assign.astype(jnp.int32) << 16),
        color5[:, 0].astype(jnp.int32)
        | (color5[:, 1].astype(jnp.int32) << 5)
        | (color5[:, 2].astype(jnp.int32) << 10)
        | (inten.astype(jnp.int32) << 15),
        jnp.sum(patterns.astype(jnp.int32) << shifts2[None, :], axis=1),
    ])
    return packed


@functools.lru_cache(maxsize=64)
def _jitted_single(**knobs):
    return jax.jit(functools.partial(_frontend_impl, **knobs))


@functools.lru_cache(maxsize=64)
def _jitted_fused(**knobs):
    """N same-shaped images in ONE device program.

    `lax.map` runs the per-image pipeline sequentially inside a single
    executable: the VMEM/HBM working set stays that of one image, but the
    whole group costs one launch round-trip over the serving tunnel instead
    of N (measured ~30 ms per executed program on the tunnel). Outputs are
    returned as N separate per-image buffers — each ~120 KB, under the
    transport's large-fetch cliff (see utils/transfer.py) — so the host can
    fetch them concurrently.
    """
    impl = functools.partial(_frontend_impl, **knobs)

    def fused(px_stack, seeds, left, up, e_t, s_t):
        out = jax.lax.map(
            lambda xs: impl(xs[0], xs[1], left, up, e_t, s_t),
            (px_stack, seeds))
        return tuple(out[i] for i in range(out.shape[0]))

    return jax.jit(fused)


def _knobs_and_neighbors(pixels_shape_b: int, params: FrontendParams,
                         neighbors):
    radius, kmeans_iters, refine_iters, sel_iters, topk = _effort_knobs(params.effort)
    num_e = int(min(params.max_endpoint_clusters, pixels_shape_b))
    num_s = int(min(params.max_selector_clusters, pixels_shape_b))
    # wide codebooks (q>=~230) need a wider exact-reassign shortlist: the
    # 6D pre-rank's recall drops as clusters densify (parity grid: +0.05 dB
    # at q255 from 16 -> 64; q<=128 keeps the narrow list and its program)
    if num_e > 4096:
        topk = max(topk, min(64, num_e // 128))
    topk = min(topk, num_e)
    rdo = (neighbors is not None
           and (params.endpoint_rdo_thresh > 1.0
                or params.selector_rdo_thresh > 1.0))
    if neighbors is None:
        left = np.full(pixels_shape_b, -1, dtype=np.int32)
        up = left
    else:
        left, up = neighbors
    # effort-1 iteration trim, gated on codebook density: with a SPARSE
    # codebook (blocks >> clusters) one fewer Lloyd/selector round costs
    # <=0.1 dB at ~3% smaller files (A/B on kodim03/18/23 q128/q50 e1);
    # dense codebooks (q>=~230) need the full ladder — the same trim sent
    # kodim01 q255 e1 past the 0.3 dB parity gate.
    if params.effort <= 1 and pixels_shape_b >= 4 * num_e:
        kmeans_iters = min(kmeans_iters, 2)
        sel_iters = min(sel_iters, 2)
    # bisecting init always runs on all blocks: A/B on kodim03 q128 e1
    # showed strided subsampling (2x/4x) lands k-means in a worse optimum
    # (-0.08/-0.15 dB) that extra Lloyd/refine rounds do NOT recover, and
    # steady-state wall time was unchanged — the init is launch-bound, not
    # FLOP-bound, once fused into the single frontend program
    init_sub = 1
    knobs = dict(num_e=num_e, num_s=num_s, radius=radius,
                 kmeans_iters=kmeans_iters, refine_iters=refine_iters,
                 sel_iters=sel_iters, topk=topk, rdo=rdo,
                 init_sub=init_sub, perceptual=bool(params.perceptual))
    return knobs, jnp.asarray(left), jnp.asarray(up)


def _unpack_result(packed: np.ndarray, nblocks: int, num_e: int, num_s: int):
    p = 0
    both = packed[p:p + nblocks]; p += nblocks
    assign = both & 0xFFFF
    sel = (both >> 16) & 0xFFFF
    ep = packed[p:p + num_e]; p += num_e
    color5 = np.stack([ep & 31, (ep >> 5) & 31, (ep >> 10) & 31], axis=-1)
    inten = (ep >> 15) & 7
    pw = packed[p:p + num_s]; p += num_s
    patterns = (pw[:, None] >> (np.arange(16, dtype=np.int32) * 2)) & 3
    return assign, color5, inten, patterns, sel


@functools.partial(jax.jit, static_argnames=("topk", "num_s", "perceptual"))
def _assign_global(px, cb_color5, cb_inten, patterns, topk: int, num_s: int,
                   perceptual: bool = False):
    """Global-codebooks mode: no training — one nearest-neighbor assignment
    pass against fixed codebooks (SURVEY.md §A.4: 'pure matmul+argmin';
    init_global_codebooks, basisu_frontend.cpp:318-553)."""
    def to_metric(x):
        return ops.perceptual_transform(x) if perceptual else x

    enc = ops.encode_blocks(px, radius=0, perceptual=perceptual)
    # 6D pre-rank stays RGB (see _frontend_impl); the exact rescore and
    # selector search below honor the perceptual metric.
    vec6 = jnp.concatenate([enc["low"], enc["high"]], -1) * (1.0 / 255.0)
    cb_pal = _palette_jnp(cb_color5, cb_inten)
    cb_pal_m = to_metric(cb_pal)
    cb_vec6 = jnp.concatenate(
        [cb_pal[:, 0, :], cb_pal[:, 3, :]], -1) * (1.0 / 255.0)
    assign, _ = ops.refine_endpoint_assignment(
        px, vec6, cb_vec6, cb_color5, cb_inten, topk=topk,
        perceptual=perceptual)
    dists = ops.block_selector_distances(to_metric(px), cb_pal_m[assign])
    sel_assign, _ = ops.find_best_selector_patterns(dists, patterns, num_s)
    return assign, sel_assign


def compress_with_global_codebooks(pixels: np.ndarray, color5, inten5,
                                   selectors, effort: int = 1,
                                   perceptual: bool = True) -> FrontendOutput:
    """Assign blocks to externally provided (shared) codebooks."""
    topk = 8 if effort <= 5 else 16
    assign, sel = jax.device_get(_assign_global(
        jnp.asarray(pixels, dtype=jnp.float32),
        jnp.asarray(np.asarray(color5, dtype=np.int32)),
        jnp.asarray(np.asarray(inten5, dtype=np.int32)),
        jnp.asarray(np.asarray(selectors, dtype=np.int32)),
        topk, int(np.asarray(selectors).shape[0]), bool(perceptual)))
    return FrontendOutput(
        endpoint_color5=np.asarray(color5, dtype=np.uint8),
        endpoint_inten5=np.asarray(inten5, dtype=np.uint8),
        selectors=np.asarray(selectors, dtype=np.uint8),
        block_endpoints=assign.astype(np.int32),
        block_selectors=sel.astype(np.int32),
    )


def compress(pixels: np.ndarray, params: FrontendParams, seed: int = 0,
             neighbors=None) -> FrontendOutput:
    """pixels: (B, 16, 3) float32 RGB in [0,255] (one entry per 4x4 block).
    neighbors: optional (left_idx, up_idx) flat int32 arrays for RDO."""
    assert pixels.ndim == 3 and pixels.shape[1:] == (16, 3)
    knobs, left, up = _knobs_and_neighbors(pixels.shape[0], params, neighbors)
    out = _jitted_single(**knobs)(
        device_put_chunked(np.asarray(pixels, dtype=np.uint8)
                           if np.asarray(pixels).dtype == np.uint8
                           else np.asarray(pixels, dtype=np.float32)),
        seed, left, up,
        float(params.endpoint_rdo_thresh), float(params.selector_rdo_thresh))
    # single host sync for the whole pipeline
    got = _unpack_result(jax.device_get(out), pixels.shape[0],
                         knobs["num_e"], knobs["num_s"])
    return _host_finalize(*got, knobs["num_e"], knobs["num_s"])


def compress_batch(pixels: np.ndarray, params: FrontendParams,
                   seed: int = 0, neighbors=None):
    """Batched frontend over N same-shaped images: pixels (N, B, 16, 3).

    TPU analog of basis_parallel_compress (encoder/basisu_comp.cpp:5466):
    all N device programs are dispatched asynchronously up front (JAX
    dispatch is non-blocking), so the chip runs back-to-back while the host
    overlaps finalize/entropy work for earlier images with device compute of
    later ones. Returns a list of N FrontendOutput.

    (A single vmapped megaprogram was measured slower: the (N,B,C) distance
    and top-k intermediates blow past VMEM and thrash HBM.)
    """
    return list(compress_batch_iter(pixels, params, seed, neighbors))


@functools.lru_cache(maxsize=32)
def _jitted_scan(**knobs):
    """K same-shaped images in ONE device program via lax.scan.

    The per-image pipeline runs sequentially inside a single executable:
    VMEM/HBM working set stays that of ONE image (a vmapped megaprogram
    thrashes HBM — measured), while the whole chunk costs one dispatch and,
    critically, ONE device→host fetch round trip over the serving tunnel
    (each separate fetch of a computed buffer costs a ~35 ms round trip;
    measured: 16 per-image programs 442 ms compute + 582 ms fetch vs
    fused-16 scan 342 ms compute + 100 ms fetch)."""
    impl = functools.partial(_frontend_impl, **knobs)

    def fused(px_stack, seeds, lefts, ups, e_t, s_t):
        def body(carry, xs):
            px, seed, left, up = xs
            return carry, impl(px, seed, left, up, e_t, s_t)
        _, outs = jax.lax.scan(body, 0, (px_stack, seeds, lefts, ups))
        return outs                                   # (K, P) int32

    return jax.jit(fused)


# Chunk size: big enough to amortize the per-chunk fetch round trip and to
# push the stacked upload over the transport's fast-DMA threshold, small
# enough that the first chunk's host entropy work starts early (it overlaps
# the later chunks' device compute).
_SCAN_CHUNK = 8


def compress_batch_iter(pixels, params: FrontendParams,
                        seed: int = 0, neighbors=None):
    """Generator form of compress_batch: yields FrontendOutput per image.

    pixels: (N, B, 16, 3) array OR a list of N per-image payloads (block
    arrays or raw padded images). neighbors: optional list of per-image
    (left_idx, up_idx) arrays (or one shared pair).

    Images are grouped into chunks of _SCAN_CHUNK and each chunk runs as ONE
    scan-fused device program (see _jitted_scan): one stacked upload (large
    puts ride the transport's fast DMA path; 16 separate ~1.2 MB puts are
    ~17x slower than one stacked 19 MB put), one launch, one stacked fetch.
    All chunks are dispatched up front (JAX dispatch is non-blocking), so
    chunk k's fetch + the caller's host entropy coding overlap chunk k+1's
    device compute."""
    n = len(pixels)
    raw = pixels[0].ndim == 3 and pixels[0].shape[1:] != (16, 3)
    if raw:
        nblocks = (pixels[0].shape[0] // 4) * (pixels[0].shape[1] // 4)
    else:
        nblocks = pixels[0].shape[0]
    if neighbors is not None and isinstance(neighbors, tuple):
        neighbors = [neighbors] * n
    knobs, left0, up0 = _knobs_and_neighbors(
        nblocks, params, neighbors[0] if neighbors else None)

    e_t = float(params.endpoint_rdo_thresh)
    s_t = float(params.selector_rdo_thresh)

    if n == 1:
        fn = _jitted_single(raw_image=raw, **knobs)
        out = fn(device_put_chunked(np.asarray(pixels[0])),
                 seed, left0, up0, e_t, s_t)
        got = _unpack_result(np.asarray(jax.device_get(out)), nblocks,
                             knobs["num_e"], knobs["num_s"])
        yield _host_finalize(*got, knobs["num_e"], knobs["num_s"])
        return

    fn = _jitted_scan(raw_image=raw, **knobs)
    l0_np, u0_np = (np.asarray(left0), np.asarray(up0))

    def _nbr_np(i):
        return neighbors[i] if neighbors else (l0_np, u0_np)

    # dispatch every chunk's upload + program up front; fetch lazily
    chunks = []
    for c0 in range(0, n, _SCAN_CHUNK):
        c1 = min(c0 + _SCAN_CHUNK, n)
        px_stack = jax.device_put(
            np.stack([np.asarray(pixels[i]) for i in range(c0, c1)]))
        seeds = jax.device_put(
            np.arange(seed + c0, seed + c1, dtype=np.int32))
        lefts = jax.device_put(np.stack([_nbr_np(i)[0] for i in range(c0, c1)]))
        ups = jax.device_put(np.stack([_nbr_np(i)[1] for i in range(c0, c1)]))
        chunks.append(fn(px_stack, seeds, lefts, ups, e_t, s_t))

    for out in chunks:
        host = np.asarray(jax.device_get(out))        # (K, P)
        for row in host:
            got = _unpack_result(row, nblocks, knobs["num_e"], knobs["num_s"])
            yield _host_finalize(*got, knobs["num_e"], knobs["num_s"])


def _host_finalize(assign_np, color5_np, inten_np, pat_np, sel_np,
                   num_e: int, num_s: int) -> FrontendOutput:
    """Drop empty clusters, dedup identical entries, remap block indices."""
    pat_np = pat_np.astype(np.uint8)

    used = np.zeros(num_e, dtype=bool)
    used[np.unique(assign_np)] = True
    packed = (color5_np[:, 0].astype(np.int64) << 16) \
        | (color5_np[:, 1].astype(np.int64) << 11) \
        | (color5_np[:, 2].astype(np.int64) << 6) | inten_np.astype(np.int64)
    packed[~used] = -1
    uniq, remap_to_uniq = np.unique(packed, return_inverse=True)
    keep = uniq >= 0
    new_index = np.full(uniq.shape, -1, dtype=np.int64)
    new_index[keep] = np.arange(keep.sum())
    block_endpoints = new_index[remap_to_uniq[assign_np]].astype(np.int32)
    assert (block_endpoints >= 0).all()
    kept_vals = uniq[keep]
    e_color5 = np.zeros((int(keep.sum()), 3), dtype=np.uint8)
    e_color5[:, 0] = (kept_vals >> 16) & 31
    e_color5[:, 1] = (kept_vals >> 11) & 31
    e_color5[:, 2] = (kept_vals >> 6) & 31
    e_inten = (kept_vals & 7).astype(np.uint8)

    used_s = np.zeros(num_s, dtype=bool)
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
