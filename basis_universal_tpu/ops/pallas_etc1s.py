"""Pallas TPU kernels for the ETC1S frontend hot path.

The frontend's three "exact rescore" stages (per-block candidate rescore in
encode_blocks, endpoint-cluster reassignment, per-cluster endpoint
optimization — the reference's etc1_optimizer / refine_endpoint_clusterization
loops, encoder/basisu_etc.cpp + bin/ocl_kernels.cl:1013-1090) all reduce to
one primitive: the exact gamut-clipped ETC1S error of every block against a
small per-block set of candidate palettes,

    err[b, k] = sum_i min_sel || x[b,i] - pal[b,k,sel] ||^2 .

XLA's broadcast formulation materializes (B, K, 4, 16, 3)-shaped temporaries
whose minor axes (3 or 4 wide) land on the 128-lane dimension — a ~30-40x
physical padding blowup in HBM. This kernel keeps the block axis on lanes,
every operand a (sublane, lane) tile in VMEM, and the k/sel loops fully
unrolled: one pass, no HBM temporaries.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 2048  # blocks per grid step


def _errs_kernel(pix_ref, pal_ref, out_ref, *, n_cand: int):
    """pix_ref: (48, T) f32 — rows [ch*16 + i]; pal_ref: (K*12, T) f32 —
    rows [((k*4 + sel)*3) + ch]; out_ref: (K, T) f32 exact errors."""
    r = pix_ref[0:16, :]
    g = pix_ref[16:32, :]
    b = pix_ref[32:48, :]
    for k in range(n_cand):
        acc = None
        for sel in range(4):
            o = (k * 4 + sel) * 3
            dr = r - pal_ref[o, :][None, :]
            dg = g - pal_ref[o + 1, :][None, :]
            db = b - pal_ref[o + 2, :][None, :]
            dist = dr * dr + dg * dg + db * db            # (16,T)
            acc = dist if acc is None else jnp.minimum(acc, dist)
        out_ref[k, :] = jnp.sum(acc, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def palette_errs(pixels, palettes, interpret: bool = False):
    """Exact clipped ETC1S candidate errors.

    pixels: (B, 16, 3) f32 in [0,255]; palettes: (B, K, 4, 3) f32.
    Returns err (B, K) f32 with err[b,k] = sum_i min_sel |x_bi - pal_bks|^2.
    """
    b_n, k_n = palettes.shape[0], palettes.shape[1]
    bp = -(-b_n // _LANES) * _LANES
    pix_t = pixels.astype(jnp.float32).transpose(2, 1, 0).reshape(48, b_n)
    pal_t = palettes.astype(jnp.float32).transpose(1, 2, 3, 0).reshape(k_n * 12, b_n)
    if bp != b_n:
        pix_t = jnp.pad(pix_t, ((0, 0), (0, bp - b_n)))
        pal_t = jnp.pad(pal_t, ((0, 0), (0, bp - b_n)))
    err = pl.pallas_call(
        functools.partial(_errs_kernel, n_cand=k_n),
        grid=(bp // _LANES,),
        in_specs=[
            pl.BlockSpec((48, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_n * 12, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_n, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_n, bp), jnp.float32),
        interpret=interpret,
    )(pix_t, pal_t)
    return err[:, :b_n].T


def use_pallas() -> bool:
    """Pallas kernels run on real TPU backends only (tests force CPU)."""
    return jax.default_backend() == "tpu"


def _perc_rows():
    """Baked perceptual-transform rows (see etc1s_encode.PERC_P): dist =
    ||P d||² equals the reference's luma-weighted color_distance."""
    from .etc1s_encode import PERC_P

    return tuple(tuple(float(v) for v in row) for row in PERC_P)


def _rescore_kernel(pix_ref, pk_ref, out_ref, *, n_cand: int, tabs,
                    perceptual: bool = False):
    """Exact clipped rescore from PACKED candidate descriptors.

    pk_ref: (K, T) i32, each value r5 | g5<<5 | b5<<10 | inten<<15. The
    palette is reconstructed in VMEM (expand5 + intensity-table select
    against baked scalar constants), so the kernel's HBM traffic is the
    (K, T) i32 descriptor tile instead of the (K*12, T) f32 palettes the
    plain palette_errs variant ships — the (B, K, 4, 3) palette gather the
    XLA path materializes (the frontend's hottest fusion) disappears."""
    r = pix_ref[0:16, :]
    g = pix_ref[16:32, :]
    b = pix_ref[32:48, :]
    for k in range(n_cand):
        v = pk_ref[k, :][None, :]
        r5 = (v & 31).astype(jnp.float32)
        g5 = ((v >> 5) & 31).astype(jnp.float32)
        b5 = ((v >> 10) & 31).astype(jnp.float32)
        tt = ((v >> 15) & 7).astype(jnp.float32)
        b8r = r5 * 8.0 + jnp.floor(r5 * 0.25)
        b8g = g5 * 8.0 + jnp.floor(g5 * 0.25)
        b8b = b5 * 8.0 + jnp.floor(b5 * 0.25)
        acc = None
        for sel in range(4):
            tsel = jnp.full_like(tt, tabs[7][sel])
            for t in range(6, -1, -1):
                tsel = jnp.where(tt == float(t), tabs[t][sel], tsel)
            pr = jnp.clip(b8r + tsel, 0.0, 255.0)
            pg = jnp.clip(b8g + tsel, 0.0, 255.0)
            pb = jnp.clip(b8b + tsel, 0.0, 255.0)
            dr = r - pr
            dg = g - pg
            db = b - pb
            if perceptual:
                p = _perc_rows()
                d0 = p[0][0] * dr + p[0][1] * dg + p[0][2] * db
                d1 = p[1][0] * dr + p[1][1] * dg + p[1][2] * db
                d2 = p[2][0] * dr + p[2][1] * dg + p[2][2] * db
                dist = d0 * d0 + d1 * d1 + d2 * d2        # (16,T)
            else:
                dist = dr * dr + dg * dg + db * db        # (16,T)
            acc = dist if acc is None else jnp.minimum(acc, dist)
        out_ref[k, :] = jnp.sum(acc, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret", "perceptual"))
def palette_errs_packed(pixels, packed, interpret: bool = False,
                        perceptual: bool = False):
    """Exact clipped ETC1S candidate errors from packed descriptors.

    pixels: (B, 16, 3) f32 RGB in [0,255]; packed: (B, K) i32 with
    r5 | g5<<5 | b5<<10 | inten<<15 per candidate. Returns (B, K) f32.
    perceptual: score with the luma-weighted metric (palette construction
    and gamut clip stay in RGB; only the distance is transformed)."""
    from .etc1 import ETC1_INTEN_TABLES

    b_n, k_n = packed.shape
    bp = -(-b_n // _LANES) * _LANES
    pix_t = pixels.astype(jnp.float32).transpose(2, 1, 0).reshape(48, b_n)
    pk_t = packed.astype(jnp.int32).T
    if bp != b_n:
        pix_t = jnp.pad(pix_t, ((0, 0), (0, bp - b_n)))
        pk_t = jnp.pad(pk_t, ((0, 0), (0, bp - b_n)))
    tabs = tuple(tuple(float(v) for v in row) for row in ETC1_INTEN_TABLES)
    err = pl.pallas_call(
        functools.partial(_rescore_kernel, n_cand=k_n, tabs=tabs,
                          perceptual=perceptual),
        grid=(bp // _LANES,),
        in_specs=[
            pl.BlockSpec((48, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_n, _LANES), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k_n, _LANES), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_n, bp), jnp.float32),
        interpret=interpret,
    )(pix_t, pk_t)
    return err[:, :b_n].T


def _selbest_kernel(d_ref, p_ref, best_ref, val_ref, *, n_pat: int,
                    s_chunk: int):
    """Fused (T,64)@(64,s_chunk) matmul + running argmin over the pattern
    axis of the grid.

    The XLA formulation materializes the full (B, S) error matrix in HBM
    (~270 MB at kodim scale) just to argmin it; here each (T, s_chunk) tile
    lives only in VMEM. The pattern axis is the FASTEST grid dimension, so
    the (1, T) best/val output tile is revisited sequentially and carries
    the running argmin (resident-table variants OOM scoped VMEM once the
    selector codebook reaches q255 scale, ~16K patterns)."""
    ci = pl.program_id(1)
    d = d_ref[...].astype(jnp.bfloat16)
    err = jax.lax.dot_general(
        d, p_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (T, s_chunk)
    col = jax.lax.broadcasted_iota(jnp.int32, err.shape, 1) + ci * s_chunk
    err = jnp.where(col < n_pat, err, jnp.inf)
    cmin = jnp.min(err, axis=1)
    carg = jnp.argmin(err, axis=1).astype(jnp.int32) + ci * s_chunk

    @pl.when(ci == 0)
    def _init():
        best_ref[0, :] = carg
        val_ref[0, :] = cmin

    @pl.when(ci > 0)
    def _accum():
        take = cmin < val_ref[0, :]
        best_ref[0, :] = jnp.where(take, carg, best_ref[0, :])
        val_ref[0, :] = jnp.where(take, cmin, val_ref[0, :])


@functools.partial(jax.jit, static_argnames=("num_patterns", "interpret"))
def find_best_selector_patterns(dists, patterns, num_patterns: int,
                                interpret: bool = False):
    """Pallas analog of etc1s_encode.find_best_selector_patterns: per-block
    best codebook selector pattern without materializing the (B, S) error
    matrix. Returns (best (B,) i32, min_err (B,) f32)."""
    b_n = dists.shape[0]
    t = 1024
    s_chunk = 512
    s_pad = -(-num_patterns // s_chunk) * s_chunk
    bp = -(-b_n // t) * t
    d_flat = dists.reshape(b_n, 64).astype(jnp.float32)
    if bp != b_n:
        d_flat = jnp.pad(d_flat, ((0, bp - b_n), (0, 0)))
    one = jax.nn.one_hot(patterns, 4, dtype=jnp.bfloat16)
    p_flat = one.reshape(num_patterns, 64)
    if s_pad != num_patterns:
        p_flat = jnp.pad(p_flat, ((0, s_pad - num_patterns), (0, 0)))
    best, val = pl.pallas_call(
        functools.partial(_selbest_kernel, n_pat=num_patterns,
                          s_chunk=s_chunk),
        grid=(bp // t, s_pad // s_chunk),
        in_specs=[
            pl.BlockSpec((t, 64), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s_chunk, 64), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, bp), jnp.int32),
            jax.ShapeDtypeStruct((1, bp), jnp.float32),
        ],
        interpret=interpret,
    )(d_flat, p_flat)
    return best[0, :b_n], val[0, :b_n]


def _fscan_kernel(deltas_ref, mids_ref, tabs_ref, pix_ref, base_ref, err_ref,
                  *, n_deltas: int, external_base: bool,
                  perceptual: bool = False):
    """Factorized candidate scan, one delta per fori step, all 8 intensity
    tables vectorized on sublanes.

    Computes the unclipped error decomposition (etc1s_encode._scan_block_errs)
        err = q - su2/3 + 3 * sum_i min_k (t_k - u_i)^2
    entirely in VMEM. deltas_ref: (D,3) i32 SMEM; pix_ref: (48,T) f32;
    err_ref: (D*8, T) f32. mids (8,3) / tabs (8,4) are baked numpy consts.

    perceptual: channels are transformed through P at entry (base colors
    likewise per candidate); PERC_P is scaled so P@(1,1,1) = (√3,0,0), so
    the gray-axis projection is √3·channel0 and the 1/3 and 3.0 constants
    (= 1/|g|² and |g|²) hold for both metrics.
    """
    r = pix_ref[0:16, :]
    g = pix_ref[16:32, :]
    b = pix_ref[32:48, :]
    sr = jnp.sum(r, 0, keepdims=True)
    sg = jnp.sum(g, 0, keepdims=True)
    sb = jnp.sum(b, 0, keepdims=True)
    if perceptual:
        p = _perc_rows()
        sq3 = float(np.sqrt(3.0))
        x0 = p[0][0] * r + p[0][1] * g + p[0][2] * b     # (16,T) luma axis
        x1 = p[1][0] * r + p[1][1] * g + p[1][2] * b
        x2 = p[2][0] * r + p[2][1] * g + p[2][2] * b
        luma = sq3 * x0
    else:
        x0, x1, x2 = r, g, b
        luma = r + g + b                                 # (16,T)
    sum_l = jnp.sum(luma, 0, keepdims=True)              # (1,T)
    sum_l2 = jnp.sum(luma * luma, 0, keepdims=True)
    s0 = jnp.sum(x0, 0, keepdims=True)
    s1 = jnp.sum(x1, 0, keepdims=True)
    s2 = jnp.sum(x2, 0, keepdims=True)
    sum_x2 = jnp.sum(x0 * x0 + x1 * x1 + x2 * x2, 0, keepdims=True)
    if external_base:
        b5r = base_ref[0:1, :]
        b5g = base_ref[1:2, :]
        b5b = base_ref[2:3, :]
    else:
        s = 31.0 / 255.0
        b5r = jnp.clip(jnp.round(sr / 16.0 * s), 0.0, 31.0)
        b5g = jnp.clip(jnp.round(sg / 16.0 * s), 0.0, 31.0)
        b5b = jnp.clip(jnp.round(sb / 16.0 * s), 0.0, 31.0)

    m0 = mids_ref[:, 0:1]
    m1 = mids_ref[:, 1:2]
    m2 = mids_ref[:, 2:3]
    t0 = tabs_ref[:, 0:1]
    t1 = tabs_ref[:, 1:2]
    t2 = tabs_ref[:, 2:3]
    t3 = tabs_ref[:, 3:4]

    def d_body(d, _):
        c5r = jnp.clip(b5r + deltas_ref[d, 0].astype(jnp.float32), 0.0, 31.0)
        c5g = jnp.clip(b5g + deltas_ref[d, 1].astype(jnp.float32), 0.0, 31.0)
        c5b = jnp.clip(b5b + deltas_ref[d, 2].astype(jnp.float32), 0.0, 31.0)
        b8r = c5r * 8.0 + jnp.floor(c5r * 0.25)
        b8g = c5g * 8.0 + jnp.floor(c5g * 0.25)
        b8b = c5b * 8.0 + jnp.floor(c5b * 0.25)
        if perceptual:
            p = _perc_rows()
            e0 = p[0][0] * b8r + p[0][1] * b8g + p[0][2] * b8b
            e1 = p[1][0] * b8r + p[1][1] * b8g + p[1][2] * b8b
            e2 = p[2][0] * b8r + p[2][1] * b8g + p[2][2] * b8b
            lb = float(np.sqrt(3.0)) * e0                # (1,T)
        else:
            e0, e1, e2 = b8r, b8g, b8b
            lb = b8r + b8g + b8b                         # (1,T)
        q = (sum_x2 - 2.0 * (e0 * s0 + e1 * s1 + e2 * s2)
             + 16.0 * (e0 * e0 + e1 * e1 + e2 * e2))
        su2 = sum_l2 - 2.0 * lb * sum_l + 16.0 * lb * lb
        const = q - su2 * (1.0 / 3.0)                    # (1,T)

        acc = jnp.zeros((8, luma.shape[1]), jnp.float32)
        for i in range(16):
            u = (luma[i:i + 1, :] - lb) * (1.0 / 3.0)    # (1,T)
            k = ((u > m0).astype(jnp.float32) + (u > m1) + (u > m2))  # (8,T)
            tk = jnp.where(k == 0.0, t0,
                           jnp.where(k == 1.0, t1,
                                     jnp.where(k == 2.0, t2, t3)))
            dv = tk - u
            acc = acc + dv * dv
        err_ref[pl.ds(d * 8, 8), :] = const + 3.0 * acc
        return 0

    jax.lax.fori_loop(0, n_deltas, d_body, 0)


@functools.partial(jax.jit, static_argnames=("radius", "interpret",
                                              "perceptual"))
def factorized_scan(pixels, base5=None, radius: int = 1,
                    interpret: bool = False, perceptual: bool = False):
    """Unclipped factorized candidate errors, (B, D*8) — the Pallas analog
    of etc1s_encode._scan_block_errs whose XLA broadcast chain materializes
    lane-padded (D,B,8,16) temporaries. Feeds the existing top-k shortlist +
    exact clipped rescore (palette_errs).

    base5: optional (B,3) per-block 5-bit base colors (cluster-endpoint
    optimization gathers each block's CLUSTER base here; per-cluster errors
    are then a segment-sum of the per-block rows — q/su2 are linear in the
    block moments, so the decomposition is exact)."""
    from .etc1 import ETC1_INTEN_TABLES
    from .etc1s_encode import _candidate_deltas

    deltas_np = _candidate_deltas(radius)
    n_deltas = int(deltas_np.shape[0])
    mids = (ETC1_INTEN_TABLES[:, :-1] + ETC1_INTEN_TABLES[:, 1:]) / 2.0
    b_n = pixels.shape[0]
    # radius 2 emits a (1000, T) error tile: shrink T to stay inside VMEM
    tile = _LANES if n_deltas * 8 <= 256 else 512
    bp = -(-b_n // tile) * tile
    pix_t = pixels.astype(jnp.float32).transpose(2, 1, 0).reshape(48, b_n)
    external = base5 is not None
    base_t = (base5.astype(jnp.float32).T if external
              else jnp.zeros((3, b_n), jnp.float32))
    if bp != b_n:
        pix_t = jnp.pad(pix_t, ((0, 0), (0, bp - b_n)))
        base_t = jnp.pad(base_t, ((0, 0), (0, bp - b_n)))
    err = pl.pallas_call(
        functools.partial(_fscan_kernel, n_deltas=n_deltas,
                          external_base=external, perceptual=perceptual),
        grid=(bp // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, 3), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 4), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((48, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_deltas * 8, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_deltas * 8, bp), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(deltas_np),
      jnp.asarray(mids, jnp.float32),
      jnp.asarray(ETC1_INTEN_TABLES, jnp.float32),
      pix_t, base_t)
    return err[:, :b_n].T                                # (B, D*8)
