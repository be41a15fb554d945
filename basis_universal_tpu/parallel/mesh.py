"""Multi-chip parallelism: texture-batch sharding over a device mesh.

The reference's scaling story is basis_parallel_compress() — one CPU job per
texture (encoder/basisu_comp.cpp:5466). The TPU-native analog shards a batch
of same-shaped textures across chips over ICI: per-texture codebook state is
independent, so the mesh axis is pure data parallelism over the texture axis;
within a chip, blocks of one texture fill the MXU. Cross-chip collectives
only appear if a single texture's blocks are ever sharded (psum reductions in
k-means accumulation), which the dry-run path also exercises.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import etc1s_encode as ops


def texture_batch_mesh(devices=None, axis: str = "textures") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_blocks_frontend_step(mesh: Mesh, num_clusters: int):
    """One ETC1S frontend iteration with a SINGLE texture's blocks sharded
    across the mesh (block-parallel): per-block encode + k-means assignment
    + codebook (centroid) update. The centroid accumulation is a cross-chip
    reduction — XLA inserts psum/all-reduce over ICI from the sharding
    annotations alone.

    Returns a jitted fn(blocks (B,16,3) f32) -> (centroids, assignment).
    """
    axis = mesh.axis_names[0]
    block_sharding = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(block_sharding,),
        out_shardings=(repl, block_sharding),
    )
    def step(blocks):
        enc = ops.encode_blocks(blocks, radius=1)
        vec6 = jnp.concatenate([enc["low"], enc["high"]], -1) * (1.0 / 255.0)
        w = jnp.ones(vec6.shape[0], dtype=jnp.float32)
        seeds = vec6[: num_clusters]
        centroids, assign = ops.kmeans(vec6, w, seeds, num_clusters, iters=2)
        return centroids, assign

    return step


@functools.lru_cache(maxsize=8)
def _sharded_frontend(mesh: Mesh, **knobs):
    """The FULL per-texture frontend device program, vmapped over the
    texture axis and sharded across the mesh (one texture per chip at
    N == mesh size; pure data parallelism, no collectives — each chip
    trains its own codebooks)."""
    from ..codecs.etc1s import frontend as F

    axis = mesh.axis_names[0]
    tex = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    impl = functools.partial(F._frontend_impl, **knobs)
    return jax.jit(
        jax.vmap(impl, in_axes=(0, 0, None, None, None, None)),
        in_shardings=(tex, tex, repl, repl, None, None),
        out_shardings=tex)


def compress_batch_sharded(images, params, mesh: Mesh):
    """compress_batch over a device mesh: the texture batch is sharded on
    the mesh axis, each chip runs the full frontend for its textures, and
    the host assembles entropy streams per image. Output is byte-identical
    to the single-device compress_batch (same device program per texture).
    """
    from .. import compressor as C
    from ..codecs.etc1s import frontend as F

    per_image = [C._prepare_slices([img], params) for img in images]
    shapes = {tuple((s["num_blocks_x"] * s["num_blocks_y"], s["alpha"])
                    for s in sl) for sl in per_image}
    if len(shapes) != 1:
        raise ValueError("sharded batch requires uniform image shapes")
    total_blocks = sum(s["blocks"].shape[0] for s in per_image[0])
    fp = C._frontend_params(params, total_blocks)
    nbrs = [C._slice_neighbors(sl) for sl in per_image]
    knobs, left0, up0 = F._knobs_and_neighbors(total_blocks, fp, nbrs[0])

    batch = np.stack([
        np.concatenate([s["blocks"] for s in sl], axis=0)
        for sl in per_image])                                # (N,B,16,3)
    seeds = jnp.asarray(
        np.arange(params.seed, params.seed + len(images), dtype=np.int32))

    fn = _sharded_frontend(mesh, **knobs)
    packed = np.asarray(jax.device_get(fn(
        jnp.asarray(batch), seeds, left0, up0,
        float(fp.endpoint_rdo_thresh),
        float(fp.selector_rdo_thresh))))

    outs = []
    for i, sl in enumerate(per_image):
        got = F._unpack_result(packed[i], total_blocks,
                               knobs["num_e"], knobs["num_s"])
        fe = F._host_finalize(*got, knobs["num_e"], knobs["num_s"])
        outs.append(C._assemble(sl, fe, params))
    return outs
