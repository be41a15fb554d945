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


def batched_frontend_kernels(mesh: Mesh):
    """vmapped-over-textures frontend kernels, sharded on the texture axis.

    Each returned fn maps (N, ...) arrays with N sharded across the mesh.
    """
    axis = mesh.axis_names[0]

    def shard(spec_rank):
        return NamedSharding(mesh, P(axis, *([None] * spec_rank)))

    encode = jax.jit(
        jax.vmap(lambda px: ops.encode_blocks(px, radius=1)),
        in_shardings=shard(2),
    )

    def _cluster(px, vec6, seeds, num_clusters):
        w = jnp.ones(vec6.shape[0], dtype=jnp.float32)
        cents, assign = ops.kmeans(vec6, w, seeds, num_clusters, iters=3)
        return cents, assign

    return encode, _cluster
