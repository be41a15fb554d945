"""Batch + multi-chip example: compress a directory of same-sized textures.

  python examples/batch_mesh.py /root/reference/test_files

Uses compress_batch (async per-image device programs; host entropy coding
overlaps device compute). On a multi-chip host, compress_batch_sharded
shards the texture batch over a jax.sharding.Mesh instead — same bytes,
N-way data parallel.
"""

import pathlib
import sys
import time

import numpy as np
from PIL import Image

import jax

from basis_universal_tpu import compressor


def main():
    d = pathlib.Path(sys.argv[1] if len(sys.argv) > 1
                     else "/root/reference/test_files")
    imgs = []
    for p in sorted(d.glob("kodim*.png"))[:8]:
        a = np.asarray(Image.open(p).convert("RGB"))
        if a.shape[:2] != (512, 768):
            a = np.ascontiguousarray(np.transpose(a, (1, 0, 2)))
        imgs.append(a)
    print(f"{len(imgs)} textures, {jax.device_count()} device(s)")

    params = compressor.CompressorParams(quality_level=128, effort=1)
    outs = compressor.compress_batch(imgs, params)   # warm-up + compile
    t0 = time.time()
    outs = compressor.compress_batch(imgs, params)
    dt = time.time() - t0
    mpix = sum(i.shape[0] * i.shape[1] for i in imgs) / 1e6
    print(f"{mpix:.2f} Mpix in {dt * 1e3:.0f} ms = {mpix / dt:.2f} Mpix/s")
    for p, out in zip(sorted(d.glob("kodim*.png"))[:8], outs):
        print(f"  {p.name}: {len(out.basis_data)} B")

    if jax.device_count() > 1:
        from basis_universal_tpu.parallel import mesh as pmesh

        sharded = pmesh.compress_batch_sharded(imgs, params)
        assert all(a.basis_data == b.basis_data
                   for a, b in zip(outs, sharded))
        print("mesh-sharded outputs byte-identical")


if __name__ == "__main__":
    main()
