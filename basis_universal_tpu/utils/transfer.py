"""Host->device transfer helpers tuned for the TPU tunnel transport.

The runtime's host->device path is fast for small buffers (inlined in the
command stream) but falls off a cliff for large ones (measured on the
serving tunnel: 128 KB uploads at ~0.2 ms, one 512 KB upload at ~40 ms).
Large arrays are therefore shipped as a sequence of sub-cliff chunks and
reassembled on-device with a free concatenate.
"""

import numpy as np

import jax
import jax.numpy as jnp

# Stay well under the transport's slow-path threshold (measured ~448 KB).
_CHUNK_BYTES = 256 * 1024


def device_put_chunked(arr, chunk_bytes: int = _CHUNK_BYTES):
    """device_put that splits large arrays into fast sub-threshold uploads.

    Returns a device array with the same shape/dtype as `arr`.
    """
    # Measured on the serving tunnel: after transport warm-up, a plain
    # device_put sustains ~1 GB/s for MB-size buffers, while splitting into
    # chunks costs a concatenate *program execution* whose fixed overhead
    # dwarfs the transfer. Chunking is therefore disabled; the helper remains
    # the single switch point if a future transport regresses.
    return jax.device_put(np.asarray(arr))
