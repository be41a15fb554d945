"""basis_universal_tpu — a TPU-native (JAX/XLA/Pallas) GPU-texture
supercompression framework with the capabilities of Basis Universal.

Architecture (TPU-first, not a port):
  - Per-block encode searches, VQ clustering, and transcode block conversion
    run as batched JAX/Pallas ops on device (MXU matmuls + VPU elementwise).
  - Irreducibly-serial entropy coding (canonical Huffman, MTF history, VLC)
    runs on host (numpy-vectorized encode; C++ extension for hot decode).
  - File containers (.basis, .KTX2) are host-side format contracts that match
    the reference bitstream spec byte-for-byte (see docstring citations of
    /root/reference files for the behavior each module reproduces).
"""

__version__ = "0.1.0"

# Persistent XLA compilation cache: device programs are keyed by shape, and
# fresh processes would otherwise pay full (remote) compiles per program.
import os as _os

if _os.environ.get("BASISU_TPU_DISABLE_COMPILE_CACHE") != "1":
    try:
        import jax as _jax

        _cache_dir = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "basisu_tpu", "xla"))
        _os.makedirs(_cache_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - cache is best-effort
        pass

from .formats.constants import (  # noqa: F401
    BasisTexFormat,
    BasisTextureType,
    TranscoderTextureFormat,
)
