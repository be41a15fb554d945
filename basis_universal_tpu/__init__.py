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

from .formats.constants import (  # noqa: F401
    BasisTexFormat,
    BasisTextureType,
    TranscoderTextureFormat,
)
