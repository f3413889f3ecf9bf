"""stegotpu — TPU-native secure video steganography (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the reference project
``erc-a/Secure-Video-Steganography-using-ECC-and-DCT`` (QIM parity embedding in
8x8 DCT blocks of video luma, with P-256 ECDH + HKDF-SHA256 + AES-256-GCM +
SHA3-256), wire-format compatible with the reference's payload layout
(reference: embed_process.py:60-82, extract_process.py:89-188) but with the
compute path redesigned TPU-first:

- the per-frame scalar DCT/QIM loop (reference: config_and_setup.py:106-174)
  becomes a batched, fused device kernel (``stegotpu.ops``): on TPU, a
  Pallas kernel that transforms only the payload-slot coefficient rows and
  applies QIM as a sparse delta in one HBM pass; portably, a blockify ->
  64x64 Kronecker DCT matmul formulation on the MXU;
- frame-axis data parallelism scales over a ``jax.sharding.Mesh``, and
  across hosts via ``jax.distributed`` with per-host frame-range segments
  (``stegotpu.parallel``);
- crypto and payload framing stay host-side (``stegotpu.crypto``,
  ``stegotpu.payload``);
- PSNR/SSIM/BER run as jitted on-device reductions (``stegotpu.metrics``).
"""

__version__ = "0.5.0"

from stegotpu.config import StegoConfig  # noqa: F401
from stegotpu.pipeline import (  # noqa: F401
    embed_data_in_video,
    embed_image_in_video,
    extract_image_from_video,
)
