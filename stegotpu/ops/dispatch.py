"""Kernel variant dispatch: select the embed/extract implementation.

Variants (all semantically identical, tested against each other):

- 'xla'    — ops/qim.py: blockify + one (nb, 64) @ (64, 64) Kronecker matmul.
             Fastest measured on TPU v5e (benchmarks/ab_kernels.py); default.
- 'pallas' — ops/pallas_kernel.py: fused single-HBM-pass stripe kernel.
             Requires W % 128 == 0; falls back to 'xla' otherwise.
- 'auto'   — currently 'xla'.
"""

from __future__ import annotations

from stegotpu.ops import pallas_kernel, qim


def _pallas_ok(w: int, h: int) -> bool:
    return w % 128 == 0 and h % 8 == 0


def embed_fn(kernel: str, h: int, w: int):
    if kernel == "pallas" and _pallas_ok(w, h):
        return pallas_kernel.embed_frames_pallas
    return qim.embed_frames


def extract_fn(kernel: str, h: int, w: int):
    if kernel == "pallas" and _pallas_ok(w, h):
        return pallas_kernel.extract_frames_pallas
    return qim.extract_frames
