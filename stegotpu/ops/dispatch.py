"""Kernel variant dispatch: select the embed/extract implementation.

Variants (all semantically identical, tested against each other):

- 'pallas' — ops/pallas_kernel.py: fused single-HBM-pass stripe kernel,
             f32-faithful stacked-bf16 DCT (15.1k fps 1080p roundtrip at
             batch 512, BENCH_r04). Requires a compiled-Pallas backend
             (TPU); non-128-multiple widths run via in-wrapper lane
             padding (pallas_kernel._lane_pad).
- 'xla'    — ops/qim.py: blockify + one (nb, 64) @ (64, 64) Kronecker
             matmul at Precision.HIGHEST; works everywhere.
- 'auto'   — pallas on TPU when the shape allows, xla otherwise (Pallas on
             CPU runs interpreted, which is only for tests).
"""

from __future__ import annotations

from stegotpu.ops import pallas_kernel, qim


def _pallas_ok(w: int, h: int) -> bool:
    # any 8x8-blockable frame (the pipeline's crop guarantees this); widths
    # off the 128-lane grid are zero-padded inside the pallas wrappers
    return w % 8 == 0 and h % 8 == 0 and w > 0 and h > 0


def _pallas_compiled_backend() -> bool:
    import jax

    # Mosaic-TPU kernels lower only on TPU; 'auto' must stay on the portable
    # XLA kernel for any other backend (CPU runs Pallas interpreted — tests
    # only; GPU/metal would fail to lower entirely)
    return jax.default_backend() == "tpu"


def _use_pallas(kernel: str, h: int, w: int) -> bool:
    if not _pallas_ok(w, h):
        return False
    if kernel == "pallas":
        return True
    return kernel == "auto" and _pallas_compiled_backend()


def embed_fn(kernel: str, h: int, w: int, precision: str = "wire"):
    if _use_pallas(kernel, h, w):
        if precision == "fast":
            import functools

            return functools.partial(pallas_kernel.embed_frames_pallas,
                                     precision="fast")
        return pallas_kernel.embed_frames_pallas
    # the XLA kernel stays at Precision.HIGHEST in both modes: it is the
    # oracle baseline and the non-TPU fallback (f32 exact on CPU anyway)
    return qim.embed_frames


def extract_fn(kernel: str, h: int, w: int, precision: str = "wire"):
    if _use_pallas(kernel, h, w):
        if precision == "fast":
            import functools

            return functools.partial(pallas_kernel.extract_frames_pallas,
                                     precision="fast")
        return pallas_kernel.extract_frames_pallas
    return qim.extract_frames


def extract_packed_fn(kernel: str, h: int, w: int, precision: str = "wire"):
    """Packed-compact-rows extract for the streaming pipeline's fast path,
    or None when the XLA kernel is in use (it has no packed layout).

    The returned fn(frames, delta, num_ac) ships ~5x fewer readback bytes
    than the wire-order bit plane and skips the device-side full-capacity
    unpack entirely; pair with pallas_kernel.packed_rows_to_bits_host."""
    if not _use_pallas(kernel, h, w):
        return None
    import functools

    return functools.partial(pallas_kernel.extract_frames_pallas_packed,
                             precision=precision)
