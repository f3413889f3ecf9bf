"""Color conversion matching OpenCV's fixed-point BT.601 BGR->gray exactly.

The reference converts each frame with ``cv2.cvtColor(BGR2GRAY)``
(reference: config_and_setup.py:112). OpenCV's 8-bit path is fixed point
(15-bit in OpenCV 5.x, verified bit-exact against cv2 in tests/test_color.py):

    gray = (R*9798 + G*19235 + B*3735 + 2^14) >> 15

The three coefficients sum to 2^15, so a GRAY2BGR-replicated frame converts
back to exactly the same gray values — the property the stego round-trip
relies on (reference: embed_process.py:126 writes the gray stego replicated
to 3 channels). This module reproduces the integer arithmetic bit-exactly,
host-side (numpy) and device-side (jnp), so the pure-device batched path
needs no cv2 in the loop.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

_R, _G, _B = 9798, 19235, 3735  # cv2 fixed-point BT.601 weights, sum = 1 << 15
_HALF = 1 << 14
_SHIFT = 15


def bgr_to_gray_np(frames_bgr: np.ndarray) -> np.ndarray:
    """(..., H, W, 3) uint8 BGR -> (..., H, W) uint8 gray, cv2-bit-exact."""
    f = frames_bgr.astype(np.int32)
    acc = f[..., 0] * _B + f[..., 1] * _G + f[..., 2] * _R + _HALF
    return (acc >> _SHIFT).astype(np.uint8)


def bgr_to_gray(frames_bgr: jnp.ndarray) -> jnp.ndarray:
    """Device-side variant of bgr_to_gray_np (same integer arithmetic)."""
    f = frames_bgr.astype(jnp.int32)
    acc = f[..., 0] * _B + f[..., 1] * _G + f[..., 2] * _R + _HALF
    return jnp.right_shift(acc, _SHIFT).astype(jnp.uint8)


def gray_to_bgr_np(frames_gray: np.ndarray) -> np.ndarray:
    """(..., H, W) uint8 -> (..., H, W, 3) replicated channels (GRAY2BGR)."""
    return np.repeat(frames_gray[..., None], 3, axis=-1)
