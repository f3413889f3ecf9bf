"""BGR->gray must be bit-exact vs cv2's fixed-point BT.601 path, and the
GRAY2BGR replication round-trip must be lossless."""

import cv2
import numpy as np
import jax.numpy as jnp

from stegotpu.ops.color import bgr_to_gray, bgr_to_gray_np, gray_to_bgr_np


def test_gray_matches_cv2_exactly(rng):
    frame = rng.integers(0, 256, (64, 80, 3), dtype=np.uint8)
    expected = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
    np.testing.assert_array_equal(bgr_to_gray_np(frame), expected)
    np.testing.assert_array_equal(np.asarray(bgr_to_gray(jnp.asarray(frame))), expected)


def test_gray_matches_cv2_exhaustive_extremes():
    # every value along each channel axis with others at extremes
    v = np.arange(256, dtype=np.uint8)
    for fill in (0, 255):
        frame = np.full((3, 256, 3), fill, np.uint8)
        for ch in range(3):
            frame[ch, :, ch] = v
        expected = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
        np.testing.assert_array_equal(bgr_to_gray_np(frame), expected)


def test_replicated_roundtrip_is_identity(rng):
    """gray -> GRAY2BGR -> BGR2GRAY must be the identity (the stego write
    path relies on this; reference: embed_process.py:126)."""
    gray = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    bgr = gray_to_bgr_np(gray)
    np.testing.assert_array_equal(bgr_to_gray_np(bgr), gray)
    np.testing.assert_array_equal(
        cv2.cvtColor(cv2.cvtColor(gray, cv2.COLOR_GRAY2BGR), cv2.COLOR_BGR2GRAY), gray
    )
