"""Verified-embed tests: repairs clipping losses the plain embed cannot."""

import jax.numpy as jnp
import numpy as np
import pytest

from stegotpu.ops.qim import embed_frames, extract_frames
from stegotpu.ops.verified import embed_frames_verified

DELTA = 20
N_AC = 10


def _roundtrip_errors(stego, payload, total):
    ex = np.asarray(extract_frames(stego, jnp.float32(DELTA), N_AC)).reshape(-1)[:total]
    return int(np.sum(ex != payload.reshape(-1)[:total]))


def test_verified_matches_plain_when_no_clipping(rng):
    frames = rng.integers(60, 196, (2, 32, 64), dtype=np.uint8)  # mid-range
    cap = (32 // 8) * (64 // 8) * N_AC
    total = 2 * cap
    payload = rng.integers(0, 2, (2, cap)).astype(np.uint8)
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA), N_AC)
    stego_p, bpf_p = embed_frames(*args)
    stego_v, bpf_v, residual = embed_frames_verified(*args)
    assert int(residual) == 0
    np.testing.assert_array_equal(np.asarray(bpf_p), np.asarray(bpf_v))
    # with no clipping, no repairs trigger: outputs identical
    np.testing.assert_array_equal(np.asarray(stego_p), np.asarray(stego_v))


def test_verified_repairs_saturated_cover(rng):
    """Near-black cover: the plain embed demonstrably loses bits; the
    verified embed recovers BER=0 while staying standard-QIM-decodable."""
    frames = rng.integers(0, 12, (1, 32, 64), dtype=np.uint8)  # near-black
    cap = (32 // 8) * (64 // 8) * N_AC
    total = cap
    payload = rng.integers(0, 2, (1, cap)).astype(np.uint8)
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA), N_AC)
    stego_p, _ = embed_frames(*args)
    plain_errors = _roundtrip_errors(stego_p, payload, total)
    assert plain_errors > 0, "test premise: plain embed must lose bits here"

    stego_v, _, residual = embed_frames_verified(*args, repair_rounds=4)
    assert int(residual) == 0
    # a completely standard extractor recovers the payload
    assert _roundtrip_errors(stego_v, payload, total) == 0


def test_verified_partial_payload(rng):
    frames = rng.integers(0, 256, (2, 32, 64), dtype=np.uint8)
    cap = (32 // 8) * (64 // 8) * N_AC
    total = cap + 7
    payload = np.zeros((2, cap), np.uint8)
    payload.reshape(-1)[:total] = rng.integers(0, 2, total)
    stego, bpf, residual = embed_frames_verified(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    assert int(residual) == 0
    assert list(np.asarray(bpf)) == [cap, 7]
    assert _roundtrip_errors(stego, payload, total) == 0
    # untouched blocks pass through exactly
    np.testing.assert_array_equal(np.asarray(stego)[1, 8:], frames[1, 8:])
