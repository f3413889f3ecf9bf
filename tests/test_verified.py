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


def test_verified_fast_path_equivalence(rng):
    """embed_frames_verified_fast (Pallas fused roundtrip + conditional
    repair) must return residual=0 and a BER-0 stego on a clean cover, and
    take the repair branch (residual counted, bits recovered) on a
    saturated one — same guarantees as the XLA path it wraps."""
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import extract_frames_pallas
    from stegotpu.ops.verified import embed_frames_verified_fast

    h, w, num_ac = 64, 128, 10
    cap = (h // 8) * (w // 8) * num_ac
    payload = rng.integers(0, 2, (2, cap), dtype=np.uint8)
    total = jnp.int32(2 * cap)

    # clean mid-range cover: fast branch, residual 0, bits recovered
    frames = rng.integers(60, 196, (2, h, w), dtype=np.uint8)
    stego, bpf, residual = embed_frames_verified_fast(
        frames, payload, total, jnp.float32(20.0), num_ac, kernel="pallas")
    assert int(residual) == 0
    got = np.asarray(
        extract_frames_pallas(stego, jnp.float32(20.0), num_ac))
    np.testing.assert_array_equal(got, payload)

    # flat-black cover: plain embed loses bits; verified-fast must repair
    black = np.zeros((2, h, w), dtype=np.uint8)
    stego_b, _, residual_b = embed_frames_verified_fast(
        black, payload, total, jnp.float32(20.0), num_ac, kernel="pallas")
    assert int(residual_b) == 0  # DC-shift repair fixes flat blocks
    got_b = np.asarray(
        extract_frames_pallas(stego_b, jnp.float32(20.0), num_ac))
    np.testing.assert_array_equal(got_b, payload)


def test_verified_fast_falls_back_off_pallas_shapes(rng):
    """W % 128 != 0 routes to the XLA implementation transparently."""
    import jax.numpy as jnp

    from stegotpu.ops.qim import extract_frames
    from stegotpu.ops.verified import embed_frames_verified_fast

    h, w, num_ac = 64, 96, 10
    cap = (h // 8) * (w // 8) * num_ac
    payload = rng.integers(0, 2, (2, cap), dtype=np.uint8)
    frames = rng.integers(60, 196, (2, h, w), dtype=np.uint8)
    stego, _, residual = embed_frames_verified_fast(
        frames, payload, jnp.int32(2 * cap), jnp.float32(20.0), num_ac)
    assert int(residual) == 0
    got = np.asarray(extract_frames(stego, jnp.float32(20.0), num_ac))
    np.testing.assert_array_equal(got, payload)
