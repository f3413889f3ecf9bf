"""Fused single-pass Pallas round trip: identical results to the two-pass
embed->extract sequence."""

import jax.numpy as jnp
import numpy as np

from stegotpu.ops.pallas_kernel import (
    embed_and_extract_frames_pallas,
    embed_and_extract_frames_pallas_fused,
    embed_and_extract_frames_pallas_twokernel,
    embed_frames_pallas,
    extract_frames_pallas,
)

DELTA = 20
N_AC = 10


def test_fused_roundtrip_matches_two_pass(rng):
    frames = rng.integers(0, 256, (2, 48, 128), dtype=np.uint8)
    cap = (48 // 8) * (128 // 8) * N_AC
    total = 2 * cap - 9
    payload = np.zeros((2, cap), np.uint8)
    payload.reshape(-1)[:total] = rng.integers(0, 2, total)
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA), N_AC)

    stego_f, bpf_f, ex_f = embed_and_extract_frames_pallas_fused(*args)
    stego_2, bpf_2 = embed_frames_pallas(*args)
    ex_2 = extract_frames_pallas(stego_2, jnp.float32(DELTA), N_AC)
    for variant in (embed_and_extract_frames_pallas,
                    embed_and_extract_frames_pallas_twokernel):
        stego_c, bpf_c, ex_c = variant(*args)
        np.testing.assert_array_equal(np.asarray(stego_c), np.asarray(stego_2))
        np.testing.assert_array_equal(np.asarray(ex_c), np.asarray(ex_2))

    np.testing.assert_array_equal(np.asarray(stego_f), np.asarray(stego_2))
    np.testing.assert_array_equal(np.asarray(bpf_f), np.asarray(bpf_2))
    np.testing.assert_array_equal(np.asarray(ex_f), np.asarray(ex_2))
    # and the payload actually round-trips
    np.testing.assert_array_equal(
        np.asarray(ex_f).reshape(-1)[:total], payload.reshape(-1)[:total]
    )
