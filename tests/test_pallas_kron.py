"""Pallas v2 (in-kernel blockify + dense Kronecker) vs the XLA baseline."""

import jax.numpy as jnp
import numpy as np
import pytest

from stegotpu.ops.experimental.pallas_kron import (
    embed_and_extract_frames_kron,
    embed_frames_kron,
    extract_frames_kron,
)
from stegotpu.ops.qim import embed_frames, extract_frames

DELTA = 20
N_AC = 10


def _stego_flip_budget() -> float:
    """Allowed fraction of pixels differing by >1 between kernel variants.

    Borderline round(c/delta) flips the lattice choice; the directional
    adjust still lands the right parity, so both embeds decode identically
    (asserted separately). On CPU the two f32 paths agree closely; on TPU
    the MXU's f32 (bf16x3) vs Mosaic arithmetic flips more rounds.
    """
    import jax

    return 0.01 if jax.default_backend() == "cpu" else 0.2



def _inputs(rng, b=2, h=48, w=128, frac=1.0):
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    total = int(b * cap * frac)
    payload = np.zeros(b * cap, np.uint8)
    payload[:total] = rng.integers(0, 2, total)
    return frames, payload.reshape(b, cap), total, cap


@pytest.mark.parametrize("frac", [1.0, 0.35, 0.0])
def test_kron_embed_matches_baseline(rng, frac):
    frames, payload, total, cap = _inputs(rng, frac=frac)
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA), N_AC)
    stego_b, bpf_b = embed_frames(*args)
    stego_k, bpf_k = embed_frames_kron(*args)
    np.testing.assert_array_equal(np.asarray(bpf_b), np.asarray(bpf_k))
    diff = np.abs(np.asarray(stego_b).astype(int) - np.asarray(stego_k).astype(int))
    assert (diff > 1).mean() < _stego_flip_budget()  # lattice-choice flips on borderline rounds
    ex = np.asarray(extract_frames(stego_k, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(
        ex.reshape(-1)[:total], payload.reshape(-1)[:total]
    )


def test_kron_extract_matches_baseline(rng):
    frames, payload, total, cap = _inputs(rng)
    stego, _ = embed_frames(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    ex_b = np.asarray(extract_frames(stego, jnp.float32(DELTA), N_AC))
    ex_k = np.asarray(extract_frames_kron(stego, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex_b, ex_k)


def test_kron_roundtrip_multi_stripe(rng):
    frames, payload, total, cap = _inputs(rng, b=1, h=240, w=384, frac=0.9)
    stego, bpf, ex = embed_and_extract_frames_kron(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    assert int(np.asarray(bpf).sum()) == total
    np.testing.assert_array_equal(
        np.asarray(ex).reshape(-1)[:total], payload.reshape(-1)[:total]
    )
    # untouched tail blocks pass through
    nb = (240 // 8) * (384 // 8)
    entered = -(-total // N_AC)
    first_clean_row = 8 * (-(-entered // (384 // 8)))
    np.testing.assert_array_equal(
        np.asarray(stego)[0, first_clean_row:], frames[0, first_clean_row:]
    )
