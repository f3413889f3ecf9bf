"""Golden tests: the fused device kernel vs an independent scalar scipy
oracle of the reference semantics (tests/reference_model.py).

The oracle computes the DCT with scipy's FFT path in float32, the kernel with
a 64x64 matmul in float32 — float-identical outputs are not guaranteed, so
assertions are behavioral: extracted bits at lattice points are equal, stego
pixels match within 1 LSB, and the kernel's own embed->extract loop is BER=0.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.fftpack import dct as sdct

from stegotpu.bitstream import bits_to_string, pad_bits, string_to_bits
from stegotpu.ops.dct import blockify, dct_matrix, kron_dct_matrix, unblockify
from stegotpu.ops.qim import embed_frames, extract_frames
from tests.reference_model import embed_frame_oracle, extract_frame_oracle

DELTA = 20
N_AC = 10


def test_dct_matrix_matches_scipy(rng):
    x = rng.standard_normal((8, 8)).astype(np.float64)
    m = dct_matrix(8, np.float64)
    ours = m @ x @ m.T
    scipy_dct = sdct(sdct(x, axis=0, norm="ortho"), axis=1, norm="ortho")
    np.testing.assert_allclose(ours, scipy_dct, atol=1e-12)


def test_kron_matches_separable(rng):
    x = rng.standard_normal((8, 8)).astype(np.float64)
    m = dct_matrix(8, np.float64)
    k = kron_dct_matrix(8, np.float64)
    np.testing.assert_allclose(k @ x.flatten(), (m @ x @ m.T).flatten(), atol=1e-12)


def test_kron_orthonormal():
    k = kron_dct_matrix(8, np.float64)
    np.testing.assert_allclose(k.T @ k, np.eye(64), atol=1e-12)


def test_blockify_order_matches_reference_loops(rng):
    """Row-major block order + row-major in-block flatten (SURVEY §2.4)."""
    frame = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    blocks = blockify(frame)
    assert blocks.shape == (2 * 3, 64)
    # block index b = (r//8) * (W//8) + (c//8); in-block flatten row-major
    for b, (r, c) in enumerate([(r, c) for r in range(0, 16, 8) for c in range(0, 24, 8)]):
        np.testing.assert_array_equal(
            blocks[b], frame[r : r + 8, c : c + 8].flatten()
        )
    np.testing.assert_array_equal(unblockify(blocks, 16, 24), frame)


def _run_embed(frames_u8, payload_str, delta=DELTA, n_ac=N_AC):
    b, h, w = frames_u8.shape
    cap = (h // 8) * (w // 8) * n_ac
    bits = pad_bits(string_to_bits(payload_str), b * cap).reshape(b, cap)
    stego, bpf = embed_frames(
        jnp.asarray(frames_u8), jnp.asarray(bits),
        jnp.int32(len(payload_str)), jnp.float32(delta), n_ac,
    )
    return np.asarray(stego), np.asarray(bpf)


def test_embed_full_frame_matches_oracle(rng):
    frame = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    cap = (24 // 8) * (32 // 8) * N_AC
    payload = "".join(rng.integers(0, 2, cap).astype(str))
    oracle_stego, oracle_n = embed_frame_oracle(frame, payload, DELTA, N_AC)
    stego, bpf = _run_embed(frame[None], payload)
    assert bpf[0] == oracle_n == cap
    diff = np.abs(stego[0].astype(int) - oracle_stego.astype(int))
    # float32 FFT-vs-matmul divergence across the truncating uint8 cast: <=1 LSB
    # (the cast amplifies ulp-level float diffs near integers, so many pixels
    # differ by exactly 1; none may differ by more)
    assert diff.max() <= 1, f"max pixel diff {diff.max()}"


def test_embed_partial_payload_stops_midblock_and_midframe(rng):
    frame = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    payload_len = 3 * N_AC + 4  # 3 full blocks + 4 bits into block 4
    payload = "".join(rng.integers(0, 2, payload_len).astype(str))
    oracle_stego, oracle_n = embed_frame_oracle(frame, payload, DELTA, N_AC)
    stego, bpf = _run_embed(frame[None], payload)
    assert bpf[0] == oracle_n == payload_len
    diff = np.abs(stego[0].astype(int) - oracle_stego.astype(int))
    assert diff.max() <= 1
    # untouched blocks (5..) must be bit-identical passthrough in BOTH
    np.testing.assert_array_equal(stego[0][8:, :], frame[8:, :])
    np.testing.assert_array_equal(oracle_stego[8:, :], frame[8:, :])
    # entered blocks 0..4 live in row stripe 0
    touched = blockify(stego[0][:8, :])
    orig = blockify(frame[:8, :])
    assert not np.array_equal(touched[:4], orig[:4])


def test_extract_matches_oracle_on_stego(rng):
    """On embedded (lattice-snapped) content both extractors agree exactly."""
    frame = rng.integers(0, 256, (24, 32), dtype=np.uint8)
    cap = (24 // 8) * (32 // 8) * N_AC
    payload = "".join(rng.integers(0, 2, cap).astype(str))
    stego, _ = _run_embed(frame[None], payload)
    oracle_bits = extract_frame_oracle(stego[0], DELTA, N_AC)
    ours = extract_frames(jnp.asarray(stego), jnp.float32(DELTA), N_AC)
    assert bits_to_string(np.asarray(ours)[0]) == oracle_bits


def test_embed_extract_ber_zero_roundtrip(rng):
    """North-star oracle: BER=0 through the uint8 stego frame (SURVEY §4)."""
    frames = rng.integers(0, 256, (4, 48, 64), dtype=np.uint8)
    cap = (48 // 8) * (64 // 8) * N_AC
    total = 4 * cap - 7  # end mid-block in the last frame
    payload = rng.integers(0, 2, total).astype(np.uint8)
    seg = pad_bits(payload, 4 * cap).reshape(4, cap)
    stego, bpf = embed_frames(
        jnp.asarray(frames), jnp.asarray(seg), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    assert np.asarray(bpf).sum() == total
    extracted = np.asarray(
        extract_frames(stego, jnp.float32(DELTA), N_AC)
    ).reshape(-1)[:total]
    assert np.array_equal(extracted, payload), "BER != 0"


def test_roundtrip_against_oracle_cross(rng):
    """Cross-validation: oracle embeds -> kernel extracts, and vice versa."""
    frame = rng.integers(0, 256, (16, 16), dtype=np.uint8)
    cap = 4 * N_AC
    payload = "".join(rng.integers(0, 2, cap).astype(str))
    # oracle embed -> kernel extract
    oracle_stego, _ = embed_frame_oracle(frame, payload, DELTA, N_AC)
    ours = extract_frames(jnp.asarray(oracle_stego[None]), jnp.float32(DELTA), N_AC)
    assert bits_to_string(np.asarray(ours)[0]) == payload
    # kernel embed -> oracle extract
    stego, _ = _run_embed(frame[None], payload)
    assert extract_frame_oracle(stego[0], DELTA, N_AC) == payload


# NOTE: n_ac=63 is NOT a robust operating point for this algorithm at any
# delta: snapping all 63 AC coefficients distorts pixels enough that clipping
# + uint8 truncation perturb coefficients past delta/2 (verified: the scipy
# oracle of the reference semantics has BER>0 there too, and larger delta
# makes it worse). Pairs below are the robust envelope.
@pytest.mark.parametrize(
    "n_ac,delta",
    [(1, 8), (1, 20), (3, 12), (3, 20), (10, 12), (10, 20), (10, 100), (30, 20)],
)
def test_param_sweep_ber_zero(rng, delta, n_ac):
    frames = rng.integers(0, 256, (2, 16, 16), dtype=np.uint8)
    cap = 4 * n_ac
    total = 2 * cap
    payload = rng.integers(0, 2, total).astype(np.uint8)
    stego, bpf = embed_frames(
        jnp.asarray(frames), jnp.asarray(payload.reshape(2, cap)),
        jnp.int32(total), jnp.float32(delta), n_ac,
    )
    extracted = np.asarray(extract_frames(stego, jnp.float32(delta), n_ac)).reshape(-1)
    assert np.array_equal(extracted, payload)


def test_negative_coefficient_parity(rng):
    """Directional moves on negative quantizer indices must round-trip
    (python -3 % 2 == 1 semantics, matched by jnp.mod on floats)."""
    # a moderate horizontal gradient: large negative AC(0,1) coefficient
    # without saturating pixels (clipping would destroy the lattice — a
    # data-loss mode the reference shares, exercised in the test below)
    frame = np.tile(np.linspace(180, 60, 8, dtype=np.uint8), (8, 1))
    payload = "1" * N_AC
    stego, _ = _run_embed(frame[None], payload)
    ours = extract_frames(jnp.asarray(stego), jnp.float32(DELTA), N_AC)
    assert bits_to_string(np.asarray(ours)[0][:N_AC]) == payload
    oracle_stego, _ = embed_frame_oracle(frame, payload, DELTA, N_AC)
    assert extract_frame_oracle(oracle_stego, DELTA, N_AC)[:N_AC] == payload


def test_clipping_data_loss_matches_oracle():
    """Saturated frames clip IDCT output and destroy embedded bits — in the
    reference algorithm too. The kernel must fail the *same way*."""
    frame = np.zeros((8, 8), np.uint8)
    frame[:, :4] = 255
    payload = "1" * N_AC
    stego, _ = _run_embed(frame[None], payload)
    oracle_stego, _ = embed_frame_oracle(frame, payload, DELTA, N_AC)
    ours = bits_to_string(
        np.asarray(extract_frames(jnp.asarray(stego), jnp.float32(DELTA), N_AC))[0][:N_AC]
    )
    oracle = extract_frame_oracle(oracle_stego, DELTA, N_AC)[:N_AC]
    assert ours == oracle  # identical (wrong) bits: same failure semantics


def test_pallas_nonlane_width_matches_oracle(rng):
    """Lane-padded Pallas at a non-128-multiple width vs the independent
    scalar oracle: extracted bits equal in both directions (the r3 VERDICT
    item 4 golden case; reference handles any >=8x8 frame,
    embed_process.py:94)."""
    from stegotpu.ops.pallas_kernel import (
        embed_frames_pallas,
        extract_frames_pallas,
    )

    h, w = 24, 80  # 80 % 128 != 0: exercises the pad/mask path
    frame = rng.integers(0, 256, (h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    payload = "".join(rng.integers(0, 2, cap).astype(str))
    bits = pad_bits(string_to_bits(payload), cap).reshape(1, cap)

    # oracle embed -> pallas extract
    oracle_stego, _ = embed_frame_oracle(frame, payload, DELTA, N_AC)
    ours = extract_frames_pallas(jnp.asarray(oracle_stego[None]),
                                 jnp.float32(DELTA), N_AC)
    assert bits_to_string(np.asarray(ours)[0]) == payload

    # pallas embed -> oracle extract
    stego, bpf = embed_frames_pallas(
        jnp.asarray(frame[None]), jnp.asarray(bits), jnp.int32(cap),
        jnp.float32(DELTA), N_AC,
    )
    assert int(np.asarray(bpf)[0]) == cap
    assert extract_frame_oracle(np.asarray(stego)[0], DELTA, N_AC) == payload
