"""The fused streaming-evaluation step: one dispatch, correct metrics."""

import jax.numpy as jnp
import numpy as np

from stegotpu.ops.qim import embed_extract_evaluate


def test_embed_extract_evaluate(rng):
    b, h, w, n_ac = 2, 48, 64, 10
    cap = (h // 8) * (w // 8) * n_ac
    total = 2 * cap - 5
    frames = rng.integers(32, 224, (b, h, w), dtype=np.uint8)
    payload = np.zeros((b, cap), np.uint8)
    payload.reshape(-1)[:total] = rng.integers(0, 2, total)

    stego, bpf, extracted, m = embed_extract_evaluate(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(20), n_ac,
    )
    assert int(m["bit_errors"]) == 0
    assert int(m["payload_bits"]) == total
    psnr = float(m["psnr_db"])
    assert 25 < psnr < 60
    # metrics consistent with a host-side recount on valid slots
    ex = np.asarray(extracted).reshape(-1)[:total]
    assert np.array_equal(ex, payload.reshape(-1)[:total])
    assert int(np.asarray(bpf).sum()) == total


def test_evaluate_counts_only_valid_slots(rng):
    """Garbage extracted bits past the payload end must not count as errors."""
    b, h, w, n_ac = 1, 16, 16, 10
    cap = (h // 8) * (w // 8) * n_ac
    total = 7  # tiny payload: most of the capacity is garbage slots
    frames = rng.integers(32, 224, (b, h, w), dtype=np.uint8)
    payload = np.zeros((b, cap), np.uint8)
    payload.reshape(-1)[:total] = 1
    _, _, _, m = embed_extract_evaluate(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(20), n_ac,
    )
    assert int(m["bit_errors"]) == 0
    assert int(m["payload_bits"]) == total
