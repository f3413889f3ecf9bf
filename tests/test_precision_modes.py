"""qim_precision modes: 'wire' (f32-faithful, reference-interoperable —
the default) vs 'fast' (single-pass bf16, TPU-local). Fast mode's
semantics are backend-consistent (its MATRICES are bf16-truncated, so CPU
interpret reproduces the on-chip arithmetic class)."""

import jax.numpy as jnp
import numpy as np
import pytest

from stegotpu.config import StegoConfig
from stegotpu.ops.pallas_kernel import (
    embed_and_extract_frames_pallas,
    embed_frames_pallas,
    extract_frames_pallas,
)

DELTA, N_AC = 20, 10


def _inputs(rng, b=2, h=48, w=128):
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    payload = rng.integers(0, 2, (b, cap)).astype(np.uint8)
    return frames, payload, b * cap


def test_fast_mode_roundtrip_exact(rng):
    frames, payload, total = _inputs(rng)
    st, bpf, ex = embed_and_extract_frames_pallas(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC, precision="fast",
    )
    np.testing.assert_array_equal(np.asarray(ex).reshape(-1),
                                  payload.reshape(-1))
    # and the standalone fast extractor reads the fast stego identically
    ex2 = extract_frames_pallas(st, jnp.float32(DELTA), N_AC,
                                precision="fast")
    np.testing.assert_array_equal(np.asarray(ex2), np.asarray(ex))


def test_fast_embed_wire_extract_at_default_delta(rng):
    """At delta=20 the bf16 lattice drift (~2) sits well inside the margin
    (10): cross-mode extraction still recovers the payload on this cover.
    This is a practical observation, NOT the contract — the contract pairs
    fast with fast (config.py docstring)."""
    frames, payload, total = _inputs(rng)
    st, _ = embed_frames_pallas(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC, precision="fast",
    )
    ex = extract_frames_pallas(st, jnp.float32(DELTA), N_AC)  # wire
    np.testing.assert_array_equal(np.asarray(ex).reshape(-1),
                                  payload.reshape(-1))


def test_fast_mode_delta_guard():
    StegoConfig(qim_precision="fast", delta=12)
    with pytest.raises(ValueError, match="delta >= 12"):
        StegoConfig(qim_precision="fast", delta=8)
    with pytest.raises(ValueError, match="wire/fast"):
        StegoConfig(qim_precision="bf16")


def test_cli_precision_fast_roundtrip(tmp_path, monkeypatch, capsys):
    from stegotpu.cli import main
    from stegotpu.image import load_image_gray

    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    fixtures.make_secret_image("s.png", 24, 24, kind="noise", seed=41)
    fixtures.make_cover_video("c.mp4", 320, 240, frames=6, kind="moving",
                              seed=42)
    assert main(["embed", "c.mp4", "s.png", "st", "--kernel", "pallas",
                 "--precision", "fast"]) == 0
    assert main(["extract", "st.avi", "x.png", "--kernel", "pallas",
                 "--precision", "fast"]) == 0
    np.testing.assert_array_equal(load_image_gray("x.png"),
                                  load_image_gray("s.png"))


def test_sharded_paths_accept_fast_precision(rng):
    """The mesh kernels compile and stay exact with precision='fast'
    (round-4 review: the flag used to be silently dropped on these paths)."""
    import jax

    from stegotpu.parallel.mesh import make_mesh, sharded_roundtrip_step

    if len(jax.devices()) < 4:
        import pytest as _p

        _p.skip("needs 4 virtual devices")
    mesh = make_mesh(2, 2)
    step = sharded_roundtrip_step(mesh, N_AC, kernel="pallas",
                                  precision="fast")
    frames, payload, total = _inputs(rng, b=4, h=48, w=128)
    stego, bpf, bits, errors = step(jnp.asarray(frames), jnp.asarray(payload),
                                    jnp.int32(total), jnp.float32(DELTA))
    assert int(np.asarray(errors)) == 0
    np.testing.assert_array_equal(np.asarray(bits).reshape(-1),
                                  payload.reshape(-1))
