"""Multi-chip sharding tests on an 8-device virtual CPU mesh (conftest sets
--xla_force_host_platform_device_count=8), standing in for a TPU slice."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from stegotpu.ops.qim import embed_frames, extract_frames
from stegotpu.parallel.mesh import (
    make_mesh,
    sharded_embed_frames,
    sharded_extract_frames,
    sharded_roundtrip_step,
)

DELTA = 20
N_AC = 10


@pytest.fixture(scope="module")
def devices():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual CPU devices"
    return devs


def _mk_inputs(rng, b=8, h=64, w=64, fill_fraction=0.8):
    # h=64 -> 8 block-rows, divisible by every 'space' size used below
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    total = int(b * cap * fill_fraction)
    payload = np.zeros(b * cap, np.uint8)
    payload[:total] = rng.integers(0, 2, total)
    return frames, payload.reshape(b, cap), total, cap


@pytest.mark.parametrize("n_data,n_space", [(8, 1), (4, 2), (2, 4), (1, 8)])
def test_sharded_embed_matches_single_device(rng, devices, n_data, n_space):
    frames, payload, total, cap = _mk_inputs(rng)
    mesh = make_mesh(n_data, n_space, devices)
    embed = sharded_embed_frames(mesh, N_AC)
    stego_sh, bpf_sh = embed(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total), jnp.float32(DELTA)
    )
    stego_1, bpf_1 = embed_frames(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    np.testing.assert_array_equal(np.asarray(bpf_sh), np.asarray(bpf_1))
    # float reassociation across program variants can move a pixel by 1 LSB
    # through the truncating cast; payload recovery is asserted exactly below
    diff = np.abs(
        np.asarray(stego_sh).astype(int) - np.asarray(stego_1).astype(int)
    )
    assert diff.max() <= 1
    extracted = np.asarray(
        extract_frames(stego_sh, jnp.float32(DELTA), N_AC)
    ).reshape(-1)[:total]
    np.testing.assert_array_equal(extracted, payload.reshape(-1)[:total])


@pytest.mark.parametrize("n_data,n_space", [(4, 2), (2, 4)])
def test_sharded_extract_matches_single_device(rng, devices, n_data, n_space):
    frames, payload, total, cap = _mk_inputs(rng)
    stego, _ = embed_frames(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    mesh = make_mesh(n_data, n_space, devices)
    extract = sharded_extract_frames(mesh, N_AC)
    bits_sh = np.asarray(extract(stego, jnp.float32(DELTA)))
    bits_1 = np.asarray(extract_frames(stego, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(bits_sh, bits_1)


def test_sharded_roundtrip_step_ber_zero(rng, devices):
    frames, payload, total, cap = _mk_inputs(rng)
    mesh = make_mesh(4, 2, devices)
    step = sharded_roundtrip_step(mesh, N_AC)
    stego, bpf, extracted, errors = step(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total), jnp.float32(DELTA)
    )
    assert int(errors) == 0
    assert int(np.asarray(bpf).sum()) == total
    ex = np.asarray(extracted).reshape(-1)[:total]
    np.testing.assert_array_equal(ex, payload.reshape(-1)[:total])


def test_sharded_roundtrip_with_pallas_kernel(rng, devices):
    """Per-shard pallas kernel under shard_map (interpret mode on CPU):
    identical results to the xla per-shard kernel."""
    b, h, w = 8, 96, 128  # h_l=48 per space-shard -> stripe 48; w=128 ok
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    total = b * cap - 11
    payload = np.zeros(b * cap, np.uint8)
    payload[:total] = rng.integers(0, 2, total)
    payload = payload.reshape(b, cap)
    mesh = make_mesh(4, 2, devices)
    step_x = sharded_roundtrip_step(mesh, N_AC, kernel="xla")
    step_p = sharded_roundtrip_step(mesh, N_AC, kernel="pallas")
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA))
    sx, bx, ex, errx = step_x(*args)
    sp, bp, ep, errp = step_p(*args)
    assert int(errx) == 0 and int(errp) == 0
    np.testing.assert_array_equal(np.asarray(bx), np.asarray(bp))
    np.testing.assert_array_equal(np.asarray(ex), np.asarray(ep))
    # stego pixels may differ where a borderline round(c/delta) flips the
    # lattice choice between float orderings — both embeds are valid (the
    # extracted bits above are identical); just bound the disagreement
    diff = np.abs(np.asarray(sx).astype(int) - np.asarray(sp).astype(int))
    assert (diff > 1).mean() < 0.01  # each flipped coeff perturbs its 64-px block


def test_partial_payload_stripe_boundaries(rng, devices):
    """Payload ending inside a middle stripe of a middle frame: the offset
    arithmetic across (data, space) shards must place the boundary exactly."""
    frames, payload, _, cap = _mk_inputs(rng, fill_fraction=1.0)
    # end 13 bits into frame 3's second stripe (of 2): stripe cap = cap//2
    total = 3 * cap + cap // 2 + 13
    payload = payload.reshape(-1).copy()
    payload[total:] = 0
    payload = payload.reshape(8, cap)
    mesh = make_mesh(4, 2, devices)
    step = sharded_roundtrip_step(mesh, N_AC)
    stego, bpf, extracted, errors = step(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total), jnp.float32(DELTA)
    )
    assert int(errors) == 0
    bpf = np.asarray(bpf)
    assert bpf[3] == cap // 2 + 13
    assert bpf[4] == 0 and bpf[2] == cap
    # frames past the payload must be bit-identical passthrough
    np.testing.assert_array_equal(np.asarray(stego)[4:], frames[4:])
