"""Fused Pallas kernel vs the XLA baseline: identical behavior.

On the CPU test backend Pallas runs in interpreter-equivalent lowering, so
these tests validate semantics; performance is covered by benchmarks/.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from stegotpu.ops.pallas_kernel import (
    embed_frames_pallas,
    extract_frames_pallas,
    pick_stripe,
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


def test_pick_stripe():
    assert pick_stripe(1080) == 120
    assert pick_stripe(720) == 120
    assert pick_stripe(2160) == 120
    assert pick_stripe(480) == 120
    assert pick_stripe(96) == 96
    assert pick_stripe(48) == 48
    assert pick_stripe(64) == 8
    with pytest.raises(ValueError):
        pick_stripe(100)


@pytest.mark.parametrize("frac", [1.0, 0.4, 0.0])
def test_pallas_embed_matches_baseline(rng, frac):
    frames, payload, total, cap = _inputs(rng, frac=frac)
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA), N_AC)
    stego_b, bpf_b = embed_frames(*args)
    stego_p, bpf_p = embed_frames_pallas(*args)
    np.testing.assert_array_equal(np.asarray(bpf_b), np.asarray(bpf_p))
    diff = np.abs(np.asarray(stego_b).astype(int) - np.asarray(stego_p).astype(int))
    # borderline round(c/delta) can flip the lattice choice between float
    # orderings (backend-dependent); both embeds are valid — extraction
    # equality below is the real contract
    assert (diff > 1).mean() < _stego_flip_budget()
    # payload recovery exact
    ex = np.asarray(extract_frames(stego_p, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(
        ex.reshape(-1)[:total], payload.reshape(-1)[:total]
    )


def test_pallas_extract_matches_baseline(rng):
    frames, payload, total, cap = _inputs(rng)
    stego, _ = embed_frames(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    ex_b = np.asarray(extract_frames(stego, jnp.float32(DELTA), N_AC))
    ex_p = np.asarray(extract_frames_pallas(stego, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex_b, ex_p)


def test_pallas_roundtrip_at_1080p_shape(rng):
    """One realistic-resolution stripe config (120-row stripes)."""
    frames, payload, total, cap = _inputs(rng, b=1, h=240, w=384)
    stego, bpf = embed_frames_pallas(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    assert int(np.asarray(bpf).sum()) == total
    ex = np.asarray(extract_frames_pallas(stego, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex.reshape(-1), payload.reshape(-1))


def test_pallas_passthrough_and_boundary(rng):
    frames, payload, _, cap = _inputs(rng, b=1, h=48, w=128)
    total = 2 * N_AC + 3  # mid-block stop in block 2
    stego, _ = embed_frames_pallas(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC,
    )
    np.testing.assert_array_equal(np.asarray(stego)[0, 8:], frames[0, 8:])
    ex = np.asarray(extract_frames_pallas(stego, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex.reshape(-1)[:total], payload.reshape(-1)[:total])


def test_packed_extract_matches_unpacked(rng):
    """The bit-packed kernel output (8 slot bits/byte via the MXU pack
    matmul) must unpack to exactly the unpacked kernel's wire-order bits,
    and the packed fused roundtrip must be bit-identical to the unpacked
    fused roundtrip (round-3 A/B default; docs/TUNING.md)."""
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (
        _extract_frames_pallas_rows_packed,
        embed_and_extract_frames_pallas_fused,
        embed_and_extract_frames_pallas_packed,
        extract_frames_pallas,
        packed_rows_to_bits,
        pick_stripe,
    )

    for (h, w, num_ac) in [(128, 256, 10), (120, 384, 3), (64, 128, 63),
                           (128, 128, 1)]:
        frames = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        cap = (h // 8) * (w // 8) * num_ac
        payload = rng.integers(0, 2, (3, cap), dtype=np.uint8)
        total = int(cap * 2 + 123)
        b1 = np.asarray(extract_frames_pallas(frames, jnp.float32(20.0),
                                              num_ac))
        pk = _extract_frames_pallas_rows_packed(
            jnp.asarray(frames), jnp.float32(20.0), num_ac, True)
        b2 = np.asarray(packed_rows_to_bits(pk, h, w, num_ac, pick_stripe(h)))
        np.testing.assert_array_equal(b1, b2)
        s1, bpf1, e1 = embed_and_extract_frames_pallas_fused(
            frames, payload, total, 20.0, num_ac)
        s2, bpf2, e2 = embed_and_extract_frames_pallas_packed(
            frames, payload, total, 20.0, num_ac)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))
        np.testing.assert_array_equal(np.asarray(bpf1), np.asarray(bpf2))


def test_rows_level_roundtrip_matches_bits_level(rng):
    """The rows-level public entry (prebuilt compact rows in, packed rows
    out — benchmark.py's kernel-only chain scope) must be bit-identical to
    the bits-level fused path, incl. at a lane-padded width."""
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (
        embed_and_extract_frames_pallas_packed,
        embed_and_extract_frames_pallas_rows_packed,
        packed_rows_to_bits,
        payload_to_rows,
        pick_stripe,
    )

    for (h, w, num_ac) in [(128, 256, 10), (120, 720, 7)]:
        frames = rng.integers(0, 256, (3, h, w), dtype=np.uint8)
        cap = (h // 8) * (w // 8) * num_ac
        payload = rng.integers(0, 2, (3, cap), dtype=np.uint8)
        total = int(cap * 2 + 123)
        stripe = pick_stripe(h)
        rows = payload_to_rows(jnp.asarray(payload), h, w, num_ac, stripe)
        s1, pk = embed_and_extract_frames_pallas_rows_packed(
            jnp.asarray(frames), rows, total, 20.0, num_ac)
        e1 = packed_rows_to_bits(pk, h, w, num_ac, stripe)
        s2, _, e2 = embed_and_extract_frames_pallas_packed(
            frames, payload, total, 20.0, num_ac)
        np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
        np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


@pytest.mark.parametrize("h,w", [(48, 80), (48, 336), (120, 720)])
def test_pallas_nonlane_width(rng, h, w):
    """Non-128-multiple widths (the r3 VERDICT gap: 720x480, 1366x768-
    cropped-to-1360, sub-lane frames) run the Pallas path via lane padding:
    bit offsets/bpf match the XLA baseline exactly, extraction is
    bit-identical in both directions, and all fused variants agree."""
    from stegotpu.ops.pallas_kernel import (
        embed_and_extract_frames_pallas_fused,
        embed_and_extract_frames_pallas_packed,
    )

    b = 2
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    total = b * cap - 5  # end mid-block in the last frame
    payload = np.zeros(b * cap, np.uint8)
    payload[:total] = rng.integers(0, 2, total)
    payload = payload.reshape(b, cap)
    args = (jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
            jnp.float32(DELTA), N_AC)

    stego_b, bpf_b = embed_frames(*args)
    stego_p, bpf_p = embed_frames_pallas(*args)
    assert stego_p.shape == (b, h, w)
    np.testing.assert_array_equal(np.asarray(bpf_b), np.asarray(bpf_p))
    diff = np.abs(np.asarray(stego_b).astype(int)
                  - np.asarray(stego_p).astype(int))
    assert (diff > 1).mean() < _stego_flip_budget()

    # extract: bit-identical on the same stego, both kernels
    ex_b = np.asarray(extract_frames(stego_b, jnp.float32(DELTA), N_AC))
    ex_p = np.asarray(extract_frames_pallas(stego_b, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex_b, ex_p)

    # roundtrip through the pallas stego recovers the payload exactly
    ex = np.asarray(extract_frames_pallas(stego_p, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex.reshape(-1)[:total],
                                  payload.reshape(-1)[:total])

    # fused variants (packed default + unpacked) agree bit-for-bit
    st_f, bpf_f, ex_f = embed_and_extract_frames_pallas_fused(*args)
    st_k, bpf_k, ex_k = embed_and_extract_frames_pallas_packed(*args)
    np.testing.assert_array_equal(np.asarray(ex_f), np.asarray(ex_k))
    np.testing.assert_array_equal(np.asarray(st_f), np.asarray(st_k))
    np.testing.assert_array_equal(
        np.asarray(ex_k).reshape(-1)[:total], payload.reshape(-1)[:total])


def test_pallas_nonlane_width_verified_check(rng):
    """The verified fast path's fused check kernel also runs lane-padded:
    zero errors on a midrange cover, stego matches the plain embed."""
    from stegotpu.ops.pallas_kernel import _embed_and_check_frames_pallas

    h, w = 48, 80
    frames = rng.integers(60, 196, (2, h, w), dtype=np.uint8)
    cap = (h // 8) * (w // 8) * N_AC
    total = 2 * cap
    payload = rng.integers(0, 2, (2, cap)).astype(np.uint8)
    stego, bpf, errors = _embed_and_check_frames_pallas(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(total),
        jnp.float32(DELTA), N_AC, True,
    )
    assert stego.shape == (2, h, w)
    assert int(np.asarray(errors).sum()) == 0
    ex = np.asarray(extract_frames(stego, jnp.float32(DELTA), N_AC))
    np.testing.assert_array_equal(ex.reshape(-1), payload.reshape(-1))


def test_pick_stripe_env_override(monkeypatch):
    """STEGOTPU_PALLAS_STRIPE: a valid override wins; invalid values are
    ignored with the default fallback (warn path)."""
    monkeypatch.setenv("STEGOTPU_PALLAS_STRIPE", "216")
    assert pick_stripe(1080) == 216
    monkeypatch.setenv("STEGOTPU_PALLAS_STRIPE", "100")  # not a multiple of 8
    assert pick_stripe(1080) == 120
    monkeypatch.setenv("STEGOTPU_PALLAS_STRIPE", "nope")
    assert pick_stripe(1080) == 120
    monkeypatch.delenv("STEGOTPU_PALLAS_STRIPE")


def test_packed_rows_to_bits_host_matches_device(rng):
    """The numpy wire-order unpack (the streaming extract's typical-payload
    fast path) must be bit-identical to the jitted packed_rows_to_bits on
    arbitrary packed content, including lane-padded widths and the
    sublane-padding rows (random garbage there must be ignored by both)."""
    from stegotpu.ops.pallas_kernel import (
        _rows_pad,
        packed_rows_to_bits,
        packed_rows_to_bits_host,
        pick_stripe,
        rows_per_block,
    )

    for (h, w, num_ac) in [(128, 256, 10), (120, 384, 3), (64, 128, 63),
                           (128, 128, 1), (120, 720, 10), (48, 80, 7)]:
        stripe = pick_stripe(h)
        rp = _rows_pad(stripe, rows_per_block(num_ac))
        packed = rng.integers(0, 256, (3, (h // stripe) * rp, w // 8),
                              dtype=np.uint8)
        dev = np.asarray(packed_rows_to_bits(jnp.asarray(packed), h, w,
                                             num_ac, stripe))
        host = packed_rows_to_bits_host(packed, h, w, num_ac, stripe)
        np.testing.assert_array_equal(dev, host)


def test_extract_packed_host_path_end_to_end(rng):
    """extract_frames_pallas_packed + host unpack == extract_frames_pallas
    (the wire-order device path) on real frames, both precisions."""
    from stegotpu.ops.pallas_kernel import (
        extract_frames_pallas_packed,
        packed_rows_to_bits_host,
        pick_stripe,
    )

    for (h, w, num_ac) in [(128, 256, 10), (120, 720, 10)]:
        frames = rng.integers(0, 256, (2, h, w), dtype=np.uint8)
        for precision in ("wire", "fast"):
            wire = np.asarray(extract_frames_pallas(
                frames, jnp.float32(20.0), num_ac, precision=precision))
            pk = np.asarray(extract_frames_pallas_packed(
                jnp.asarray(frames), jnp.float32(20.0), num_ac,
                precision=precision))
            host = packed_rows_to_bits_host(pk, h, w, num_ac, pick_stripe(h))
            np.testing.assert_array_equal(wire, host)


def test_packed_rows_to_bits_host_group_prefix(rng):
    """A stripe-group PREFIX of the packed rows unpacks to exactly the
    corresponding wire-bit prefix — the contract behind the pipeline's
    sliced device readback (_PackedBitBuf)."""
    from stegotpu.ops.pallas_kernel import (
        _rows_pad,
        packed_rows_to_bits_host,
        rows_per_block,
    )

    for (h, w, num_ac) in [(128, 256, 10), (120, 384, 3), (240, 160, 2),
                           (64, 128, 63)]:
        stripe = pick_stripe(h)
        rp = _rows_pad(stripe, rows_per_block(num_ac))
        gpf = h // stripe
        spg = (h // 8) * (w // 8) * num_ac // gpf
        packed = rng.integers(0, 256, (2, gpf * rp, w // 8), dtype=np.uint8)
        full = packed_rows_to_bits_host(packed, h, w, num_ac, stripe)
        for g in (1, gpf // 2, gpf):
            if g == 0:
                continue
            pref = packed_rows_to_bits_host(packed[:, : g * rp], h, w,
                                            num_ac, stripe)
            np.testing.assert_array_equal(pref, full[:, : g * spg])
        with pytest.raises(ValueError):
            packed_rows_to_bits_host(packed[:, : rp - 1], h, w, num_ac,
                                     stripe)


def test_wire_embed_delta8_smooth_cover_zero_ber(tmp_path):
    """Round-5 soak regression: the single-pass-bf16 inverse lost 3-13e-5
    BER at the delta=8 robust edge on smooth covers (zero in the f32 XLA
    embed) — its pixel noise crossed uint8 truncation cliffs. The wire
    inverse is f32-faithful now; this pins zero errors at delta=8 on the
    same class of cover, and the pallas stego staying ~100x closer to the
    XLA ideal than the old kernel's 0.4% of pixels."""
    import jax.numpy as jnp

    from stegotpu import fixtures
    from stegotpu.ops.pallas_kernel import (embed_frames_pallas,
                                            extract_frames_pallas)
    from stegotpu.ops.qim import embed_frames
    from stegotpu.video import VideoReader

    fixtures.make_cover_video(tmp_path / "c.mp4", 336, 96, frames=8,
                              kind="moving", seed=123)
    with VideoReader(tmp_path / "c.mp4") as r:
        cover = np.concatenate(list(r.batches(8, mode="gray")))
    h, w = cover.shape[1:]
    n_ac = 10
    cap = (h // 8) * (w // 8) * n_ac
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        bits = rng.integers(0, 2, (cover.shape[0], cap), np.uint8)
        total = int(cover.shape[0] * cap * 0.95)
        st, _ = embed_frames_pallas(jnp.asarray(cover), jnp.asarray(bits),
                                    jnp.int32(total), jnp.float32(8.0), n_ac)
        ex = np.asarray(extract_frames_pallas(st, jnp.float32(8.0), n_ac)
                        ).reshape(-1)[:total]
        assert int((ex != bits.reshape(-1)[:total]).sum()) == 0, seed
        stx, _ = embed_frames(jnp.asarray(cover), jnp.asarray(bits),
                              jnp.int32(total), jnp.float32(8.0), n_ac)
        pix_diff = int((np.asarray(st) != np.asarray(stx)).sum())
        # old kernel: ~1000 of 258k pixels differed; fixed: ~10
        assert pix_diff < 100, pix_diff
