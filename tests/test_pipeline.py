"""End-to-end file-to-file round trips through real FFV1 video containers —
the minimum slice of SURVEY.md §7 step 3, plus failure paths."""

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video
from stegotpu.video import force_avi_path


@pytest.fixture(scope="module")
def keys(tmp_path_factory):
    d = tmp_path_factory.mktemp("keys")
    return crypto.setup_receiver_keys(d / "priv.pem", d / "pub.pem")


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    d = tmp_path_factory.mktemp("media")
    fixtures.make_secret_image(d / "secret.png", 32, 32, kind="pattern")
    fixtures.make_cover_video(d / "cover.mp4", 320, 240, frames=12, kind="moving")
    return d


def test_embed_extract_roundtrip_pixel_identical(media, keys, tmp_path):
    """North star: the extracted secret is pixel-identical to the original
    (reference: extract_process.py:262-272)."""
    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=10)
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego", pub_c, cfg,
        batch_frames=4,
    )
    assert res.success
    assert res.output_path.endswith(".avi")
    assert res.bits_embedded == res.total_payload_bits
    assert res.first_frame_psnr is not None and res.first_frame_psnr > 20.0

    out_png = tmp_path / "extracted.png"
    ext = extract_image_from_video(res.output_path, priv, cfg, out_png, batch_frames=4)
    assert ext.success, ext.error
    assert ext.hash_ok
    original = load_image_gray(media / "secret.png")
    np.testing.assert_array_equal(ext.pixels, original)
    np.testing.assert_array_equal(load_image_gray(out_png), original)


def test_payload_spans_multiple_frames(media, keys, tmp_path):
    """Small per-frame capacity forces the ciphertext across frames
    (reference continuation loop: extract_process.py:173-182)."""
    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=3)  # 320x240/64*3 = 3600 bits/frame
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_multi", pub_c, cfg,
        batch_frames=2,
    )
    assert res.success
    # 32x32 secret -> 976 + 8192 = 9168 bits > 3600/frame -> >= 3 frames
    assert res.bits_embedded == res.total_payload_bits > 2 * 3600
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=2)
    assert ext.success, ext.error
    np.testing.assert_array_equal(ext.pixels, load_image_gray(media / "secret.png"))


def test_wrong_key_fails_authentication(media, keys, tmp_path):
    priv, pub_c = keys
    cfg = StegoConfig()
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_auth", pub_c, cfg,
    )
    assert res.success
    wrong_priv, _ = crypto.generate_keypair()
    ext = extract_image_from_video(res.output_path, wrong_priv, cfg)
    assert not ext.success
    assert "authentication" in ext.error


def test_wrong_delta_fails_cleanly(media, keys, tmp_path):
    """delta is an out-of-band shared secret; a mismatch must fail, not crash."""
    priv, pub_c = keys
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_delta", pub_c,
        StegoConfig(delta=20),
    )
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, StegoConfig(delta=21))
    assert not ext.success


def test_video_too_small_for_payload(keys, tmp_path):
    priv, pub_c = keys
    fixtures.make_secret_image(tmp_path / "big_secret.png", 128, 128, kind="noise")
    fixtures.make_cover_video(tmp_path / "tiny.mp4", 64, 64, frames=3)
    res = embed_image_in_video(
        tmp_path / "tiny.mp4", tmp_path / "big_secret.png", tmp_path / "stego_small",
        pub_c, StegoConfig(),
    )
    # 128*128*8 bits >> 3 frames * 64 blocks * 10 bits
    assert not res.success
    assert res.bits_embedded < res.total_payload_bits


def test_delta_zero_rejected(media, keys, tmp_path):
    _, pub_c = keys
    with pytest.raises(ValueError):
        embed_image_in_video(
            media / "cover.mp4", media / "secret.png", tmp_path / "x", pub_c,
            StegoConfig(delta=0),
        )


def test_trailing_frames_passthrough_color(media, keys, tmp_path):
    """Frames after the payload keep original (cropped) color content
    (reference: embed_process.py:134-139)."""
    import cv2

    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=10)
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_tail", pub_c, cfg,
        batch_frames=4,
    )
    assert res.success
    cap_in = cv2.VideoCapture(str(media / "cover.mp4"))
    cap_out = cv2.VideoCapture(res.output_path)
    n_stego_frames = -(-res.total_payload_bits // cfg.frame_capacity_bits(240, 320))
    i = 0
    while True:
        ri, fi = cap_in.read()
        ro, fo = cap_out.read()
        if not ro:
            break
        assert ri
        if i >= n_stego_frames:
            # passthrough frame: identical to cropped original (FFV1 lossless)
            np.testing.assert_array_equal(fo, fi[:240, :320])
        else:
            # stego frame: grayscale replicated across channels
            assert np.array_equal(fo[..., 0], fo[..., 1])
            assert np.array_equal(fo[..., 1], fo[..., 2])
        i += 1
    cap_in.release(), cap_out.release()
    assert i == 12  # all cover frames present in the stego video


def test_force_avi_path():
    assert force_avi_path("out.mp4") == "out.avi"
    assert force_avi_path("dir/base") == "dir/base.avi"


def test_stage_timer_covers_all_pipeline_stages(media, keys, tmp_path):
    """--timing instrumentation: every stage of both pipelines accumulates."""
    from stegotpu.utils.profiling import StageTimer

    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=10)
    t_embed = StageTimer()
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego", pub_c,
        cfg, batch_frames=4, timer=t_embed,
    )
    assert res.success
    # gray conversion happens inside decode now (native C++ or the batches()
    # generator on the cv2 fallback) — no gray_convert stage remains
    assert {"decode_wait", "device_dispatch",
            "device_readback", "encode"} <= set(t_embed.totals)

    t_ext = StageTimer()
    ext = extract_image_from_video(res.output_path, priv, cfg,
                                   batch_frames=4, timer=t_ext)
    assert ext.success
    assert {"decode_wait", "device_dispatch",
            "device_readback"} <= set(t_ext.totals)
    assert "ms/call" in t_ext.report()


def test_full_pipeline_on_cv2_fallback(monkeypatch, tmp_path):
    """The whole embed->extract round trip must work with the native layer
    disabled (STEGOTPU_VIDEO_BACKEND=cv2): gray conversion falls back to
    numpy inside batches(), encode to cv2.VideoWriter — same wire."""
    from stegotpu import crypto, fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.image import load_image_gray
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video

    monkeypatch.setenv("STEGOTPU_VIDEO_BACKEND", "cv2")
    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="noise", seed=1)
    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=8,
                              kind="moving", seed=2)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                             tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, StegoConfig(),
                               batch_frames=4)
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, StegoConfig(),
                                   batch_frames=4)
    assert ext.success and ext.hash_ok, ext.error
    np.testing.assert_array_equal(ext.pixels,
                                  load_image_gray(tmp_path / "s.png"))


def test_extract_decodes_exactly_payload_frames(media, keys, tmp_path):
    """The streaming extract decodes exactly max(first batch, payload
    frames): after the unpipelined header batch fixes the total, the
    FrameBudget stops the decoder at ceil(total/capacity) — no speculative
    batch past the payload (reference reads only until enough bits
    accumulate, extract_process.py:55-86,173-182)."""
    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=3)  # 3600 bits/frame
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_exact",
        pub_c, cfg, batch_frames=2,
    )
    assert res.success
    cap = cfg.frame_capacity_bits(240, 320)
    payload_frames = -(-res.total_payload_bits // cap)
    assert 2 < payload_frames < 12  # the video has 12 frames; payload 3
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=2)
    assert ext.success, ext.error
    assert ext.frames_read == max(2, payload_frames)


def test_extract_packed_fast_path_pallas(media, keys, tmp_path):
    """The Pallas packed-rows readback + host unpack path (typical-payload
    fast path) extracts pixel-identically and still decodes exactly the
    payload frames."""
    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=3, kernel="pallas")
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_pk",
        pub_c, cfg, batch_frames=2,
    )
    assert res.success
    cap = cfg.frame_capacity_bits(240, 320)
    payload_frames = -(-res.total_payload_bits // cap)
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=2)
    assert ext.success, ext.error
    assert ext.frames_read == max(2, payload_frames)
    np.testing.assert_array_equal(ext.pixels,
                                  load_image_gray(media / "secret.png"))


def test_extract_single_batch_payload(media, keys, tmp_path):
    """Payload that fits the first batch: phase 2 never runs, exactly one
    batch is decoded."""
    priv, pub_c = keys
    cfg = StegoConfig(delta=20, num_ac_coeffs=10)  # 12000 bits/frame
    res = embed_image_in_video(
        media / "cover.mp4", media / "secret.png", tmp_path / "stego_one",
        pub_c, cfg, batch_frames=4,
    )
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=4)
    assert ext.success, ext.error
    assert ext.frames_read == 4  # one batch, though the video has 12 frames


def test_packed_bit_buf_sliced_readback(rng):
    """_PackedBitBuf materializes a group-rounded PREFIX of the wire bit
    stream, reading back only the (frame, stripe-group) span the request
    covers — including mid-group and mid-frame bit counts, growth across
    repeated calls, and multi-batch buffers."""
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (_rows_pad,
                                            packed_rows_to_bits_host,
                                            pick_stripe, rows_per_block)
    from stegotpu.pipeline import _PackedBitBuf

    h, w, num_ac = 240, 160, 2
    stripe = pick_stripe(h)                    # 120 -> 2 groups/frame
    rp = _rows_pad(stripe, rows_per_block(num_ac))
    gpf = h // stripe
    cap = (h // 8) * (w // 8) * num_ac
    spg = cap // gpf
    rng_ = rng
    batches = [3, 2]
    devs = [rng_.integers(0, 256, (n, gpf * rp, w // 8), dtype=np.uint8)
            for n in batches]
    expected = np.concatenate(
        [packed_rows_to_bits_host(d, h, w, num_ac, stripe).reshape(-1)
         for d in devs])

    buf = _PackedBitBuf(h, w, num_ac, stripe)
    for n, d in zip(batches, devs):
        buf.add(n, jnp.asarray(d))
    assert buf.capacity_bits == 5 * cap
    for k in [1, spg - 1, spg, spg + 1, cap + 7, 3 * cap + spg + 13,
              5 * cap]:
        got = buf.bits(k)
        assert got.size >= min(k, buf.capacity_bits)
        assert got.size % spg == 0
        np.testing.assert_array_equal(got, expected[: got.size])
    np.testing.assert_array_equal(buf.bits(10 ** 9), expected)
    np.testing.assert_array_equal(buf.bits(None), expected)


def test_packed_bit_buf_eager_frames(rng):
    """eager_frames reads back those frames' full rows at add() time (the
    bulk phase's overlap path) and releases the device array once a batch
    is fully materialized."""
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (_rows_pad,
                                            packed_rows_to_bits_host,
                                            pick_stripe, rows_per_block)
    from stegotpu.pipeline import _PackedBitBuf

    h, w, num_ac = 240, 160, 2
    stripe = pick_stripe(h)
    rp = _rows_pad(stripe, rows_per_block(num_ac))
    gpf = h // stripe
    dev = rng.integers(0, 256, (4, gpf * rp, w // 8), dtype=np.uint8)
    expected = packed_rows_to_bits_host(dev, h, w, num_ac,
                                        stripe).reshape(-1)

    buf = _PackedBitBuf(h, w, num_ac, stripe)
    buf.add(4, jnp.asarray(dev), eager_frames=4)
    assert buf._items[0]["dev"] is None        # fully read back: released
    np.testing.assert_array_equal(buf.bits(None), expected)

    buf2 = _PackedBitBuf(h, w, num_ac, stripe)
    buf2.add(4, jnp.asarray(dev), eager_frames=2)
    assert buf2._items[0]["dev"] is not None   # tail still on device
    np.testing.assert_array_equal(buf2.bits(None), expected)
