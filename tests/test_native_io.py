"""Native FFmpeg I/O layer: lossless round trip, cv2 interop both ways."""

import cv2
import numpy as np
import pytest

from stegotpu.native import videoio

pytestmark = pytest.mark.skipif(
    not videoio.available(), reason=f"native lib unavailable: {videoio.build_error()}"
)


def _frames(rng, n=6, h=64, w=96):
    return rng.integers(0, 256, (n, h, w, 3), dtype=np.uint8)


def test_native_write_native_read_lossless(rng, tmp_path):
    frames = _frames(rng)
    path = str(tmp_path / "nat.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0) as w:
        w.write(frames)
    with videoio.NativeVideoReader(path) as r:
        assert (r.width, r.height) == (96, 64)
        assert abs(r.fps - 24.0) < 0.01
        got = r.read_batch(10, 64, 96)
        assert got.shape == (6, 64, 96, 3)
        np.testing.assert_array_equal(got, frames)
        assert r.read_batch(4, 64, 96) is None  # EOF


def test_native_write_cv2_read(rng, tmp_path):
    """cv2 (the reference's stack) must read our FFV1 losslessly."""
    frames = _frames(rng)
    path = str(tmp_path / "nat2.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0) as w:
        for f in frames:
            w.write(f)
    cap = cv2.VideoCapture(path)
    for i in range(6):
        ok, f = cap.read()
        assert ok
        np.testing.assert_array_equal(f, frames[i])
    cap.release()


def test_cv2_write_native_read(rng, tmp_path):
    frames = _frames(rng)
    path = str(tmp_path / "cv.avi")
    out = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"FFV1"), 24.0, (96, 64))
    for f in frames:
        out.write(f)
    out.release()
    with videoio.NativeVideoReader(path) as r:
        got = r.read_batch(6, 64, 96)
        np.testing.assert_array_equal(got, frames)


def test_native_read_crop(rng, tmp_path):
    frames = _frames(rng, n=2, h=70, w=100)  # not multiples of 8
    path = str(tmp_path / "crop.avi")
    with videoio.NativeVideoWriter(path, 100, 70, 30.0) as w:
        w.write(frames)
    with videoio.NativeVideoReader(path) as r:
        got = r.read_batch(2, 64, 96)  # top-left crop
        np.testing.assert_array_equal(got, frames[:, :64, :96])


def test_native_batched_reads(rng, tmp_path):
    frames = _frames(rng, n=7)
    path = str(tmp_path / "batched.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0) as w:
        w.write(frames)
    with videoio.NativeVideoReader(path) as r:
        b1 = r.read_batch(4, 64, 96)
        b2 = r.read_batch(4, 64, 96)
        assert b1.shape[0] == 4 and b2.shape[0] == 3
        np.testing.assert_array_equal(np.concatenate([b1, b2]), frames)


def test_native_open_missing_file():
    with pytest.raises(IOError):
        videoio.NativeVideoReader("/nonexistent/file.avi")


@pytest.mark.parametrize("workers", [1, 3, 4])
def test_parallel_encoder_pool_lossless(rng, tmp_path, workers):
    """Frame-striped FFV1 encoder lanes: packets mux in pts order and the
    result decodes pixel-identically across uneven write() batches."""
    frames = _frames(rng, n=13)
    path = str(tmp_path / f"pool{workers}.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0, workers=workers) as w:
        w.write(frames[:5])
        w.write(frames[5:6])
        w.write(frames[6:])
    with videoio.NativeVideoReader(path) as r:
        got = r.read_batch(16, 64, 96)
    np.testing.assert_array_equal(got, frames)


def test_parallel_encoder_pool_cv2_decodable(rng, tmp_path):
    """The pooled output must stay consumable by cv2 — the reference's
    extractor reads stego videos through cv2.VideoCapture."""
    frames = _frames(rng, n=9)
    path = str(tmp_path / "pool_cv2.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0, workers=3) as w:
        w.write(frames)
    cap = cv2.VideoCapture(path)
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(f)
    cap.release()
    np.testing.assert_array_equal(np.stack(got), frames)


def test_native_huffyuv_pool_lossless_and_cv2_decodable(rng, tmp_path):
    """HuffYUV through the encoder-lane pool: lossless, decodable by both
    the native reader and cv2 (the reference extractor's consumer)."""
    frames = _frames(rng, n=11)
    path = str(tmp_path / "hfyu.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0, workers=3,
                                   codec="huffyuv") as w:
        w.write(frames[:4])
        w.write(frames[4:])
    with videoio.NativeVideoReader(path) as r:
        np.testing.assert_array_equal(r.read_batch(16, 64, 96), frames)
    cap = cv2.VideoCapture(path)
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(f)
    cap.release()
    np.testing.assert_array_equal(np.stack(got), frames)


def test_native_writer_unknown_codec_fails_cleanly(tmp_path):
    with pytest.raises(IOError, match="encoder unavailable"):
        videoio.NativeVideoWriter(tmp_path / "x.avi", 96, 64, 24.0,
                                  codec="nonsense")


def test_native_gray_decode_bit_exact(rng, tmp_path):
    """The C++ gray plane must equal the numpy cv2-bit-exact conversion of
    the BGR plane for the same frames (reference gray convert:
    config_and_setup.py:112)."""
    from stegotpu.ops.color import bgr_to_gray_np

    frames = _frames(rng, n=5)
    path = str(tmp_path / "g.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0) as w:
        w.write(frames)
    with videoio.NativeVideoReader(path) as r:
        bgr, gray = r.read_batch_both(8, 64, 96)
    assert gray.shape == (5, 64, 96)
    np.testing.assert_array_equal(gray, bgr_to_gray_np(bgr))
    # gray-only read on a fresh reader matches too (and crops identically)
    with videoio.NativeVideoReader(path) as r:
        gray2 = r.read_batch_gray(8, 48, 88)
    np.testing.assert_array_equal(gray2, gray[:, :48, :88])


def test_native_write_gray_replicates(rng, tmp_path):
    """write_gray must produce the same file contents as writing the host-
    replicated GRAY2BGR frames (reference: embed_process.py:126)."""
    gray = rng.integers(0, 256, (4, 64, 96), dtype=np.uint8)
    p1, p2 = str(tmp_path / "a.avi"), str(tmp_path / "b.avi")
    with videoio.NativeVideoWriter(p1, 96, 64, 24.0) as w:
        w.write_gray(gray)
    with videoio.NativeVideoWriter(p2, 96, 64, 24.0) as w:
        w.write(np.repeat(gray[..., None], 3, axis=-1))
    with videoio.NativeVideoReader(p1) as r:
        a = r.read_batch(8, 64, 96)
    with videoio.NativeVideoReader(p2) as r:
        b = r.read_batch(8, 64, 96)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, np.repeat(gray[..., None], 3, axis=-1))


def test_native_write_gray_shape_guard(rng, tmp_path):
    gray = rng.integers(0, 256, (2, 32, 48), dtype=np.uint8)
    with videoio.NativeVideoWriter(str(tmp_path / "s.avi"), 96, 64, 24.0) as w:
        with pytest.raises(ValueError):
            w.write_gray(gray)
        w.write_gray(rng.integers(0, 256, (64, 96), dtype=np.uint8))  # 2-D ok


def test_native_rawvideo_pool_lossless_and_cv2_decodable(rng, tmp_path):
    """rawvideo (the --codec RGBA path) through the native encoder pool:
    stored BGR24 verbatim, decodable by both readers."""
    frames = _frames(rng, n=9)
    path = str(tmp_path / "raw.avi")
    with videoio.NativeVideoWriter(path, 96, 64, 24.0, workers=2,
                                   codec="rawvideo") as w:
        w.write(frames[:5])
        w.write(frames[5:])
    with videoio.NativeVideoReader(path) as r:
        np.testing.assert_array_equal(r.read_batch(16, 64, 96), frames)
    cap = cv2.VideoCapture(path)
    got = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        got.append(f)
    cap.release()
    np.testing.assert_array_equal(np.stack(got), frames)


def test_concat_rejects_mismatched_segments(rng, tmp_path):
    """Segments with different dimensions must fail with a structured
    IOError (and must not crash in the trailer path — the muxer header
    was written by the first segment)."""
    from stegotpu.native.videoio import concat_videos

    with videoio.NativeVideoWriter(tmp_path / "a.avi", 96, 64, 24.0) as w:
        w.write(_frames(rng, n=2))
    with videoio.NativeVideoWriter(tmp_path / "b.avi", 64, 64, 24.0) as w:
        w.write(rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8))
    with pytest.raises(IOError, match="mismatch"):
        concat_videos(tmp_path / "out.avi", [tmp_path / "a.avi",
                                             tmp_path / "b.avi"])


def test_concat_unwritable_output_fails_cleanly(rng, tmp_path):
    """An unopenable output path raises IOError instead of crashing in
    av_write_trailer (header never written -> trailer must not run)."""
    from stegotpu.native.videoio import concat_videos

    with videoio.NativeVideoWriter(tmp_path / "a.avi", 96, 64, 24.0) as w:
        w.write(_frames(rng, n=2))
    with pytest.raises(IOError):
        concat_videos("/proc/definitely/not/writable/out.avi",
                      [tmp_path / "a.avi"])


def test_concat_mismatched_segments_refused(tmp_path):
    """svx_concat refuses codec or dimension mismatches with a structured
    error instead of silently writing a broken container."""
    import pytest

    from stegotpu.native.videoio import available, concat_videos
    from stegotpu.video import VideoWriter

    if not available():
        pytest.skip("native layer not built")
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (3, 64, 96), np.uint8)
    with VideoWriter(tmp_path / "ffv1.avi", 24.0, 96, 64, "FFV1") as w:
        w.write_gray_batch(a)
    with VideoWriter(tmp_path / "hfyu.avi", 24.0, 96, 64, "HFYU") as w:
        w.write_gray_batch(a)
    with VideoWriter(tmp_path / "small.avi", 24.0, 48, 64, "FFV1") as w:
        w.write_gray_batch(a[:, :, :48])

    with pytest.raises(OSError, match="mismatch"):
        concat_videos(tmp_path / "o1.avi",
                      [tmp_path / "ffv1.avi", tmp_path / "hfyu.avi"])
    with pytest.raises(OSError, match="mismatch"):
        concat_videos(tmp_path / "o2.avi",
                      [tmp_path / "ffv1.avi", tmp_path / "small.avi"])


@pytest.mark.skipif(not videoio.available(), reason="native lib unavailable")
def test_writer_rejects_non_uint8(tmp_path):
    """Non-uint8 frames must raise, not be unsafely cast (float -1.0 ->
    255 would write silently corrupt stego) — round-5 native review."""
    from stegotpu.native.videoio import NativeVideoWriter

    with NativeVideoWriter(tmp_path / "o.avi", 64, 48, 24.0) as w:
        ok = np.zeros((2, 48, 64), np.uint8)
        w.write_gray(ok)
        with pytest.raises(ValueError, match="uint8"):
            w.write_gray(ok.astype(np.float32))
        with pytest.raises(ValueError, match="uint8"):
            w.write(np.zeros((1, 48, 64, 3), np.int16))
