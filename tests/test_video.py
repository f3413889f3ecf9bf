"""Video-layer unit tests: Prefetcher lifecycle (early close, exhaustion,
error propagation, full-queue DONE delivery) and backend dispatch."""

import time

import numpy as np
import pytest

from stegotpu.native import videoio
from stegotpu.video import Prefetcher, VideoReader, VideoWriter


def test_prefetcher_full_iteration():
    with Prefetcher(iter(range(10)), depth=2) as p:
        assert list(p) == list(range(10))


def test_prefetcher_early_close_does_not_hang():
    def slow_gen():
        for i in range(1000):
            yield i

    p = Prefetcher(slow_gen(), depth=2)
    assert next(p) == 0
    t0 = time.perf_counter()
    p.close()
    assert time.perf_counter() - t0 < 5.0


def test_prefetcher_done_sentinel_with_full_queue():
    """Producer finishes while the queue is full: the DONE sentinel must
    still arrive (regression for a consumer-hang bug)."""
    p = Prefetcher(iter(range(3)), depth=1)
    time.sleep(0.3)  # let the worker fill the queue and block
    assert list(p) == [0, 1, 2]  # terminates


def test_prefetcher_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("decode failed")

    with pytest.raises(RuntimeError, match="decode failed"):
        with Prefetcher(bad_gen(), depth=2) as p:
            for _ in p:
                pass


@pytest.mark.skipif(not videoio.available(), reason="native lib unavailable")
def test_reader_backend_forcing(rng, tmp_path):
    frames = rng.integers(0, 256, (3, 64, 128, 3), dtype=np.uint8)
    path = str(tmp_path / "v.avi")
    with VideoWriter(path, 24.0, 128, 64, backend="native") as w:
        w.write_bgr_batch(frames)
    for backend in ("native", "cv2", "auto"):
        with VideoReader(path, backend=backend) as r:
            assert (r.info.width, r.info.height) == (128, 64)
            got = np.concatenate(list(r.batches(2)))
            np.testing.assert_array_equal(got, frames)


def test_writer_gray_batch_roundtrip(rng, tmp_path):
    from stegotpu.ops.color import bgr_to_gray_np

    gray = rng.integers(0, 256, (2, 64, 128), dtype=np.uint8)
    path = str(tmp_path / "g.avi")
    with VideoWriter(path, 24.0, 128, 64) as w:
        w.write_gray_batch(gray)
    with VideoReader(path) as r:
        got = np.concatenate(list(r.batches(4)))
    # replicated channels survive FFV1 exactly; gray recovers exactly
    np.testing.assert_array_equal(bgr_to_gray_np(got), gray)


def test_extract_from_truncated_stego_fails_closed(tmp_path):
    """A stego file cut off mid-stream must yield a structured error from
    extraction (and never hang the reader loop)."""
    from stegotpu import crypto, fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video

    fixtures.make_secret_image(tmp_path / "s.png", 48, 48, kind="noise", seed=1)
    fixtures.make_cover_video(tmp_path / "c.mp4", 96, 64, frames=40,
                              kind="moving")
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                             tmp_path / "p.pem")
    cfg = StegoConfig()
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "stego", pub_c, cfg)
    assert res.success and res.frames_used > 4

    data = (tmp_path / "stego.avi").read_bytes()
    for frac in (0.5, 0.15):
        cut = tmp_path / f"cut{int(frac*100)}.avi"
        cut.write_bytes(data[: int(len(data) * frac)])
        out = extract_image_from_video(cut, priv, cfg)
        assert not out.success
        assert out.error


def test_prefetcher_maybe_single_core(monkeypatch):
    """On a 1-core host maybe() returns the inline passthrough (a worker
    thread cannot overlap anything there and measurably slows the codec);
    on multi-core it returns a real Prefetcher. The check is affinity-aware
    (cgroup quota), not raw host core count."""
    import stegotpu.video as V
    from stegotpu.video import _PassthroughPrefetcher

    monkeypatch.setattr(V, "effective_cpu_count", lambda: 1)
    with Prefetcher.maybe(iter(range(5))) as p:
        assert isinstance(p, _PassthroughPrefetcher)
        assert list(p) == list(range(5))

    monkeypatch.setattr(V, "effective_cpu_count", lambda: 8)
    with Prefetcher.maybe(iter(range(5))) as p:
        assert isinstance(p, Prefetcher)
        assert list(p) == list(range(5))


def test_passthrough_prefetcher_close_mid_iteration():
    from stegotpu.video import _PassthroughPrefetcher

    p = _PassthroughPrefetcher(iter(range(10)))
    assert next(p) == 0
    p.close()
    assert list(p) == []


def test_batches_gray_switch(tmp_path, rng):
    """mode='both' with a GraySwitch: after the consumer flips it off,
    batches arrive as (bgr, None) and the gray conversion is skipped —
    on both the native and cv2 backends."""
    from stegotpu.video import GraySwitch

    frames = rng.integers(0, 256, (8, 32, 48, 3), dtype=np.uint8)
    with VideoWriter(tmp_path / "c.avi", 24.0, 48, 32, "FFV1") as w:
        w.write_bgr_batch(frames)
    for backend in ("native", "cv2"):
        try:
            r = VideoReader(tmp_path / "c.avi", backend=backend)
        except RuntimeError:
            continue  # native lib unavailable in this environment
        with r:
            sw = GraySwitch()
            got = []
            for i, (bgr, gray) in enumerate(
                    r.batches(2, mode="both", gray_switch=sw)):
                got.append((bgr, gray))
                if i == 1:
                    sw.on = False
            assert len(got) == 4
            assert got[0][1] is not None and got[1][1] is not None
            assert got[2][1] is None and got[3][1] is None, backend
            np.testing.assert_array_equal(
                np.concatenate([b for b, _ in got]), frames)


def test_batches_frame_budget(tmp_path, rng):
    """A FrameBudget limit set mid-stream stops the decoder at exactly that
    many total frames (short final batch), on both backends; a pre-set
    limit bounds from the first batch."""
    from stegotpu.video import FrameBudget

    frames = rng.integers(0, 256, (12, 32, 48, 3), dtype=np.uint8)
    with VideoWriter(tmp_path / "b.avi", 24.0, 48, 32, "FFV1") as w:
        w.write_bgr_batch(frames)
    for backend in ("native", "cv2"):
        try:
            r = VideoReader(tmp_path / "b.avi", backend=backend)
        except RuntimeError:
            continue  # native lib unavailable in this environment
        with r:
            budget = FrameBudget()
            sizes = []
            for i, gray in enumerate(
                    r.batches(4, mode="gray", budget=budget)):
                sizes.append(gray.shape[0])
                if i == 0:
                    budget.limit = 7  # 4 read; allow 3 more
            assert sizes == [4, 3], backend
        with VideoReader(tmp_path / "b.avi", backend=backend) as r:
            sizes = [g.shape[0] for g in
                     r.batches(4, mode="gray", budget=FrameBudget(6))]
            assert sizes == [4, 2], backend
