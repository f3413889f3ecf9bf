"""Multi-host PRODUCT path: cooperative dist-embed / dist-extract via the
CLI across 2 processes (jax.distributed + Gloo), segment stitch by native
packet concat. The payload deliberately spans the segment boundary, and
the stitched stego must decode pixel-identically to the single-process
embed with the same deterministic crypto stream."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.native import videoio

REPO = Path(__file__).resolve().parent.parent

pytestmark = pytest.mark.skipif(
    not videoio.available(), reason="native concat needs the native lib")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(cmd_args, pid, nproc, port, extra_env=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=str(REPO),
               **(extra_env or {}))
    return subprocess.Popen(
        [sys.executable, "-m", "stegotpu.cli", "--platform", "cpu",
         *cmd_args, "--coordinator", f"127.0.0.1:{port}",
         "--num-processes", str(nproc), "--process-id", str(pid)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


def _run_all(cmd_args, nproc=2, extra_env=None):
    port = _free_port()
    procs = [_spawn(cmd_args, pid, nproc, port, extra_env)
             for pid in range(nproc)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
    return outs


_FOUR_DEVICES = {"XLA_FLAGS": "--xla_force_host_platform_device_count=4"}


def _decode_all(path):
    import cv2

    cap = cv2.VideoCapture(str(path))
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    return np.stack(frames)


def test_dist_embed_extract_two_processes(tmp_path):
    d = tmp_path
    # payload spans the segment boundary: 12 frames, batch 4 -> host 0 owns
    # [0, 8), host 1 [8, 12); a 56x56 secret needs ~9 frames at 128x160
    fixtures.make_secret_image(d / "s.png", 56, 56, kind="noise", seed=3)
    fixtures.make_cover_video(d / "c.mp4", 160, 128, frames=12,
                              kind="moving", seed=4)
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")

    outs = _run_all([
        "dist-embed", str(d / "c.mp4"), str(d / "s.png"), str(d / "st"),
        "--public-key", str(d / "p.pem"), "--seed", "5", "--batch", "4",
    ])
    assert any("embedded" in o and "2 hosts" in o for o in outs), outs
    stego = d / "st.avi"
    assert stego.exists()
    assert not list(d.glob("*.seg*.avi"))  # segments cleaned up

    # pixel-identical to the single-process embed with the same crypto seed
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video

    res1 = embed_image_in_video(d / "c.mp4", d / "s.png", d / "st_one", pub_c,
                                StegoConfig(), batch_frames=4,
                                rng=np.random.default_rng(5))
    assert res1.success
    np.testing.assert_array_equal(_decode_all(stego),
                                  _decode_all(res1.output_path))

    # single-process extract of the stitched file
    ext = extract_image_from_video(stego, priv, StegoConfig())
    assert ext.success and ext.hash_ok
    np.testing.assert_array_equal(ext.pixels, load_image_gray(d / "s.png"))

    # cooperative 2-process extract
    outs = _run_all([
        "dist-extract", str(stego), str(d / "out.png"),
        "--private-key", str(d / "k.pem"), "--batch", "4",
    ])
    assert any("SHA3-256 integrity: OK" in o for o in outs), outs
    np.testing.assert_array_equal(load_image_gray(d / "out.png"),
                                  load_image_gray(d / "s.png"))


def test_segment_bounds():
    from stegotpu.parallel.dist_pipeline import segment_bounds

    assert segment_bounds(12, 2, 4) == [(0, 8), (8, None)]
    assert segment_bounds(64, 4, 8) == [(0, 16), (16, 32), (32, 48), (48, None)]
    # more processes than batches: trailing hosts idle (lo == frame_count)
    assert segment_bounds(4, 3, 4) == [(0, 4), (4, 4), (4, None)]
    with pytest.raises(ValueError):
        segment_bounds(0, 2, 4)


def test_dist_embed_with_per_host_mesh_and_hfyu(tmp_path):
    """The full hierarchy: frame-range segments across 2 processes x a
    ('data','space') mesh over each process's 4 local virtual devices —
    with the HFYU codec exercising the packet concat on a second codec.
    Output must extract single-process, pixel-identically."""
    d = tmp_path
    fixtures.make_secret_image(d / "s.png", 56, 56, kind="noise", seed=3)
    fixtures.make_cover_video(d / "c.mp4", 160, 128, frames=12,
                              kind="moving", seed=4)
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")

    _run_all([
        "dist-embed", str(d / "c.mp4"), str(d / "s.png"), str(d / "st"),
        "--public-key", str(d / "p.pem"), "--seed", "5", "--batch", "4",
        "--codec", "HFYU", "--mesh", "data=2,space=2",
    ], extra_env=_FOUR_DEVICES)

    from stegotpu.pipeline import extract_image_from_video

    ext = extract_image_from_video(d / "st.avi", priv, StegoConfig())
    assert ext.success and ext.hash_ok, ext.error
    np.testing.assert_array_equal(ext.pixels, load_image_gray(d / "s.png"))

    # and the cooperative extract with its own per-host mesh
    _run_all([
        "dist-extract", str(d / "st.avi"), str(d / "out.png"),
        "--private-key", str(d / "k.pem"), "--batch", "4",
        "--mesh", "data=2,space=2",
    ], extra_env=_FOUR_DEVICES)
    np.testing.assert_array_equal(load_image_gray(d / "out.png"),
                                  load_image_gray(d / "s.png"))


def test_dist_embed_mesh_batch_rounding(tmp_path):
    """Regression: a mesh data axis that does not divide --batch rounds the
    batch UP inside the pipeline; segment bounds must be computed with the
    ROUNDED batch or batches straddle segment boundaries and frames
    duplicate in the stitched output (extraction garbage)."""
    d = tmp_path
    fixtures.make_secret_image(d / "s.png", 64, 64, kind="noise", seed=3)
    fixtures.make_cover_video(d / "c.mp4", 160, 128, frames=20,
                              kind="moving", seed=4)
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")

    _run_all([
        "dist-embed", str(d / "c.mp4"), str(d / "s.png"), str(d / "st"),
        "--public-key", str(d / "p.pem"), "--seed", "5", "--batch", "8",
        "--mesh", "data=3",  # 3 does not divide 8 -> batch rounds to 9
    ], extra_env=_FOUR_DEVICES)

    from stegotpu.pipeline import extract_image_from_video

    frames = _decode_all(d / "st.avi")
    assert frames.shape[0] == 20  # no duplicated boundary frames
    ext = extract_image_from_video(d / "st.avi", priv, StegoConfig())
    assert ext.success and ext.hash_ok, ext.error
    np.testing.assert_array_equal(ext.pixels, load_image_gray(d / "s.png"))


def test_dist_extract_payload_spans_both_segments(tmp_path):
    """Tiny-capacity cover (64x64, 640 bits/frame): the payload needs ~5 of
    8 frames, so the demand-driven extract rounds must pull bits from BOTH
    hosts' segments ((0,4) and (4,EOF) at batch 2) before the parse
    completes."""
    d = tmp_path
    fixtures.make_secret_image(d / "s.png", 16, 16, kind="noise", seed=7)
    fixtures.make_cover_video(d / "c.mp4", 64, 64, frames=8,
                              kind="moving", seed=8)
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")

    outs = _run_all([
        "dist-embed", str(d / "c.mp4"), str(d / "s.png"), str(d / "st"),
        "--public-key", str(d / "p.pem"), "--seed", "9", "--batch", "2",
    ])
    assert any("embedded" in o for o in outs), outs

    outs = _run_all([
        "dist-extract", str(d / "st.avi"), str(d / "out.png"),
        "--private-key", str(d / "k.pem"), "--batch", "2",
    ])
    assert any("SHA3-256 integrity: OK" in o for o in outs), outs
    np.testing.assert_array_equal(load_image_gray(d / "out.png"),
                                  load_image_gray(d / "s.png"))


def test_segment_bounds_properties_exhaustive():
    """Invariants over the whole small parameter space: segments are
    disjoint, ordered, cover [0, frame_count), interior cuts align to
    batch_frames, and only the last segment is open-ended."""
    from stegotpu.parallel.dist_pipeline import segment_bounds

    for frame_count in range(1, 41):
        for nproc in range(1, 5):
            for batch in range(1, 9):
                bounds = segment_bounds(frame_count, nproc, batch)
                assert len(bounds) == nproc
                prev_hi = 0
                for i, (lo, hi) in enumerate(bounds):
                    assert lo == prev_hi  # contiguous, ordered
                    assert lo % batch == 0 or lo == frame_count
                    if i == nproc - 1:
                        assert hi is None
                        prev_hi = frame_count
                    else:
                        assert hi is not None and hi >= lo
                        assert hi % batch == 0 or hi == frame_count
                        prev_hi = hi
                assert prev_hi == frame_count  # full coverage
