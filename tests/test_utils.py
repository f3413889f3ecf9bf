"""Utility subsystem tests: stage timer, logging config, kernel dispatch,
pipeline with the pallas kernel selected."""

import logging
import time

import numpy as np
import pytest

from stegotpu.config import StegoConfig
from stegotpu.ops import dispatch, pallas_kernel, qim
from stegotpu.utils.logging import configure, get_logger
from stegotpu.utils.profiling import StageTimer


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        time.sleep(0.01)
    with t.stage("a"):
        pass
    with t.stage("b"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    assert t.totals["a"] >= 0.01
    rep = t.report()
    assert "a:" in rep and "ms/call" in rep


def test_logging_configure(capsys):
    import io
    buf = io.StringIO()
    configure(verbose=True, stream=buf)
    log = get_logger()
    log.debug("hello-debug")
    assert "hello-debug" in buf.getvalue()
    configure(verbose=False, stream=buf)
    log.debug("hidden")
    assert "hidden" not in buf.getvalue()


def test_dispatch_selection():
    assert dispatch.embed_fn("auto", 1080, 1920) is qim.embed_frames
    assert dispatch.embed_fn("xla", 1080, 1920) is qim.embed_frames
    assert dispatch.embed_fn("pallas", 1080, 1920) is pallas_kernel.embed_frames_pallas
    # non-128-multiple widths now run pallas via lane padding (r4)
    assert dispatch.embed_fn("pallas", 240, 320) is pallas_kernel.embed_frames_pallas
    # non-8-multiple frames (pre-crop) still fall back
    assert dispatch.embed_fn("pallas", 240, 322) is qim.embed_frames
    assert dispatch.extract_fn("pallas", 1080, 1920) is pallas_kernel.extract_frames_pallas


def test_config_kernel_validation():
    StegoConfig(kernel="pallas")
    with pytest.raises(ValueError):
        StegoConfig(kernel="cuda")


def test_pipeline_with_pallas_kernel(rng, tmp_path):
    """Full file round trip with kernel='pallas' (W=384 is 3x128)."""
    from stegotpu import crypto, fixtures
    from stegotpu.image import load_image_gray
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video

    fixtures.make_secret_image(tmp_path / "s.png", 16, 16, kind="pattern")
    fixtures.make_cover_video(tmp_path / "c.mp4", 384, 240, frames=6)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    cfg = StegoConfig(kernel="pallas")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, cfg, batch_frames=3)
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=3)
    assert ext.success, ext.error
    np.testing.assert_array_equal(ext.pixels, load_image_gray(tmp_path / "s.png"))
