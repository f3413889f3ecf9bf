"""End-to-end with non-multiple-of-8 video dimensions: the top-left crop
(reference: embed_process.py:94) must be applied identically on both sides."""

import numpy as np

from stegotpu import crypto, fixtures
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video


def test_odd_dimensions_roundtrip(tmp_path, rng):
    # 325x243 -> cropped to 320x240
    fixtures.make_cover_video(tmp_path / "odd.mp4", 325, 243, frames=8)
    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="pattern")
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    cfg = StegoConfig()
    res = embed_image_in_video(tmp_path / "odd.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, cfg, batch_frames=4)
    assert res.success
    # output video must be the cropped size
    from stegotpu.video import VideoReader

    with VideoReader(res.output_path) as r:
        assert (r.info.width, r.info.height) == (320, 240)
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=4)
    assert ext.success, ext.error
    np.testing.assert_array_equal(ext.pixels, load_image_gray(tmp_path / "s.png"))
