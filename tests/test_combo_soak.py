"""Combination soak: pallas kernel + verified embed + native I/O + payload
spanning many frames, in one flow — the features must compose."""

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.native import videoio
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video


@pytest.mark.skipif(not videoio.available(), reason="native lib unavailable")
def test_pallas_verified_native_multiframe(tmp_path, rng):
    # pallas-compatible width, low capacity -> payload spans ~6 frames;
    # cover includes a black band (exercises the verified repair)
    import cv2

    path = tmp_path / "cover.mp4"
    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24.0,
                          (384, 240))
    for i in range(16):
        f = rng.integers(40, 216, (240, 384, 3), dtype=np.uint8)
        f[:48] = 0  # saturated black band in every frame
        out.write(f)
    out.release()

    fixtures.make_secret_image(tmp_path / "s.png", 40, 40, kind="noise", seed=3)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    cfg = StegoConfig(delta=20, num_ac_coeffs=2, kernel="pallas",
                      verified_embed=True, repair_rounds=4)
    # capacity: 48*30*2 = 2880 bits/frame; payload 976+12800 = 13776 -> 5 frames
    res = embed_image_in_video(path, tmp_path / "s.png", tmp_path / "st",
                               pub_c, cfg, batch_frames=4)
    assert res.success

    # extract with the plain xla kernel + forced cv2 backend: everything must
    # interoperate on the wire
    ext = extract_image_from_video(
        res.output_path, priv,
        StegoConfig(delta=20, num_ac_coeffs=2, kernel="xla"),
        batch_frames=3,
    )
    assert ext.success, ext.error
    assert ext.hash_ok
    np.testing.assert_array_equal(ext.pixels, load_image_gray(tmp_path / "s.png"))
