"""Round trips on the reference's OWN bundled benchmark assets
(BASELINE.json config: "cover_1.mp4 720p + image64.png secret, 3 AC
coeffs/block QIM"). Skipped when the read-only reference mount is absent."""

from pathlib import Path

import numpy as np
import pytest

from stegotpu import crypto
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video

REF_MEDIA = Path("/root/reference/media/input")

pytestmark = pytest.mark.skipif(
    not (REF_MEDIA / "cover_1.mp4").exists(),
    reason="reference media assets not mounted",
)


def test_cover1_image64_three_coeffs(tmp_path):
    """The BASELINE benchmark config, end to end on real 720p video.

    Real footage contains saturated regions where plain QIM occasionally
    loses a bit to clipping (ciphertext is random per run, so which blocks
    carry which bits varies) — verified embed guarantees the round trip
    while the extraction below stays completely standard.
    """
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    cfg = StegoConfig(delta=20, num_ac_coeffs=3, verified_embed=True)
    res = embed_image_in_video(
        REF_MEDIA / "cover_1.mp4", REF_MEDIA / "image64.png",
        tmp_path / "stego1", pub_c, cfg, batch_frames=8,
    )
    assert res.success
    # 64x64 secret: 976 + 32768 = 33744 bits; 720p at N=3 = 43200 bits/frame
    assert res.total_payload_bits == 33744
    assert res.first_frame_psnr > 30.0  # "SANGAT BAIK" band on real content
    plain_cfg = StegoConfig(delta=20, num_ac_coeffs=3)  # standard extractor
    ext = extract_image_from_video(res.output_path, priv, plain_cfg, batch_frames=8)
    assert ext.success, ext.error
    assert ext.hash_ok
    np.testing.assert_array_equal(
        ext.pixels, load_image_gray(REF_MEDIA / "image64.png")
    )


def test_cover2_image32_default_params(tmp_path):
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    # verified embed for determinism on real footage (see note above);
    # delta=20, N=10 are the reference defaults
    cfg = StegoConfig(verified_embed=True)
    res = embed_image_in_video(
        REF_MEDIA / "cover_2.mp4", REF_MEDIA / "image32.png",
        tmp_path / "stego2", pub_c, cfg, batch_frames=8,
    )
    assert res.success
    ext = extract_image_from_video(res.output_path, priv, StegoConfig(),
                                   batch_frames=8)
    assert ext.success, ext.error
    np.testing.assert_array_equal(
        ext.pixels, load_image_gray(REF_MEDIA / "image32.png")
    )
