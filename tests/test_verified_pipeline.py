"""End-to-end verified embed: a black-background cover that defeats the plain
embed must round-trip pixel-identically with --verified."""

import numpy as np
import pytest

from stegotpu import crypto
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray, save_image_gray
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video


@pytest.fixture
def black_cover(tmp_path, rng):
    """A mostly-black cover video (the algorithm's worst case)."""
    import cv2

    path = tmp_path / "black.mp4"
    out = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"), 24.0, (320, 240))
    for i in range(8):
        frame = np.zeros((240, 320, 3), np.uint8)
        frame[100:140, 100 + i * 4 : 140 + i * 4] = 90  # a small moving patch
        out.write(frame)
    out.release()
    return path


def test_verified_cli_flag_wired():
    from stegotpu.cli import build_parser

    args = build_parser().parse_args(["embed", "a", "b", "c", "--verified"])
    assert args.verified


def test_black_cover_plain_fails_verified_succeeds(tmp_path, rng, black_cover):
    secret = tmp_path / "s.png"
    save_image_gray(rng.integers(0, 256, (24, 24), dtype=np.uint8), secret)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")

    plain = StegoConfig()
    res_p = embed_image_in_video(black_cover, secret, tmp_path / "plain", pub_c, plain)
    assert res_p.success  # embeds fine; the loss shows at extraction
    ext_p = extract_image_from_video(res_p.output_path, priv, plain)
    plain_ok = ext_p.success and np.array_equal(
        ext_p.pixels, load_image_gray(secret)
    )
    assert not plain_ok, "test premise: plain embed must fail on a black cover"

    ver = StegoConfig(verified_embed=True, repair_rounds=4)
    res_v = embed_image_in_video(black_cover, secret, tmp_path / "ver", pub_c, ver)
    assert res_v.success
    ext_v = extract_image_from_video(res_v.output_path, priv, plain)  # std extract
    assert ext_v.success, ext_v.error
    assert ext_v.hash_ok
    np.testing.assert_array_equal(ext_v.pixels, load_image_gray(secret))


def test_residual_fails_embed_unless_allowed(tmp_path, rng):
    """An unrepairable cover (checkerboard at max dynamic range: pre-clip
    block range > 255, no DC shift can help) must FAIL the embed with the
    residual surfaced — unless allow_residual opts into the reference's
    silent-loss behavior."""
    import cv2

    from stegotpu import crypto, fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import embed_image_in_video

    # checkerboard cover: every block's pre-clip range far exceeds 255
    h, w = 64, 128
    yy, xx = np.mgrid[0:h, 0:w]
    checker = ((yy + xx) % 2 * 255).astype(np.uint8)
    vw = cv2.VideoWriter(str(tmp_path / "c.avi"),
                         cv2.VideoWriter_fourcc(*"FFV1"), 24.0, (w, h), True)
    for _ in range(60):
        vw.write(np.repeat(checker[..., None], 3, axis=-1))
    vw.release()
    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="noise", seed=5)
    _, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")

    res = embed_image_in_video(
        tmp_path / "c.avi", tmp_path / "s.png", tmp_path / "st", pub_c,
        StegoConfig(delta=20, num_ac_coeffs=10, verified_embed=True),
        rng=np.random.default_rng(11),  # deterministic crypto stream
    )
    assert not res.success
    assert res.residual_bits > 0

    res2 = embed_image_in_video(
        tmp_path / "c.avi", tmp_path / "s.png", tmp_path / "st2", pub_c,
        StegoConfig(delta=20, num_ac_coeffs=10, verified_embed=True,
                    allow_residual=True),
        rng=np.random.default_rng(11),
    )
    assert res2.success
    assert res2.residual_bits == res.residual_bits > 0
