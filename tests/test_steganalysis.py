"""Steganalysis: detects stego video at the right delta; clean video passes."""

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.config import StegoConfig
from stegotpu.pipeline import embed_image_in_video
from stegotpu.steganalysis import analyze_frames, analyze_video


@pytest.fixture(scope="module")
def stego_and_clean(tmp_path_factory):
    d = tmp_path_factory.mktemp("steg")
    fixtures.make_secret_image(d / "s.png", 48, 48, kind="noise", seed=5)
    fixtures.make_cover_video(d / "clean.mp4", 320, 240, frames=6, kind="noise",
                              seed=11)
    _, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")
    res = embed_image_in_video(d / "clean.mp4", d / "s.png", d / "stego",
                               pub_c, StegoConfig(delta=20, num_ac_coeffs=10))
    assert res.success
    return d / "clean.mp4", res.output_path


def test_detects_stego_at_true_delta(stego_and_clean):
    clean, stego = stego_and_clean
    rep = analyze_video(stego, max_frames=2)
    assert rep.detected
    # delta=20 or a divisor structure; the top candidate must be 20
    assert rep.best_delta == 20
    assert rep.detection_ratio > 3.0


def test_clean_video_not_flagged(stego_and_clean):
    clean, _ = stego_and_clean
    rep = analyze_video(clean, max_frames=2)
    assert not rep.detected
    assert rep.detection_ratio < 3.0


def test_detects_high_delta_stego(tmp_path):
    """The delta grid covers the reference GUI's full spinbox range [1,100]
    (reference: app.py:231-234) — a delta=80 stego must NOT score as clean."""
    fixtures.make_secret_image(tmp_path / "s.png", 32, 32, kind="noise", seed=7)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=4,
                              kind="noise", seed=13)
    _, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c,
                               StegoConfig(delta=80, num_ac_coeffs=10))
    assert res.success
    rep = analyze_video(res.output_path, max_frames=2)
    assert rep.detected
    assert rep.best_delta == 80


def test_analyze_frames_direct(rng):
    frames = rng.integers(40, 216, (2, 64, 64), dtype=np.uint8)
    rep = analyze_frames(frames)
    assert rep.scores.shape == rep.deltas.shape
    assert not rep.detected


@pytest.mark.parametrize("n_true", [3, 10])
def test_estimate_num_ac_recovers_parameter(tmp_path, n_true):
    """Keyless parameter recovery: slots 1..N saturate the lattice, slot N+1
    does not — the out-of-band num_ac is readable from the stego itself."""
    from stegotpu.ops.color import bgr_to_gray_np
    from stegotpu.steganalysis import estimate_num_ac
    from stegotpu.video import VideoReader

    fixtures.make_secret_image(tmp_path / "s.png", 40, 40, kind="noise", seed=2)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=8,
                              kind="noise", seed=3)
    _, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    res = embed_image_in_video(
        tmp_path / "c.mp4", tmp_path / "s.png", tmp_path / "st", pub_c,
        StegoConfig(delta=20, num_ac_coeffs=n_true),
    )
    assert res.success
    with VideoReader(res.output_path) as r:
        frames = np.stack([bgr_to_gray_np(r.read_frame()) for _ in range(2)])
    assert estimate_num_ac(frames, 20.0) == n_true
    # a clean frame estimates 0 at any delta
    clean = np.stack([bgr_to_gray_np(f) for f in _first_frames(tmp_path / "c.mp4", 2)])
    assert estimate_num_ac(clean, 20.0) == 0


def _first_frames(path, n):
    from stegotpu.video import VideoReader

    with VideoReader(path) as r:
        return [r.read_frame() for _ in range(n)]


@pytest.mark.parametrize("kind,seed", [("noise", 1), ("noise", 2),
                                       ("moving", 1), ("moving", 2)])
def test_clean_covers_not_flagged_across_content(tmp_path, kind, seed):
    """False-positive guard across content kinds and seeds: synthetic
    low-texture covers can coincidentally align with some delta, but the
    score-floor condition must keep them clean-likely."""
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=6,
                              kind=kind, seed=seed)
    rep = analyze_video(tmp_path / "c.mp4")
    assert not rep.detected, (kind, seed, rep.detection_ratio, rep.best_score)


def test_detection_robust_to_payload_randomness(tmp_path):
    """Regression: the best-frame background estimate left real stegos
    hovering at exactly the 3.0x threshold, so detection depended on the
    crypto-random payload bits. Any seed must detect decisively now."""
    fixtures.make_secret_image(tmp_path / "s.png", 48, 48, kind="noise", seed=2)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=6,
                              kind="moving", seed=3)
    _, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    for seed in (1, 2):  # seeds that previously landed at ratio ~2.97
        res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                                   tmp_path / f"st{seed}", pub_c, StegoConfig(),
                                   rng=np.random.default_rng(seed))
        rep = analyze_video(res.output_path)
        assert rep.detected and rep.detection_ratio > 4.5, rep.detection_ratio


def test_recover_params_with_smaller_true_num_ac(tmp_path):
    """Recovery must find a stego embedded with FEWER coefficients than the
    configured num_ac (round-5 review: scoring over config's 10 slots
    diluted a true-N=3 lattice below the detection floor, reporting 'not a
    stego video' for exactly the case recovery exists to fix)."""
    from stegotpu import crypto, fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video
    from stegotpu.steganalysis import recover_params

    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=6,
                              kind="noise", seed=11)
    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="noise",
                               seed=12)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                             tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c,
                               StegoConfig(delta=20, num_ac_coeffs=3),
                               batch_frames=4)
    assert res.success
    new_cfg, msg = recover_params(res.output_path,
                                  StegoConfig(delta=20, num_ac_coeffs=10))
    assert new_cfg is not None, msg
    assert new_cfg.num_ac_coeffs == 3 and new_cfg.delta == 20, msg
    ext = extract_image_from_video(res.output_path, priv, new_cfg)
    assert ext.success and ext.hash_ok
