"""Evaluation-suite tests: verdicts, capacity math, crypto timing probes."""

import numpy as np
import pytest

from stegotpu import fixtures
from stegotpu.config import StegoConfig
from stegotpu.evaluation import (
    capacity_report,
    compare_frames,
    measure_crypto_timings,
    quality_verdict,
    security_summary,
)


def test_quality_verdict_thresholds():
    # reference rubric (evaluation.py:40-45)
    assert quality_verdict(35.0) == "GOOD"
    assert quality_verdict(25.0) == "ACCEPTABLE"
    assert quality_verdict(15.0) == "POOR"


def test_compare_frames(rng):
    a = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    cmp_same = compare_frames(a, a)
    assert cmp_same.psnr == float("inf")
    assert abs(cmp_same.ssim - 1.0) < 1e-6


def test_capacity_report(tmp_path):
    fixtures.make_cover_video(tmp_path / "c.mp4", 324, 244, frames=5)
    r = capacity_report(tmp_path / "c.mp4", StegoConfig(num_ac_coeffs=10))
    # cropped to 320x240 -> 40*30 blocks * 10
    assert r.qim_bits_per_frame == 40 * 30 * 10
    assert r.naive_bits_per_frame == 320 * 240
    assert r.frames == 5
    assert r.total_qim_bits == 5 * 12000
    assert r.max_secret_pixels == (5 * 12000 - 976) // 8


def test_crypto_timings_are_real():
    t = measure_crypto_timings(payload_bytes=1024, repeats=3)
    # real operations take nonzero but sane time
    for v in (t.keygen_ms, t.ecdh_ms, t.hkdf_ms, t.aes_encrypt_ms,
              t.aes_decrypt_ms, t.sha3_ms):
        assert 0 < v < 1000


def test_security_summary_contents():
    s = security_summary()
    assert s["curve"].startswith("SECP256R1")
    assert s["ecdh_security_bits"] == 128
