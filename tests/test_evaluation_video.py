"""Whole-video comparison tests."""

import numpy as np
import pytest

from stegotpu import fixtures
from stegotpu.evaluation import compare_videos


def test_identical_videos(tmp_path):
    fixtures.make_cover_video(tmp_path / "a.mp4", 128, 96, frames=6)
    vc = compare_videos(tmp_path / "a.mp4", tmp_path / "a.mp4")
    assert vc.frames == 6
    assert vc.mean_psnr == float("inf") or vc.mean_psnr > 50  # mp4 self-read exact
    assert vc.mean_ssim > 0.999


def test_different_videos(tmp_path):
    fixtures.make_cover_video(tmp_path / "a.mp4", 128, 96, frames=6, kind="moving")
    fixtures.make_cover_video(tmp_path / "b.mp4", 128, 96, frames=6, kind="noise")
    vc = compare_videos(tmp_path / "a.mp4", tmp_path / "b.mp4")
    assert vc.frames == 6
    assert vc.mean_psnr < 20
    assert vc.min_psnr <= vc.mean_psnr
    assert vc.verdict == "POOR"


def test_max_frames_limit(tmp_path):
    fixtures.make_cover_video(tmp_path / "a.mp4", 128, 96, frames=10)
    vc = compare_videos(tmp_path / "a.mp4", tmp_path / "a.mp4", max_frames=4)
    assert vc.frames == 4


def test_cli_all_frames(tmp_path, monkeypatch, capsys):
    from stegotpu.cli import main

    monkeypatch.chdir(tmp_path)
    fixtures.make_cover_video(tmp_path / "a.mp4", 128, 96, frames=5)
    assert main(["evaluate", "a.mp4", "a.mp4", "--all-frames"]) == 0
    out = capsys.readouterr().out
    assert "5 frames" in out and "mean PSNR" in out
