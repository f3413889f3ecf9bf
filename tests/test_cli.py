"""CLI end-to-end: genkey -> fixtures -> embed -> extract -> evaluate."""

import numpy as np
import pytest

from stegotpu.cli import main
from stegotpu.image import load_image_gray


def test_cli_full_workflow(tmp_path, capsys, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    assert (tmp_path / "bob_private_key.pem").exists()
    # genkey refuses to overwrite without --force
    assert main(["genkey"]) == 1
    assert main(["genkey", "--force"]) == 0

    assert main([
        "fixtures", "--dir", "media", "--width", "320", "--height", "240",
        "--frames", "8", "--secret-size", "32",
    ]) == 0

    assert main([
        "embed", "media/cover.mp4", "media/secret.png", "out/stego",
        "--batch", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "PSNR" in out

    assert main([
        "extract", "out/stego.avi", "out/extracted.png", "--batch", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "OK" in out
    np.testing.assert_array_equal(
        load_image_gray("out/extracted.png"), load_image_gray("media/secret.png")
    )

    assert main([
        "evaluate", "media/cover.mp4", "out/stego.avi",
        "--secret", "media/secret.png", "--extracted", "out/extracted.png",
    ]) == 0
    out = capsys.readouterr().out
    assert "SSIM" in out and "security" in out

    assert main(["capacity", "media/cover.mp4"]) == 0
    assert "bits/frame" in capsys.readouterr().out


def test_cli_extract_wrong_params_fails(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    assert main(["fixtures", "--dir", "media", "--width", "320", "--height", "240",
                 "--frames", "6", "--secret-size", "16"]) == 0
    assert main(["embed", "media/cover.mp4", "media/secret.png", "stego"]) == 0
    capsys.readouterr()
    assert main(["extract", "stego.avi", "x.png", "--delta", "19"]) == 1
    assert "FAILED" in capsys.readouterr().err
