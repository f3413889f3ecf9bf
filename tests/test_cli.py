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


def test_cli_embed_batch_many_covers(tmp_path, monkeypatch, capsys):
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    fixtures.make_secret_image("secret.png", 16, 16, kind="pattern")
    for i in range(3):
        fixtures.make_cover_video(f"cover{i}.mp4", 320, 240, frames=4,
                                  kind="moving", seed=i)

    assert main([
        "embed-batch", "secret.png", "cover0.mp4", "cover1.mp4", "cover2.mp4",
        "--out-dir", "out", "--batch", "4",
    ]) == 0
    out = capsys.readouterr().out
    assert "batch done: 3/3" in out
    from stegotpu.crypto import load_private_pem
    from stegotpu.pipeline import extract_image_from_video
    from stegotpu.config import StegoConfig

    priv = load_private_pem("bob_private_key.pem")
    for i in range(3):
        res = extract_image_from_video(f"out/cover{i}.avi", priv, StegoConfig())
        assert res.success and res.hash_ok
        np.testing.assert_array_equal(res.pixels, load_image_gray("secret.png"))

    # one bad cover -> exit 1, good ones still produced
    assert main([
        "embed-batch", "secret.png", "cover0.mp4", "missing.mp4",
        "--out-dir", "out2",
    ]) == 1
    assert "batch done: 1/2" in capsys.readouterr().out

    # same-stem covers would silently overwrite each other: refused up front
    import shutil

    (tmp_path / "d").mkdir()
    shutil.copy("cover0.mp4", "d/cover0.mp4")
    assert main([
        "embed-batch", "secret.png", "cover0.mp4", "d/cover0.mp4",
        "--out-dir", "out3",
    ]) == 1
    assert "overwrite" in capsys.readouterr().err


def test_cli_embed_batch_jobs_overlap(tmp_path, monkeypatch, capsys):
    """--jobs 2 overlaps files across threads; results stay in input order
    and every output decodes correctly."""
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    fixtures.make_secret_image("secret.png", 16, 16, kind="pattern")
    for i in range(4):
        fixtures.make_cover_video(f"cover{i}.mp4", 320, 240, frames=4,
                                  kind="moving", seed=i)
    assert main([
        "embed-batch", "secret.png", "cover0.mp4", "cover1.mp4",
        "cover2.mp4", "cover3.mp4", "--out-dir", "out", "--batch", "4",
        "--jobs", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "batch done: 4/4" in out
    # input order preserved in the report
    lines = [line for line in out.splitlines() if line.startswith("cover")]
    assert [line.split(":")[0] for line in lines] == [
        f"cover{i}.mp4" for i in range(4)]

    from stegotpu.config import StegoConfig
    from stegotpu.crypto import load_private_pem
    from stegotpu.pipeline import extract_image_from_video

    priv = load_private_pem("bob_private_key.pem")
    for i in range(4):
        res = extract_image_from_video(f"out/cover{i}.avi", priv, StegoConfig())
        assert res.success and res.hash_ok
        np.testing.assert_array_equal(res.pixels, load_image_gray("secret.png"))


def test_cli_embed_auto_fixtures(tmp_path, monkeypatch, capsys):
    """--auto-fixtures generates reference-style dummies for missing inputs
    (reference: config_and_setup.py:219-238, README.md:134-137) and the
    result extracts pixel-identically; without the flag, missing paths
    still fail."""
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    capsys.readouterr()
    assert main(["embed", "media/cover.mp4", "media/secret.png", "stego",
                 "--auto-fixtures"]) == 0
    out = capsys.readouterr().out
    assert "auto-fixtures: generated dummy cover" in out
    assert "auto-fixtures: generated dummy secret" in out
    assert main(["extract", "stego.avi", "x.png"]) == 0
    np.testing.assert_array_equal(
        load_image_gray("x.png"), load_image_gray("media/secret.png"))

    # without the flag the missing path is an error, not a dummy
    assert main(["embed", "missing2.mp4", "missing2.png", "s2"]) == 1


def test_cli_extract_batch(tmp_path, monkeypatch, capsys):
    """extract-batch mirrors embed-batch: many stegos -> per-stem outputs,
    warm jit, overlap via --jobs, failures reported per file."""
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    fixtures.make_secret_image("secret.png", 16, 16, kind="pattern")
    for i in range(3):
        fixtures.make_cover_video(f"cover{i}.mp4", 320, 240, frames=4,
                                  kind="moving", seed=i)
    assert main(["embed-batch", "secret.png", "cover0.mp4", "cover1.mp4",
                 "cover2.mp4", "--out-dir", "st", "--batch", "4"]) == 0
    capsys.readouterr()

    assert main(["extract-batch", "st/cover0.avi", "st/cover1.avi",
                 "st/cover2.avi", "--out-dir", "out", "--jobs", "2"]) == 0
    out = capsys.readouterr().out
    assert "batch done: 3/3" in out
    for i in range(3):
        np.testing.assert_array_equal(
            load_image_gray(f"out/cover{i}.png"), load_image_gray("secret.png"))

    # a wrong-delta file fails per-file, good ones still extract
    assert main(["extract-batch", "st/cover0.avi", "st/cover1.avi",
                 "--out-dir", "out2", "--delta", "19"]) == 1
    err = capsys.readouterr().err
    assert "FAILED" in err


def test_cli_json_outputs(tmp_path, monkeypatch, capsys):
    """capacity/inspect/steganalyze --json emit one parseable JSON line
    (the scripting surface)."""
    import json

    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    # secret sized to saturate a full frame so steganalysis sees every slot
    fixtures.make_secret_image("s.png", 48, 48, kind="pattern")
    fixtures.make_cover_video("c.mp4", 320, 240, frames=6, kind="moving")
    assert main(["embed", "c.mp4", "s.png", "st"]) == 0
    capsys.readouterr()

    assert main(["capacity", "c.mp4", "--json"]) == 0
    cap = json.loads(capsys.readouterr().out)
    assert cap["qim_bits_per_frame"] == (240 // 8) * (320 // 8) * 10

    assert main(["inspect", "st.avi", "--json"]) == 0
    ins = json.loads(capsys.readouterr().out)
    assert ins["secret_width"] == 48 and ins["payload_type"] == "image"
    assert ins["ciphertext_bytes"] == 48 * 48

    assert main(["steganalyze", "st.avi", "--json"]) == 0
    stz = json.loads(capsys.readouterr().out)
    assert stz["detected"] and stz["estimated_delta"] == 20
    assert stz["estimated_num_ac"] == 10


def test_cli_segment_embed_resume_and_concat(tmp_path, monkeypatch, capsys):
    """Resumable embeds: two separate CLI runs embed frame ranges [0:8) and
    [8:EOF) against a persisted sealed payload, `concat` stitches them, and
    the result is pixel-identical to a single full embed of the same
    payload — the interrupted-run recovery story."""
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    fixtures.make_secret_image("s.png", 56, 56, kind="noise", seed=1)
    fixtures.make_cover_video("c.mp4", 160, 128, frames=12, kind="moving",
                              seed=2)
    # run 1 ("interrupted"): frames [0, 8), seals + saves the payload
    assert main(["embed", "c.mp4", "s.png", "seg0", "--batch", "4",
                 "--frame-range", "0:8", "--payload-state", "p"]) == 0
    assert "sealed payload saved" in capsys.readouterr().out
    # run 2 (the resume): frames [8, EOF) against the SAME sealed payload
    assert main(["embed", "c.mp4", "s.png", "seg1", "--batch", "4",
                 "--frame-range", "8:", "--payload-state", "p"]) == 0
    assert main(["concat", "full.avi", "seg0.avi", "seg1.avi"]) == 0
    capsys.readouterr()

    # reference run: one invocation, same sealed payload, full video
    assert main(["embed", "c.mp4", "s.png", "one", "--batch", "4",
                 "--payload-state", "p"]) == 0
    import cv2

    def frames_of(p):
        cap = cv2.VideoCapture(p)
        out = []
        while True:
            ok, f = cap.read()
            if not ok:
                break
            out.append(f)
        cap.release()
        return np.stack(out)

    np.testing.assert_array_equal(frames_of("full.avi"), frames_of("one.avi"))
    assert main(["extract", "full.avi", "x.png"]) == 0
    np.testing.assert_array_equal(load_image_gray("x.png"),
                                  load_image_gray("s.png"))


def test_cli_extract_auto_params_recovery(tmp_path, monkeypatch, capsys):
    """RECOVERY MODE (r3 VERDICT item 7): a stego embedded with
    non-default parameters extracts with NO delta/coeffs given when
    --auto-params lets steganalysis recover them from the lattice."""
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    from stegotpu import fixtures

    # big-enough secret that the payload saturates slots on frame 0
    fixtures.make_secret_image("s.png", 48, 48, kind="noise", seed=11)
    fixtures.make_cover_video("c.mp4", 320, 240, frames=8, kind="moving",
                              seed=12)
    assert main(["embed", "c.mp4", "s.png", "st",
                 "--delta", "32", "--coeffs", "3"]) == 0
    capsys.readouterr()

    # defaults (20/10) fail without recovery...
    assert main(["extract", "st.avi", "x.png"]) == 1
    capsys.readouterr()
    # ...and succeed with it, clearly labeled
    assert main(["extract", "st.avi", "x.png", "--auto-params"]) == 0
    out = capsys.readouterr()
    assert "RECOVERY" in out.err
    assert "recovered parameters: delta=32, coeffs=3" in out.out

    extracted = load_image_gray("x.png")
    np.testing.assert_array_equal(extracted, load_image_gray("s.png"))

    # a NON-stego input reports recovery failure, not a bogus retry
    assert main(["extract", "c.mp4", "y.png", "--auto-params"]) == 1
    err = capsys.readouterr().err
    assert "RECOVERY FAILED" in err and "EXTRACT FAILED" in err
