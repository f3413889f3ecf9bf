"""Single-host segment-parallel product path (`--procs N`, r3 VERDICT
item 3): exact container seek, parallel embed/extract correctness
(pixel-identity vs the single-pipeline run), and the CLI wiring."""

import numpy as np
import pytest

from stegotpu import crypto, fixtures
from stegotpu.cli import main
from stegotpu.config import StegoConfig
from stegotpu.image import load_image_gray
from stegotpu.native.videoio import available
from stegotpu.video import VideoReader, VideoWriter


@pytest.mark.parametrize("backend", ["native", "cv2"])
@pytest.mark.parametrize("container", ["mp4", "avi"])
def test_seek_exact(tmp_path, backend, container):
    """VideoReader.seek positions EXACTLY on inter-coded (mp4) and
    intra-only (FFV1 avi) containers, including past-EOF."""
    if backend == "native" and not available():
        pytest.skip("native layer not built")
    n = 14
    if container == "mp4":
        path = tmp_path / "c.mp4"
        fixtures.make_cover_video(path, 160, 128, frames=n, kind="moving",
                                  seed=3)
    else:
        path = tmp_path / "c.avi"
        rng = np.random.default_rng(1)
        frames = rng.integers(0, 256, (n, 64, 96), np.uint8)
        with VideoWriter(path, 24.0, 96, 64, "FFV1") as w:
            w.write_gray_batch(frames)

    with VideoReader(path, backend=backend) as r:
        seq = np.concatenate(list(r.batches(4, mode="gray")))
    for k in (0, 3, 7, n - 1, n + 5):
        with VideoReader(path, backend=backend) as r:
            r.seek(k)
            got = list(r.batches(4, mode="gray"))
            flat = (np.concatenate(got) if got
                    else np.zeros((0,) + seq.shape[1:], np.uint8))
        assert flat.shape[0] == max(0, n - k), (k, flat.shape)
        np.testing.assert_array_equal(flat, seq[k:], err_msg=str(k))


@pytest.fixture
def workdir(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    fixtures.make_secret_image("s.png", 96, 96, kind="noise", seed=21)
    fixtures.make_cover_video("c.mp4", 320, 240, frames=24, kind="moving",
                              seed=22)
    return tmp_path


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_procs_embed_pixel_identical_and_extract(workdir, capsys):
    """`embed --procs 3` output is byte-level pixel-identical to the
    single-pipeline run of the same sealed payload, and both plain and
    `--procs 2` extract recover the secret exactly."""
    assert main(["embed", "c.mp4", "s.png", "one", "--payload-state", "p",
                 "--batch", "4"]) == 0
    assert main(["embed", "c.mp4", "s.png", "par", "--payload-state", "p",
                 "--batch", "4", "--procs", "3"]) == 0
    capsys.readouterr()
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

    np.testing.assert_array_equal(frames_of("one.avi"), frames_of("par.avi"))

    assert main(["extract", "par.avi", "x1.png"]) == 0
    assert main(["extract", "par.avi", "x2.png", "--procs", "2"]) == 0
    secret = load_image_gray("s.png")
    np.testing.assert_array_equal(load_image_gray("x1.png"), secret)
    np.testing.assert_array_equal(load_image_gray("x2.png"), secret)


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_procs_more_workers_than_segments(workdir, capsys):
    """procs > payload segments: idle workers are skipped, result intact."""
    from stegotpu.parallel.local_procs import parallel_embed, parallel_extract

    pub = crypto.serialize_public_compressed(
        crypto.load_public_pem("bob_public_key.pem"))
    priv = crypto.load_private_pem("bob_private_key.pem")
    cfg = StegoConfig()
    rng = np.random.default_rng(9)
    res = parallel_embed("c.mp4", "s.png", "many", pub, cfg, batch_frames=4,
                         procs=16, rng=rng)
    assert res.success and res.frames_used == 24
    ext = parallel_extract("many.avi", priv, cfg, "xm.png", batch_frames=4,
                           procs=16)
    assert ext.success and ext.hash_ok, ext.error
    np.testing.assert_array_equal(load_image_gray("xm.png"),
                                  load_image_gray("s.png"))


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_procs_extract_structured_failures(workdir, capsys):
    """parallel_extract keeps the structured-error contract: truncated
    payload region and non-stego inputs fail with .error, no exception."""
    from stegotpu.parallel.local_procs import parallel_extract

    assert main(["embed", "c.mp4", "s.png", "st", "--batch", "4"]) == 0
    capsys.readouterr()
    priv = crypto.load_private_pem("bob_private_key.pem")

    # truncate inside the payload region
    raw = (workdir / "st.avi").read_bytes()
    (workdir / "cut.avi").write_bytes(raw[: len(raw) // 3])
    res = parallel_extract("cut.avi", priv, StegoConfig(), procs=2)
    assert not res.success and res.error

    # non-stego: noise bits never yield a usable header
    res = parallel_extract("c.mp4", priv, StegoConfig(), procs=2)
    assert not res.success and res.error


def test_procs_flag_conflicts(workdir, capsys):
    assert main(["embed", "c.mp4", "s.png", "o", "--procs", "2",
                 "--frame-range", "0:8"]) == 1
    assert "--frame-range" in capsys.readouterr().err
    assert main(["embed", "c.mp4", "s.png", "o", "--procs", "2",
                 "--mesh", "data=2"]) == 1
    assert "--mesh" in capsys.readouterr().err
    assert main(["extract", "x.avi", "o.png", "--procs", "2",
                 "--mesh", "data=2"]) == 1
    assert "--mesh" in capsys.readouterr().err


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_native_seek_sequence_fuzz(tmp_path):
    """Random seek/read sequences on the native reader (incl. BACKWARD
    seeks, which the C layer supports) always deliver the absolutely-
    indexed frames — differential vs a full sequential decode."""
    n = 17
    path = tmp_path / "c.mp4"
    fixtures.make_cover_video(path, 160, 128, frames=n, kind="moving",
                              seed=61)
    with VideoReader(path, backend="native") as ref:
        oracle = [ref.read_frame() for _ in range(n)]

    rng = np.random.default_rng(62)
    with VideoReader(path, backend="native") as r:
        pos = 0
        for _ in range(24):
            if rng.random() < 0.5:
                pos = int(rng.integers(0, n + 3))
                r.seek(pos)
            else:
                got = r.read_frame()
                if pos >= n:
                    assert got is None, pos
                else:
                    np.testing.assert_array_equal(got, oracle[pos],
                                                  err_msg=f"pos={pos}")
                    pos += 1


@pytest.mark.skipif(not available(), reason="native layer not built")
@pytest.mark.parametrize("codec", ["HFYU", "RGBA"])
def test_procs_embed_non_default_codecs(workdir, capsys, codec):
    """Packet concat is codec-general: --procs output matches --procs 1
    byte-for-byte under HFYU and raw too."""
    assert main(["embed", "c.mp4", "s.png", f"one_{codec}",
                 "--payload-state", f"p{codec}", "--batch", "4",
                 "--codec", codec]) == 0
    assert main(["embed", "c.mp4", "s.png", f"par_{codec}",
                 "--payload-state", f"p{codec}", "--batch", "4",
                 "--codec", codec, "--procs", "2"]) == 0
    capsys.readouterr()
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

    np.testing.assert_array_equal(frames_of(f"one_{codec}.avi"),
                                  frames_of(f"par_{codec}.avi"))
    assert main(["extract", f"par_{codec}.avi", f"x_{codec}.png"]) == 0
    np.testing.assert_array_equal(load_image_gray(f"x_{codec}.png"),
                                  load_image_gray("s.png"))


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_embed_data_procs_roundtrip(workdir, capsys):
    """`embed-data --procs 2`: raw-bytes payloads ride the segment-parallel
    path too, and extraction recovers the exact bytes."""
    blob = bytes(np.random.default_rng(77).integers(0, 256, 5000,
                                                    dtype=np.uint8))
    (workdir / "blob.bin").write_bytes(blob)
    assert main(["embed-data", "c.mp4", "blob.bin", "db", "--batch", "4",
                 "--procs", "2"]) == 0
    assert main(["extract", "db.avi", "out.bin"]) == 0
    capsys.readouterr()
    assert (workdir / "out.bin").read_bytes() == blob


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_procs_with_verified_embed(workdir, capsys):
    """--procs composes with --verified: each segment runs the closed-loop
    repair; the stitched result extracts exactly."""
    assert main(["embed", "c.mp4", "s.png", "pv", "--batch", "4",
                 "--procs", "2", "--verified"]) == 0
    assert main(["extract", "pv.avi", "xv.png"]) == 0
    capsys.readouterr()
    np.testing.assert_array_equal(load_image_gray("xv.png"),
                                  load_image_gray("s.png"))


def test_resolve_procs_auto(monkeypatch):
    """'auto' = min(effective host cores, batch-aligned segments)."""
    from stegotpu.parallel import local_procs
    import stegotpu.video as video

    monkeypatch.setattr(video, "effective_cpu_count", lambda: 4)
    assert local_procs.resolve_procs("auto", 24, 8) == 3   # 3 segments
    assert local_procs.resolve_procs("auto", 640, 8) == 4  # core-bound
    assert local_procs.resolve_procs("auto", 4, 8) == 1    # one segment
    assert local_procs.resolve_procs(2, 4, 8) == 2         # explicit N wins
    monkeypatch.setattr(video, "effective_cpu_count", lambda: 1)
    assert local_procs.resolve_procs("auto", 640, 8) == 1


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_procs_auto_on_one_core_falls_back_to_plain(workdir, capsys):
    """`--procs auto` on a 1-core host resolves to the plain pipeline and
    still round-trips (this CI VM has one core)."""
    assert main(["embed", "c.mp4", "s.png", "auto_out", "--batch", "4",
                 "--procs", "auto"]) == 0
    assert main(["extract", "auto_out.avi", "xa.png", "--procs", "auto"]) == 0
    np.testing.assert_array_equal(load_image_gray("xa.png"),
                                  load_image_gray("s.png"))


@pytest.mark.skipif(not available(), reason="native layer not built")
def test_procs_spawn_mode_byte_identity(workdir, capsys):
    """`--procs-mode spawn` (OS-process workers, CPU-pinned jax) produces a
    byte-identical container to the thread-mode run of the same sealed
    payload, and extraction with spawn workers recovers the secret."""
    from pathlib import Path

    from stegotpu.parallel.local_procs import parallel_embed, parallel_extract

    priv = crypto.load_private_pem("bob_private_key.pem")
    pub = crypto.serialize_public_compressed(
        crypto.load_public_pem("bob_public_key.pem"))
    cfg = StegoConfig(delta=20, num_ac_coeffs=10)
    rng = np.random.default_rng(7)
    sealed = None
    from stegotpu import payload as payload_mod
    from stegotpu.image import image_to_bits
    from stegotpu.bitstream import bits_to_bytes

    w, h, bits = image_to_bits("s.png")
    sealed, _ = payload_mod.seal_payload(bits_to_bytes(bits), w, h, pub,
                                         rng=rng)
    r1 = parallel_embed("c.mp4", "s.png", "thr", pub, cfg, batch_frames=4,
                        procs=2, sealed_bits=sealed, mode="thread")
    assert r1.success
    r2 = parallel_embed("c.mp4", "s.png", "spn", pub, cfg, batch_frames=4,
                        procs=2, sealed_bits=sealed, mode="spawn")
    assert r2.success
    assert Path("thr.avi").read_bytes() == Path("spn.avi").read_bytes()

    res = parallel_extract("spn.avi", priv, cfg, procs=2, mode="spawn")
    assert res.success, res.error
    np.testing.assert_array_equal(res.pixels, load_image_gray("s.png"))


def test_procs_auto_falls_back_without_native_layer(workdir, monkeypatch):
    """`--procs auto` resolving to 1 must reach the plain pipeline even
    when the native concat layer is absent (cv2-fallback hosts) — the
    availability gate belongs AFTER the auto resolution (round-5 review
    fix: it used to raise OSError before resolve_procs could fall back)."""
    from stegotpu.native import videoio
    from stegotpu.parallel import local_procs

    monkeypatch.setattr(videoio, "available", lambda: False)
    monkeypatch.setattr(local_procs, "resolve_procs",
                        lambda procs, fc, bf: 1 if procs == "auto" else
                        int(procs))
    assert main(["embed", "c.mp4", "s.png", "nofb_out", "--batch", "4",
                 "--procs", "auto"]) == 0
    assert main(["extract", "nofb_out.avi", "xnf.png"]) == 0
    np.testing.assert_array_equal(load_image_gray("xnf.png"),
                                  load_image_gray("s.png"))
    # an EXPLICIT worker count still demands the native layer, loudly
    with pytest.raises(OSError, match="native concat layer"):
        from stegotpu.parallel.local_procs import parallel_embed

        pub = crypto.serialize_public_compressed(
            crypto.load_public_pem("bob_public_key.pem"))
        parallel_embed("c.mp4", "s.png", "expl", pub, StegoConfig(),
                       batch_frames=4, procs=2)


def test_procs_auto_defers_to_plain_with_frame_range(workdir, capsys):
    """`--procs auto --frame-range` runs the plain pipeline (auto means
    "best mode for this invocation") instead of erroring; an explicit
    worker count still conflicts loudly (round-5 review fix)."""
    assert main(["embed", "c.mp4", "s.png", "fr_out", "--batch", "4",
                 "--procs", "auto", "--frame-range", "0:24"]) == 0
    err = capsys.readouterr().err
    assert "defers to the plain pipeline" in err
    assert main(["extract", "fr_out.avi", "xfr.png"]) == 0
    np.testing.assert_array_equal(load_image_gray("xfr.png"),
                                  load_image_gray("s.png"))

    assert main(["embed", "c.mp4", "s.png", "fr2_out", "--batch", "4",
                 "--procs", "2", "--frame-range", "0:24"]) == 1
    assert "cannot combine" in capsys.readouterr().err
