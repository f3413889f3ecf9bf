"""Regressions for code-review findings: key re-derivation, structured
extraction errors on garbage headers, header-only parsing, backend
precedence."""

import numpy as np
import pytest

from stegotpu import crypto
from stegotpu.payload import (
    FIXED_HEADER_BITS,
    NeedMoreBits,
    PayloadParts,
    build_payload_bits,
    parse_header_bits,
)


def test_setup_keys_rederives_public_not_regenerate(tmp_path):
    """Missing public PEM must NOT nuke the private key."""
    priv_p, pub_p = tmp_path / "k.pem", tmp_path / "p.pem"
    priv1, pub_c1 = crypto.setup_receiver_keys(priv_p, pub_p)
    pub_p.unlink()
    priv2, pub_c2 = crypto.setup_receiver_keys(priv_p, pub_p)
    assert pub_c1 == pub_c2  # same key, public half re-derived
    assert priv1.private_numbers().private_value == priv2.private_numbers().private_value
    assert pub_p.exists()


def test_parse_header_bits_without_ciphertext():
    parts = PayloadParts(
        secret_width=100, secret_height=50,
        sender_pub_compressed=b"\x02" + b"\x11" * 32,
        hkdf_salt=b"\x22" * 16, sha3_hash=b"\x33" * 32,
        nonce=b"\x44" * 12, tag=b"\x55" * 16,
        ciphertext=b"\x66" * 5000,
    )
    bits = build_payload_bits(parts)
    # give ONLY the header bits — ciphertext absent entirely
    hdr, ct_len, consumed = parse_header_bits(bits[:FIXED_HEADER_BITS])
    assert (hdr.secret_width, hdr.secret_height) == (100, 50)
    assert ct_len == 5000
    assert consumed == FIXED_HEADER_BITS
    assert hdr.ciphertext == b""
    with pytest.raises(NeedMoreBits):
        parse_header_bits(bits[:500])


def test_extract_invalid_point_returns_structured_error(rng, tmp_path):
    """Garbage bits forming a plausible header with an off-curve 'point'
    must produce ExtractResult(error=...), not an exception."""
    from stegotpu import fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import extract_image_from_video

    # a NON-stego video: extraction reads noise coefficients
    fixtures.make_cover_video(tmp_path / "plain.mp4", 320, 240, frames=4,
                              kind="noise", seed=9)
    priv, _ = crypto.generate_keypair()
    res = extract_image_from_video(tmp_path / "plain.mp4", priv, StegoConfig())
    assert not res.success
    assert res.error  # structured failure, whatever stage it died at


def test_explicit_native_backend_beats_env(monkeypatch, tmp_path, rng):
    from stegotpu.native import videoio
    from stegotpu.video import VideoWriter

    if not videoio.available():
        pytest.skip("native lib unavailable")
    monkeypatch.setenv("STEGOTPU_VIDEO_BACKEND", "cv2")
    with VideoWriter(tmp_path / "x.avi", 24.0, 128, 64, backend="native") as w:
        assert w._native is not None  # explicit choice wins over env
        w.write_bgr_batch(rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8))


def test_cli_bench_import_is_packaged():
    """`stegotpu bench` must not rely on the repo-root bench.py module."""
    from stegotpu import benchmark

    assert callable(benchmark.main)


def test_setup_keys_repairs_mismatched_public_pem(tmp_path):
    """A stale public PEM from a DIFFERENT key must be rewritten from the
    private key, not silently returned (ADVICE r1: stego videos would be
    undecryptable)."""
    priv_p, pub_p = tmp_path / "k.pem", tmp_path / "p.pem"
    _, pub_c1 = crypto.setup_receiver_keys(priv_p, pub_p)
    # overwrite the public PEM with an unrelated key's public half
    other, _ = crypto.generate_keypair()
    crypto.save_keypair_pem(other, tmp_path / "o.pem", pub_p)
    _, pub_c2 = crypto.setup_receiver_keys(priv_p, pub_p)
    assert pub_c2 == pub_c1  # repaired back to the private key's pair
    _, pub_c3 = crypto.setup_receiver_keys(priv_p, pub_p)
    assert pub_c3 == pub_c1  # and the file on disk is fixed


def test_blockify_nonstandard_block_size(rng):
    """blockify/unblockify must honor the block parameter (ADVICE r1: the
    final reshape hardcoded BLOCK_AREA)."""
    from stegotpu.ops.dct import blockify, unblockify

    x = rng.integers(0, 256, (2, 12, 20), dtype=np.uint8)
    blocks = blockify(x, block=4)
    assert blocks.shape == (2, 3 * 5, 16)
    assert np.array_equal(blocks[1, 0], x[1, :4, :4].reshape(-1))
    assert np.array_equal(unblockify(blocks, 12, 20, block=4), x)


def test_native_writer_rejects_wrong_frame_shape(tmp_path, rng):
    """Undersized frames must fail loudly, not OOB-read in C (ADVICE r1)."""
    from stegotpu.native import videoio

    if not videoio.available():
        pytest.skip("native lib unavailable")
    with videoio.NativeVideoWriter(tmp_path / "x.avi", 128, 64, 24.0) as w:
        with pytest.raises(ValueError, match="frame shape"):
            w.write(rng.integers(0, 256, (1, 32, 64, 3), dtype=np.uint8))
        w.write(rng.integers(0, 256, (1, 64, 128, 3), dtype=np.uint8))


def test_native_reader_rejects_oversize_crop(tmp_path, rng):
    from stegotpu.native import videoio

    if not videoio.available():
        pytest.skip("native lib unavailable")
    with videoio.NativeVideoWriter(tmp_path / "x.avi", 128, 64, 24.0) as w:
        w.write(rng.integers(0, 256, (2, 64, 128, 3), dtype=np.uint8))
    with videoio.NativeVideoReader(tmp_path / "x.avi") as r:
        with pytest.raises(ValueError, match="crop"):
            r.read_batch(1, 64, 256)
        assert r.read_batch(2, 64, 128).shape == (2, 64, 128, 3)


def test_frame_range_alignment_revalidated_after_mesh_rounding(tmp_path):
    """_mesh_setup rounds batch_frames up to the mesh data axis AFTER the
    old alignment check ran: `--frame-range 8: --batch 8 --mesh data=3`
    used to pass validation and then run with batch 9, silently embedding
    pre-segment frames at wrong bit offsets (advisor r3). Now it raises."""
    from stegotpu import fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.parallel.mesh import make_mesh
    from stegotpu.pipeline import embed_image_in_video

    fixtures.make_secret_image(tmp_path / "s.png", 16, 16, kind="noise",
                               seed=3)
    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=18,
                              kind="moving", seed=4)
    priv_path, pub_path = tmp_path / "k.pem", tmp_path / "p.pem"
    _, pub_c = crypto.setup_receiver_keys(priv_path, pub_path)
    mesh = make_mesh(3, 1)
    with pytest.raises(ValueError, match="rounded up to the mesh"):
        embed_image_in_video(
            tmp_path / "c.mp4", tmp_path / "s.png", tmp_path / "seg",
            pub_c, StegoConfig(), batch_frames=8, mesh=mesh,
            frame_range=(8, None),
        )


def test_cli_segment_without_payload_state_refused(tmp_path, monkeypatch,
                                                   capsys):
    """A mid-video segment run (--frame-range LO>0) without --payload-state
    would seal FRESH crypto randomness whose bits can never decode against
    other runs' segments — the CLI must refuse, not silently emit a
    poisoned segment (advisor r3)."""
    from stegotpu import fixtures
    from stegotpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    fixtures.make_secret_image("s.png", 16, 16, kind="noise", seed=1)
    fixtures.make_cover_video("c.mp4", 160, 128, frames=12, kind="moving",
                              seed=2)
    assert main(["embed", "c.mp4", "s.png", "seg1", "--batch", "4",
                 "--frame-range", "8:"]) == 1
    err = capsys.readouterr().err
    assert "--payload-state" in err
    # LO == 0 (first segment / fresh run) stays allowed without state
    assert main(["embed", "c.mp4", "s.png", "seg0", "--batch", "4",
                 "--frame-range", "0:8"]) == 0


def test_recover_params_distinguishes_same_params_case(tmp_path):
    """Round-4 review: recovery used to report 'no QIM lattice detected'
    even when the lattice WAS detected but matched the already-tried
    parameters (e.g. wrong private key) — the shared helper must name the
    real problem class."""
    from stegotpu import crypto as _crypto
    from stegotpu import fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import embed_image_in_video
    from stegotpu.steganalysis import recover_params

    fixtures.make_secret_image(tmp_path / "s.png", 48, 48, kind="noise",
                               seed=51)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=6,
                              kind="moving", seed=52)
    _, pub_c = _crypto.setup_receiver_keys(tmp_path / "k.pem",
                                           tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, StegoConfig())
    assert res.success

    # defaults already correct -> recovery cannot help, and must SAY the
    # parameters are not the problem
    cfg, msg = recover_params(tmp_path / "st.avi", StegoConfig())
    assert cfg is None
    assert "SAME parameters" in msg and "key" in msg

    # wrong params -> recovery returns the corrected config
    cfg, msg = recover_params(tmp_path / "st.avi",
                              StegoConfig(delta=33, num_ac_coeffs=5))
    assert cfg is not None and (cfg.delta, cfg.num_ac_coeffs) == (20, 10)

    # non-stego -> no lattice
    cfg, msg = recover_params(tmp_path / "c.mp4", StegoConfig())
    assert cfg is None and "no QIM lattice" in msg


def test_cv2_seek_is_absolute_after_reads(tmp_path):
    """Round-4 review: the cv2 seek fallback grabbed RELATIVE to the
    current position; it must honor the absolute contract (and refuse to
    go backwards)."""
    import pytest as _pytest

    from stegotpu import fixtures
    from stegotpu.video import VideoReader

    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=10,
                              kind="moving", seed=53)
    with VideoReader(tmp_path / "c.mp4", backend="cv2") as ref:
        frames = [ref.read_frame() for _ in range(10)]

    with VideoReader(tmp_path / "c.mp4", backend="cv2") as r:
        r.read_frame()          # consume 2 frames first
        r.read_frame()
        r.seek(5)               # ABSOLUTE: next read must be frame 5
        np.testing.assert_array_equal(r.read_frame(), frames[5])
        with _pytest.raises(OSError):
            r.seek(2)           # backwards: refused, not silently wrong


def test_frame_range_rejects_negative_and_inverted(tmp_path):
    """A negative lo used to pass the batch-alignment check (-8 % 8 == 0)
    and Python-wrap the payload slice to the END of the bitstream — a
    silently-corrupt embed (round-5 review). Now both bad shapes raise."""
    from stegotpu import fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import embed_image_in_video

    fixtures.make_secret_image(tmp_path / "s.png", 16, 16, kind="noise",
                               seed=3)
    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=10,
                              kind="moving", seed=4)
    _, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                          tmp_path / "p.pem")
    for bad in [(-8, 16), (8, 8), (16, 8)]:
        with pytest.raises(ValueError, match="0 <= start < end"):
            embed_image_in_video(
                tmp_path / "c.mp4", tmp_path / "s.png", tmp_path / "seg",
                pub_c, StegoConfig(), batch_frames=8, frame_range=bad,
            )


def test_procs_extract_seek_fallback(tmp_path, monkeypatch):
    """parallel_extract segment workers fall back to decode-and-discard on
    an unseekable container, matching every other seek call site — a file
    that extracts with --procs 1 must not fail with --procs N (round-5
    review)."""
    from stegotpu import fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.image import load_image_gray
    from stegotpu.parallel.local_procs import parallel_extract
    from stegotpu.pipeline import embed_image_in_video
    from stegotpu.video import VideoReader

    # 128x128 secret = ~131k payload bits over 12k bits/frame -> the
    # payload spans ~11 frames, so 2 batch-4-aligned segments are LIVE and
    # the second worker's seek(lo>0) must hit the fallback
    fixtures.make_secret_image(tmp_path / "s.png", 128, 128, kind="noise",
                               seed=5)
    fixtures.make_cover_video(tmp_path / "c.mp4", 320, 240, frames=16,
                              kind="moving", seed=6)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                             tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, StegoConfig(),
                               batch_frames=4)
    assert res.success

    failed_seeks = []

    def broken_seek(self, frame):
        if frame > 0:
            failed_seeks.append(frame)
            raise OSError("seek: simulated unseekable container")

    monkeypatch.setattr(VideoReader, "seek", broken_seek)
    ext = parallel_extract(res.output_path, priv, StegoConfig(),
                           batch_frames=4, procs=2)
    assert ext.success, ext.error
    assert failed_seeks, "fallback never exercised: no worker sought past 0"
    np.testing.assert_array_equal(ext.pixels,
                                  load_image_gray(tmp_path / "s.png"))


def test_private_pem_written_owner_only(tmp_path):
    """genkey-path private PEMs must be 0600 (round-5 crypto review)."""
    import stat

    crypto.setup_receiver_keys(tmp_path / "k.pem", tmp_path / "p.pem")
    mode = stat.S_IMODE((tmp_path / "k.pem").stat().st_mode)
    assert mode == 0o600, oct(mode)


def test_setup_keys_repairs_corrupt_public_pem(tmp_path):
    """A corrupt public PEM beside a valid private PEM is repaired from the
    private key (the declared source of truth), not crashed on."""
    _, pub_c1 = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                           tmp_path / "p.pem")
    (tmp_path / "p.pem").write_bytes(b"-----BEGIN GARBAGE-----\nxx\n")
    _, pub_c2 = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                           tmp_path / "p.pem")
    assert pub_c1 == pub_c2


def test_empty_passphrase_fails_closed(tmp_path):
    """passphrase=b'' must raise, not silently write an unencrypted key."""
    priv, _ = crypto.generate_keypair(np.random.default_rng(1))
    with pytest.raises(ValueError, match="empty passphrase"):
        crypto.save_keypair_pem(priv, tmp_path / "k.pem", tmp_path / "p.pem",
                                passphrase=b"")


def test_seal_payload_rejects_zero_dims():
    """0-dim payloads parse-fail on EVERY extractor with a misleading
    wrong-key diagnosis — sealing must reject them up front."""
    from stegotpu.payload import seal_payload

    _, pub = crypto.generate_keypair(np.random.default_rng(2))
    pub_c = crypto.serialize_public_compressed(pub)
    with pytest.raises(ValueError, match="nonzero"):
        seal_payload(b"x", 0, 16, pub_c)
    with pytest.raises(ValueError, match="nonzero"):
        seal_payload(b"x", 16, 0, pub_c)


def test_embed_result_carries_failure_reason(tmp_path):
    """EmbedResult.error names why an embed failed (round-5 server review:
    the daemon's 422 used to carry no reason)."""
    from stegotpu import fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import embed_image_in_video

    # payload far exceeding a tiny cover's capacity
    fixtures.make_secret_image(tmp_path / "s.png", 128, 128, kind="noise",
                               seed=3)
    fixtures.make_cover_video(tmp_path / "c.mp4", 64, 64, frames=3,
                              kind="moving", seed=4)
    _, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                          tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, StegoConfig(),
                               batch_frames=2)
    assert not res.success
    assert res.error and "payload" in res.error


def test_prefetcher_stays_exhausted():
    """An exhausted Prefetcher must keep raising StopIteration, not block
    forever on its drained queue (iterator protocol; round-5 review)."""
    from stegotpu.video import Prefetcher

    p = Prefetcher(iter([1, 2]))
    assert list(p) == [1, 2]
    with pytest.raises(StopIteration):
        next(p)
    with pytest.raises(StopIteration):  # and again
        next(p)
    p.close()


def test_writer_explicit_native_rejects_unsupported_codec(tmp_path):
    """backend='native' with a codec the native layer lacks must raise,
    not silently fall back to cv2 (the reader already raises)."""
    from stegotpu.video import VideoWriter

    with pytest.raises(ValueError, match="native video backend"):
        VideoWriter(tmp_path / "x.avi", 24.0, 64, 48, codec="MJPG",
                    backend="native")


def test_inspect_rejects_tiny_video(tmp_path, rng):
    """inspect_stego_header guards sub-8px videos and zero capacity like
    extract does (round-5 review: backend-dependent crop error / full-video
    scan)."""
    import cv2

    from stegotpu.config import StegoConfig
    from stegotpu.pipeline import inspect_stego_header

    out = cv2.VideoWriter(str(tmp_path / "tiny.avi"),
                          cv2.VideoWriter_fourcc(*"FFV1"), 24.0, (4, 4))
    for _ in range(3):
        out.write(rng.integers(0, 256, (4, 4, 3), dtype=np.uint8))
    out.release()
    with pytest.raises(ValueError, match="too small"):
        inspect_stego_header(tmp_path / "tiny.avi", StegoConfig())


def test_payload_state_stale_secret_refused(tmp_path, monkeypatch, capsys):
    """Resuming with a --payload-state sealed from a DIFFERENT secret used
    to silently embed the old ciphertext (the secret argument ignored
    with no indication); now it errors with the dims mismatch."""
    from stegotpu import fixtures
    from stegotpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    fixtures.make_secret_image("s1.png", 16, 16, kind="noise", seed=1)
    fixtures.make_secret_image("s2.png", 24, 24, kind="noise", seed=2)
    fixtures.make_cover_video("c.mp4", 160, 128, frames=12, kind="moving",
                              seed=3)
    assert main(["embed", "c.mp4", "s1.png", "o1", "--batch", "4",
                 "--payload-state", "st.npy"]) == 0
    capsys.readouterr()
    # resume against a different secret: refused with a clear reason
    assert main(["embed", "c.mp4", "s2.png", "o2", "--batch", "4",
                 "--payload-state", "st.npy"]) == 1
    assert "different secret" in capsys.readouterr().err
    # resume with the SAME secret: allowed, with a loaded note
    assert main(["embed", "c.mp4", "s1.png", "o3", "--batch", "4",
                 "--payload-state", "st.npy"]) == 0
    assert "loaded sealed payload" in capsys.readouterr().out


def test_genkey_force_survives_generation_failure(tmp_path, monkeypatch,
                                                  capsys):
    """genkey --force must not destroy the old keypair when generation
    fails (round-5 review: unlink-then-write lost the private key on a
    mid-generation error)."""
    from stegotpu import crypto as crypto_mod
    from stegotpu.cli import main

    monkeypatch.chdir(tmp_path)
    assert main(["genkey"]) == 0
    old_priv = (tmp_path / "bob_private_key.pem").read_bytes()

    def boom(*a, **k):
        raise OSError("disk full")

    monkeypatch.setattr(crypto_mod, "setup_receiver_keys", boom)
    rc = main(["genkey", "--force"])  # CLI surfaces errors as exit 1
    assert rc != 0
    assert (tmp_path / "bob_private_key.pem").read_bytes() == old_priv
