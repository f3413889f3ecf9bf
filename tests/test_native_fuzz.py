"""Container-corruption differential fuzz for the native video layer
(r3 VERDICT item 6).

For every corruption class, BOTH backends (native FFmpeg layer and the cv2
fallback) must fail *structurally* — an OSError/ValueError or a clean short
read, never a crash, hang, or uninitialized-memory frame — and they must
agree on the readable clean prefix (pixel-identical: both are FFmpeg
decoders of a lossless codec; disagreement would mean one backend fabricates
data). The product pipeline must convert every one of these into a
structured ExtractResult failure (pipeline.py OSError path), matching the
reference's print-and-exit contract (extract_process.py:17-20) but as a
value, not a process exit.
"""

from __future__ import annotations

import numpy as np
import pytest

from stegotpu.config import StegoConfig
from stegotpu.native.videoio import available
from stegotpu.pipeline import extract_image_from_video
from stegotpu.video import VideoReader, VideoWriter

pytestmark = pytest.mark.skipif(
    not available(), reason="native video layer not built"
)

H, W, N_FRAMES = 64, 96, 8


@pytest.fixture(scope="module")
def clean_avi(tmp_path_factory):
    """A small FFV1 stego-like container + its decoded frames (oracle)."""
    d = tmp_path_factory.mktemp("fuzz")
    path = d / "clean.avi"
    rng = np.random.default_rng(7)
    frames = rng.integers(0, 256, (N_FRAMES, H, W), dtype=np.uint8)
    with VideoWriter(path, 24.0, W, H, "FFV1") as w:
        w.write_gray_batch(frames)
    return path, frames


def _corrupt(raw: bytes, kind: str) -> bytes:
    if kind == "empty":
        return b""
    if kind == "tiny_riff":  # RIFF magic survives, stream headers do not
        return raw[:128]
    if kind == "trunc_half":  # cut mid-movi, mid-packet
        return raw[: len(raw) // 2]
    if kind == "trunc_tail":  # last packet torn off mid-write
        return raw[:-64]
    if kind == "garbage":  # not a media file at all
        return bytes(np.random.default_rng(3).integers(0, 256, 4096, dtype=np.uint8))
    if kind == "header_smash":  # RIFF kept, AVI header fields wrecked
        return raw[:32] + b"\xff" * 64 + raw[96:]
    if kind == "interior_flip":  # bit flips inside the packet data
        body = bytearray(raw)
        for off in range(int(len(body) * 0.6), int(len(body) * 0.6) + 32):
            body[off] ^= 0xA5
        return bytes(body)
    if kind == "interior_flip_early":  # flips inside frame 0's packet
        body = bytearray(raw)          # (the payload region)
        start = raw.index(b"movi") + 16  # just past the first packet header
        for off in range(start, start + 32):
            body[off] ^= 0xA5
        return bytes(body)
    raise AssertionError(kind)


CLASSES = ["empty", "tiny_riff", "trunc_half", "trunc_tail", "garbage",
           "header_smash", "interior_flip"]


def _read_all(path, backend):
    """(gray frames list, structured error or None). Anything other than a
    clean EOF or an OSError/ValueError is a real bug and propagates."""
    frames = []
    try:
        with VideoReader(path, backend=backend) as r:
            h8, w8 = r.info.cropped
            if h8 <= 0 or w8 <= 0:
                return frames, "zero-dim header"
            for gray in r.batches(2, mode="gray"):
                frames.append(gray)
    except (OSError, ValueError) as e:  # IOError is OSError
        return frames, f"{type(e).__name__}: {e}"
    return frames, None


@pytest.mark.parametrize("kind", CLASSES)
def test_corruption_differential(clean_avi, tmp_path, kind):
    path, oracle = clean_avi
    bad = tmp_path / f"{kind}.avi"
    bad.write_bytes(_corrupt(path.read_bytes(), kind))

    got = {}
    for backend in ("native", "cv2"):
        frames, err = _read_all(bad, backend)
        flat = (np.concatenate(frames) if frames
                else np.zeros((0, H, W), np.uint8))
        # never more frames than the original container held
        assert flat.shape[0] <= N_FRAMES, (backend, kind)
        # every decoded clean-prefix frame must be REAL data: identical to
        # the oracle (lossless codec), not concealment garbage — frames at
        # or past the corruption point may legitimately differ, so compare
        # only the prefix that matches frame 0..k of the oracle
        clean_prefix = 0
        for i in range(flat.shape[0]):
            if np.array_equal(flat[i], oracle[i]):
                clean_prefix += 1
            else:
                break
        got[backend] = (flat, clean_prefix, err)

    n_nat, p_nat = got["native"][0].shape[0], got["native"][1]
    n_cv, p_cv = got["cv2"][0].shape[0], got["cv2"][1]
    # the two FFmpeg decoders must agree on the clean readable prefix
    # (concealed/partial frames past it may differ between lib versions)
    common = min(p_nat, p_cv)
    np.testing.assert_array_equal(got["native"][0][:common],
                                  got["cv2"][0][:common], err_msg=kind)
    if kind in ("empty", "tiny_riff", "garbage"):
        # nothing decodable: both must surface an error or a zero read
        assert n_nat == 0 and n_cv == 0, kind
    if kind in ("trunc_half", "trunc_tail"):
        # clean packets before the cut must survive on both backends,
        # and the backends may differ by at most the torn packet
        assert abs(p_nat - p_cv) <= 1, (kind, p_nat, p_cv)


@pytest.mark.parametrize("kind", ["trunc_half", "garbage", "empty",
                                  "interior_flip_early"])
def test_corrupt_stego_extract_is_structured(tmp_path, kind, rng):
    """Product path: a corrupted STEGO container yields a structured
    failure — an ExtractResult with .error, or an OSError at container
    open (which the CLI's error boundary renders as `error: ...`) — never
    a traceback from deeper in the stack or a false success.

    Corruption past the payload region deliberately does NOT fail:
    extraction stops once the payload parses (pipeline reads only the
    frames it needs), so the flip class here targets the EARLY packets."""
    from stegotpu import crypto, fixtures
    from stegotpu.pipeline import embed_image_in_video

    fixtures.make_secret_image(tmp_path / "s.png", 24, 24, kind="noise",
                               seed=5)
    fixtures.make_cover_video(tmp_path / "c.mp4", 160, 128, frames=8,
                              kind="moving", seed=6)
    priv, pub_c = crypto.setup_receiver_keys(tmp_path / "k.pem",
                                             tmp_path / "p.pem")
    res = embed_image_in_video(tmp_path / "c.mp4", tmp_path / "s.png",
                               tmp_path / "st", pub_c, StegoConfig())
    assert res.success
    raw = (tmp_path / "st.avi").read_bytes()
    bad = tmp_path / f"bad_{kind}.avi"
    bad.write_bytes(_corrupt(raw, kind))

    try:
        out = extract_image_from_video(bad, priv, StegoConfig())
    except OSError:
        return  # structured: container unopenable (empty/garbage classes)
    assert not out.success, kind
    assert out.error, kind  # structured reason, not a traceback
