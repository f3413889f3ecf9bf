"""Standalone host-side FFV1 codec throughput (NO TPU involved).

SURVEY.md §7 flags lossless FFV1 encode as the likely real-world bottleneck
once the device kernel exceeds ~2,000 fps; this measures the first-party
FFmpeg C++ layer (stegotpu/native/videoio.cpp, slice-threaded encode +
threaded decode) and the cv2 fallback on this host, 1080p BGR, so the
pipeline's host-stage budget is a number instead of a guess.
"""

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

from stegotpu.native import videoio
from stegotpu import video as v

B, H, W, FRAMES = 16, 1080, 1920, 96


def bench_backend(name: str, tmp: Path, frames: np.ndarray) -> dict:
    path = tmp / f"{name}.avi"
    t0 = time.perf_counter()
    with v.VideoWriter(path, 24.0, W, H, "FFV1", backend=name) as w:
        for i in range(0, FRAMES, B):
            w.write_bgr_batch(frames[i : i + B])
    enc = time.perf_counter() - t0

    t0 = time.perf_counter()
    n = 0
    with v.VideoReader(path, backend=name) as r:
        for batch in r.batches(B):
            n += batch.shape[0]
    dec = time.perf_counter() - t0
    assert n == FRAMES, (name, n)

    return {
        "backend": name,
        "encode_fps": round(FRAMES / enc, 1),
        "decode_fps": round(FRAMES / dec, 1),
        "file_mb": round(path.stat().st_size / 1e6, 1),
    }


def main() -> None:
    rng = np.random.default_rng(0)
    # textured mid-luma content (stego-like); pure noise would be the FFV1
    # worst case and pure flat the best — report both
    base = rng.integers(64, 192, (FRAMES, H, W, 3), dtype=np.uint8)
    smooth = np.clip(
        base.astype(np.int16) // 4 + np.arange(W, dtype=np.int16)[None, None, :, None] % 128 + 64,
        0, 255,
    ).astype(np.uint8)

    results = []
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        for content, frames in (("noise", base), ("smooth", smooth)):
            backends = ["cv2"] + (["native"] if videoio.available() else [])
            for name in backends:
                r = bench_backend(name, tmp, frames)
                r["content"] = content
                results.append(r)
                print(json.dumps(r))
    if not videoio.available():
        print(f"native backend unavailable: {videoio.build_error()}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
