"""End-to-end file-to-file throughput: decode -> gray -> device QIM ->
FFV1 encode, and the reverse extraction path.

Unlike the kernel microbenchmarks this measures the REAL product path,
including the native FFmpeg I/O layer and the host<->device transfers — on
most hosts it is codec-bound, which is exactly the point of measuring it.

Prints one JSON line per phase.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root



import json
import tempfile
import time
from pathlib import Path

import numpy as np


def main(width=1920, height=1080, frames=64, secret_px=256, batch=8):
    import cv2

    from stegotpu import crypto
    from stegotpu.config import StegoConfig
    from stegotpu.image import save_image_gray
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    d = Path(tempfile.mkdtemp(prefix="stegobench-"))
    rng = np.random.default_rng(0)

    cover = d / "cover.avi"  # lossless cover so decode cost is realistic
    out = cv2.VideoWriter(str(cover), cv2.VideoWriter_fourcc(*"FFV1"), 30.0,
                          (width, height))
    base = rng.integers(48, 208, (height, width, 3), dtype=np.uint8)
    for i in range(frames):
        f = np.roll(base, i * 7, axis=1)  # cheap motion
        out.write(f)
    out.release()

    secret = d / "secret.png"
    save_image_gray(
        rng.integers(0, 256, (secret_px, secret_px), dtype=np.uint8), secret
    )
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")
    cfg = StegoConfig()

    t0 = time.perf_counter()
    res = embed_image_in_video(cover, secret, d / "stego", pub_c, cfg,
                               batch_frames=batch)
    dt_e = time.perf_counter() - t0
    assert res.success, "embed failed"
    mb = width * height * 3 * frames / 1e6
    print(json.dumps({
        "phase": "embed_e2e", "fps": round(frames / dt_e, 1),
        "mb_per_s": round(mb / dt_e, 1),
        "payload_bits": res.total_payload_bits,
        "frames": frames, "resolution": f"{width}x{height}",
    }), flush=True)

    t0 = time.perf_counter()
    ext = extract_image_from_video(res.output_path, priv, cfg, batch_frames=batch)
    dt_x = time.perf_counter() - t0
    assert ext.success and ext.hash_ok, f"extract failed: {ext.error}"
    # extraction stops once the payload is complete; normalize by frames read
    frames_read = -(-res.total_payload_bits // cfg.frame_capacity_bits(height, width))
    frames_read = max(frames_read, 1)
    print(json.dumps({
        "phase": "extract_e2e", "fps": round(frames_read / dt_x, 1),
        "frames_read": frames_read, "seconds": round(dt_x, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
