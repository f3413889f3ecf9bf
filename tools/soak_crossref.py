"""Randomized INTEROP soak against the REAL reference, BOTH directions.

tests/golden/ pins frozen configs of each direction (ref_stego*/rev*);
this tool randomizes them — resolution (incl. lane-padded widths),
delta, num_ac, secret size, kernel, verified embed. Per draw:

  1. stegotpu embed -> reference extractor
     (/root/reference/extract_process.py, or $STEGO_REFERENCE) —
     recovered secret asserted PIXEL-IDENTICAL;
  2. reference embed (embed_process.py) on the same cover/secret ->
     stegotpu extract — success, SHA3 hash OK, pixel-identical.

Covers (FFV1 .avi only — the reference reads via cv2.VideoCapture) are
mid-luma textured so the algorithm's clipping tail cannot contribute;
deltas stay in the robust envelope. The reference is a scalar Python
loop (~seconds per small frame), so draws use small covers.

Usage: python tools/soak_crossref.py [N] [SEED]   (default 12 draws)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("STEGO_REFERENCE", "/root/reference"))
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main() -> None:
    if os.environ.get("JAX_PLATFORMS"):
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0

    from PIL import Image

    from stegotpu import crypto
    from stegotpu.config import StegoConfig
    from stegotpu.image import load_image_gray
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video
    from stegotpu.video import VideoWriter

    sys.path.insert(0, str(REFERENCE))
    import embed_process  # reference modules, treated as black boxes
    import extract_process

    rng = np.random.default_rng(seed)
    fails = 0
    with tempfile.TemporaryDirectory() as td:
        d = Path(td)
        for i in range(n):
            w = int(rng.choice([160, 240, 256, 336, 384]))
            h = int(rng.choice([96, 120, 128, 144]))
            frames = int(rng.integers(3, 8))
            delta = float(rng.choice([12.0, 20.0, 28.0]))
            num_ac = int(rng.choice([3, 10, 17]))
            kernel = str(rng.choice(["pallas", "xla"]))
            verified = bool(rng.integers(0, 2))
            cap_bits = (h // 8) * (w // 8) * num_ac * frames
            side = int(np.clip(rng.integers(8, 64), 8,
                               np.floor(np.sqrt((cap_bits - 2000) / 8))))
            row = dict(i=i, w=w, h=h, frames=frames, delta=delta,
                       num_ac=num_ac, kernel=kernel, verified=verified,
                       secret=side)
            t0 = time.perf_counter()
            cover = rng.integers(64, 192, (frames, h, w, 3), dtype=np.uint8)
            with VideoWriter(d / "c.avi", 24.0, w, h, "FFV1") as vw:
                vw.write_bgr_batch(cover)
            secret = rng.integers(0, 256, (side, side), dtype=np.uint8)
            Image.fromarray(secret, mode="L").save(d / "s.png")
            priv, pub = crypto.generate_keypair(
                np.random.default_rng(int(rng.integers(1 << 30))))
            pub_c = crypto.serialize_public_compressed(pub)

            cfg = StegoConfig(delta=delta, num_ac_coeffs=num_ac,
                              kernel=kernel, verified_embed=verified,
                              repair_rounds=3)
            res = embed_image_in_video(d / "c.avi", d / "s.png",
                                       d / "st", pub_c, cfg, batch_frames=4)
            try:
                assert res.success, row
                ok = extract_process.ekstraksi_gambar_video_final(
                    str(d / "st.avi"), str(d / "ref_out.png"), delta,
                    num_ac, priv, bits_untuk_dimensi=16)
                assert ok, ("reference extractor rejected", row)
                got = load_image_gray(d / "ref_out.png")
                np.testing.assert_array_equal(got, secret, err_msg=str(row))

                # direction 2: reference embed -> stegotpu extract
                ok2, _, _ = embed_process.embed_gambar_ke_video_final(
                    str(d / "c.avi"), str(d / "s.png"), str(d / "ref_st"),
                    delta, num_ac, pub_c)
                assert ok2, ("reference embed failed", row)
                ours = extract_image_from_video(
                    d / "ref_st.avi", priv,
                    StegoConfig(delta=delta, num_ac_coeffs=num_ac,
                                kernel=kernel))
                assert ours.success and ours.hash_ok, (row, ours.error)
                np.testing.assert_array_equal(ours.pixels, secret,
                                              err_msg=str(row))
                row["wall_s"] = round(time.perf_counter() - t0, 2)
                print(json.dumps(row), flush=True)
            except AssertionError as e:
                fails += 1
                print(f"FAIL draw {i}: {e}", file=sys.stderr, flush=True)
    print(f"crossref soak done: {n} draws, {fails} failures", flush=True)
    if fails:
        sys.exit(1)


if __name__ == "__main__":
    main()
