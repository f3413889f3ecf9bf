"""`--procs N` e2e scaling benchmark (r3 VERDICT item 3's measurement).

Runs the full file->file embed and extract at procs in {1, 2, 4}, prints
one JSON line per point, and asserts pixel identity between the procs=1
and procs=N outputs (same sealed payload). On a single-core host (the dev
VM: nproc=1) the expected result is ~1.0x — segment pipelines can only
overlap on real cores; run this on a multi-core host to see the codec
bottleneck split (the encode lane pool and decode thread already use spare
cores within ONE pipeline, so the marginal procs gain depends on how far a
single pipeline is from saturating the machine).

Usage: python benchmarks/procs_scaling.py [--frames 64] [--procs 1,2,4]
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--procs", default="1,2,4")
    ap.add_argument("--passes", type=int, default=3, help="best-of-N")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import numpy as np

    from stegotpu import crypto, fixtures
    from stegotpu.config import StegoConfig
    from stegotpu.parallel.local_procs import parallel_embed, parallel_extract
    from stegotpu.payload import seal_payload
    from stegotpu.image import image_to_bits
    from stegotpu.bitstream import bits_to_bytes
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video
    from stegotpu.video import VideoReader

    d = Path(tempfile.mkdtemp(prefix="procs-bench-"))
    N = args.frames
    fixtures.make_cover_video(d / "c.mp4", 1920, 1080, frames=N,
                              kind="moving", seed=1)
    fixtures.make_secret_image(d / "s.png", 512, 512, kind="noise", seed=2)
    priv, pub = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")
    cfg = StegoConfig()

    # one sealed payload shared by every run: outputs must be identical
    w_px, h_px, img_bits = image_to_bits(d / "s.png")
    sealed, _ = seal_payload(bits_to_bytes(img_bits), w_px, h_px, pub,
                             cfg.dims_bits)
    ncores = len(os.sched_getaffinity(0))

    def frames_of(p):
        with VideoReader(p) as r:
            return np.concatenate(list(r.batches(16, mode="gray")))

    ref = None
    for procs in [int(p) for p in args.procs.split(",")]:
        out = d / f"st_{procs}"
        best_e = best_x = None
        for _ in range(args.passes):
            t0 = time.perf_counter()
            if procs == 1:
                res = embed_image_in_video(d / "c.mp4", d / "s.png", out,
                                           pub, cfg, batch_frames=8,
                                           sealed_bits=sealed)
            else:
                res = parallel_embed(d / "c.mp4", d / "s.png", out, pub, cfg,
                                     batch_frames=8, procs=procs,
                                     sealed_bits=sealed)
            dt = time.perf_counter() - t0
            assert res.success
            best_e = dt if best_e is None else min(best_e, dt)

            t0 = time.perf_counter()
            if procs == 1:
                ext = extract_image_from_video(res.output_path, priv, cfg,
                                               batch_frames=8)
            else:
                ext = parallel_extract(res.output_path, priv, cfg,
                                       batch_frames=8, procs=procs)
            dt = time.perf_counter() - t0
            assert ext.success and ext.hash_ok, ext.error
            best_x = dt if best_x is None else min(best_x, dt)

        got = frames_of(res.output_path)
        if ref is None:
            ref = got
        else:
            assert np.array_equal(ref, got), "procs output not pixel-identical"
        print(json.dumps({
            "procs": procs, "host_cores": ncores, "frames": N,
            "embed_fps": round(N / best_e, 2),
            "extract_fps": round(ext.frames_read / best_x, 2),
            "pixel_identical": True,
        }))


if __name__ == "__main__":
    main()
