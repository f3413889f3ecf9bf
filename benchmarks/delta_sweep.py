"""Capacity-vs-quality sweep: PSNR/SSIM/BER across delta at full payload.

BASELINE.json config: "1080p30 cover, delta sweep (capacity vs PSNR) at
full-capacity payload". All metrics are computed on device; only scalars
cross the host boundary (bulk readbacks through the TPU relay can stall).

Prints one JSON line per delta.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root



import json

import numpy as np


def main(b=8, h=1080, w=1920, n_ac=10,
         deltas=(4, 8, 12, 16, 20, 28, 40, 60, 100)):
    import jax
    import jax.numpy as jnp

    from stegotpu.metrics import psnr, ssim
    from stegotpu.ops.qim import embed_and_extract_frames
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    # mid-luma textured cover (natural-video-like, avoids saturation cliffs)
    base = rng.integers(48, 208, (b, h, w), dtype=np.uint8)
    frames = jax.device_put(base)
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    total = jnp.int32(b * cap)

    @jax.jit
    def sweep_one(f, p, delta):
        stego, _, extracted = embed_and_extract_frames(f, p, total, delta, n_ac)
        errors = jnp.sum((extracted != p).astype(jnp.int32))
        ps = psnr(f, stego)
        ss = ssim(f[0], stego[0])
        return errors, ps, ss

    for d in deltas:
        errors, ps, ss = sweep_one(frames, payload, jnp.float32(d))
        print(json.dumps({
            "delta": d,
            "capacity_bits_per_frame": cap,
            "ber": round(float(errors) / (b * cap), 8),
            "stego_psnr_db": round(float(ps), 2),
            "stego_ssim": round(float(ss), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
