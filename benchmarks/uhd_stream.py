"""4K streaming config: embed+extract with on-device evaluation at 2160p.

BASELINE.json config: "4K60 streaming embed+extract with on-device
PSNR/SSIM/BER evaluation". Measures the fused evaluation step's steady-state
throughput (chained data-dependent iterations, scalar readbacks only) and
reports whether it sustains 60 fps of 4K.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

import json
import time

import numpy as np


def main(b=128, h=2160, w=3840, n_ac=10, k_chain=10):
    # batch sweep (honest chain, v5e): 16->905, 64->3134, 128->4502 fps;
    # 256 stalls (frame+stego+bits HBM residency through the relay).
    # r4 wire-correct kernel (f32-faithful DCT): 128 -> 3620 fps, BER=0
    # r5: headline switched to the two-point chain fit (wall(25)-wall(5)
    # over 20 iters) which cancels the relay's fixed ~20-25 ms/call
    # overhead (docs/TUNING.md round 5); the old chain-10 wall figure
    # rides along as fps_wall10 for cross-round comparability.
    import jax
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import embed_and_extract_frames_pallas
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(32, 224, (b, h, w), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    total = jnp.int32(b * cap)
    d = jnp.float32(20)

    from stegotpu.ops.qim import roundtrip_metrics

    def evaluated_step(f, p):
        """Pallas round trip + on-device PSNR/BER (scalars-only boundary)."""
        stego, bpf, extracted = embed_and_extract_frames_pallas(f, p, total, d, n_ac)
        m = roundtrip_metrics(f, stego, extracted, p, total)
        return stego, extracted, m["psnr_db"], m["bit_errors"]

    one = jax.jit(evaluated_step)
    _, _, psnr_dev, errors_dev = one(frames, payload)
    psnr_db = float(psnr_dev)
    errors = int(errors_dev)

    def wall(k: int, reps: int = 3) -> float:
        @jax.jit
        def chained(f, p):
            def body(_, carry):
                fr, pl_ = carry
                s, e, _, _ = evaluated_step(fr, pl_)
                return s, e  # extracted bits feed the next payload: live
            out, bits = jax.lax.fori_loop(0, k, body, (f, p))
            return (jnp.sum(out, dtype=jnp.int32)
                    + jnp.sum(bits, dtype=jnp.int32))

        _ = float(chained(frames, payload))  # compile + warm
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(chained(frames, payload))
            best = min(best, time.perf_counter() - t0)
        return best

    k1, k2 = 5, 25
    slope = (wall(k2) - wall(k1)) / (k2 - k1)
    fps_wall10 = b * k_chain / wall(k_chain, reps=1)
    fps = b / slope if slope > 0 else fps_wall10
    print(json.dumps({
        "metric": "4k_embed_extract_eval_fps_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "fps_wall10": round(fps_wall10, 1),
        "stego_psnr_db": round(psnr_db, 2),
        "bit_errors": errors,
        "payload_mbit_per_s": round(fps * cap / 1e6, 1),
        "sustains_4k60": fps >= 60.0,
    }))


if __name__ == "__main__":
    main()
