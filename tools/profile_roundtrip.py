"""Capture a profiler trace of the fused roundtrip kernel (VERDICT r4
item 2's closure artifact: show whether the ~4 ms of per-batch compute that
does not overlap DMA is compiler-imposed serialization).

Writes a TensorBoard/XPlane trace under --out (default
benchmarks/traces/roundtrip/). On the axon relay the device-side TPU trace
may be unavailable — the tool reports what it captured either way; the
committed conclusion lives in docs/TUNING.md round 5.

Usage: python tools/profile_roundtrip.py [--batch 128] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--chain", type=int, default=0,
                    help="chain N data-dependent roundtrips inside ONE jit "
                         "(the bench methodology) instead of single steps")
    ap.add_argument("--out", default=str(REPO / "benchmarks" / "traces"
                                         / "roundtrip"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (
        embed_and_extract_frames_pallas_packed,
    )
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    b, h, w, n_ac = args.batch, 1080, 1920, 10
    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    total = jnp.int32(b * cap)
    dlt = jnp.float32(20.0)

    if args.chain:
        @jax.jit
        def step(f, p):
            def body(_i, fr):
                s, _bpf, _e = embed_and_extract_frames_pallas_packed(
                    fr, p, total, dlt, n_ac)
                return s  # loop-carried stego, the roofline chain
            out = jax.lax.fori_loop(0, args.chain, body, f)
            return jnp.sum(out, dtype=jnp.int32)
    else:
        @jax.jit
        def step(f, p):
            s, _, e = embed_and_extract_frames_pallas_packed(f, p, total,
                                                             dlt, n_ac)
            return jnp.sum(s, dtype=jnp.int32) + jnp.sum(e, dtype=jnp.int32)

    _ = float(step(frames, payload))  # compile + warm outside the trace

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out)):
        for _ in range(args.iters):
            _ = float(step(frames, payload))

    produced = sorted(str(p.relative_to(out)) for p in out.rglob("*")
                      if p.is_file())
    print(json.dumps({
        "backend": jax.default_backend(),
        "trace_dir": str(out),
        "files": produced[:20],
        "n_files": len(produced),
    }))


if __name__ == "__main__":
    main()
