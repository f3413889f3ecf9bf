"""Headline benchmark: 1080p embed+extract round-trip throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology: the axon TPU relay's block_until_ready does not reliably wait,
so throughput is measured by chaining K data-dependent round trips inside a
single jit (each iteration's stego feeds the next embed AND its extracted
wire-order bits feed the next payload, via lax.fori_loop) and forcing one
scalar device->host readback at the end — the double dependency chain makes
the device execute every stage of every iteration for real (embed, extract,
and both payload layout passes; nothing is dead-code-eliminable). NOTE:
round 1's chain depended only on the stego output, which let XLA eliminate
the extract half entirely — its 9,841.7 fps (BENCH_r01) is an embed-only
number.

Round-5 correction: the device profiler (tools/device_roofline.py) proved a
single chained call still carries a FIXED ~20-25 ms dispatch+readback
overhead through the relay, which at chain=10 inflated every per-iteration
number by ~2-2.5 ms (batch 128) — rounds 2-4's headlines UNDERSTATE device
throughput by ~25-35%. The headline is therefore now the two-point chain
fit: wall(K2) - wall(K1) over K2-K1 iterations cancels the fixed overhead
exactly and matches the device timeline's per-iteration period (verified
against the XPlane trace, docs/TUNING.md round 5). The old single-wall
chain=10 figure rides along as "fps_wall10" for cross-round comparability.

The reference publishes no numbers (BASELINE.md): its scalar Python loop is
far below real time. vs_baseline is therefore reported against the
BASELINE.json north-star target of 2,000 fps 1080p embed+extract per chip
(value/2000), the only quantitative bar on record.
"""

from __future__ import annotations

import json
import time

import numpy as np

NORTH_STAR_FPS = 2000.0

# DEVICE-measured u8 streaming ceiling of this chip: the pure-copy Pallas
# kernel's per-iteration period on the device timeline is 1.69 ms/128
# frames = 314.7 GB/s (tools/device_roofline.py, r5). The old 110-115 GB/s
# figure was the same kernel seen through the relay's fixed per-call wall
# overhead (docs/TUNING.md round 5).
U8_CEILING_GBPS = 315.0


def chain_bytes_per_frame(h: int, w: int, n_ac: int) -> int:
    """HBM bytes the fused-packed roundtrip chain moves per frame: the
    pallas_call's reads (u8 frame + compact payload rows) and writes (u8
    stego + packed bits), plus the XLA layout passes' traffic (payload bits
    read -> rows written; packed read -> wire-order bits written). The
    chained bench fuses rows_to_bits with the next iteration's
    payload_to_rows (docs/TUNING.md "Measurement footnote"), so this model
    slightly OVERSTATES bytes — i.e. understates achieved GB/s: a
    conservative MFU figure."""
    from stegotpu.config import BLOCK
    from stegotpu.ops.pallas_kernel import (_rows_pad, pick_stripe,
                                            rows_per_block)

    stripe = pick_stripe(h)
    rp = _rows_pad(stripe, rows_per_block(n_ac))
    rows = (h // stripe) * rp * w          # compact payload rows plane
    packed = (h // stripe) * rp * (w // BLOCK)
    cap = (h // BLOCK) * (w // BLOCK) * n_ac
    kernel = h * w + rows + h * w + packed          # frame+rows in, stego+packed out
    layout = (cap + rows) + (packed + cap)          # payload_to_rows + unpack
    return kernel + layout


def main() -> None:
    import jax
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (
        embed_and_extract_frames_pallas as embed_and_extract_frames,
    )
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    # round-2 batch sweep on v5e (fused kernel, honest chain): 128->14.5k,
    # 256->15.9k, 384->16.7k, 512->17.0k, 1024->17.6k fps — amortization
    # keeps paying past 128; 512 is the practical throughput point (2 GB of
    # frame+stego HBM residency per in-flight batch)
    b, h, w, n_ac, delta = 512, 1080, 1920, 10, 20.0
    k_chain = 10
    import os

    # STEGOTPU_BENCH_PRECISION=fast measures the TPU-local single-pass-bf16
    # mode (config.qim_precision); the committed headline is always 'wire'
    precision = os.environ.get("STEGOTPU_BENCH_PRECISION", "wire")
    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    total = jnp.int32(b * cap)
    dlt = jnp.float32(delta)

    # Round-trip sanity, computed ON DEVICE (bulk device->host transfers
    # through the relay can stall; scalar readbacks are reliable). On
    # uniform-random covers the algorithm itself loses ~2e-6 of bits to
    # clipping in near-saturated blocks (the reference's scalar pipeline shows
    # the identical rate — verified on the CPU backend); anything beyond that
    # bound indicates a kernel bug.
    @jax.jit
    def ber_errors(f, p):
        _, _, e = embed_and_extract_frames(f, p, total, dlt, n_ac,
                                           precision)
        return jnp.sum((e != p).astype(jnp.int32))

    errors = int(ber_errors(frames, payload))
    ber_val = errors / float(b * cap)
    assert ber_val <= 1e-5, f"round-trip BER {ber_val:.2e} exceeds algorithmic bound"

    # Self-verifying bench (r4 VERDICT item 5): the BER bound above is an
    # ALGORITHMIC gate loose enough to mask a margin-scale miscompile (it
    # did, for three rounds). On real hardware, re-prove compiled-kernel
    # bit-exactness vs the XLA oracle for BOTH precision modes and carry
    # the verdict in the artifact; a broken kernel fails the bench here.
    exactness_ok = None
    if jax.default_backend() == "tpu":
        from stegotpu.ops.exactness import quick_exactness_check

        exactness_ok = all(
            quick_exactness_check(precision=p)["ok"] for p in ("wire", "fast")
        )
        assert exactness_ok, "on-chip kernel exactness check FAILED"

    def wall(prec: str, k: int, reps: int = 3) -> float:
        """Best-of-reps wall seconds for one chained call of k iterations."""
        @jax.jit
        def chained(f, p):
            def body(_, carry):
                fr, pl_ = carry
                s, _, e = embed_and_extract_frames(fr, pl_, total, dlt,
                                                   n_ac, prec)
                return s, e  # extracted bits are the NEXT payload: live
            out, bits = jax.lax.fori_loop(0, k, body, (f, p))
            return (jnp.sum(out, dtype=jnp.int32)
                    + jnp.sum(bits, dtype=jnp.int32))

        _ = float(chained(frames, payload))  # compile + warmup
        best = float("inf")
        for _i in range(reps):
            t0 = time.perf_counter()
            _ = float(chained(frames, payload))
            best = min(best, time.perf_counter() - t0)
        return best

    K1, K2 = 5, 25

    def measure(prec: str, legacy: bool = True) -> tuple[float, float]:
        """(steady-state fps via the two-point fit, legacy chain-10 fps).

        legacy=False skips the chain-10 wall run (the cross-round
        comparability figure is only reported for the headline precision;
        each extra chained call risks minutes on a slow-tunnel day)."""
        t1 = wall(prec, K1)
        t2 = wall(prec, K2)
        slope = (t2 - t1) / (K2 - K1)   # s/iter, fixed overhead cancelled
        fps_wall10 = (b * k_chain / wall(prec, k_chain, reps=1)
                      if legacy else float("nan"))
        if slope <= 0:  # relay hiccup mid-fit: fall back, overhead included
            fb = fps_wall10 if legacy else b * K2 / t2
            return fb, fps_wall10
        return b / slope, fps_wall10

    fps, fps_wall10 = measure(precision)

    def kernel_chain_fps(prec: str) -> float:
        """Slope-fit fps of the KERNEL-ONLY chain (stego is the carry;
        payload rows prebuilt and passed as an arg — baked-in constants
        overflow the relay's remote-compile size limit). This is the
        device cost of the fused pallas call + the loop-carry copy,
        without the full-capacity wire-order unpack / payload re-pack the
        headline chain includes — i.e. the scope the SHIPPED extract path
        actually runs, since r5's sliced packed-rows readback does wire
        unpacking on the host (docs/TUNING.md round 5). Matches the device
        timeline's 23.2k fps (tools/device_roofline.py)."""
        from stegotpu.ops.pallas_kernel import (
            embed_and_extract_frames_pallas_rows_packed as rt_rows,
            payload_to_rows,
            pick_stripe,
        )

        rows = jax.device_put(
            payload_to_rows(payload, h, w, n_ac, pick_stripe(h)))

        def wall_k(k: int) -> float:
            @jax.jit
            def chained(f, r):
                def body(_, fr):
                    s, _p = rt_rows(fr, r, total, dlt, n_ac, prec)
                    return s
                out = jax.lax.fori_loop(0, k, body, f)
                return jnp.sum(out, dtype=jnp.int32)

            _ = float(chained(frames, rows))
            best = float("inf")
            for _i in range(2):  # rider metric: 2 reps, fewer relay calls
                t0 = time.perf_counter()
                _ = float(chained(frames, rows))
                best = min(best, time.perf_counter() - t0)
            return best

        t1, t2 = wall_k(K1), wall_k(K2)
        slope = (t2 - t1) / (K2 - K1)
        # relay hiccup (t2 <= t1): fall back to the single-wall figure,
        # overhead included — a numeric underestimate, never NaN (NaN is
        # not valid JSON and would corrupt the committed artifact line)
        return b / slope if slope > 0 else b * K2 / t2

    fps_kernel = kernel_chain_fps(precision)
    gbps = fps * chain_bytes_per_frame(h, w, n_ac) / 1e9
    row = {
        "metric": "1080p_embed_extract_fps_per_chip"
                  if precision == "wire" else
                  "1080p_embed_extract_fps_per_chip_fastmode",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / NORTH_STAR_FPS, 3),
        "gbps": round(gbps, 1),
        "pct_u8_ceiling": round(100 * gbps / U8_CEILING_GBPS, 1),
        "fps_wall10": round(fps_wall10, 1),
        "fps_kernel_chain": round(fps_kernel, 1),
        "exactness_ok": exactness_ok,
    }
    if precision == "wire":
        # the opt-in TPU-local mode's figure rides along so the artifact
        # carries both honest numbers (docs/TUNING.md round 4)
        row["fastmode_fps"] = round(measure("fast", legacy=False)[0], 1)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
