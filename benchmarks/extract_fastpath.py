"""A/B: typical-payload extract — wire-order device unpack vs packed-rows
host unpack (VERDICT r4 item 1).

The product case: a small secret (header + 32x32 image ~ 34k bits) inside
1080p frames whose capacity is 324k bits/frame. The old path ran the
full-capacity wire-order unpack on device (packed_rows_to_bits, pure
layout) and shipped the (B, 324000) u8 bit plane to the host; the new
pipeline path ships the bit-packed compact rows ((B, 270, 240) u8, ~5x
smaller) and unpacks in numpy (packed_rows_to_bits_host).

Both arms are measured as the host actually experiences them in the
streaming loop: dispatch + value readback + to-wire-order-bits + payload
parse attempt, per batch, best-of-N (the relay's bulk-transfer latency is
part of the product path and exactly what the packed arm shrinks). The
parse consumes the SAME bits on both arms (asserted identical).

Usage: python benchmarks/extract_fastpath.py [--batch 8] [--reps 10]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (
        _rows_pad,
        extract_frames_pallas,
        extract_frames_pallas_packed,
        packed_rows_to_bits_host,
        pick_stripe,
        rows_per_block,
    )
    from stegotpu.payload import parse_header_bits
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    b, h, w, n_ac = args.batch, 1080, 1920, 10
    cap = (h // 8) * (w // 8) * n_ac
    stripe = pick_stripe(h)
    dlt = jnp.float32(20.0)

    # a real stego batch: embed a typical payload so the parse has a header
    from stegotpu.ops.pallas_kernel import embed_frames_pallas
    from stegotpu.payload import seal_payload
    from stegotpu import crypto

    rng = np.random.default_rng(0)
    priv, pub = crypto.generate_keypair(rng)
    pub_c = crypto.serialize_public_compressed(pub)
    secret = rng.integers(0, 256, 32 * 32 // 8 * 8, dtype=np.uint8)
    bits, _ = seal_payload(secret.tobytes(), 32, 32, pub_c, rng=rng)
    payload = np.zeros((b, cap), np.uint8)
    payload.reshape(-1)[: bits.size] = bits
    frames = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    stego_dev, _ = embed_frames_pallas(
        jnp.asarray(frames), jnp.asarray(payload), jnp.int32(bits.size),
        dlt, n_ac)
    stego = jax.device_put(np.asarray(stego_dev))

    def arm_wire():
        dev = extract_frames_pallas(stego, dlt, n_ac)
        out = np.asarray(dev).reshape(-1)
        parse_header_bits(out)
        return out

    def arm_packed():
        dev = extract_frames_pallas_packed(stego, dlt, n_ac)
        out = packed_rows_to_bits_host(np.asarray(dev), h, w, n_ac,
                                       stripe).reshape(-1)
        parse_header_bits(out)
        return out

    # the r5 product path (pipeline._PackedBitBuf): readback ONLY the
    # (frame, stripe-group) prefix the payload spans — for this typical
    # payload, one group of frame 0 — then parse the full payload from it
    from stegotpu.payload import FIXED_HEADER_BITS, parse_payload_bits
    from stegotpu.pipeline import _PackedBitBuf

    def arm_sliced():
        dev = extract_frames_pallas_packed(stego, dlt, n_ac)
        buf = _PackedBitBuf(h, w, n_ac, stripe)
        buf.add(b, dev)
        _hdr, ct_len, hdr_pos = parse_header_bits(
            buf.bits(FIXED_HEADER_BITS))
        total = hdr_pos + 8 * ct_len
        parts, _ = parse_payload_bits(buf.bits(total))
        return buf.bits(total)

    # warm all compiles, assert identical bits
    bw, bp = arm_wire(), arm_packed()
    np.testing.assert_array_equal(bw, bp)
    bs = arm_sliced()
    np.testing.assert_array_equal(bs, bw[: bs.size])

    def best_of(fn) -> float:
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return best

    t_wire = best_of(arm_wire)
    t_packed = best_of(arm_packed)
    t_sliced = best_of(arm_sliced)
    rp = _rows_pad(stripe, rows_per_block(n_ac))
    spg = cap // (h // stripe)
    groups = -(-int(bits.size) // spg)
    print(json.dumps({
        "batch": b, "payload_bits": int(bits.size), "capacity_bits": cap,
        "backend": jax.default_backend(),
        "wire_ms_per_batch": round(1e3 * t_wire, 2),
        "packed_ms_per_batch": round(1e3 * t_packed, 2),
        "sliced_ms_per_batch": round(1e3 * t_sliced, 2),
        "speedup_packed": round(t_wire / t_packed, 2),
        "speedup_sliced": round(t_wire / t_sliced, 2),
        "readback_bytes_wire": b * cap,
        "readback_bytes_packed": b * (h // stripe) * rp * (w // 8),
        "readback_bytes_sliced": groups * rp * (w // 8),
    }))


if __name__ == "__main__":
    main()
