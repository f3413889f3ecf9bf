"""r5 structural attempt at the ~4 ms non-DMA-overlapped compute (VERDICT
r4 item 2): TWO frames per grid step as INDEPENDENT dependency chains.

Round 4 proved the fused roundtrip's gap above the DMA floor is serial
compute no pipeline knob recovers (TUNING.md r4) — but every A/B varied
pipeline machinery around a single serial chain: within one grid step, each
matmul waits on the previous VPU stage and vice versa, so the MXU idles
during VPU work and vice versa. This variant gives Mosaic's scheduler
instruction-level parallelism instead: a (2, stripe, W) block whose two
frame slices run the SAME body as two chains with NO data dependence
between them — if the compiler interleaves them, chain A's matmuls overlap
chain B's casts/QIM arithmetic. (Plain bigger stripes don't do this: one
chain, same serialization — measured flat-to-worse in r4.)

Correctness: asserted bit-identical (stego AND packed bits) to the default
one-frame kernel before timing. Timing: the bench.py chained-in-jit
methodology at batch 512, wire-precision matrices.

Usage: python benchmarks/dualchain_r5.py [--batch 512] [--chain 10]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from stegotpu.ops import pallas_kernel as pk  # noqa: E402
from stegotpu.utils.jaxcache import enable_compilation_cache  # noqa: E402


def _dual_kernel(frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref,
                 pk_ref, delta_ref, lim_ref, stego_ref, bits_ref, *,
                 stripe, w, w_real, num_ac, cap, rn, rp):
    """_roundtrip_kernel_packed body x2, chains independent per frame."""
    delta = delta_ref[0]
    base = pl.program_id(0) * 2
    for sub in range(2):
        x = pk._u8_to_f32(frames_ref[sub])
        ys = pk._dct2_compact(x, pvr_ref[:], bh_f_ref[:], w)
        bits = pk._u8_to_f32(rows_ref[sub])
        valid = pk._qim_valid_compact(
            lim_ref[0], lim_ref[1], stripe=stripe, w=w, w_real=w_real,
            num_ac=num_ac, cap=cap, rn=rn, rp=rp, frame=base + sub,
        )
        dy = pk._qim_sparse_delta(ys, bits, valid, delta)
        xd = pk._idct2_sparse(dy, pve_ref[:], bh_i_ref[:], w)
        stego_i = jnp.clip(x + xd, 0.0, 255.0).astype(jnp.int32)
        stego_ref[sub] = stego_i.astype(jnp.uint8)
        y2 = pk._dct2_compact(stego_i.astype(jnp.bfloat16), pvr_ref[:],
                              bh_f_ref[:], w)
        bf = pk._extract_bits_f32(y2, delta)
        bits_ref[sub] = pk._f32_to_u8(
            jnp.dot(bf, pk_ref[:], preferred_element_type=jnp.float32))


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def dual_roundtrip(frames, payload_bits, total_bits, delta, num_ac,
                   interpret=False):
    b, h, w = frames.shape
    assert b % 2 == 0
    wp = pk._lane_pad(w)
    stripe = pk.pick_stripe(h)
    rn = pk.rows_per_block(num_ac)
    rp = pk._rows_pad(stripe, rn)
    cap = (h // 8) * (w // 8) * num_ac

    rows = pk._pad_lanes(
        pk.payload_to_rows(payload_bits, h, w, num_ac, stripe), wp)
    lim = jnp.stack([total_bits, jnp.int32(0)]).astype(jnp.int32)
    grid = (b // 2, h // stripe)
    mat = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = pl.BlockSpec((2, stripe, wp), lambda i, j: (i, j, 0),
                        memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((2, rp, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    packed_spec = pl.BlockSpec((2, rp, wp // 8), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    stego, bits_packed = pl.pallas_call(
        functools.partial(_dual_kernel, stripe=stripe, w=wp, w_real=w,
                          num_ac=num_ac, cap=cap, rn=rn, rp=rp),
        grid=grid,
        compiler_params=pk._DIMSEM,
        in_specs=[tile, rows_spec, mat, mat, mat, mat, mat, smem, smem],
        out_specs=(tile, packed_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp), jnp.uint8),
            jax.ShapeDtypeStruct((b, (h // stripe) * rp, wp // 8), jnp.uint8),
        ),
        interpret=interpret,
    )(
        pk._pad_lanes(frames, wp), rows,
        jnp.asarray(pk._vert2_matrix(stripe, rn)),
        jnp.asarray(pk._vert_expand2_matrix(stripe, rn, False)),
        jnp.asarray(pk._horiz2_matrix()),
        jnp.asarray(pk._horiz_inv2_matrix(False)),
        jnp.asarray(pk._pack_matrix(wp)),
        delta.reshape(1), lim,
    )
    if wp != w:
        stego = stego[:, :, :w]
        bits_packed = bits_packed[:, :, : w // 8]
    extracted = pk.packed_rows_to_bits(bits_packed, h, w, num_ac, stripe)
    bpf = jnp.clip(total_bits - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap)
    return stego, bpf, extracted


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--chain", type=int, default=10)
    args = ap.parse_args()
    enable_compilation_cache()
    interpret = jax.default_backend() == "cpu"

    b, h, w, n_ac, delta = args.batch, 1080, 1920, 10, 20.0
    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    total = jnp.int32(b * cap - 13)
    dlt = jnp.float32(delta)

    # correctness gate: bit-identical to the default fused-packed kernel
    small = 4
    f4, p4 = frames[:small], payload[:small]
    t4 = jnp.int32(small * cap - 13)
    s_ref, bpf_ref, e_ref = pk.embed_and_extract_frames_pallas_packed(
        f4, p4, t4, dlt, n_ac)
    s_d, bpf_d, e_d = dual_roundtrip(f4, p4, t4, dlt, n_ac, interpret)
    np.testing.assert_array_equal(np.asarray(s_ref), np.asarray(s_d))
    np.testing.assert_array_equal(np.asarray(e_ref), np.asarray(e_d))
    np.testing.assert_array_equal(np.asarray(bpf_ref), np.asarray(bpf_d))
    print("correctness: dual-chain bit-identical to default kernel",
          file=sys.stderr, flush=True)

    def measure(fn) -> float:
        @jax.jit
        def chained(f, p):
            def body(_, carry):
                fr, pl_ = carry
                s, _, e = fn(fr, pl_, jnp.int32(b * cap), dlt, n_ac)
                return s, e
            out, bits = jax.lax.fori_loop(0, args.chain, body, (f, p))
            return (jnp.sum(out, dtype=jnp.int32)
                    + jnp.sum(bits, dtype=jnp.int32))

        _ = float(chained(frames, payload))  # compile + warm
        t0 = time.perf_counter()
        _ = float(chained(frames, payload))
        return b * args.chain / (time.perf_counter() - t0)

    fps_default = measure(
        lambda f, p, t, d, n: pk.embed_and_extract_frames_pallas_packed(
            f, p, t, d, n))
    fps_dual = measure(
        lambda f, p, t, d, n: dual_roundtrip(f, p, t, d, n, interpret))
    print(json.dumps({
        "batch": b, "chain": args.chain,
        "fps_default": round(fps_default, 1),
        "fps_dualchain": round(fps_dual, 1),
        "speedup": round(fps_dual / fps_default, 3),
    }))


if __name__ == "__main__":
    main()
