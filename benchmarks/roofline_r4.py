"""Round-4 roofline budget for the fused packed kernel (VERDICT item 1).

[SUPERSEDED in round 5 for ABSOLUTE numbers: the wall-clock chain this
tool uses carries a fixed ~20-25 ms/call relay overhead, so its ms/128
figures are inflated — tools/device_roofline.py reuses these variants but
reads the device timeline instead (u8 copy 314.7 GB/s, fused kernel
4.66 ms/128, compute-bound). The knob-for-knob A/B comparisons below
remain valid: both arms carry the same overhead. docs/TUNING.md round 5.]

Question: is the 7.9ms/128-batch fused roundtrip's gap to the 5.8ms
streaming floor imperfect compute/DMA overlap (fixable) or the cost of the
kernel's actual DMA spec set (irreducible)? Three measurements at the
identical grid/block structure answer it:

  copy      — stego = frames, nothing else: the pure u8 in+out ceiling at
              this block shape (re-measures TUNING.md's ~115 GB/s figure).
  dmaspec   — the fused kernel's EXACT in/out specs (frames + payload rows
              in, stego + packed bits out) with no math: stego = frames,
              packed = a lane slice of rows. The true DMA floor of the
              spec set, including the mixed-size/mixed-plane DMA reality.
  fused     — the real roundtrip kernel (kernel-only: payload rows are
              prebuilt outside the chain; no XLA layout passes measured).

If fused ~= dmaspec, the remainder vs `copy`-derived ideal is DMA latency
inherent to the spec set, not missing overlap — the committed A/B VERDICT
item 1 asks for. Extra variants probe the cheap knobs: a CostEstimate
hint, dimension_semantics, and stripe size under the round-3 packed
structure.

Methodology: K data-dependent iterations chained in one jit (stego feeds
the next frames input; a pallas_call is opaque to XLA, so every input is
read and every output written each iteration) + a final scalar readback —
the axon relay's block_until_ready lies (stegotpu/benchmark.py).

Usage: python benchmarks/roofline_r4.py [--batch 128] [--iters 10]
"""

import argparse
import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

H, W, N_AC, DELTA = 1080, 1920, 10, 20.0


def build_variant(name: str, stripe: int, dimsem, cost: bool, bufs: int = 0):
    """Returns jit(frames, rows, delta_arr, lim) -> (stego, packed)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stegotpu.config import BLOCK
    from stegotpu.ops.pallas_kernel import (
        _embed_kernel,
        _horiz2_matrix,
        _horiz_inv2_matrix,
        _pack_matrix,
        _roundtrip_kernel_packed,
        _rows_pad,
        _vert2_matrix,
        _vert_expand2_matrix,
        rows_per_block,
    )

    rn = rows_per_block(N_AC)
    rp = _rows_pad(stripe, rn)
    nb = (H // BLOCK) * (W // BLOCK)
    cap = nb * N_AC
    interpret = jax.default_backend() == "cpu"

    def copy_kernel(frames_ref, rows_ref, d_ref, l_ref, stego_ref, bits_ref):
        stego_ref[0] = frames_ref[0]
        bits_ref[0] = rows_ref[0][:, : W // BLOCK]

    if name == "copy":
        # in+out u8 frame planes only — rows/packed shrunk to minimal
        def pure_copy(frames_ref, stego_ref):
            stego_ref[0] = frames_ref[0]

        def make(b):
            tile = pl.BlockSpec((1, stripe, W), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                pure_copy, grid=(b, H // stripe),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=dimsem),
                in_specs=[tile], out_specs=tile,
                out_shape=jax.ShapeDtypeStruct((b, H, W), jnp.uint8),
                interpret=interpret)

        @jax.jit
        def run(frames, rows, delta_arr, lim):
            return make(frames.shape[0])(frames), None

        return run, H * W * 2  # bytes per frame

    if name == "dmaspec":
        kern = copy_kernel
    elif name == "embed":
        # embed-only kernel (no re-extract/pack): splits the fused compute
        # budget into its embed and re-extract halves
        kern = functools.partial(_embed_kernel, stripe=stripe, w=W, w_real=W,
                                 num_ac=N_AC, cap=cap, rn=rn, rp=rp)
    else:
        kern = functools.partial(_roundtrip_kernel_packed, stripe=stripe,
                                 w=W, w_real=W, num_ac=N_AC, cap=cap, rn=rn,
                                 rp=rp)

    def make(b):
        pm = pl.Buffered(buffer_count=bufs) if bufs else None
        tile = pl.BlockSpec((1, stripe, W), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM, pipeline_mode=pm)
        rows_spec = pl.BlockSpec((1, rp, W), lambda i, j: (i, j, 0),
                                 memory_space=pltpu.VMEM, pipeline_mode=pm)
        packed_spec = pl.BlockSpec((1, rp, W // BLOCK), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM, pipeline_mode=pm)
        mat = pl.BlockSpec(memory_space=pltpu.VMEM)
        smem = pl.BlockSpec(memory_space=pltpu.SMEM)
        if name == "dmaspec":
            in_specs = [tile, rows_spec, smem, smem]
        elif name == "embed":
            in_specs = [tile, rows_spec, mat, mat, mat, mat, smem, smem]
        else:
            in_specs = [tile, rows_spec, mat, mat, mat, mat, mat, smem, smem]
        kwargs = {}
        if cost:
            bytes_per = (H * W + (H // stripe) * rp * W + H * W
                         + (H // stripe) * rp * (W // BLOCK))
            kwargs["cost_estimate"] = pl.CostEstimate(
                flops=2 * b * 4 * (H // 8) * 2 * 8 * W * 8,  # 4 matmul passes
                bytes_accessed=b * bytes_per, transcendentals=0)
        if name == "embed":
            out_specs, out_shape = tile, jax.ShapeDtypeStruct((b, H, W),
                                                              jnp.uint8)
        else:
            out_specs = (tile, packed_spec)
            out_shape = (
                jax.ShapeDtypeStruct((b, H, W), jnp.uint8),
                jax.ShapeDtypeStruct((b, (H // stripe) * rp, W // BLOCK),
                                     jnp.uint8))
        return pl.pallas_call(
            kern, grid=(b, H // stripe),
            compiler_params=pltpu.CompilerParams(dimension_semantics=dimsem),
            in_specs=in_specs,
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret, **kwargs)

    mats = None
    if name == "embed":
        mats = (np.asarray(_vert2_matrix(stripe, rn)),
                np.asarray(_vert_expand2_matrix(stripe, rn, False)),
                np.asarray(_horiz2_matrix()),
                np.asarray(_horiz_inv2_matrix(False)))
    elif name != "dmaspec":
        mats = (np.asarray(_vert2_matrix(stripe, rn)),
                np.asarray(_vert_expand2_matrix(stripe, rn, False)),
                np.asarray(_horiz2_matrix()),
                np.asarray(_horiz_inv2_matrix(False)),
                np.asarray(_pack_matrix(W)))

    @jax.jit
    def run(frames, rows, delta_arr, lim):
        b = frames.shape[0]
        if name == "dmaspec":
            return make(b)(frames, rows, delta_arr, lim)
        m = [jnp.asarray(x) for x in mats]
        return make(b)(frames, rows, *m, delta_arr, lim)

    bytes_per = (H * W + (H // stripe) * rp * W + H * W
                 + (H // stripe) * rp * (W // BLOCK))
    return run, bytes_per


def measure(run, b: int, iters: int, stripe: int) -> float:
    import jax
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import (_rows_pad, payload_to_rows,
                                            rows_per_block)

    rng = np.random.default_rng(0)
    cap = (H // 8) * (W // 8) * N_AC
    frames = jax.device_put(rng.integers(0, 256, (b, H, W), dtype=np.uint8))
    payload = rng.integers(0, 2, (b, cap), dtype=np.uint8)
    rows = jax.device_put(np.asarray(
        payload_to_rows(jnp.asarray(payload), H, W, N_AC, stripe)))
    delta_arr = jnp.float32(DELTA).reshape(1)
    lim = jnp.asarray([b * cap, 0], jnp.int32)

    @jax.jit
    def chained(f):
        def body(_, fr):
            out = run(fr, rows, delta_arr, lim)
            while isinstance(out, tuple):
                out = out[0]
            return out  # the (b, H, W) stego plane feeds the next iteration
        out = jax.lax.fori_loop(0, iters, body, f)
        return jnp.sum(out, dtype=jnp.int32)

    _ = int(chained(frames))  # compile + warmup
    t0 = time.perf_counter()
    _ = int(chained(frames))
    return (time.perf_counter() - t0) / iters


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--variants", default=None,
                    help="comma list; default all")
    args = ap.parse_args()

    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()

    PAR = ("parallel", "arbitrary")
    PP = ("parallel", "parallel")
    ARB = ("arbitrary", "arbitrary")
    grid = [
        ("copy", 120, PAR, False),
        ("dmaspec", 120, PAR, False),
        ("fused", 120, PAR, False),
        ("embed", 120, PAR, False),
        ("fused_pp", 120, PP, False),
        ("fused_cost", 120, PAR, True),
        ("fused_arb", 120, ARB, False),
        ("fused_s216", 216, PAR, False),
        ("fused_s360", 360, PAR, False),
        ("fused_buf3", 120, PAR, False),
        ("fused_buf4", 120, PAR, False),
    ]
    if args.variants:
        want = set(args.variants.split(","))
        grid = [g for g in grid if g[0] in want]

    for (label, stripe, dimsem, cost) in grid:
        if H % stripe:
            continue
        base = ("embed" if label == "embed" else
                "fused" if label.startswith("fused") else label)
        bufs = int(label[-1]) if label.startswith("fused_buf") else 0
        run, bytes_per = build_variant(base, stripe, dimsem, cost, bufs=bufs)
        dt = measure(run, args.batch, args.iters, stripe)
        ms128 = dt * 128 / args.batch * 1000
        gbps = args.batch * bytes_per / dt / 1e9
        print(json.dumps({
            "variant": label, "stripe": stripe, "batch": args.batch,
            "ms_per_128": round(ms128, 2),
            "fps": round(args.batch / dt, 1),
            "gbps": round(gbps, 1),
            "bytes_per_frame": bytes_per,
        }), flush=True)


if __name__ == "__main__":
    main()
