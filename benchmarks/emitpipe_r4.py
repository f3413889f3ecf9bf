"""emit_pipeline experiment (r4): manual inner pipeline for the fused
roundtrip, hunting the compute/DMA overlap pallas_call's automatic
double-buffered pipeline fails to deliver (roofline_r4.py measured the
fused kernel's time as DMA + compute, additive, against a 4.85 ms/128 DMA
floor at 1080p).

Structure: ONE outer pallas_call step holding HBM refs (memory_space=ANY);
pltpu.emit_pipeline drives a flat (b * stripes,) inner grid with the same
block shapes, carrying a per-step index plane so the QIM validity mask can
recover (frame, stripe) without pl.program_id. Measured with the same
chained methodology as roofline_r4.

Usage: python benchmarks/emitpipe_r4.py [--batch 128] [--iters 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

H, W, N_AC, DELTA = 1080, 1920, 10, 20.0
STRIPE = 120


def build(b: int, bufs: int = 2):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from stegotpu.config import BLOCK
    from stegotpu.ops.pallas_kernel import (
        _dct2_compact,
        _extract_bits_f32,
        _f32_to_u8,
        _horiz2_matrix,
        _horiz_inv2_matrix,
        _idct2_sparse,
        _pack_matrix,
        _qim_sparse_delta,
        _rows_pad,
        _u8_to_f32,
        _vert2_matrix,
        _vert_expand2_matrix,
        rows_per_block,
    )

    rn = rows_per_block(N_AC)
    rp = _rows_pad(STRIPE, rn)
    n_ch = H // STRIPE
    bw = W // BLOCK
    bh_s = STRIPE // BLOCK
    cap = (H // BLOCK) * bw * N_AC
    steps = b * n_ch

    def valid_mask(total, f, jg):
        k = jax.lax.broadcasted_iota(jnp.int32, (rp, W), 0)
        x = jax.lax.broadcasted_iota(jnp.int32, (rp, W), 1)
        i = k // rn
        blk = (jg * bh_s + i) * bw + x // BLOCK
        rem = total - f * cap - blk * N_AC
        c = (k - i * rn) * BLOCK + x % BLOCK
        return (c >= 1) & (c <= N_AC) & (c - 1 < rem)

    def outer(idx_hbm, frames_hbm, rows_hbm, v2, pve, bh2, bhi, pk,
              d_sm, l_sm, stego_hbm, packed_hbm):
        def inner(idx_vm, frames_vm, rows_vm, stego_vm, packed_vm):
            step = idx_vm[0, 0, 0]
            f = step // n_ch
            jg = step - f * n_ch
            delta = d_sm[0]
            x = _u8_to_f32(frames_vm[0])
            ys = _dct2_compact(x, v2[:], bh2[:], W)
            bits = _u8_to_f32(rows_vm[0])
            valid = valid_mask(l_sm[0], f, jg)
            dy = _qim_sparse_delta(ys, bits, valid, delta)
            xd = _idct2_sparse(dy, pve[:], bhi[:], W)
            stego_i = jnp.clip(x + xd, 0.0, 255.0).astype(jnp.int32)
            stego_vm[0] = stego_i.astype(jnp.uint8)
            y2 = _dct2_compact(stego_i.astype(jnp.bfloat16), v2[:], bh2[:], W)
            bf = _extract_bits_f32(y2, delta)
            # emit_pipeline DMA slices need 128-aligned lanes: write the
            # 240 packed bytes into a 256-lane block (16 lanes dead)
            pkd = _f32_to_u8(
                jnp.dot(bf, pk[:], preferred_element_type=jnp.float32))
            packed_vm[0] = jnp.pad(pkd, ((0, 0), (0, 256 - W // BLOCK)))

        fj = lambda s: (s // n_ch, s % n_ch, 0)  # noqa: E731
        pm = pl.Buffered(buffer_count=bufs) if bufs != 2 else None
        pltpu.emit_pipeline(
            inner,
            grid=(steps,),
            in_specs=[
                pl.BlockSpec((1, 8, 128), lambda s: (s, 0, 0)),
                pl.BlockSpec((1, STRIPE, W), fj, pipeline_mode=pm),
                pl.BlockSpec((1, rp, W), fj, pipeline_mode=pm),
            ],
            out_specs=[  # >2 buffers unsupported for outputs (jax r4)
                pl.BlockSpec((1, STRIPE, W), fj),
                pl.BlockSpec((1, rp, 256), fj),
            ],
        )(idx_hbm, frames_hbm, rows_hbm, stego_hbm, packed_hbm)

    mats = (np.asarray(_vert2_matrix(STRIPE, rn)),
            np.asarray(_vert_expand2_matrix(STRIPE, rn, False)),
            np.asarray(_horiz2_matrix()),
            np.asarray(_horiz_inv2_matrix(False)),
            np.asarray(_pack_matrix(W)))
    any_spec = pl.BlockSpec(memory_space=pltpu.ANY)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    call = pl.pallas_call(
        outer,
        in_specs=[any_spec, any_spec, any_spec,
                  mat_spec, mat_spec, mat_spec, mat_spec, mat_spec,
                  smem_spec, smem_spec],
        out_specs=(any_spec, any_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, H, W), jnp.uint8),
            jax.ShapeDtypeStruct((b, n_ch * rp, 256), jnp.uint8),
        ),
    )
    idx = np.broadcast_to(
        np.arange(steps, dtype=np.int32)[:, None, None],
        (steps, 8, 128)).copy()

    @jax.jit
    def run(frames, rows, delta_arr, lim):
        m = [jnp.asarray(x) for x in mats]
        return call(jnp.asarray(idx), frames, rows, *m, delta_arr, lim)

    return run, rp, cap


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bufs", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from stegotpu.ops.pallas_kernel import payload_to_rows
    from stegotpu.ops.qim import extract_frames
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    run, rp, cap = build(b, bufs=args.bufs)

    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (b, H, W), dtype=np.uint8))
    payload = rng.integers(0, 2, (b, cap), dtype=np.uint8)
    rows = jax.device_put(np.asarray(
        payload_to_rows(jnp.asarray(payload), H, W, N_AC, STRIPE)))
    delta_arr = jnp.float32(DELTA).reshape(1)
    lim = jnp.asarray([b * cap, 0], jnp.int32)

    # correctness first: stego must round-trip the payload through the
    # standard XLA extractor (errors counted on device)
    stego, packed = run(frames, rows, delta_arr, lim)

    @jax.jit
    def errs(st, pl_):
        ex = extract_frames(st, jnp.float32(DELTA), N_AC)
        return jnp.sum((ex != pl_).astype(jnp.int32))

    e = int(errs(stego, jnp.asarray(payload)))
    print(json.dumps({"check": "roundtrip_errors_vs_xla_extract", "errors": e,
                      "total": int(b * cap)}), flush=True)

    @jax.jit
    def chained(f):
        def body(_, fr):
            st, _pk = run(fr, rows, delta_arr, lim)
            return st
        out = jax.lax.fori_loop(0, args.iters, body, f)
        return jnp.sum(out, dtype=jnp.int32)

    _ = int(chained(frames))
    t0 = time.perf_counter()
    _ = int(chained(frames))
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "variant": f"emitpipe_buf{args.bufs}", "stripe": STRIPE, "batch": b,
        "ms_per_128": round(dt * 128 / b * 1000, 2),
        "fps": round(b / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
