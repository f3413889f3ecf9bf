"""A/B: bit-packed payload INPUT rows for the embed kernel.

TUNING.md's headroom note says payload rows could bit-pack 8x (70 -> 8.75
MB/128-frame batch) but "the in-kernel unpack is a lane expansion Mosaic
can't express". The round-3 extract-side pack showed the MXU expresses
cross-lane folds as matmuls; the inverse works the same way: a (W/8, W)
0/1 selector matmul replicates each packed byte across its 8 lanes, then
a per-lane iota shift ((byte >> (x%8)) & 1) recovers the bit — all
Mosaic-supported ops. This measures whether the 8x payload-traffic cut
beats the extra selector matmul (cost model: k=W/8=240 vs the vertical
DCT's k=stripe=120 — roughly one extra vertical-matmul-equivalent).

Verdict goes to docs/TUNING.md; the winner ships.
"""

import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stegotpu.config import BLOCK
from stegotpu.ops.pallas_kernel import (
    _DIMSEM,
    _LANE,
    _dct2_compact,
    _embed_frames_pallas,
    _f32_to_u8,
    _horiz_matrix,
    _idct2_sparse,
    _interpret_default,
    _qim_sparse_delta,
    _qim_valid_compact,
    _rows_pad,
    _u8_to_f32,
    _vert_expand_matrix,
    _vert_reduced_matrix,
    payload_to_rows,
    pick_stripe,
    rows_per_block,
)
from stegotpu.utils.jaxcache import enable_compilation_cache


@functools.partial(jax.jit, static_argnames=("h", "w", "num_ac", "stripe"))
def payload_to_rows_packed(payload_bits, h, w, num_ac, stripe):
    """payload_to_rows, then fold each 8-lane group into one byte
    (weight 2^(x%8)) — byte j of a compact row = that row's block-j slots."""
    rows = payload_to_rows(payload_bits, h, w, num_ac, stripe)
    b, r, _ = rows.shape
    g = rows.reshape(b, r, w // BLOCK, BLOCK).astype(jnp.uint32)
    shifts = jnp.arange(BLOCK, dtype=jnp.uint32)
    return (g << shifts).sum(axis=-1).astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _unpack_selector(w: int) -> np.ndarray:
    """(W/8, W) selector: S[j, l] = 1 iff l // 8 == j (byte -> its lanes)."""
    out = np.zeros((w // BLOCK, w), np.float32)
    lane = np.arange(w)
    out[lane // BLOCK, lane] = 1.0
    return out


def _embed_kernel_packedin(frames_ref, prows_ref, pvr_ref, pve_ref, bh_f_ref,
                           bh_i_ref, sel_ref, delta_ref, lim_ref, stego_ref, *,
                           stripe, w, num_ac, cap, rn, rp):
    delta = delta_ref[0]
    x = _u8_to_f32(frames_ref[0])
    ys = _dct2_compact(x, pvr_ref[:], bh_f_ref[:], w)

    # unpack: selector matmul replicates byte j across lanes 8j..8j+7,
    # then (byte >> (lane%8)) & 1 recovers the slot bit
    rep = jnp.dot(_u8_to_f32(prows_ref[0]), sel_ref[:],
                  preferred_element_type=jnp.float32)
    k = jax.lax.broadcasted_iota(jnp.int32, (rp, w), 1) % BLOCK
    bits = ((rep.astype(jnp.int32) >> k) & 1).astype(jnp.float32)

    valid = _qim_valid_compact(
        lim_ref[0], lim_ref[1], stripe=stripe, w=w, num_ac=num_ac, cap=cap,
        rn=rn, rp=rp,
    )
    dy = _qim_sparse_delta(ys, bits, valid, delta)
    xd = _idct2_sparse(dy, pve_ref[:], bh_i_ref[:], w)
    stego_ref[0] = _f32_to_u8(jnp.clip(x + xd, 0.0, 255.0))


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def embed_frames_pallas_packedin(frames, payload_bits, total_bits, delta,
                                 num_ac, interpret):
    b, h, w = frames.shape
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    cap = (h // BLOCK) * (w // BLOCK) * num_ac
    prows = payload_to_rows_packed(payload_bits, h, w, num_ac, stripe)
    delta_arr = jnp.asarray(delta, jnp.float32).reshape(1)
    lim = jnp.stack([total_bits.astype(jnp.int32), jnp.int32(0)])

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    stego = pl.pallas_call(
        functools.partial(_embed_kernel_packedin, stripe=stripe, w=w,
                          num_ac=num_ac, cap=cap, rn=rn, rp=rp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[
            pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, w // BLOCK), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec, mat_spec,
            smem_spec, smem_spec,
        ],
        out_specs=pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        interpret=interpret,
    )(
        frames, prows,
        jnp.asarray(_vert_reduced_matrix(stripe, rn)),
        jnp.asarray(_vert_expand_matrix(stripe, rn)),
        jnp.asarray(_horiz_matrix(inverse=False)),
        jnp.asarray(_horiz_matrix(inverse=True)),
        jnp.asarray(_unpack_selector(w)),
        delta_arr, lim,
    )
    return stego


def main():
    enable_compilation_cache()
    B, H, W, NAC, K = 512, 1080, 1920, 10, 10
    cap = (H // 8) * (W // 8) * NAC
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (B, cap), dtype=np.uint8))
    total = jnp.int32(B * cap)
    delta = jnp.float32(20.0)
    interp = _interpret_default()

    # correctness: packed-in stego must equal the production kernel's
    sb, hb, wb = 4, 64, 256
    fsm = jax.device_put(rng.integers(0, 256, (sb, hb, wb), dtype=np.uint8))
    capb = (hb // 8) * (wb // 8) * NAC
    psm = jax.device_put(rng.integers(0, 2, (sb, capb), dtype=np.uint8))
    tb = jnp.int32(sb * capb - 7)
    ref, _ = _embed_frames_pallas(fsm, psm, tb, delta, NAC, jnp.int32(0),
                                  interp)
    got = embed_frames_pallas_packedin(fsm, psm, tb, delta, NAC, interp)
    diff = int(jnp.sum((ref != got).astype(jnp.int32)))
    assert diff == 0, f"packed-in stego differs in {diff} pixels"
    print(f"# correctness OK (backend={jax.default_backend()})")

    def chain(name, step):
        f = step(frames)
        _ = float(jnp.sum(f, dtype=jnp.int32))  # compile + full completion
        t0 = time.perf_counter()

        @jax.jit
        def chained(f0):
            def body(_, fr):
                return step(fr)
            out = jax.lax.fori_loop(0, K, body, f0)
            return jnp.sum(out, dtype=jnp.int32)

        _ = float(chained(frames))  # compile
        t0 = time.perf_counter()
        _ = float(chained(frames))
        dt = (time.perf_counter() - t0) / K
        print(f"{name}: {dt * 1e3:.2f} ms/batch ({B / dt:.0f} fps)")
        return dt

    t_ref = chain("embed unpacked payload (prod)",
                  lambda f: _embed_frames_pallas(f, payload, total, delta,
                                                 NAC, jnp.int32(0), interp)[0])
    t_new = chain("embed PACKED payload (exp)  ",
                  lambda f: embed_frames_pallas_packedin(f, payload, total,
                                                         delta, NAC, interp))
    print(f"# packed/unpacked: {t_new / t_ref:.3f}x")


if __name__ == "__main__":
    main()
