"""Micro-bench of rows_to_bits formulations on TPU (scratch experiment)."""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from stegotpu.ops import pallas_kernel as pk
from stegotpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

B, H, W, N_AC = 128, 1080, 1920, 10
STRIPE = pk.pick_stripe(H)
BLOCK = 8
RN = pk.rows_per_block(N_AC)
RP = pk._rows_pad(STRIPE, RN)
BH, BW = H // 8, W // 8
CAP = BH * BW * N_AC

rng = np.random.default_rng(0)
rows = jax.device_put(
    rng.integers(0, 2, (B, (H // STRIPE) * RP, W), dtype=np.uint8))


def timed(name, fn):
    f = jax.jit(fn)

    def chained(r):
        def body(_, carry):
            bits = f(carry)
            return carry ^ bits[:, :1, None]
        return jnp.sum(jax.lax.fori_loop(0, 10, body, r), dtype=jnp.int32)

    c = jax.jit(chained)
    _ = float(c(rows))
    t0 = time.perf_counter()
    _ = float(c(rows))
    dt = (time.perf_counter() - t0) / 10
    print(f"{name:32s} {dt*1e3:8.2f} ms")


def v_strided(r):
    return pk.rows_to_bits(r, H, W, N_AC, STRIPE)


def v_transpose(r):
    r = r.reshape(B, H // STRIPE, RP, W)[:, :, : (STRIPE // 8) * RN]
    r = r.reshape(B, BH, RN, BW, BLOCK).transpose(0, 1, 3, 2, 4)
    r = r.reshape(B, BH, BW, RN * BLOCK)
    return r[..., 1 : 1 + N_AC].reshape(B, -1)


def v_matmul(r):
    """Lane compaction via one MXU matmul instead of tiny-chunk copies."""
    r = r.reshape(B, H // STRIPE, RP, W)[:, :, : (STRIPE // 8) * RN]
    r = r.reshape(B, BH, RN, BW, BLOCK).transpose(0, 1, 3, 2, 4)
    rf = r.reshape(-1, RN * BLOCK).astype(jnp.float32)
    sel = np.zeros((RN * BLOCK, N_AC), np.float32)
    for m in range(N_AC):
        sel[m + 1, m] = 1.0
    out = rf @ jnp.asarray(sel)
    return out.astype(jnp.uint8).reshape(B, -1)


def v_no_slice(r):
    """Keep the sublane padding rows; only do the wire interleave."""
    r = r.reshape(B, H // STRIPE, RP, W)
    r = r.reshape(B, (H // STRIPE) * RP // 2, 2, BW, BLOCK)
    parts = [r[:, :, 0, :, 1:8], r[:, :, 1, :, 0:3]]
    return jnp.concatenate(parts, axis=-1).reshape(B, -1)


timed("strided concat (current)", v_strided)
timed("5-D transpose", v_transpose)
timed("transpose+matmul compaction", v_matmul)
timed("no row slice (layout only)", v_no_slice)
