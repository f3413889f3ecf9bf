"""Per-stage TPU timing of the round-trip pipeline (relay-safe methodology:
chained data-dependent iterations inside one jit + one scalar readback)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

from stegotpu.ops import pallas_kernel as pk
from stegotpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

B, H, W, N_AC, DELTA, K = 128, 1080, 1920, 10, 20.0, 10
CAP = (H // 8) * (W // 8) * N_AC
STRIPE = pk.pick_stripe(H)

rng = np.random.default_rng(0)
frames = jax.device_put(rng.integers(0, 256, (B, H, W), dtype=np.uint8))
payload = jax.device_put(rng.integers(0, 2, (B, CAP), dtype=np.uint8))
total = jnp.int32(B * CAP)
dlt = jnp.float32(DELTA)


def timed(name, fn, *args):
    @jax.jit
    def chained(x):
        def body(_, carry):
            out = fn(carry)
            return out
        return jnp.sum(jax.lax.fori_loop(0, K, body, x), dtype=jnp.int32)

    _ = float(chained(*args))
    t0 = time.perf_counter()
    _ = float(chained(*args))
    dt = (time.perf_counter() - t0) / K
    print(f"{name:28s} {dt*1e3:8.2f} ms/batch  {B/dt:10.0f} fps")
    return dt


# payload_to_rows alone (u8 in -> u8 out, feed output back via slicing)
def p2r_step(p):
    r = pk.payload_to_rows(p, H, W, N_AC, STRIPE)
    # map back to (B, CAP) u8 so the loop carry type is stable
    return pk.rows_to_bits(r, H, W, N_AC, STRIPE)

timed("payload_to_rows+rows_to_bits", p2r_step, payload)

RP = pk._rows_pad(STRIPE, pk.rows_per_block(N_AC))
rows0 = pk.payload_to_rows(payload, H, W, N_AC, STRIPE)


def r2b_step(r):
    bits = pk.rows_to_bits(r, H, W, N_AC, STRIPE)
    return r ^ bits[:, :1, None]

timed("rows_to_bits alone", r2b_step, rows0)


def extract_kernel_only(f):
    bits_rows = pk._extract_frames_pallas_rows(f, dlt, N_AC, False)
    return f ^ bits_rows[:, :1, :1]

timed("extract kernel only", extract_kernel_only, frames)


def honest_roundtrip(f):
    s, _, e = pk.embed_and_extract_frames_pallas_fused(f, payload, total, dlt,
                                                       N_AC)
    return s ^ e[:, :1, None]   # REAL dependency on the extracted bits

timed("roundtrip fused honest", honest_roundtrip, frames)


def embed_step(f):
    s, _ = pk.embed_frames_pallas(f, payload, total, dlt, N_AC)
    return s

timed("embed (kernel+rows prep)", embed_step, frames)


def extract_step(f):
    bits = pk.extract_frames_pallas(f, dlt, N_AC)
    # keep a (B,H,W) u8 carry: xor a bit slice into the frame
    return f ^ bits[:, :1, None]

timed("extract (kernel+unpack)", extract_step, frames)


def roundtrip_step(f):
    s, _, e = pk.embed_and_extract_frames_pallas(f, payload, total, dlt, N_AC)
    return s ^ (e[:, :1, None] & 0)

timed("roundtrip two-kernel", roundtrip_step, frames)


def roundtrip_fused_step(f):
    s, _, e = pk.embed_and_extract_frames_pallas_fused(f, payload, total, dlt,
                                                       N_AC)
    return s ^ (e[:, :1, None] & 0)

timed("roundtrip fused", roundtrip_fused_step, frames)
