"""Fused batched DCT/QIM embed & extract — the hot path, XLA-native.

Replaces the reference's scalar per-block Python loop (reference:
config_and_setup.py:106-174) with fully vectorized device compute:

    blockify -> (nb, 64) @ K64^T on the MXU -> vectorized directional-parity
    QIM on AC columns 1..N -> (nb, 64) @ K64 -> unblockify -> clip + uint8

Exact semantic contract reproduced from the reference (SURVEY.md §2.4):

- "AC coefficients" are flat row-major indices 1..N of the 8x8 block
  (NOT zigzag) (config_and_setup.py:138-140);
- embed quantizer: q = round(c/delta) with round-half-to-even; if parity
  mismatches the payload bit, move q by +1 for bit 1 and -1 for bit 0
  (directional, not nearest); the coefficient is ALWAYS rewritten to
  q*delta, even when parity already matches (lattice snap,
  config_and_setup.py:146-156);
- bits are consumed row-major, N per block; embedding stops mid-block at the
  payload end; blocks never entered pass through untouched (no DCT roundtrip),
  while partially-used blocks are still inverse-transformed
  (config_and_setup.py:129-132,141,166-169);
- output pixels: clip to [0,255] then TRUNCATING uint8 cast (not round)
  (config_and_setup.py:171);
- extract reads round(c/delta) mod 2 for every AC slot of every block,
  with no knowledge of where embedding stopped (config_and_setup.py:159-163).

Frames are (B, H, W) uint8 grayscale, pre-cropped to multiples of 8. Payload
for the batch is pre-padded to the batch capacity B*C bits (C = per-frame
capacity) with don't-care bits; `total_bits` (dynamic scalar) marks the real
payload end so jit never recompiles across payload lengths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from stegotpu.config import BLOCK
from stegotpu.ops.dct import blockify, kron_dct_matrix, unblockify


def _ac_slice(y: jnp.ndarray, num_ac: int) -> jnp.ndarray:
    return jax.lax.slice_in_dim(y, 1, 1 + num_ac, axis=-1)


def qim_embed_coeffs(
    ac: jnp.ndarray, bits: jnp.ndarray, valid: jnp.ndarray, delta: jnp.ndarray
) -> jnp.ndarray:
    """Directional-parity QIM on a tensor of AC coefficients.

    ac: float32 coefficients; bits: 0/1 same shape; valid: bool mask of slots
    actually carrying payload. Invalid slots keep their original value.
    """
    q = jnp.round(ac / delta)  # round-half-to-even, matches python round()
    parity = jnp.mod(q, 2.0)
    bits_f = bits.astype(jnp.float32)
    adjust = jnp.where(parity != bits_f, jnp.where(bits_f == 1.0, 1.0, -1.0), 0.0)
    snapped = (q + adjust) * delta
    return jnp.where(valid, snapped, ac)


@functools.partial(jax.jit, static_argnames=("num_ac", "block"))
def embed_frames(
    frames: jnp.ndarray,
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    block: int = BLOCK,
    bit_offset: jnp.ndarray | int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Embed payload bits into a batch of frames.

    Args:
      frames: (B, H, W) uint8 grayscale, H and W multiples of `block`.
      payload_bits: (B, C) uint8 0/1, C = (H//8)*(W//8)*num_ac per-frame
        capacity; frame i consumes global bit indices
        [bit_offset + i*C, bit_offset + (i+1)*C).
      total_bits: int32 scalar — number of real payload bits (rest are padding).
      delta: float32 scalar QIM step (> 0).
      num_ac: static number of AC coefficients per block.
      bit_offset: global bit index of this batch's first slot — used by
        sharded execution where each device holds a shard of the frame axis
        (stegotpu.parallel) so `valid`/`entered` masks line up globally.

    Returns:
      (stego uint8 (B, H, W), bits_embedded per frame int32 (B,)).
    """
    b, h, w = frames.shape
    nb = (h // block) * (w // block)
    cap = nb * num_ac
    total_bits = total_bits.astype(jnp.int32)
    bit_offset = jnp.asarray(bit_offset, dtype=jnp.int32)

    xb = blockify(frames.astype(jnp.float32), block)  # (B, nb, 64)
    k = jnp.asarray(kron_dct_matrix(block))
    y = jnp.einsum("bnc,kc->bnk", xb, k, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)

    ac = _ac_slice(y, num_ac)  # (B, nb, N)
    # Remaining bits at each block's first slot (global index offset + i*C +
    # blk*N): rem > 0 <=> block entered; slot j valid <=> j < rem. Threshold
    # form keeps the big (B, nb, N) iota out of the graph (hot-path cost,
    # see docs/TUNING.md).
    rem = (
        total_bits
        - bit_offset
        - jnp.arange(b, dtype=jnp.int32)[:, None] * cap
        - jnp.arange(nb, dtype=jnp.int32)[None, :] * num_ac
    )[..., None]                                       # (B, nb, 1)
    valid = jnp.arange(num_ac, dtype=jnp.int32) < rem  # (B, nb, N)
    bits = payload_bits.reshape(b, nb, num_ac)
    ac_new = qim_embed_coeffs(ac, bits, valid, delta)

    y_new = jnp.concatenate(
        [y[..., :1], ac_new, y[..., 1 + num_ac :]], axis=-1
    )
    x_out = jnp.einsum("bnk,kc->bnc", y_new, k,
                       preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)

    # Blocks whose first slot lies past the payload end were never entered:
    # they pass through with NO transform roundtrip (config_and_setup.py:130-132).
    entered = rem > 0
    x_final = jnp.where(entered, x_out, xb)

    stego = unblockify(x_final, h, w, block)
    stego_u8 = jnp.clip(stego, 0.0, 255.0).astype(jnp.uint8)  # truncating cast
    bits_per_frame = jnp.clip(
        total_bits - bit_offset - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego_u8, bits_per_frame


@functools.partial(jax.jit, static_argnames=("num_ac", "block"))
def extract_frames(
    frames: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    block: int = BLOCK,
) -> jnp.ndarray:
    """Extract the full QIM capacity of every frame.

    Returns (B, C) uint8 bit array, C = (H//8)*(W//8)*num_ac. Excess garbage
    bits past the true payload end are discarded by the header-driven parser,
    exactly like the reference (extract_process.py:89-188).
    """
    b, h, w = frames.shape
    xb = blockify(frames.astype(jnp.float32), block)
    k = jnp.asarray(kron_dct_matrix(block))
    y = jnp.einsum("bnc,kc->bnk", xb, k, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    ac = _ac_slice(y, num_ac)
    # delta <= 0 degenerate path: all-zero bits, explicitly (the reference
    # appends '0' per slot, config_and_setup.py:143-145; dividing by zero
    # would be an implementation-defined NaN->uint8 cast)
    safe = jnp.where(delta > 0, delta, 1.0)
    q = jnp.round(ac / safe)
    bits = jnp.where(delta > 0, jnp.mod(q, 2.0), 0.0).astype(jnp.uint8)
    return bits.reshape(b, -1)


def roundtrip_metrics(frames, stego, extracted, payload_bits, total_bits):
    """On-device quality metrics for an embed/extract round trip.

    Returns {psnr_db, bit_errors, payload_bits} as device scalars (only
    scalars cross the host boundary for live monitoring). Bit errors count
    payload-carrying slots only. Shared by embed_extract_evaluate and the
    streaming benchmarks (benchmarks/uhd_stream.py).
    """
    from stegotpu.metrics import psnr  # the ONE PSNR implementation

    psnr_db = psnr(frames, stego)
    b = frames.shape[0]
    cap = payload_bits.shape[1]
    total_bits = total_bits.astype(jnp.int32)
    # threshold form: remaining bits at each frame's first slot
    rem = (total_bits - jnp.arange(b, dtype=jnp.int32)[:, None] * cap)
    valid = jnp.arange(cap, dtype=jnp.int32) < rem
    bit_errors = jnp.sum(
        jnp.where(valid, (extracted != payload_bits).astype(jnp.int32), 0)
    )
    return {
        "psnr_db": psnr_db,
        "bit_errors": bit_errors,
        "payload_bits": jnp.minimum(total_bits, b * cap),
    }


@functools.partial(jax.jit, static_argnames=("num_ac", "block"))
def embed_extract_evaluate(
    frames: jnp.ndarray,
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    block: int = BLOCK,
):
    """Streaming-evaluation step: embed + extract + on-device quality metrics.

    One device dispatch returns (stego, bits_per_frame, extracted,
    metrics) where metrics = {psnr_db, bit_errors, payload_bits}
    (BASELINE.json's "on-device evaluation" config; per-frame SSIM is
    available separately via metrics.ssim_batch — it is not computed here
    because the streaming benchmarks gate on PSNR/BER scalars only).
    """
    stego, bits_per_frame, extracted = embed_and_extract_frames(
        frames, payload_bits, total_bits, delta, num_ac, block
    )
    metrics = roundtrip_metrics(frames, stego, extracted, payload_bits, total_bits)
    return stego, bits_per_frame, extracted, metrics


@functools.partial(jax.jit, static_argnames=("num_ac", "block"))
def embed_and_extract_frames(
    frames: jnp.ndarray,
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    block: int = BLOCK,
):
    """Fused round-trip (embed then re-extract from the stego frames).

    Used by benchmarks and self-checks: returns (stego, bits_per_frame,
    extracted_bits) in one device dispatch.
    """
    stego, bits_per_frame = embed_frames(
        frames, payload_bits, total_bits, delta, num_ac, block
    )
    extracted = extract_frames(stego, delta, num_ac, block)
    return stego, bits_per_frame, extracted
