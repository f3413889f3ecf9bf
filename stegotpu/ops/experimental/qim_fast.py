"""Transpose-free fast path: QIM/DCT in image layout.

The baseline kernel (ops/qim.py) blockifies float32 frames — two big layout
transposes per direction that dominate HBM traffic. This variant never
transposes the pixel data:

- vertical 8-point DCT: contract each 8-row group with M via an einsum over a
  (B, H/8, 8, W) view — pure reshape, no data movement;
- horizontal 8-point DCT: reshape (H, W) -> (H*W/128, 128) (layout-free: W is
  a multiple of 128 for all standard resolutions) and multiply by the 128x128
  block-diagonal B = I_16 (x) M^T — a single fat MXU matmul;
- QIM runs per-coefficient in image layout, driven by a precomputed uint8
  "state plane" (same shape as the frame):

      0/1 -> payload bit for this coefficient slot
      2   -> slot carries no payload but its block was entered
      3   -> block never entered (whole block passes through untransformed)

  The plane is built by one cheap uint8 unblockify from the (B, C) payload —
  the only transpose left in the pipeline, at 1/4 the bytes of a float32
  frame transpose.

Semantics are bit-identical to ops/qim.py (same quantizer, directional
parity, lattice snap, passthrough rules); tests/test_qim_fast.py asserts
equality against it.

Width must be a multiple of 128 for the fast path (1920, 1280, 3840, ... all
qualify); `embed_frames_auto` falls back to the baseline kernel otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from stegotpu.config import BLOCK, BLOCK_AREA
from stegotpu.ops.dct import blockify, dct_matrix, unblockify
from stegotpu.ops import qim as qim_baseline

_LANE = 128
_BPL = _LANE // BLOCK  # blocks per 128-lane chunk


@functools.lru_cache(maxsize=None)
def _bdiag_matrix(transpose: bool, dtype=np.float32) -> np.ndarray:
    """B = I_16 (x) M (or M^T): 128x128 block-diagonal horizontal operator."""
    m = dct_matrix(BLOCK, np.float64)
    blk = m.T if transpose else m
    return np.kron(np.eye(_BPL), blk).astype(dtype)


def _dct2_image(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """2-D 8x8 block DCT of (B, H, W) float32 frames in image layout."""
    b, h, w = x.shape
    m = jnp.asarray(dct_matrix())
    mv = m.T if inverse else m  # vertical operator (contract row index)
    # vertical: y[.., k, ..] = sum_r mv[k, r] x[.., r, ..] within each 8-row group
    xv = x.reshape(b, h // BLOCK, BLOCK, w)
    # precision=HIGHEST: on TPU the default f32 matmul is a single bf16
    # pass that drifts coefficients off the f32 lattice (the r4 bug,
    # ops/qim.py) — pinned here too so the module's bit-identity claim
    # holds on real chips, not just the CPU backend CI runs
    y = jnp.einsum("kr,bgrw->bgkw", mv, xv,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    y = y.reshape(b, h, w)
    # horizontal: right-multiply by I_16 (x) M^T via the 128-lane reshape
    bh = jnp.asarray(_bdiag_matrix(transpose=not inverse))
    yh = jnp.dot(y.reshape(-1, _LANE), bh,
                 precision=jax.lax.Precision.HIGHEST)
    return yh.reshape(b, h, w)


def build_plane_blocks(
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    nb: int,
    num_ac: int,
    bit_offset: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """(B, C) payload -> (B, nb, 64) uint8 state plane in BLOCK layout.

    ONE fused where-chain over a remaining-bits threshold so XLA materializes
    a single uint8 array — the plane build is on the embed hot path (it was
    44% of embed time in the earlier iota-heavy formulation).
    """
    b = payload_bits.shape[0]
    cap = nb * num_ac
    total_bits = total_bits.astype(jnp.int32)
    bit_offset = jnp.asarray(bit_offset, dtype=jnp.int32)

    # remaining bits at each block's first slot: rem > 0 <=> block entered;
    # slot j (0-based AC index) is valid <=> j < rem. (B, nb) int32 only.
    rem = (
        total_bits
        - bit_offset
        - jnp.arange(b, dtype=jnp.int32)[:, None] * cap
        - jnp.arange(nb, dtype=jnp.int32)[None, :] * num_ac
    )[..., None]                                   # (B, nb, 1)

    col = jnp.arange(BLOCK_AREA, dtype=jnp.int32)  # flat coefficient index
    is_slot = (col >= 1) & (col <= num_ac)
    # payload padded into the 64-wide block grid (cols 1..N)
    bits64 = jnp.pad(
        payload_bits.reshape(b, nb, num_ac), ((0, 0), (0, 0), (1, BLOCK_AREA - 1 - num_ac))
    )
    return jnp.where(
        rem <= 0,
        jnp.uint8(3),                                           # block never entered
        jnp.where(is_slot & (col - 1 < rem), bits64, jnp.uint8(2)),
    ).astype(jnp.uint8)


def build_state_plane(
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    h: int,
    w: int,
    num_ac: int,
    bit_offset: jnp.ndarray | int = 0,
) -> jnp.ndarray:
    """(B, C) payload -> (B, H, W) uint8 state plane (see module docstring)."""
    nb = (h // BLOCK) * (w // BLOCK)
    return unblockify(
        build_plane_blocks(payload_bits, total_bits, nb, num_ac, bit_offset), h, w
    )


@functools.partial(jax.jit, static_argnames=("num_ac",))
def embed_frames_fast(
    frames: jnp.ndarray,
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    bit_offset: jnp.ndarray | int = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Image-layout fused embed; API-compatible with ops.qim.embed_frames."""
    b, h, w = frames.shape
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac
    total_bits = total_bits.astype(jnp.int32)
    bit_offset = jnp.asarray(bit_offset, dtype=jnp.int32)

    plane = build_state_plane(payload_bits, total_bits, h, w, num_ac, bit_offset)
    x = frames.astype(jnp.float32)
    y = _dct2_image(x)

    q = jnp.round(y / delta)
    parity = jnp.mod(q, 2.0)
    bit_f = plane.astype(jnp.float32)  # only meaningful where plane < 2
    adjust = jnp.where(parity != bit_f, jnp.where(bit_f == 1.0, 1.0, -1.0), 0.0)
    y_new = jnp.where(plane < 2, (q + adjust) * delta, y)

    x_out = _dct2_image(y_new, inverse=True)
    x_final = jnp.where(plane == 3, x, x_out)  # plane==3 is block-constant
    stego = jnp.clip(x_final, 0.0, 255.0).astype(jnp.uint8)

    bits_per_frame = jnp.clip(
        total_bits - bit_offset - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame


@functools.partial(jax.jit, static_argnames=("num_ac",))
def extract_frames_fast(
    frames: jnp.ndarray, delta: jnp.ndarray, num_ac: int
) -> jnp.ndarray:
    """Image-layout extract; API-compatible with ops.qim.extract_frames."""
    b, h, w = frames.shape
    y = _dct2_image(frames.astype(jnp.float32))
    bits_img = jnp.mod(jnp.round(y / delta), 2.0).astype(jnp.uint8)
    blocks = blockify(bits_img)                       # cheap: uint8
    return blocks[..., 1 : 1 + num_ac].reshape(b, -1)


def _fast_ok(w: int) -> bool:
    return w % _LANE == 0


def embed_frames_auto(frames, payload_bits, total_bits, delta, num_ac,
                      bit_offset=0):
    """Fast path when W % 128 == 0, baseline otherwise."""
    if _fast_ok(frames.shape[-1]):
        return embed_frames_fast(frames, payload_bits, total_bits, delta,
                                 num_ac, bit_offset)
    return qim_baseline.embed_frames(frames, payload_bits, total_bits, delta,
                                     num_ac, bit_offset=bit_offset)


def extract_frames_auto(frames, delta, num_ac):
    if _fast_ok(frames.shape[-1]):
        return extract_frames_fast(frames, delta, num_ac)
    return qim_baseline.extract_frames(frames, delta, num_ac)


@functools.partial(jax.jit, static_argnames=("num_ac",))
def embed_and_extract_frames_fast(frames, payload_bits, total_bits, delta, num_ac):
    stego, bpf = embed_frames_fast(frames, payload_bits, total_bits, delta, num_ac)
    extracted = extract_frames_fast(stego, delta, num_ac)
    return stego, bpf, extracted
