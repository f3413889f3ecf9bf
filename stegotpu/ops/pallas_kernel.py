"""Fused Pallas TPU kernel: QIM/DCT embed & extract in one HBM pass.

The XLA baseline (ops/qim.py) materializes float32 intermediates (blockified
frames, coefficients, modified coefficients) in HBM between fusion islands.
This kernel keeps the whole per-stripe dataflow in VMEM:

    uint8 stripe -> f32 -> vertical DCT -> horizontal DCT -> QIM (driven by
    the uint8 state plane, see ops/qim_fast.build_state_plane) -> inverse
    DCTs -> clip -> truncating uint8 cast

HBM traffic per embedded frame drops to: read frame (u8) + read plane (u8) +
write stego (u8). The transforms run on the MXU:

- vertical: P = I_{S/8} (x) M, an (S, S) block-diagonal operator applied to
  the (S, W) stripe in ONE matmul (S = stripe rows, 120 by default ->
  contraction depth 120, near the 128 MXU sweet spot);
- horizontal: B = I_16 (x) M^T, a (128, 128) block-diagonal operator applied
  per 128-lane chunk in a static loop of (S, 128) @ (128, 128) matmuls.

Stripe height: the largest of {120, 96, 72, 48, 24, 8} dividing H (any
pre-cropped H is a multiple of 8, so 8 always works). Grid = (B, H/S).

Semantics match ops/qim.py exactly (same quantizer, directional parity,
lattice snap, per-slot validity, whole-block passthrough for never-entered
blocks via plane==3); tests/test_pallas_kernel.py asserts equality.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stegotpu.config import BLOCK
from stegotpu.ops.dct import blockify, dct_matrix
from stegotpu.ops.qim_fast import build_state_plane

_LANE = 128


@functools.lru_cache(maxsize=None)
def _vert_matrix(stripe: int, inverse: bool, dtype=np.float32) -> np.ndarray:
    m = dct_matrix(BLOCK, np.float64)
    blk = m.T if inverse else m
    return np.kron(np.eye(stripe // BLOCK), blk).astype(dtype)


@functools.lru_cache(maxsize=None)
def _horiz_matrix(inverse: bool, dtype=np.float32) -> np.ndarray:
    m = dct_matrix(BLOCK, np.float64)
    # forward right-multiplies by M^T per 8-col block; inverse by M
    blk = m if inverse else m.T
    return np.kron(np.eye(_LANE // BLOCK), blk).astype(dtype)


def pick_stripe(h: int) -> int:
    import logging
    import os

    override = os.environ.get("STEGOTPU_PALLAS_STRIPE")
    if override:
        try:
            s = int(override)
        except ValueError:
            s = -1
        if s > 0 and s % BLOCK == 0 and h % s == 0:
            return s
        logging.getLogger("stegotpu").warning(
            "ignoring STEGOTPU_PALLAS_STRIPE=%r: must be a positive multiple "
            "of %d dividing height %d", override, BLOCK, h,
        )
    for s in (120, 96, 72, 48, 24, 8):
        if h % s == 0:
            return s
    raise ValueError(f"height {h} is not a multiple of 8")


def _u8_to_f32(x):
    """Mosaic lacks a direct u8->f32 cast; hop through int32."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _f32_to_u8(x):
    """Truncating cast (via int32, same toward-zero semantics as numpy)."""
    return x.astype(jnp.int32).astype(jnp.uint8)


def _dct2_stripe(x, pv, bh, w):
    """(S, W) f32 stripe -> coefficients, via two MXU matmuls.

    Vertical: one (S, S) block-diagonal matmul. Horizontal: fold the lane
    axis W = (W/128)*128 into sublanes — row-major, so (S, W) -> (S*W/128,
    128) is a tile-order reinterpretation — and apply the 128x128
    block-diagonal operator in a single fat matmul.
    """
    s = x.shape[0]
    y = jnp.dot(pv, x, preferred_element_type=jnp.float32)  # vertical
    yr = y.reshape(s * (w // _LANE), _LANE)
    z = jnp.dot(yr, bh, preferred_element_type=jnp.float32)
    return z.reshape(s, w)


def _embed_kernel(frames_ref, plane_ref, pv_f_ref, pv_i_ref, bh_f_ref,
                  bh_i_ref, delta_ref, stego_ref, *, stripe, w):
    pv_f = pv_f_ref[:]
    pv_i = pv_i_ref[:]
    bh_f = bh_f_ref[:]
    bh_i = bh_i_ref[:]
    delta = delta_ref[0]

    x = _u8_to_f32(frames_ref[0])           # block is (1, stripe, w)
    plane = plane_ref[0].astype(jnp.int32)
    y = _dct2_stripe(x, pv_f, bh_f, w)

    q = jnp.round(y / delta)
    parity = jnp.mod(q, 2.0)
    bit_f = plane.astype(jnp.float32)
    adjust = jnp.where(parity != bit_f, jnp.where(bit_f == 1.0, 1.0, -1.0), 0.0)
    y_new = jnp.where(plane < 2, (q + adjust) * delta, y)

    x_out = _dct2_stripe(y_new, pv_i, bh_i, w)
    x_final = jnp.where(plane == 3, x, x_out)  # untouched blocks: passthrough
    stego_ref[0] = _f32_to_u8(jnp.clip(x_final, 0.0, 255.0))


def _extract_kernel(frames_ref, pv_f_ref, bh_f_ref, delta_ref, bits_ref, *,
                    stripe, w):
    pv_f = pv_f_ref[:]
    bh_f = bh_f_ref[:]
    delta = delta_ref[0]
    x = _u8_to_f32(frames_ref[0])           # block is (1, stripe, w)
    y = _dct2_stripe(x, pv_f, bh_f, w)
    bits_ref[0] = _f32_to_u8(jnp.mod(jnp.round(y / delta), 2.0))


def _interpret_default() -> bool:
    """Pallas has no compiled CPU backend — interpret there (tests/CI)."""
    return jax.default_backend() == "cpu"


def embed_frames_pallas(frames, payload_bits, total_bits, delta, num_ac,
                        bit_offset=0):
    """Fused embed; API-compatible with ops.qim.embed_frames."""
    return _embed_frames_pallas(
        frames, payload_bits, total_bits, delta, num_ac,
        jnp.asarray(bit_offset, dtype=jnp.int32), _interpret_default(),
    )


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def _embed_frames_pallas(
    frames: jnp.ndarray,
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    bit_offset: jnp.ndarray,
    interpret: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, h, w = frames.shape
    if w % _LANE:
        raise ValueError(f"pallas path needs W % {_LANE} == 0, got {w}")
    stripe = pick_stripe(h)
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac
    total_bits = total_bits.astype(jnp.int32)
    bit_offset = jnp.asarray(bit_offset, dtype=jnp.int32)

    plane = build_state_plane(payload_bits, total_bits, h, w, num_ac, bit_offset)
    delta_arr = jnp.asarray(delta, dtype=jnp.float32).reshape(1)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    stego = pl.pallas_call(
        functools.partial(_embed_kernel, stripe=stripe, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        interpret=interpret,
    )(
        frames, plane,
        jnp.asarray(_vert_matrix(stripe, inverse=False)),
        jnp.asarray(_vert_matrix(stripe, inverse=True)),
        jnp.asarray(_horiz_matrix(inverse=False)),
        jnp.asarray(_horiz_matrix(inverse=True)),
        delta_arr,
    )

    bits_per_frame = jnp.clip(
        total_bits - bit_offset - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame


def extract_frames_pallas(frames, delta, num_ac):
    """Fused extract; API-compatible with ops.qim.extract_frames."""
    return _extract_frames_pallas(frames, delta, num_ac, _interpret_default())


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def _extract_frames_pallas(
    frames: jnp.ndarray, delta: jnp.ndarray, num_ac: int, interpret: bool
) -> jnp.ndarray:
    b, h, w = frames.shape
    if w % _LANE:
        raise ValueError(f"pallas path needs W % {_LANE} == 0, got {w}")
    stripe = pick_stripe(h)
    delta_arr = jnp.asarray(delta, dtype=jnp.float32).reshape(1)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    bits_img = pl.pallas_call(
        functools.partial(_extract_kernel, stripe=stripe, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        interpret=interpret,
    )(
        frames,
        jnp.asarray(_vert_matrix(stripe, inverse=False)),
        jnp.asarray(_horiz_matrix(inverse=False)),
        delta_arr,
    )

    blocks = blockify(bits_img)  # cheap uint8 layout pass
    return blocks[..., 1 : 1 + num_ac].reshape(b, -1)


def _roundtrip_kernel(frames_ref, plane_ref, pv_f_ref, pv_i_ref, bh_f_ref,
                      bh_i_ref, delta_ref, stego_ref, bits_ref, *, stripe, w):
    """Embed AND re-extract in one VMEM pass: the quantized stego never
    leaves the chip between the two transforms."""
    pv_f = pv_f_ref[:]
    pv_i = pv_i_ref[:]
    bh_f = bh_f_ref[:]
    bh_i = bh_i_ref[:]
    delta = delta_ref[0]

    x = _u8_to_f32(frames_ref[0])
    plane = plane_ref[0].astype(jnp.int32)
    y = _dct2_stripe(x, pv_f, bh_f, w)

    q = jnp.round(y / delta)
    parity = jnp.mod(q, 2.0)
    bit_f = plane.astype(jnp.float32)
    adjust = jnp.where(parity != bit_f, jnp.where(bit_f == 1.0, 1.0, -1.0), 0.0)
    y_new = jnp.where(plane < 2, (q + adjust) * delta, y)

    x_out = _dct2_stripe(y_new, pv_i, bh_i, w)
    x_final = jnp.where(plane == 3, x, x_out)
    stego_u8 = _f32_to_u8(jnp.clip(x_final, 0.0, 255.0))
    stego_ref[0] = stego_u8

    # re-extract from the ACTUAL quantized pixels, still in VMEM
    x2 = _u8_to_f32(stego_u8)
    y2 = _dct2_stripe(x2, pv_f, bh_f, w)
    bits_ref[0] = _f32_to_u8(jnp.mod(jnp.round(y2 / delta), 2.0))


def embed_and_extract_frames_pallas(frames, payload_bits, total_bits, delta,
                                    num_ac):
    """Round trip as two pipelined kernels — measured FASTER than the fused
    single-pass variant below (3,596 vs 3,157 fps at 1080p): the smaller
    per-program working set lets Mosaic overlap grid steps better than one
    triple-transform mega-kernel."""
    stego, bpf = embed_frames_pallas(frames, payload_bits, total_bits, delta,
                                     num_ac)
    extracted = extract_frames_pallas(stego, delta, num_ac)
    return stego, bpf, extracted


def embed_and_extract_frames_pallas_fused(frames, payload_bits, total_bits,
                                          delta, num_ac):
    """Single-pass fused round trip (one HBM read, two writes). Kept for
    study; see embed_and_extract_frames_pallas for why it is not default."""
    return _embed_and_extract_frames_pallas(
        frames, payload_bits, total_bits.astype(jnp.int32),
        jnp.asarray(delta, jnp.float32), num_ac, _interpret_default(),
    )


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def _embed_and_extract_frames_pallas(
    frames, payload_bits, total_bits, delta, num_ac, interpret
):
    b, h, w = frames.shape
    if w % _LANE:
        raise ValueError(f"pallas path needs W % {_LANE} == 0, got {w}")
    stripe = pick_stripe(h)
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac

    plane = build_state_plane(payload_bits, total_bits, h, w, num_ac, 0)
    delta_arr = delta.reshape(1)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    stego, bits_img = pl.pallas_call(
        functools.partial(_roundtrip_kernel, stripe=stripe, w=w),
        grid=grid,
        in_specs=[tile_spec, tile_spec, mat_spec, mat_spec, mat_spec, mat_spec,
                  pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=(tile_spec, tile_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
            jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        ),
        interpret=interpret,
    )(
        frames, plane,
        jnp.asarray(_vert_matrix(stripe, inverse=False)),
        jnp.asarray(_vert_matrix(stripe, inverse=True)),
        jnp.asarray(_horiz_matrix(inverse=False)),
        jnp.asarray(_horiz_matrix(inverse=True)),
        delta_arr,
    )
    blocks = blockify(bits_img)
    extracted = blocks[..., 1 : 1 + num_ac].reshape(b, -1)
    bits_per_frame = jnp.clip(
        total_bits - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame, extracted
