"""Pallas v2: in-kernel blockify + dense Kronecker matmuls.

The v1 stripe kernel (ops/pallas_kernel.py) avoids layout shuffles by using
block-diagonal operators — paying ~35x more MXU flops than mathematically
necessary (a 128x128 block-diagonal operator is 94% zeros). This variant
blockifies INSIDE the kernel (VMEM-resident reshape/transpose, no HBM round
trip) and applies the dense 64x64 Kronecker DCT operator:

    (S, W) tile -> (S/8 * W/8, 64) blocks -> @ K64^T -> QIM -> @ K64
    -> un-blockify -> clip/cast

Flops per transform drop from ~1.0 GF to ~30 MF per 1080p frame; traffic is
the same single HBM pass. The QIM state plane is consumed directly in block
layout (B, nb, 64) — its natural shape from build_state_plane — so only the
pixel tiles get shuffled. Extraction writes bits in block layout too, which
removes the downstream XLA blockify entirely.

Correctness is asserted against ops/qim.py in tests/test_pallas_kron.py;
benchmarks pick the fastest variant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stegotpu.config import BLOCK, BLOCK_AREA
from stegotpu.ops.dct import kron_dct_matrix
from stegotpu.ops.pallas_kernel import (
    _f32_to_u8,
    _interpret_default,
    _u8_to_f32,
    pick_stripe,
)
from stegotpu.ops.experimental.qim_fast import build_plane_blocks


def _blockify_tile(x, stripe, w):
    """(S, W) -> (S/8 * W/8, 64), row-major block order, in VMEM."""
    br, bc = stripe // BLOCK, w // BLOCK
    xb = x.reshape(br, BLOCK, bc, BLOCK)
    xb = xb.transpose(0, 2, 1, 3)
    return xb.reshape(br * bc, BLOCK_AREA)


def _unblockify_tile(xb, stripe, w):
    br, bc = stripe // BLOCK, w // BLOCK
    x = xb.reshape(br, bc, BLOCK, BLOCK)
    x = x.transpose(0, 2, 1, 3)
    return x.reshape(stripe, w)


def _embed_kernel(frames_ref, plane_ref, k_ref, delta_ref, stego_ref, *,
                  stripe, w):
    k = k_ref[:]                              # (64, 64) Kronecker operator
    delta = delta_ref[0]
    x = _u8_to_f32(frames_ref[0])             # (stripe, w)
    plane = plane_ref[0].astype(jnp.int32)    # (nb_tile, 64) block layout

    xb = _blockify_tile(x, stripe, w)
    y = jnp.dot(xb, k.T, preferred_element_type=jnp.float32)

    q = jnp.round(y / delta)
    parity = jnp.mod(q, 2.0)
    bit_f = plane.astype(jnp.float32)
    adjust = jnp.where(parity != bit_f, jnp.where(bit_f == 1.0, 1.0, -1.0), 0.0)
    y_new = jnp.where(plane < 2, (q + adjust) * delta, y)

    xb_out = jnp.dot(y_new, k, preferred_element_type=jnp.float32)
    xb_final = jnp.where(plane == 3, xb, xb_out)  # plane==3 is block-constant
    out = _unblockify_tile(xb_final, stripe, w)
    stego_ref[0] = _f32_to_u8(jnp.clip(out, 0.0, 255.0))


def _extract_kernel(frames_ref, k_ref, delta_ref, bits_ref, *, stripe, w):
    k = k_ref[:]
    delta = delta_ref[0]
    x = _u8_to_f32(frames_ref[0])
    xb = _blockify_tile(x, stripe, w)
    y = jnp.dot(xb, k.T, preferred_element_type=jnp.float32)
    bits_ref[0] = _f32_to_u8(jnp.mod(jnp.round(y / delta), 2.0))


def embed_frames_kron(frames, payload_bits, total_bits, delta, num_ac,
                      bit_offset=0):
    return _embed_frames_kron(
        frames, payload_bits, total_bits.astype(jnp.int32),
        jnp.asarray(delta, jnp.float32), num_ac,
        jnp.asarray(bit_offset, jnp.int32), _interpret_default(),
    )


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def _embed_frames_kron(frames, payload_bits, total_bits, delta, num_ac,
                       bit_offset, interpret):
    b, h, w = frames.shape
    if w % 128:
        raise ValueError(f"kron pallas path needs W % 128 == 0, got {w}")
    stripe = pick_stripe(h)
    nb = (h // BLOCK) * (w // BLOCK)
    nb_tile = (stripe // BLOCK) * (w // BLOCK)
    cap = nb * num_ac

    plane = build_plane_blocks(payload_bits, total_bits, nb, num_ac, bit_offset)
    grid = (b, h // stripe)
    stego = pl.pallas_call(
        functools.partial(_embed_kernel, stripe=stripe, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nb_tile, BLOCK_AREA), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.uint8),
        interpret=interpret,
    )(
        frames, plane, jnp.asarray(kron_dct_matrix()),
        delta.reshape(1),
    )
    bits_per_frame = jnp.clip(
        total_bits - bit_offset - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame


def extract_frames_kron(frames, delta, num_ac):
    return _extract_frames_kron(
        frames, jnp.asarray(delta, jnp.float32), num_ac, _interpret_default()
    )


@functools.partial(jax.jit, static_argnames=("num_ac", "interpret"))
def _extract_frames_kron(frames, delta, num_ac, interpret):
    b, h, w = frames.shape
    if w % 128:
        raise ValueError(f"kron pallas path needs W % 128 == 0, got {w}")
    stripe = pick_stripe(h)
    nb_tile = (stripe // BLOCK) * (w // BLOCK)

    grid = (b, h // stripe)
    bits_blocks = pl.pallas_call(
        functools.partial(_extract_kernel, stripe=stripe, w=w),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, stripe, w), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nb_tile, BLOCK_AREA), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, (h // BLOCK) * (w // BLOCK), BLOCK_AREA), jnp.uint8
        ),
        interpret=interpret,
    )(frames, jnp.asarray(kron_dct_matrix()), delta.reshape(1))
    # bits already in block layout: slice the AC columns, no transpose needed
    return bits_blocks[..., 1 : 1 + num_ac].reshape(b, -1)


def embed_and_extract_frames_kron(frames, payload_bits, total_bits, delta,
                                  num_ac):
    stego, bpf = embed_frames_kron(frames, payload_bits, total_bits, delta,
                                   num_ac)
    extracted = extract_frames_kron(stego, delta, num_ac)
    return stego, bpf, extracted
