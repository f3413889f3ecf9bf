"""Fused Pallas TPU kernel: QIM/DCT embed & extract in one HBM pass.

The XLA baseline (ops/qim.py) materializes float32 intermediates (blockified
frames, coefficients, modified coefficients) in HBM between fusion islands.
This kernel keeps the whole per-stripe dataflow in VMEM:

    uint8 stripe -> f32 -> reduced vertical DCT -> compact horizontal DCT ->
    QIM sparse delta -> sparse inverse -> add to pixels -> clip -> cast

The transforms run on the MXU:

- vertical (reduced): a (rows_pad, S) block-structured operator producing
  only the slot-bearing coefficient rows of each 8-row block in ONE matmul
  (S = stripe rows, 120 by default -> contraction depth 120, near the 128
  MXU sweet spot);
- horizontal: B = I_16 (x) M^T, a (128, 128) block-diagonal operator applied
  via the lane-fold reshape (S', W) -> (S'*W/128, 128) in one fat matmul.

Round-2 dataflow — compact rows + sparse-delta embed. Round 1 fed the QIM
stage a full (B, H, W) uint8 "state plane" built by XLA (40% of embed cost)
and transformed every coefficient of every block both ways; extract wrote a
full (H, W) bits image of which 84% was discarded. Round 2 computes only
what QIM actually touches. Round 4 made the arithmetic f32-FAITHFUL on
real TPUs: Mosaic's default f32 matmul is a single bf16 MXU pass whose
~2e-3 relative error drifts coefficients off the reference's f32 scipy
lattice (caught by the on-chip exactness harness, ops/exactness.py); the
DCT path now recovers f32 accuracy via hi/lo-stacked bf16 matmuls at one
MXU issue per logical op (_vert2_matrix/_horiz2_matrix docstrings), at a
measured 11% of roundtrip throughput (docs/TUNING.md round 4 — including
the roofline decomposition of what remains):

- payload slots (flat c = 1..num_ac) live in the first rn = num_ac//8 + 1
  pixel rows of each block. The REDUCED vertical operator (rows_pad, S)
  produces only those coefficient rows; the horizontal pass then runs on the
  (rows_pad, W) compact array — ~4x fewer MXU cycles at the default
  num_ac=10 than transforming the full stripe;
- embed forms the sparse coefficient delta dy = snapped - y on valid slots
  (0 elsewhere) and inverse-transforms THAT: stego = u8(clip(x + idct(dy))).
  dy is exactly zero for never-entered blocks, so their passthrough is exact
  (reference config_and_setup.py:130-132); entered blocks differ from the
  full-roundtrip form only by the f32 dct/idct roundtrip epsilon, far inside
  the delta/2 QIM margin (pixel-level, parity-invariant);
- validity masks are computed IN-KERNEL on the compact (rows_pad, W) grid
  from broadcasted_iota and two SMEM scalars (total_bits, bit_offset) —
  nothing materialized in HBM;
- payload bits arrive in the same compact layout ((B, (H/S)*rows_pad, W)
  uint8, payload_to_rows()) so QIM needs no scatter at all; extract writes
  its bits in that layout and rows_to_bits() unpacks to the (B, C) wire
  order (XLA-side strided slices + concat; see docs/TUNING.md for the
  rejected faster-looking alternatives).

Semantics match ops/qim.py (same quantizer, directional parity, lattice
snap, per-slot validity, whole-block passthrough); extracted bits are
bit-identical, stego pixels within the established cross-variant tolerance
(tests/test_pallas_kernel.py). Reference semantics:
config_and_setup.py:106-174 (see SURVEY.md §2.4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from stegotpu.config import BLOCK
from stegotpu.ops.dct import dct_matrix

_LANE = 128


def rows_per_block(num_ac: int) -> int:
    """In-block pixel rows that contain payload slots (flat c = 1..num_ac)."""
    return num_ac // BLOCK + 1


def _lane_pad(w: int) -> int:
    """Width padded up to the Mosaic lane multiple (128).

    Non-128-multiple widths (after the 8-px crop: 1366x768 -> 1360, 720x480,
    ...) run the Pallas path via zero-padded lane columns: the pad forms
    whole extra 8x8 blocks at each block row's end, which the validity mask
    excludes (block numbering stays keyed to the REAL width, matching the
    reference's any-size row-major order, embed_process.py:94), so their
    coefficient delta is exactly 0 and the pad is sliced off the outputs."""
    return -(-w // _LANE) * _LANE


def _pad_lanes(arr: jnp.ndarray, wp: int) -> jnp.ndarray:
    """Zero-pad the last (lane) dim to wp; no-op when already that wide."""
    w = arr.shape[-1]
    if w == wp:
        return arr
    return jnp.pad(arr, [(0, 0)] * (arr.ndim - 1) + [(0, wp - w)])


def _rows_pad(stripe: int, rn: int) -> int:
    """Compact-rows chunk height per stripe, padded so the Pallas block's
    sublane dim is a multiple of 8 (Mosaic tiling requirement)."""
    n = (stripe // BLOCK) * rn
    return -(-n // BLOCK) * BLOCK


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


# grid dims: frames are independent ('parallel'); stripes within a frame are
# too, but Mosaic only allows the last dim to be 'arbitrary' — measured +3.4%
# on the fused roundtrip vs unspecified (benchmarks/fused_variants.py)
_DIMSEM = pltpu.CompilerParams(dimension_semantics=("parallel", "arbitrary"))


def _u8_to_f32(x):
    """Mosaic lacks a direct u8->f32 cast (fails to lower, re-checked round
    4); hop through int32."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _u8_to_bf16(x):
    """u8 pixel plane -> bf16 via i32 (one pass fewer than the f32 hop;
    integers <= 255 are bf16-exact, so this is lossless for pixels)."""
    return x.astype(jnp.int32).astype(jnp.bfloat16)


def _f32_to_u8(x):
    """Truncating cast (via int32, same toward-zero semantics as numpy)."""
    return x.astype(jnp.int32).astype(jnp.uint8)


# --- compact payload layout (host/XLA side) ----------------------------------

def _slot_span(g: int, num_ac: int) -> tuple[int, int]:
    """In-block column range [s0, s1) of payload slots on slot row g
    (flat coefficient c = 8g + s must lie in [1, num_ac])."""
    return max(0, 1 - BLOCK * g), max(0, min(BLOCK, num_ac - BLOCK * g + 1))

@functools.partial(jax.jit, static_argnames=("h", "w", "num_ac", "stripe"))
def payload_to_rows(payload_bits: jnp.ndarray, h: int, w: int, num_ac: int,
                    stripe: int) -> jnp.ndarray:
    """(B, C) payload bits -> (B, (H/stripe)*rows_pad, W) compact slot rows.

    Within each stripe chunk, row i*rn + g, column x holds the bit for block
    (i, x//8), flat coefficient c = 8g + x%8 (zero where c is outside
    [1, num_ac] — those positions are never read: the kernel's iota mask
    gates them); chunk rows beyond (stripe/8)*rn are sublane padding.
    """
    b = payload_bits.shape[0]
    bh, bw = h // BLOCK, w // BLOCK
    rn = rows_per_block(num_ac)
    bh_s = stripe // BLOCK
    rp = _rows_pad(stripe, rn)
    p = payload_bits.reshape(b, bh, bw, num_ac)
    # per slot row g, lane-pad that row's slot span to the full 8 in-block
    # columns, then stack the rows — strided slices + one concat, no 5-D
    # transpose (XLA uint8 transposes measured ~2x slower than this form)
    planes = []
    for g in range(rn):
        s0, s1 = _slot_span(g, num_ac)
        pg = p[..., BLOCK * g + s0 - 1 : BLOCK * g + s1 - 1]
        planes.append(jnp.pad(pg, ((0, 0),) * 3 + ((s0, BLOCK - s1),)))
    p = jnp.stack(planes, axis=2)             # (b, bh, rn, bw, 8)
    p = p.reshape(b, h // stripe, bh_s * rn, w)
    p = jnp.pad(p, ((0, 0), (0, 0), (0, rp - bh_s * rn), (0, 0)))
    return p.reshape(b, (h // stripe) * rp, w)


@functools.partial(jax.jit, static_argnames=("h", "w", "num_ac", "stripe"))
def rows_to_bits(rows: jnp.ndarray, h: int, w: int, num_ac: int, stripe: int
                 ) -> jnp.ndarray:
    """Inverse of payload_to_rows for extracted bits: -> (B, C)."""
    b = rows.shape[0]
    bh, bw = h // BLOCK, w // BLOCK
    rn = rows_per_block(num_ac)
    bh_s = stripe // BLOCK
    rp = _rows_pad(stripe, rn)
    r = rows.reshape(b, h // stripe, rp, w)[:, :, : bh_s * rn]
    r = r.reshape(b, bh, rn, bw, BLOCK)
    # inverse of payload_to_rows: per-row strided slices + one concat
    parts = [
        r[:, :, g, :, s0:s1]
        for g, (s0, s1) in ((g, _slot_span(g, num_ac)) for g in range(rn))
    ]
    return jnp.concatenate(parts, axis=-1).reshape(b, -1)


@functools.partial(jax.jit, static_argnames=("h", "w", "num_ac", "stripe"))
def packed_rows_to_bits(packed: jnp.ndarray, h: int, w: int, num_ac: int,
                        stripe: int) -> jnp.ndarray:
    """Wire-order unpack of the kernel's bit-PACKED compact rows -> (B, C).

    The packed layout is one byte per (slot row g, block): lane x of the
    unpacked row folds into byte x//8 with weight 2^(x%8), and since
    BLOCK == 8 a byte's index IS the block column. The byte->bit expansion
    (shift+mask) fuses with the slot-span slice into a single XLA pass over
    8x less input than rows_to_bits reads.
    """
    b = packed.shape[0]
    bh, bw = h // BLOCK, w // BLOCK
    rn = rows_per_block(num_ac)
    bh_s = stripe // BLOCK
    rp = _rows_pad(stripe, rn)
    r = packed.reshape(b, h // stripe, rp, bw)[:, :, : bh_s * rn]
    r = r.reshape(b, bh, rn, bw, 1)
    shifts = jnp.arange(BLOCK, dtype=jnp.uint8)
    bits = (r >> shifts) & jnp.uint8(1)       # (b, bh, rn, bw, 8)
    parts = [
        bits[:, :, g, :, s0:s1]
        for g, (s0, s1) in ((g, _slot_span(g, num_ac)) for g in range(rn))
    ]
    return jnp.concatenate(parts, axis=-1).reshape(b, -1)


def packed_rows_to_bits_host(packed: np.ndarray, h: int, w: int, num_ac: int,
                             stripe: int) -> np.ndarray:
    """Host-side (numpy) wire-order unpack of the kernel's bit-PACKED
    compact rows -> (B, C) — packed_rows_to_bits without the device.

    The streaming extract's typical-payload fast path (pipeline.py): the
    device ships only the packed rows (~5x smaller than the wire-order u8
    bit plane at num_ac=10) and never runs the full-capacity unpack pass;
    this numpy mirror rebuilds wire order on the host, where a frame's
    65 KB of shifts is microseconds. Bit-identical to packed_rows_to_bits
    (tests/test_pallas_kernel.py). Reference loop being matched: it too
    reads only as many frames as the payload needs
    (extract_process.py:55-86,173-182).

    Accepts a STRIPE-GROUP PREFIX: an array whose row dim covers only the
    first g <= H/stripe groups (g inferred from the shape) unpacks to the
    first g * (stripe/8)*(W/8)*num_ac wire bits of each frame — the unit
    the pipeline's sliced device readback ships (pipeline._PackedBitBuf).
    """
    b = packed.shape[0]
    bw = w // BLOCK
    rn = rows_per_block(num_ac)
    bh_s = stripe // BLOCK
    rp = _rows_pad(stripe, rn)
    if packed.shape[1] % rp:
        raise ValueError(
            f"packed rows dim {packed.shape[1]} is not a multiple of the "
            f"per-stripe-group chunk {rp}"
        )
    g = packed.shape[1] // rp  # stripe groups present (full frame or prefix)
    r = packed.reshape(b, g, rp, bw)[:, :, : bh_s * rn]
    r = np.ascontiguousarray(r).reshape(b, g * bh_s, rn, bw, 1)
    shifts = np.arange(BLOCK, dtype=np.uint8)
    bits = (r >> shifts) & np.uint8(1)        # (b, bh, rn, bw, 8)
    parts = [
        bits[:, :, g, :, s0:s1]
        for g, (s0, s1) in ((g, _slot_span(g, num_ac)) for g in range(rn))
    ]
    return np.concatenate(parts, axis=-1).reshape(b, -1)


# --- kernels ------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _vert_reduced_matrix(stripe: int, rn: int, dtype=np.float32) -> np.ndarray:
    """(rows_pad, S) forward vertical operator producing ONLY coefficient
    rows g < rn of each block — all QIM ever touches. Zero rows pad the
    sublane dim to a multiple of 8 (they extract as harmless 0-bits).

    Why MXU and not VPU: an 8-FMA-per-row VPU formulation over the
    sublane-regrouped (S/8, 8, W) view measured 2x SLOWER (each strided
    sublane slice is a relayout copy of the stripe); the block-diagonal
    matmul keeps the data stationary.
    """
    m = dct_matrix(BLOCK, np.float64)
    bh_s = stripe // BLOCK
    out = np.zeros((_rows_pad(stripe, rn), stripe), np.float64)
    for i in range(bh_s):
        out[i * rn : i * rn + rn, i * BLOCK : (i + 1) * BLOCK] = m[:rn]
    return out.astype(dtype)


@functools.lru_cache(maxsize=None)
def _vert_expand_matrix(stripe: int, rn: int, dtype=np.float32) -> np.ndarray:
    """(S, rows_pad) inverse vertical operator for SPARSE coefficient deltas
    restricted to the slot rows: the transpose of the reduced forward
    operator (the full vertical is orthonormal). Its zero columns annihilate
    anything in the sublane-padding rows."""
    return _vert_reduced_matrix(stripe, rn, dtype).T.copy()


def _bf16_hi_lo(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Constant matrix as (hi, lo) bf16 pair with hi + lo ~= m to ~2^-16."""
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m.astype(np.float32) - hi.astype(np.float32)).astype(
        ml_dtypes.bfloat16)
    return hi, lo


@functools.lru_cache(maxsize=None)
def _vert2_matrix(stripe: int, rn: int, fast: bool = False) -> np.ndarray:
    """(2*rows_pad, S) bf16 [hi; lo] stack of the forward vertical operator.

    Why: Mosaic's DEFAULT f32 matmul is a single bf16 MXU pass (~2e-3
    relative coefficient error — measured on-chip, TPUCHECK r4), which
    drifts coefficients off the reference's f32 scipy DCT far enough to
    flip extracted bits at the delta/2 margin edge; its only alternative,
    HIGHEST (6 passes), measured a 34% fps hit, and the kernel's cost is
    dominated by per-matmul ISSUE overhead, not MXU cycles (the no-compute
    dmaspec A/B in benchmarks/roofline_r4.py). So the precision-recovery
    passes are PACKED INTO SINGLE ISSUES by stacking the hi/lo matrix
    split along the M dim: u8 pixel planes are EXACT in bf16 (integers
    <= 255 fit its 8-bit mantissa), so [M_hi; M_lo] @ x computes both
    correction terms in one matmul and the halves sum to the f32-faithful
    result (~1e-6 relative)."""
    hi, lo = _bf16_hi_lo(_vert_reduced_matrix(stripe, rn))
    if fast:  # TPU-local fast mode: hi term only (config.qim_precision)
        return hi
    return np.concatenate([hi, lo], axis=0)


@functools.lru_cache(maxsize=None)
def _horiz2_matrix(fast: bool = False) -> np.ndarray:
    """(128, 256) bf16 [hi | lo] of the forward horizontal operator.

    The horizontal input y is continuous (not bf16-exact), so f32-faithful
    needs three products (y_hi@B_hi + y_lo@B_hi + y_hi@B_lo). Stacking
    [y_hi; y_lo] along M and [B_hi | B_lo] along N computes all four
    quarters in ONE issue (the y_lo@B_lo quarter is discarded — its MACs
    are noise-level cheap next to a second issue's overhead)."""
    hi, lo = _bf16_hi_lo(_horiz_matrix(inverse=False))
    if fast:
        return hi
    return np.concatenate([hi, lo], axis=1)


@functools.lru_cache(maxsize=None)
def _horiz_inv2_matrix(fast: bool = False) -> np.ndarray:
    """Inverse horizontal operator: (128, 256) bf16 [Bi_hi | Bi_lo] stack
    (wire) or (128, 128) hi-only (fast).

    Rounds 1-4 ran the inverse SINGLE-pass bf16 for both modes, arguing
    |dy| <= delta bounds the injected error ~40x inside the delta/2
    margin. Round 5's product soak falsified that at the robust envelope's
    delta=8 edge on smooth covers: the ~0.1-level pixel noise crosses the
    uint8 truncation cliff on ~0.4% of pixels, and those +-1 pixel shifts
    cost the pallas embed ~3-13e-5 BER where the f32 XLA embed loses zero
    (reproduced in interpret mode — kernel MATH, not a Mosaic artifact).
    The wire inverse is therefore f32-faithful now, same single-issue
    packing as the forward (_horiz2_matrix): [dy_hi; dy_lo] @
    [Bi_hi | Bi_lo] computes all four quarters in one issue; lo@lo is
    discarded. 'fast' keeps the single pass (its envelope starts at
    delta >= 12, where the single-pass budget genuinely holds)."""
    hi, lo = _bf16_hi_lo(_horiz_matrix(inverse=True))
    if fast:
        return hi
    return np.concatenate([hi, lo], axis=1)


@functools.lru_cache(maxsize=None)
def _vert_expand2_matrix(stripe: int, rn: int, fast: bool = False
                         ) -> np.ndarray:
    """Inverse vertical operator: (S, 3*rows_pad) bf16 [P_hi | P_hi | P_lo]
    (wire) or (S, rows_pad) hi-only (fast).

    The vertical input dh is continuous (not bf16-exact), so f32-faithful
    needs P_hi@dh_hi + P_hi@dh_lo + P_lo@dh_hi; stacking the matrix along
    K against [dh_hi; dh_lo; dh_hi] computes all three in ONE issue
    (k = 3*rows_pad = 48 at the default num_ac — still tiny). Rationale
    for why wire mode needs this at all: _horiz_inv2_matrix."""
    hi, lo = _bf16_hi_lo(_vert_expand_matrix(stripe, rn))
    if fast:
        return hi
    return np.concatenate([hi, hi, lo], axis=1)


def _dct2_compact(x, vert2, bh2, w):
    """(S, W) f32 PIXEL stripe -> compact slot-row coefficients (rows_pad,
    W). Mode is carried by the MATRICES (no kernel plumbing): the wire
    forms ((2rp, S) vertical, (128, 256) horizontal) run the f32-faithful
    stacked-hi/lo math in two MXU issues (see _vert2_matrix); the fast
    forms (hi-only) run single-pass bf16 — config.qim_precision='fast',
    the TPU-local mode."""
    fast = bh2.shape[-1] == _LANE
    x_bf = x.astype(jnp.bfloat16)            # pixels are bf16-exact
    if fast:
        rp = vert2.shape[0]
        y = jnp.dot(vert2, x_bf, preferred_element_type=jnp.float32)
        m = rp * (w // _LANE)
        return jnp.dot(y.astype(jnp.bfloat16).reshape(m, _LANE), bh2,
                       preferred_element_type=jnp.float32).reshape(rp, w)
    rp = vert2.shape[0] // 2
    y2 = jnp.dot(vert2, x_bf, preferred_element_type=jnp.float32)
    y = y2[:rp] + y2[rp:]                    # hi + lo halves

    y_hi = y.astype(jnp.bfloat16)
    y_lo = (y - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    m = rp * (w // _LANE)
    yr = jnp.concatenate(
        [y_hi.reshape(m, _LANE), y_lo.reshape(m, _LANE)], axis=0)
    r = jnp.dot(yr, bh2, preferred_element_type=jnp.float32)  # (2m, 256)
    out = r[:m, :_LANE] + r[m:, :_LANE] + r[:m, _LANE:]
    return out.reshape(rp, w)


def _idct2_sparse(dy, pve_bf, bhi_bf, w):
    """Pixel-space image of a SPARSE coefficient delta living on the compact
    slot rows: (rows_pad, W) -> (S, W). Mode is carried by the MATRICES
    (like _dct2_compact): wire shapes ((128, 256) horizontal,
    (S, 3*rows_pad) vertical) run the f32-faithful stacked hi/lo math in
    two MXU issues; fast shapes run single-pass bf16 (the r1-r4 wire
    behavior, now the opt-in mode's budget only — _horiz_inv2_matrix)."""
    rp = dy.shape[0]
    m = rp * (w // _LANE)
    fast = bhi_bf.shape[-1] == _LANE
    if fast:
        dh = jnp.dot(dy.astype(jnp.bfloat16).reshape(m, _LANE), bhi_bf,
                     preferred_element_type=jnp.float32).reshape(rp, w)
        return jnp.dot(pve_bf, dh.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    dy_hi = dy.astype(jnp.bfloat16)
    dy_lo = (dy - dy_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    yr = jnp.concatenate(
        [dy_hi.reshape(m, _LANE), dy_lo.reshape(m, _LANE)], axis=0)
    r = jnp.dot(yr, bhi_bf, preferred_element_type=jnp.float32)  # (2m, 256)
    dh = (r[:m, :_LANE] + r[m:, :_LANE] + r[:m, _LANE:]).reshape(rp, w)
    dh_hi = dh.astype(jnp.bfloat16)
    dh_lo = (dh - dh_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dstack = jnp.concatenate([dh_hi, dh_lo, dh_hi], axis=0)  # (3rp, W)
    return jnp.dot(pve_bf, dstack, preferred_element_type=jnp.float32)


def _qim_valid_compact(total, offset, *, stripe, w, w_real, num_ac, cap, rn,
                       rp, frame=None):
    """Per-slot validity on the compact (rows_pad, W) grid, from iota + SMEM
    scalars — no materialized plane.

    Compact row k = i*rn + g, column x is block (i, x//8), flat in-block
    coefficient c = 8g + x%8; it carries a payload bit iff its block is a
    REAL block (x//8 < w_real/8 — lane-padded widths append zero blocks that
    carry nothing), c is a slot (1 <= c <= num_ac), and its global bit index
    is below total. Block numbering uses the real width so bit order matches
    the unpadded frame exactly. Sublane padding rows (k >= (S/8)*rn) may
    spuriously test valid — harmless: the expansion matrix's zero columns
    annihilate their delta, and extraction slices them away.

    frame: the batch frame index; defaults to grid dim 0 (the standard
    one-frame-per-step kernels). Multi-frame-per-step variants pass it
    explicitly (benchmarks/dualchain_r5.py).
    """
    bh_s = stripe // BLOCK
    bw = w_real // BLOCK
    f = pl.program_id(0) if frame is None else frame
    jg = pl.program_id(1)
    k = jax.lax.broadcasted_iota(jnp.int32, (rp, w), 0)
    x = jax.lax.broadcasted_iota(jnp.int32, (rp, w), 1)
    i = k // rn
    xb = x // BLOCK
    blk = (jg * bh_s + i) * bw + xb
    rem = total - offset - f * cap - blk * num_ac  # bits left at block start
    c = (k - i * rn) * BLOCK + x % BLOCK
    return (xb < bw) & (c >= 1) & (c <= num_ac) & (c - 1 < rem)


def _qim_sparse_delta(ys, bits, valid, delta):
    """Directional-parity QIM + lattice snap as a sparse coefficient delta:
    snapped - original on valid slots, exactly 0 elsewhere (SURVEY.md §2.4).
    delta <= 0 embeds nothing (reference config_and_setup.py:143-145) — the
    guard also keeps inf/NaN out of the pixel path."""
    safe = jnp.where(delta > 0, delta, 1.0)
    q = jnp.round(ys / safe)
    parity = jnp.mod(q, 2.0)
    adjust = jnp.where(parity != bits, jnp.where(bits == 1.0, 1.0, -1.0), 0.0)
    return jnp.where(valid & (delta > 0), (q + adjust) * safe - ys, 0.0)


def _embed_core(frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref,
                delta, lim_ref, *, stripe, w, w_real, num_ac, cap, rn, rp):
    """The shared embed preamble of every embed-bearing kernel body:
    u8 -> f32, forward DCT, validity mask, QIM sparse delta, sparse
    inverse, clip. Returns (x_f32, valid, bits_f32, stego_i32).

    ONE implementation on purpose: _embed_kernel, _roundtrip_kernel,
    _roundtrip_kernel_packed, and _embed_check_kernel used to carry four
    copies of these lines, and a precision/mask fix (the r5 inverse
    hardening was exactly such a change) had to land in all four in
    lockstep or the variants exactness.py asserts bit-identical would
    silently desynchronize."""
    x = _u8_to_f32(frames_ref[0])           # block is (1, stripe, w)
    ys = _dct2_compact(x, pvr_ref[:], bh_f_ref[:], w)

    bits = _u8_to_f32(rows_ref[0])          # compact layout, no scatter
    valid = _qim_valid_compact(
        lim_ref[0], lim_ref[1], stripe=stripe, w=w, w_real=w_real,
        num_ac=num_ac, cap=cap, rn=rn, rp=rp,
    )
    dy = _qim_sparse_delta(ys, bits, valid, delta)

    # dy == 0 for never-entered blocks -> exact passthrough of x
    xd = _idct2_sparse(dy, pve_ref[:], bh_i_ref[:], w)
    stego_i = jnp.clip(x + xd, 0.0, 255.0).astype(jnp.int32)  # truncating
    return x, valid, bits, stego_i


def _embed_kernel(frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref,
                  delta_ref, lim_ref, stego_ref, *,
                  stripe, w, w_real, num_ac, cap, rn, rp):
    _x, _v, _b, stego_i = _embed_core(
        frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref,
        delta_ref[0], lim_ref, stripe=stripe, w=w, w_real=w_real,
        num_ac=num_ac, cap=cap, rn=rn, rp=rp)
    stego_ref[0] = stego_i.astype(jnp.uint8)


def _extract_bits(y, delta):
    """_extract_bits_f32 with the u8 cast — ONE decode implementation
    (packed and unpacked extract must stay zero-tolerance identical)."""
    return _f32_to_u8(_extract_bits_f32(y, delta))


def _extract_kernel(frames_ref, pvr_ref, bh_f_ref, delta_ref, bits_ref, *, w):
    delta = delta_ref[0]
    x = _u8_to_bf16(frames_ref[0])          # block is (1, stripe, w)
    y = _dct2_compact(x, pvr_ref[:], bh_f_ref[:], w)
    bits_ref[0] = _extract_bits(y, delta)


@functools.lru_cache(maxsize=None)
def _pack_matrix(w: int, dtype=np.float32) -> np.ndarray:
    """(W, W/8) lane-folding pack operator: P[x, x//8] = 2^(x%8).

    A lane-dim-changing fold isn't expressible as a Mosaic reshape, but the
    MXU does cross-lane combination natively: bits_f32 @ P sums each 8-lane
    group into one exact small integer (<= 255, exactly representable in
    f32). This shrinks the extract output (and its HBM write) 8x; the
    wire-order unpack then reads 8x fewer bytes (packed_rows_to_bits).
    """
    out = np.zeros((w, w // BLOCK), np.float32)
    x = np.arange(w)
    out[x, x // BLOCK] = (1 << (x % BLOCK)).astype(np.float32)
    return out.astype(dtype)


def _extract_bits_f32(y, delta):
    """round(c/delta) mod 2 in f32 (packing consumes it directly; the u8
    form is _extract_bits); delta <= 0 reads all-zero bits, explicitly
    (reference config_and_setup.py:143-145 — a zero divide would be an
    implementation-defined NaN->uint8 cast)."""
    safe = jnp.where(delta > 0, delta, 1.0)
    return jnp.where(delta > 0, jnp.mod(jnp.round(y / safe), 2.0), 0.0)


def _extract_kernel_packed(frames_ref, pvr_ref, bh_f_ref, pk_ref, delta_ref,
                           bits_ref, *, w):
    delta = delta_ref[0]
    x = _u8_to_bf16(frames_ref[0])          # block is (1, stripe, w)
    y = _dct2_compact(x, pvr_ref[:], bh_f_ref[:], w)
    bf = _extract_bits_f32(y, delta)
    bits_ref[0] = _f32_to_u8(
        jnp.dot(bf, pk_ref[:], preferred_element_type=jnp.float32)
    )


def _interpret_default() -> bool:
    """Pallas has no compiled CPU backend — interpret there (tests/CI)."""
    return jax.default_backend() == "cpu"


def embed_frames_pallas(frames, payload_bits, total_bits, delta, num_ac,
                        bit_offset=0, precision="wire"):
    """Fused embed; API-compatible with ops.qim.embed_frames.
    precision: config.StegoConfig.qim_precision ('wire' default)."""
    return _embed_frames_pallas(
        frames, payload_bits, total_bits, delta, num_ac,
        jnp.asarray(bit_offset, dtype=jnp.int32), _interpret_default(),
        precision == "fast",
    )


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _embed_frames_pallas(
    frames: jnp.ndarray,
    payload_bits: jnp.ndarray,
    total_bits: jnp.ndarray,
    delta: jnp.ndarray,
    num_ac: int,
    bit_offset: jnp.ndarray,
    interpret: bool,
    fast: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    b, h, w = frames.shape
    wp = _lane_pad(w)
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac
    total_bits = total_bits.astype(jnp.int32)
    bit_offset = jnp.asarray(bit_offset, dtype=jnp.int32)

    rows = _pad_lanes(payload_to_rows(payload_bits, h, w, num_ac, stripe), wp)
    delta_arr = jnp.asarray(delta, dtype=jnp.float32).reshape(1)
    lim = jnp.stack([total_bits, bit_offset]).astype(jnp.int32)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    stego = pl.pallas_call(
        functools.partial(_embed_kernel, stripe=stripe, w=wp, w_real=w,
                          num_ac=num_ac, cap=cap, rn=rn, rp=rp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[
            pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rp, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec, mat_spec,
            smem_spec, smem_spec,
        ],
        out_specs=pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, wp), jnp.uint8),
        interpret=interpret,
    )(
        _pad_lanes(frames, wp), rows,
        jnp.asarray(_vert2_matrix(stripe, rn, fast)),
        jnp.asarray(_vert_expand2_matrix(stripe, rn, fast)),
        jnp.asarray(_horiz2_matrix(fast)),
        jnp.asarray(_horiz_inv2_matrix(fast)),
        delta_arr, lim,
    )
    if wp != w:
        stego = stego[:, :, :w]

    bits_per_frame = jnp.clip(
        total_bits - bit_offset - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame


def extract_frames_pallas(frames, delta, num_ac, precision="wire"):
    """Fused extract; API-compatible with ops.qim.extract_frames."""
    return _extract_frames_pallas(frames, delta, num_ac, _interpret_default(),
                                  precision == "fast")


def extract_frames_pallas_packed(frames, delta, num_ac, precision="wire"):
    """Extract to the bit-packed compact-rows layout, as a DEVICE array
    (B, (H/stripe)*rows_pad, W/8) — no wire-order unpack pass on device.
    Pair with packed_rows_to_bits_host for the streaming pipeline's
    typical-payload fast path, or packed_rows_to_bits to stay on device."""
    return _extract_frames_pallas_rows_packed(
        frames, delta, num_ac, _interpret_default(), precision == "fast"
    )


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _extract_frames_pallas(
    frames: jnp.ndarray, delta: jnp.ndarray, num_ac: int, interpret: bool,
    fast: bool = False,
) -> jnp.ndarray:
    # packed variant: the kernel's bit output (and its HBM write) is 8x
    # smaller; packed_rows_to_bits reads 8x less for the wire-order unpack.
    # A/B vs the unpacked form: docs/TUNING.md (round 3).
    b, h, w = frames.shape
    stripe = pick_stripe(h)
    packed = _extract_frames_pallas_rows_packed(frames, delta, num_ac,
                                                interpret, fast)
    return packed_rows_to_bits(packed, h, w, num_ac, stripe)


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _extract_frames_pallas_rows(
    frames: jnp.ndarray, delta: jnp.ndarray, num_ac: int, interpret: bool,
    fast: bool = False,
) -> jnp.ndarray:
    """Extract kernel only: bits in the compact slot-rows layout."""
    b, h, w = frames.shape
    wp = _lane_pad(w)
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    delta_arr = jnp.asarray(delta, dtype=jnp.float32).reshape(1)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    bits_rows = pl.pallas_call(
        functools.partial(_extract_kernel, w=wp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[
            pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rp, wp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, (h // stripe) * rp, wp), jnp.uint8),
        interpret=interpret,
    )(
        _pad_lanes(frames, wp),
        jnp.asarray(_vert2_matrix(stripe, rn, fast)),
        jnp.asarray(_horiz2_matrix(fast)),
        delta_arr,
    )
    if wp != w:
        bits_rows = bits_rows[:, :, :w]  # pad blocks carry no payload
    return bits_rows


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _extract_frames_pallas_rows_packed(
    frames: jnp.ndarray, delta: jnp.ndarray, num_ac: int, interpret: bool,
    fast: bool = False,
) -> jnp.ndarray:
    """Extract kernel only: bits PACKED 8/byte in the compact layout
    (B, (H/stripe)*rp, W/8)."""
    b, h, w = frames.shape
    wp = _lane_pad(w)
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    delta_arr = jnp.asarray(delta, dtype=jnp.float32).reshape(1)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    packed = pl.pallas_call(
        functools.partial(_extract_kernel_packed, w=wp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[
            pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec, mat_spec,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, rp, wp // BLOCK), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, (h // stripe) * rp, wp // BLOCK), jnp.uint8
        ),
        interpret=interpret,
    )(
        _pad_lanes(frames, wp),
        jnp.asarray(_vert2_matrix(stripe, rn, fast)),
        jnp.asarray(_horiz2_matrix(fast)),
        jnp.asarray(_pack_matrix(wp)),
        delta_arr,
    )
    if wp != w:
        packed = packed[:, :, : w // BLOCK]  # one byte per REAL block column
    return packed


def _roundtrip_kernel(frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref,
                      bh_i_ref, delta_ref, lim_ref, stego_ref, bits_ref, *,
                      stripe, w, w_real, num_ac, cap, rn, rp):
    """Embed AND re-extract in one VMEM pass: the quantized stego never
    leaves the chip between the two transforms."""
    delta = delta_ref[0]
    _x, valid, bits, stego_i = _embed_core(
        frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref, delta,
        lim_ref, stripe=stripe, w=w, w_real=w_real, num_ac=num_ac, cap=cap,
        rn=rn, rp=rp)
    stego_ref[0] = stego_i.astype(jnp.uint8)

    # re-extract from the ACTUAL quantized pixels, still in VMEM (the i32
    # plane feeds bf16 directly — same exact values a u8 round trip gives)
    y2 = _dct2_compact(stego_i.astype(jnp.bfloat16), pvr_ref[:],
                       bh_f_ref[:], w)
    bits_ref[0] = _extract_bits(y2, delta)


def _roundtrip_kernel_packed(frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref,
                             bh_i_ref, pk_ref, delta_ref, lim_ref, stego_ref,
                             bits_ref, *, stripe, w, w_real, num_ac, cap, rn,
                             rp):
    """_roundtrip_kernel with the re-extracted bits packed 8/byte before the
    HBM write (one extra small MXU matmul, 8x less bits traffic)."""
    delta = delta_ref[0]
    _x, valid, bits, stego_i = _embed_core(
        frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref, delta,
        lim_ref, stripe=stripe, w=w, w_real=w_real, num_ac=num_ac, cap=cap,
        rn=rn, rp=rp)
    stego_ref[0] = stego_i.astype(jnp.uint8)

    y2 = _dct2_compact(stego_i.astype(jnp.bfloat16), pvr_ref[:],
                       bh_f_ref[:], w)
    bf = _extract_bits_f32(y2, delta)
    bits_ref[0] = _f32_to_u8(
        jnp.dot(bf, pk_ref[:], preferred_element_type=jnp.float32)
    )


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _rows_roundtrip_pallas_packed(
    frames, rows, total_bits, delta, num_ac, interpret, fast=False
):
    """Rows-level fused round trip: prebuilt compact payload rows in,
    (stego, bit-PACKED compact rows) out — the exact device scope of the
    shipped extract path (the wire-order unpack happens host-side from the
    packed rows since round 5). Factored out of the bits-level entry so
    benchmark.py can chain the kernel alone, without re-measuring the
    full-capacity payload layout passes the product no longer runs."""
    b, h, w = frames.shape
    wp = _lane_pad(w)
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac

    rows = _pad_lanes(rows, wp)
    delta_arr = delta.reshape(1)
    lim = jnp.stack([total_bits, jnp.int32(0)]).astype(jnp.int32)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((1, rp, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    packed_spec = pl.BlockSpec((1, rp, wp // BLOCK), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    stego, bits_packed = pl.pallas_call(
        functools.partial(_roundtrip_kernel_packed, stripe=stripe, w=wp,
                          w_real=w, num_ac=num_ac, cap=cap, rn=rn, rp=rp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[tile_spec, rows_spec, mat_spec, mat_spec, mat_spec,
                  mat_spec, mat_spec, smem_spec, smem_spec],
        out_specs=(tile_spec, packed_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp), jnp.uint8),
            jax.ShapeDtypeStruct((b, (h // stripe) * rp, wp // BLOCK),
                                 jnp.uint8),
        ),
        interpret=interpret,
    )(
        _pad_lanes(frames, wp), rows,
        jnp.asarray(_vert2_matrix(stripe, rn, fast)),
        jnp.asarray(_vert_expand2_matrix(stripe, rn, fast)),
        jnp.asarray(_horiz2_matrix(fast)),
        jnp.asarray(_horiz_inv2_matrix(fast)),
        jnp.asarray(_pack_matrix(wp)),
        delta_arr, lim,
    )
    if wp != w:
        stego = stego[:, :, :w]
        bits_packed = bits_packed[:, :, : w // BLOCK]
    return stego, bits_packed


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _embed_and_extract_frames_pallas_packed(
    frames, payload_bits, total_bits, delta, num_ac, interpret, fast=False
):
    b, h, w = frames.shape
    stripe = pick_stripe(h)
    cap = (h // BLOCK) * (w // BLOCK) * num_ac

    rows = payload_to_rows(payload_bits, h, w, num_ac, stripe)
    stego, bits_packed = _rows_roundtrip_pallas_packed(
        frames, rows, total_bits, delta, num_ac, interpret, fast
    )
    extracted = packed_rows_to_bits(bits_packed, h, w, num_ac, stripe)
    bits_per_frame = jnp.clip(
        total_bits - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame, extracted


def _embed_check_kernel(frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref,
                        bh_i_ref, delta_ref, lim_ref, stego_ref, err_ref, *,
                        stripe, w, w_real, num_ac, cap, rn, rp):
    """Embed + in-VMEM re-extract + error COUNT (no bits output at all).

    The verified-embed fast path needs only the stego and "did any payload
    bit come back wrong?" — comparing re-extracted vs expected bits against
    the valid mask here costs nothing extra (all three are already in VMEM)
    and saves the packed-bits HBM write and the XLA-side compare pass.
    err_ref is the full (B, 1) int32 SMEM buffer (Mosaic requires unblocked
    SMEM outputs); each step accumulates into its frame's slot over the
    stripe grid dim (the 'arbitrary' axis, where cross-step accumulation is
    permitted).
    """
    delta = delta_ref[0]
    _x, valid, bits, stego_i = _embed_core(
        frames_ref, rows_ref, pvr_ref, pve_ref, bh_f_ref, bh_i_ref, delta,
        lim_ref, stripe=stripe, w=w, w_real=w_real, num_ac=num_ac, cap=cap,
        rn=rn, rp=rp)
    stego_ref[0] = stego_i.astype(jnp.uint8)

    y2 = _dct2_compact(stego_i.astype(jnp.bfloat16), pvr_ref[:],
                       bh_f_ref[:], w)
    bf2 = _extract_bits_f32(y2, delta)
    errs = jnp.sum(jnp.where(valid & (bf2 != bits), 1, 0), dtype=jnp.int32)

    f = pl.program_id(0)

    @pl.when(pl.program_id(1) == 0)
    def _init():
        err_ref[f, 0] = 0

    err_ref[f, 0] += errs


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _embed_and_check_frames_pallas(
    frames, payload_bits, total_bits, delta, num_ac, interpret, fast=False
):
    """(stego, bits_per_frame, errors_per_frame) — the verified fast path."""
    b, h, w = frames.shape
    wp = _lane_pad(w)
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac

    rows = _pad_lanes(payload_to_rows(payload_bits, h, w, num_ac, stripe), wp)
    delta_arr = jnp.asarray(delta, jnp.float32).reshape(1)
    lim = jnp.stack([total_bits.astype(jnp.int32), jnp.int32(0)])

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((1, rp, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    err_spec = pl.BlockSpec(memory_space=pltpu.SMEM)  # full (B, 1) buffer
    stego, errors = pl.pallas_call(
        functools.partial(_embed_check_kernel, stripe=stripe, w=wp, w_real=w,
                          num_ac=num_ac, cap=cap, rn=rn, rp=rp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[tile_spec, rows_spec, mat_spec, mat_spec, mat_spec,
                  mat_spec, smem_spec, smem_spec],
        out_specs=(tile_spec, err_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp), jnp.uint8),
            jax.ShapeDtypeStruct((b, 1), jnp.int32),
        ),
        interpret=interpret,
    )(
        _pad_lanes(frames, wp), rows,
        jnp.asarray(_vert2_matrix(stripe, rn, fast)),
        jnp.asarray(_vert_expand2_matrix(stripe, rn, fast)),
        jnp.asarray(_horiz2_matrix(fast)),
        jnp.asarray(_horiz_inv2_matrix(fast)),
        delta_arr, lim,
    )
    if wp != w:
        stego = stego[:, :, :w]
    bits_per_frame = jnp.clip(
        total_bits.astype(jnp.int32) - jnp.arange(b, dtype=jnp.int32) * cap,
        0, cap,
    )
    return stego, bits_per_frame, errors[:, 0]


def embed_and_extract_frames_pallas_packed(frames, payload_bits, total_bits,
                                           delta, num_ac, precision="wire"):
    """Single-pass fused round trip with bit-packed extract output."""
    return _embed_and_extract_frames_pallas_packed(
        frames, payload_bits, jnp.asarray(total_bits, jnp.int32),
        jnp.asarray(delta, jnp.float32), num_ac, _interpret_default(),
        precision == "fast",
    )


def embed_and_extract_frames_pallas_rows_packed(frames, rows, total_bits,
                                                delta, num_ac,
                                                precision="wire"):
    """Rows-level fused round trip: compact payload rows (payload_to_rows)
    in, (stego, bit-PACKED compact rows) out. This is the device scope of
    the shipped extract path — wire-order unpacking moved host-side in
    round 5 (packed_rows_to_bits_host) — so benchmark.py's kernel-only
    chain uses it to measure exactly what production runs per batch."""
    return _rows_roundtrip_pallas_packed(
        frames, rows, jnp.asarray(total_bits, jnp.int32),
        jnp.asarray(delta, jnp.float32), num_ac, _interpret_default(),
        precision == "fast",
    )


def embed_and_extract_frames_pallas(frames, payload_bits, total_bits, delta,
                                    num_ac, precision="wire"):
    """Round trip via the single-pass fused kernel (one HBM frame read, the
    stego never re-read for re-extraction). In round 1 the two-kernel
    pipeline measured faster; with the round-2 compact/sparse-delta
    structure the fused kernel wins (7.9 vs 11.3 ms/128-frame batch at
    1080p) — re-check per round in benchmarks/ab_kernels.py. Round 3: the
    bit-PACKED extract output wins the A/B and is the default. Round 4:
    f32-faithful arithmetic (8.87 ms/128 by wall clock). Round 5: the
    device timeline shows the true kernel time is 4.66 ms/128 — the wall
    figures carried a fixed per-call relay overhead — and the kernel is
    compute-bound at 5.4x its DMA floor, declared the single-chip optimum
    of this structure (docs/TUNING.md round 5)."""
    return embed_and_extract_frames_pallas_packed(
        frames, payload_bits, total_bits, delta, num_ac, precision
    )


def embed_and_extract_frames_pallas_twokernel(frames, payload_bits,
                                              total_bits, delta, num_ac):
    """Round trip as two pipelined kernels (kept for A/B benchmarking)."""
    stego, bpf = embed_frames_pallas(frames, payload_bits, total_bits, delta,
                                     num_ac)
    extracted = extract_frames_pallas(stego, delta, num_ac)
    return stego, bpf, extracted


def embed_and_extract_frames_pallas_fused(frames, payload_bits, total_bits,
                                          delta, num_ac):
    """Single-pass fused round trip (one HBM read, two writes)."""
    return _embed_and_extract_frames_pallas(
        frames, payload_bits, jnp.asarray(total_bits, jnp.int32),
        jnp.asarray(delta, jnp.float32), num_ac, _interpret_default(),
    )


@functools.partial(jax.jit,
                   static_argnames=("num_ac", "interpret", "fast"))
def _embed_and_extract_frames_pallas(
    frames, payload_bits, total_bits, delta, num_ac, interpret, fast=False
):
    b, h, w = frames.shape
    wp = _lane_pad(w)
    stripe = pick_stripe(h)
    rn = rows_per_block(num_ac)
    rp = _rows_pad(stripe, rn)
    nb = (h // BLOCK) * (w // BLOCK)
    cap = nb * num_ac

    rows = _pad_lanes(payload_to_rows(payload_bits, h, w, num_ac, stripe), wp)
    delta_arr = delta.reshape(1)
    lim = jnp.stack([total_bits, jnp.int32(0)]).astype(jnp.int32)

    grid = (b, h // stripe)
    mat_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile_spec = pl.BlockSpec((1, stripe, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    rows_spec = pl.BlockSpec((1, rp, wp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)
    stego, bits_rows = pl.pallas_call(
        functools.partial(_roundtrip_kernel, stripe=stripe, w=wp, w_real=w,
                          num_ac=num_ac, cap=cap, rn=rn, rp=rp),
        grid=grid,
        compiler_params=_DIMSEM,
        in_specs=[tile_spec, rows_spec, mat_spec, mat_spec, mat_spec,
                  mat_spec, smem_spec, smem_spec],
        out_specs=(tile_spec, rows_spec),
        out_shape=(
            jax.ShapeDtypeStruct((b, h, wp), jnp.uint8),
            jax.ShapeDtypeStruct((b, (h // stripe) * rp, wp), jnp.uint8),
        ),
        interpret=interpret,
    )(
        _pad_lanes(frames, wp), rows,
        jnp.asarray(_vert2_matrix(stripe, rn, fast)),
        jnp.asarray(_vert_expand2_matrix(stripe, rn, fast)),
        jnp.asarray(_horiz2_matrix(fast)),
        jnp.asarray(_horiz_inv2_matrix(fast)),
        delta_arr, lim,
    )
    if wp != w:
        stego = stego[:, :, :w]
        bits_rows = bits_rows[:, :, :w]
    extracted = rows_to_bits(bits_rows, h, w, num_ac, stripe)
    bits_per_frame = jnp.clip(
        total_bits - jnp.arange(b, dtype=jnp.int32) * cap, 0, cap
    )
    return stego, bits_per_frame, extracted
