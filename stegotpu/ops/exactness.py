"""On-device kernel exactness checks: compiled Pallas vs the XLA baseline.

The library half of tools/tpucheck.py (which writes the committed
TPUCHECK_r05.json artifact); `selftest` runs the quick single-config check
whenever the backend is a real TPU, so every on-chip smoke run re-proves
compiled-kernel bit-exactness, not just a BER bound.

Policy (what "exact" means between two f32 kernels):

- A extracted bit is round(y/delta) mod 2. The two kernels compute y with
  differently-ordered f32 matmuls (XLA at Precision.HIGHEST; Mosaic
  stacked-bf16 passes), so y differs by float noise — a bit can only
  legitimately flip where y sits within that noise of a rounding boundary.
  The check computes each slot's absolute distance to its nearest boundary
  and tolerates mismatches ONLY inside a noise envelope
  `tol = TOL_ABS + TOL_REL * |y|` (defaults 1e-2 + 2e-5|y|: the absolute
  term is set by the f32 ACCUMULATION scale, not the output — partial sums
  reach ~10^3 regardless of |y|, giving ~5e-3 of reassociation noise
  (largest observed across the r4 sweep: 0.0047); 1e-2 is ~2x that and
  still 50x inside even delta=1's 0.5 margin — a real miscompile sits at
  delta/2 scale).
  Any mismatch OUTSIDE the envelope — on any content — is a miscompile:
  zero tolerance. The envelope is a TRACED input so recalibration never
  recompiles the sweep.
- packed vs unpacked Pallas extract must be bit-identical on ANY content
  (the pack matmul is exact small-integer arithmetic): zero tolerance.
- the fused roundtrip's extracted bits must equal extracting its own stego
  with the standalone kernel: zero tolerance.
- on ROBUST parameter pairs (8 <= delta <= 30, num_ac <= 30), BOTH
  kernels must recover the payload within the documented algorithmic
  clipping bound (BER <= 1e-5 on uniform-random covers; measured ~1e-6 at
  delta=20 — stegotpu/benchmark.py). Larger deltas lose bits to clipping
  in the ALGORITHM — the r5 on-chip calibration (1080p, 1.3M bits,
  IDENTICAL counts in the Pallas kernel and the f32 XLA oracle) measured
  the tail at 7.7e-7 (delta 24-30), 5.4e-6 (32), 6.9e-6 (36), 1.54e-5
  (40), 1.5e-5 (50), ~4e-4 (100): the 1e-5 crossing sits between 36 and
  40, and Poisson noise on ~10-count samples makes 32-36 a flaky assert,
  so the asserted ceiling is 30. Non-robust pairs (delta=1, delta > 30,
  num_ac=63) are recorded, not asserted, and differ slightly between
  kernels because clipped coefficients land near boundaries.
- the verified-embed fused check kernel (_embed_and_check_frames_pallas,
  the --verified fast path) must emit stego BIT-IDENTICAL to the plain
  embed kernel and an error count EQUAL to a standalone re-extract's count
  over valid slots: zero tolerance (round-5 hardening — this kernel had no
  committed on-chip evidence before).
- precision='fast' (single-pass bf16, the opt-in TPU-local mode) runs the
  same invariant set with the wider FAST_TOL envelope for the vs-XLA
  boundary comparison and the delta >= 12 robust floor (its config guard);
  all intra-pallas identities stay zero tolerance. Before round 5 this
  mode had zero committed on-chip evidence — the same class of blind spot
  that hid the r1-r3 bf16 bug.

Reference contract: config_and_setup.py:106-174.
"""

from __future__ import annotations

import functools
import json
import time

import numpy as np

TOL_ABS = 1e-2
TOL_REL = 2e-5
# 'fast' (single-pass bf16, config.qim_precision): the DCT matmul inputs
# round to bf16 (2^-9 relative), so the coefficient error is ABSOLUTE,
# set by the accumulation magnitude (partial sums ~1e3 regardless of the
# output's size) — observed on-chip up to 2.0 (TUNING.md round 4). The
# envelope is 2x that: mismatches vs the f32 XLA oracle are legitimate
# only within it of a rounding boundary; outside it, fast mode too is a
# miscompile. (Still below delta/2 = 6 at the mode's delta >= 12 floor;
# the robust-row BER bound is the stronger correctness gate here.)
FAST_TOL_ABS = 4.0
FAST_TOL_REL = 2e-3
ROBUST_BER_BOUND = 1e-5

EXACT_KEYS = [
    "bpf_mismatch",
    "extract_mismatch_cover_nonboundary",
    "extract_mismatch_stego_nonboundary",
    "extract_packed_vs_unpacked_cover",
    "extract_packed_vs_unpacked_stego",
    "fused_vs_standalone_mismatch",
    # verified-embed fused check kernel (the --verified fast path): its
    # stego must be bit-identical to the plain embed kernel's, and its
    # in-VMEM error count must equal a standalone re-extract's count —
    # both zero tolerance (same arithmetic, same matrices)
    "verified_stego_mismatch",
    "verified_errcount_delta",
]


def is_robust(delta: float, num_ac: int, precision: str = "wire") -> bool:
    """The BER<=1e-5 parameter envelope. delta > 30 is excluded: +-delta/2
    pixel-domain perturbations clip at 0/255 often enough on random covers
    to approach/exceed the bound (on-chip calibration in the module
    docstring: 1e-5 crossing between delta 36 and 40, identical in the f32
    XLA oracle and the Pallas kernel — the algorithm's loss, not the
    kernel's). 'fast' mode's envelope starts at its config-enforced
    delta >= 12 (config.py qim_precision guard)."""
    lo = 12 if precision == "fast" else 8
    return lo <= delta <= 30 and num_ac <= 30


def check_config(b: int, h: int, w: int, num_ac: int, deltas, rng,
                 verbose: bool = True, precision: str = "wire",
                 content: str = "noise") -> list[dict]:
    """One compile; a row of on-device scalar comparisons per delta.

    precision: config.qim_precision mode under test for the PALLAS kernels
    ('wire' default, 'fast' = single-pass bf16). The XLA baseline always
    runs at Precision.HIGHEST — it is the f32 wire-contract oracle either
    way; 'fast' rows use the wider FAST_TOL envelope for the pallas-vs-XLA
    boundary comparison, while all intra-pallas identities (packed vs
    unpacked, fused vs standalone, verified kernel) stay zero tolerance.

    content: 'noise' (uniform-random, the throughput-realistic default)
    or 'compressed' (a deterministic moving-pattern cover round-tripped
    through the mpeg4 codec, mid-luma so clipping cannot contribute).
    Lossy compression leaves DCT coefficients at structured positions
    whose quantized-stego boundary distances are tight — the content
    class where the r5 single-pass-bf16 INVERSE bug flipped ~1e-4 of
    bits at delta=8 while uniform-random covers sailed through
    (validated: the simulated old kernel fails a compressed delta=8 row
    by >10x the robust BER bound; the fixed kernel passes with 0).
    """
    import jax
    import jax.numpy as jnp

    from stegotpu.ops import qim
    from stegotpu.ops.pallas_kernel import (
        _embed_and_check_frames_pallas,
        _extract_frames_pallas_rows,
        embed_and_extract_frames_pallas_packed,
        embed_frames_pallas,
        extract_frames_pallas,
        rows_to_bits,
        pick_stripe,
    )

    interpret = jax.default_backend() == "cpu"
    fast = precision == "fast"
    cap = (h // 8) * (w // 8) * num_ac

    @functools.partial(jax.jit, static_argnames=())
    def compare(frames, payload, total, delta, tol_abs, tol_rel):
        # --- embed: both kernels ---
        stego_x, bpf_x = qim.embed_frames(frames, payload, total, delta,
                                          num_ac)
        stego_p, bpf_p = embed_frames_pallas(frames, payload, total, delta,
                                             num_ac, precision=precision)
        bpf_mismatch = jnp.sum((bpf_x != bpf_p).astype(jnp.int32))
        diff = jnp.abs(stego_x.astype(jnp.int32) - stego_p.astype(jnp.int32))
        stego_maxdiff = jnp.max(diff)
        stego_gt1 = jnp.sum((diff > 1).astype(jnp.int32))

        def xdiff(fr):
            """(mismatches, nonboundary mismatches, max boundary distance
            among mismatches, packed-vs-unpacked mismatches, ex_p)."""
            ex_x = qim.extract_frames(fr, delta, num_ac)
            ex_p = extract_frames_pallas(fr, delta, num_ac,
                                         precision=precision)
            ex_u = rows_to_bits(
                _extract_frames_pallas_rows(fr, delta, num_ac, interpret,
                                            fast),
                h, w, num_ac, pick_stripe(h))
            from stegotpu.ops.dct import blockify, kron_dct_matrix

            xb = blockify(fr.astype(jnp.float32))
            y = jnp.einsum("bnk,ck->bnc", xb, jnp.asarray(kron_dct_matrix(8)),
                           precision=jax.lax.Precision.HIGHEST)
            ys = y[..., 1 : num_ac + 1].reshape(fr.shape[0], -1)
            frac = ys / delta - jnp.floor(ys / delta)
            dist = jnp.abs(frac - 0.5) * delta   # abs distance to boundary
            # float-noise envelope, CAPPED below the decision margin: the
            # relative term otherwise exceeds delta/2 for |ys| >= ~(delta/2
            # - abs)/rel (fast mode at delta=12: |ys| >= 1000), making the
            # zero-tolerance gate vacuous on large coefficients
            tol = jnp.minimum(tol_abs + tol_rel * jnp.abs(ys), 0.45 * delta)
            mm = ex_x != ex_p
            return (jnp.sum(mm.astype(jnp.int32)),
                    jnp.sum((mm & (dist >= tol)).astype(jnp.int32)),
                    jnp.max(jnp.where(mm, dist, 0.0)),
                    jnp.sum((ex_u != ex_p).astype(jnp.int32)), ex_p)

        mm_c, mm_c_nb, mm_c_dist, pu_c, _ = xdiff(frames)
        mm_s, mm_s_nb, mm_s_dist, pu_s, ex_stego = xdiff(stego_p)

        # --- fused roundtrip: its extracted bits == standalone extract ---
        st_f, _, ex_f = embed_and_extract_frames_pallas_packed(
            frames, payload, total, delta, num_ac, precision)
        fused_vs_standalone = jnp.sum(
            (ex_f != extract_frames_pallas(st_f, delta, num_ac,
                                           precision=precision)
             ).astype(jnp.int32))

        # --- roundtrip payload recovery, both kernels, valid bits only ---
        idx = jax.lax.broadcasted_iota(jnp.int32, payload.shape, 0) * cap + \
            jax.lax.broadcasted_iota(jnp.int32, payload.shape, 1)
        valid = idx < total
        err_p = jnp.sum((valid & (ex_stego != payload)).astype(jnp.int32))
        err_x = jnp.sum(
            (valid & (qim.extract_frames(stego_x, delta, num_ac) != payload)
             ).astype(jnp.int32))

        # --- verified-embed fused check kernel (the --verified fast path):
        # stego bit-identical to the plain embed kernel; its in-VMEM error
        # count equal to a standalone re-extract's count over valid slots ---
        st_v, _bpf_v, errs_v = _embed_and_check_frames_pallas(
            frames, payload, total, delta, num_ac, interpret, fast)
        v_stego_mm = jnp.sum((st_v != stego_p).astype(jnp.int32))
        ex_v = extract_frames_pallas(st_v, delta, num_ac, precision=precision)
        v_err_standalone = jnp.sum(
            (valid & (ex_v != payload)).astype(jnp.int32))
        v_err_delta = jnp.abs(jnp.sum(errs_v) - v_err_standalone)
        return (bpf_mismatch, stego_maxdiff, stego_gt1,
                mm_c, mm_c_nb, mm_c_dist, pu_c,
                mm_s, mm_s_nb, mm_s_dist, pu_s,
                fused_vs_standalone, err_p, err_x,
                v_stego_mm, v_err_delta)

    if content == "compressed":
        import os as _os
        import tempfile

        from stegotpu import fixtures
        from stegotpu.video import VideoReader

        with tempfile.TemporaryDirectory() as td:
            p = _os.path.join(td, "c.mp4")
            fixtures.make_cover_video(p, w, h, frames=b, kind="moving",
                                      seed=int(rng.integers(1 << 30)))
            with VideoReader(p) as reader:
                frames_np = np.concatenate(
                    list(reader.batches(b, mode="gray")))[:b]
    else:
        frames_np = rng.integers(0, 256, (b, h, w), dtype=np.uint8)
    frames = jax.device_put(frames_np)
    payload = jax.device_put(
        rng.integers(0, 2, (b, cap), dtype=np.uint8))
    tol_abs, tol_rel = ((FAST_TOL_ABS, FAST_TOL_REL) if fast
                        else (TOL_ABS, TOL_REL))
    rows = []
    for delta in deltas:
        # payload ends mid-block in the last frame (the parse-boundary case)
        total = jnp.int32(b * cap - 13)
        t0 = time.perf_counter()
        out = [float(v) for v in compare(
            frames, payload, total, jnp.float32(delta),
            jnp.float32(tol_abs), jnp.float32(tol_rel))]
        dt = time.perf_counter() - t0
        (bpf_mm, maxdiff, gt1, mc, mcnb, mcd, puc, ms, msnb, msd, pus,
         fvs, err_p, err_x, v_smm, v_ed) = out
        rows.append({
            "h": h, "w": w, "batch": b, "num_ac": num_ac, "delta": delta,
            "content": content,
            "precision": precision,
            "total_bits": int(b * cap - 13),
            "robust": is_robust(delta, num_ac, precision),
            "bpf_mismatch": int(bpf_mm),
            "stego_max_abs_diff": int(maxdiff),
            "stego_gt1_frac": round(gt1 / (b * h * w), 6),
            # boundary flips recorded; NONboundary = zero tolerance
            "extract_mismatch_cover": int(mc),
            "extract_mismatch_cover_nonboundary": int(mcnb),
            "max_mismatch_dist_cover": round(mcd, 6),
            "extract_mismatch_stego": int(ms),
            "extract_mismatch_stego_nonboundary": int(msnb),
            "max_mismatch_dist_stego": round(msd, 6),
            "extract_packed_vs_unpacked_cover": int(puc),   # ZERO tolerance
            "extract_packed_vs_unpacked_stego": int(pus),   # ZERO tolerance
            "fused_vs_standalone_mismatch": int(fvs),       # ZERO tolerance
            "verified_stego_mismatch": int(v_smm),          # ZERO tolerance
            "verified_errcount_delta": int(v_ed),           # ZERO tolerance
            "roundtrip_errors_pallas": int(err_p),
            "roundtrip_errors_xla": int(err_x),
            "wall_s": round(dt, 2),
        })
        if verbose:
            print(json.dumps(rows[-1]), flush=True)
    return rows


def row_ok(row: dict) -> bool:
    """The full invariant set for one row (see module docstring)."""
    if any(row[k] != 0 for k in EXACT_KEYS):
        return False
    if row["robust"]:
        bound = ROBUST_BER_BOUND * row["total_bits"]
        return (row["roundtrip_errors_pallas"] <= bound
                and row["roundtrip_errors_xla"] <= bound)
    return True


def quick_exactness_check(rng=None, verbose: bool = False,
                          precision: str = "wire") -> dict:
    """One selftest-sized config; returns the result row plus ok flag."""
    if rng is None:
        rng = np.random.default_rng(42)
    rows = check_config(4, 240, 384, 10, [20.0], rng, verbose=verbose,
                        precision=precision)
    row = rows[0]
    row["ok"] = row_ok(row)
    return row
