"""Compiled-TPU kernel exactness artifact (r3 VERDICT item 2).

CI validates the Pallas kernels in interpret mode on CPU; the only on-chip
evidence used to be bench.py's BER <= 1e-5 bound, loose enough to mask a
rare-path Mosaic miscompile. This tool runs the COMPILED Pallas kernels
against the XLA baseline on the real chip across the parameter sweep and
demands:

the invariants defined in stegotpu/ops/exactness.py (its module docstring
is the policy): mismatches only inside the float-noise boundary envelope
(zero tolerance outside it, on any content), packed==unpacked and
fused==standalone bit-identity everywhere, and zero roundtrip errors for
BOTH kernels on every robust parameter pair. A by-product of building this
artifact: the XLA kernel's DCT matmuls ran at the TPU's default bf16
matmul precision until this round — at delta=1 that flipped 44% of
extracted bits vs f32; ops/qim.py now pins Precision.HIGHEST (the wire
contract is the reference's f32 scipy DCT).

All comparisons run ON DEVICE inside one jit per (shape, num_ac); only
scalar counts cross the relay (bulk device->host transfers stall — see
stegotpu/benchmark.py docstring). delta and total_bits are traced values,
so the delta sweep and mid-block payload ends reuse each compile.

Writes TPUCHECK_r05.json at the repo root (one row per config + a summary).
Wire contract being pinned: reference config_and_setup.py:106-174.

Usage: python tools/tpucheck.py [--quick] [--out TPUCHECK_r05.json]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from stegotpu.ops.exactness import check_config, row_ok  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="one small config (selftest-sized)")
    ap.add_argument("--out", default=str(REPO / "TPUCHECK_r05.json"))
    args = ap.parse_args()

    import os

    import jax

    from stegotpu.utils.jaxcache import enable_compilation_cache

    if os.environ.get("JAX_PLATFORMS"):
        # sitecustomize imports jax before this script runs, freezing the
        # session's platform pin — re-assert the env var's choice
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    enable_compilation_cache()
    backend = jax.default_backend()
    rng = np.random.default_rng(42)

    # config tuples: (batch, h, w, num_ac, deltas, precision[, content])
    if args.quick:
        configs = [(4, 240, 384, 10, [20.0], "wire"),
                   (4, 240, 384, 10, [20.0], "fast")]
    else:
        # smallest-first: on a slow tunnel day each compile is minutes, so
        # cheap configs should reach the checkpoint before a timeout.
        # Lane-padded width (480x720 -> wp 768) across the num_ac/delta
        # grid, not just one config (r4 VERDICT weak item).
        configs = []
        for num_ac in (1, 10, 63):
            configs.append((4, 480, 720, num_ac, [1.0, 20.0, 100.0], "wire"))
        configs.append((4, 480, 720, 10, [12.0, 20.0], "fast"))
        for (b, h, w) in [(4, 1080, 1920), (2, 2160, 3840)]:
            for num_ac in (1, 10, 63):
                deltas = [1.0, 20.0, 100.0]
                if num_ac == 10 and h == 1080:
                    # robust-envelope edges (8 and 30) plus 40/50, which
                    # the r5 calibration measured at/past the 1e-5
                    # algorithmic clipping bound in both kernels (recorded,
                    # not asserted — exactness.py is_robust); deltas are
                    # traced so extra points reuse the compile
                    deltas = [1.0, 8.0, 20.0, 30.0, 40.0, 50.0, 100.0]
                configs.append((b, h, w, num_ac, deltas, "wire"))
        # 'fast' mode's documented envelope is delta >= 12 (config guard);
        # sweep its floor, the default, and the robust ceiling on-chip,
        # plus out-of-envelope deltas recorded (not asserted) for calibration
        configs.append((4, 1080, 1920, 10, [8.0, 12.0, 20.0, 30.0, 40.0,
                                            50.0], "fast"))
        configs.append((2, 2160, 3840, 10, [12.0, 20.0], "fast"))
        # COMPRESSED covers at the small-delta robust edge: lossy-codec
        # coefficient structure gives tight boundary distances — the
        # content class where the r5 single-pass-bf16 INVERSE bug flipped
        # ~1e-4 of bits while uniform-random covers sailed through
        # (exactness.check_config docstring); the robust BER gate catches
        # that regression class directly
        configs.append((4, 1080, 1920, 10, [8.0, 12.0, 20.0], "wire",
                        "compressed"))
        configs.append((4, 1080, 1920, 10, [12.0, 20.0], "fast",
                        "compressed"))

    # resumable across tunnel stalls: completed configs persist in the
    # artifact and are skipped on re-run (the jit cache makes their
    # recompute cheap anyway, but the relay can stall mid-run — memory of
    # many lost hours says checkpoint everything)
    out_path = Path(args.out)
    rows = []
    if out_path.exists():
        try:
            rows = json.loads(out_path.read_text()).get("rows", [])
            rows = [r for r in rows if r.get("backend") == backend]
        except (ValueError, KeyError):
            rows = []
    done = {(r["h"], r["w"], r["num_ac"], r["delta"],
             r.get("precision", "wire"), r.get("content", "noise"))
            for r in rows}

    def flush(rows):
        out_path.write_text(json.dumps(
            {"summary": {"backend": backend, "partial": True}, "rows": rows},
            indent=1) + "\n")

    for cfg in configs:
        (b, h, w, num_ac, deltas, precision), content = cfg[:6], (
            cfg[6] if len(cfg) > 6 else "noise")
        todo = [d for d in deltas
                if (h, w, num_ac, d, precision, content) not in done]
        if not todo:
            continue
        print(f"# config b={b} {w}x{h} num_ac={num_ac} precision={precision}"
              f" content={content} (backend={backend})",
              file=sys.stderr, flush=True)
        new = check_config(b, h, w, num_ac, todo, rng, precision=precision,
                           content=content)
        for r in new:
            r["backend"] = backend
        rows.extend(new)
        flush(rows)

    bad = [r for r in rows if not row_ok(r)]
    summary = {
        "backend": backend, "configs": len(rows),
        "violations": len(bad),
        "robust_rows": sum(1 for r in rows if r["robust"]),
        "ok": not bad,
    }
    out = {"summary": summary, "rows": rows}
    Path(args.out).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(summary), flush=True)
    if not summary["ok"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
