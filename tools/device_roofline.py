"""DEVICE-TIME roofline of the fused roundtrip (round 5).

Round 4's roofline (benchmarks/roofline_r4.py) timed chained calls by WALL
clock through the axon relay. The r5 chained profiler trace
(tools/profile_roundtrip.py --chain) showed that methodology carries a
fixed ~20-25 ms/call dispatch+readback overhead, which at chain=10/batch=128
inflates every per-iteration number by ~2.5 ms — uniformly, so the r4
knob-for-knob A/B *comparisons* stand, but the absolute floor/ceiling
story does not. This tool re-measures the copy / dmaspec / embed / fused
variants from the DEVICE's own profiler timeline: it traces a
chain-of-iters jit per variant, parses the Chrome-trace JSON, and reports
the while-loop body period, the pallas kernel duration, and the XLA
inter-op overhead per iteration.

Usage: python tools/device_roofline.py [--batch 128] [--chain 10]
       [--variants copy,dmaspec,embed,fused]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "benchmarks"))

import numpy as np  # noqa: E402


def parse_device_timeline(trace_dir: Path) -> dict:
    """Summarize the device (TPU pid) timeline of the newest trace run."""
    paths = sorted(glob.glob(str(trace_dir / "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        return {"error": "no trace produced"}
    d = json.load(gzip.open(paths[-1]))
    evs = [e for e in d.get("traceEvents", []) if e.get("ph") == "X"]
    device_pids = {
        e["pid"]
        for e in d.get("traceEvents", [])
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "TPU" in str(e.get("args", {}).get("name", ""))
    }
    dev = sorted((e for e in evs if e.get("pid") in device_pids),
                 key=lambda e: e["ts"])
    if not dev:
        return {"error": "no device events (host-only trace)"}
    loops = [e for e in dev if e["name"].startswith("while")]
    # the per-iteration kernel = the repeated op group with the largest
    # median duration (covers pallas wrappers and the roofline's inline
    # copy/dmaspec kernels, whatever the compiler names them)
    import collections

    groups = collections.defaultdict(list)
    for e in dev:
        if e["dur"] > 0 and not e["name"].startswith(("while", "jit_")):
            groups[e["name"]].append(e)
    repeated = {n: es for n, es in groups.items() if len(es) >= 2}
    kerns = []
    if repeated:
        kname = max(repeated,
                    key=lambda n: float(np.median([e["dur"]
                                                   for e in repeated[n]])))
        kerns = repeated[kname]
    out: dict = {"n_device_events": len(dev)}
    if kerns:
        out["kernel_name"] = kerns[0]["name"][:60]
    if loops:
        out["while_ms"] = round(max(lp["dur"] for lp in loops) / 1e3, 3)
    if kerns:
        durs = [k["dur"] / 1e3 for k in kerns]
        out["kernel_ms_each"] = round(float(np.median(durs)), 3)
        out["kernel_count"] = len(durs)
        starts = sorted(k["ts"] for k in kerns)
        if len(starts) > 1:
            gaps = np.diff(starts) / 1e3
            out["iter_period_ms"] = round(float(np.median(gaps)), 3)
    # top non-kernel device ops per iteration (the XLA glue)
    glue = collections.Counter()
    for e in dev:
        if e in loops or e in kerns or e["dur"] == 0 \
                or e["name"].startswith("jit_"):
            continue
        glue[e["name"]] += e["dur"]
    out["glue_top"] = [
        {"name": n, "total_ms": round(v / 1e3, 3)}
        for n, v in glue.most_common(6)
    ]
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chain", type=int, default=10)
    ap.add_argument("--variants", default="copy,dmaspec,embed,fused",
                    help="comma list; 'name:stripe' overrides the stripe "
                         "(e.g. fused:216)")
    ap.add_argument("--keep-traces", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from roofline_r4 import H, N_AC, W, build_variant  # noqa: E402
    from stegotpu.ops.pallas_kernel import payload_to_rows  # noqa: E402
    from stegotpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache()
    b = args.batch
    rng = np.random.default_rng(0)
    cap = (H // 8) * (W // 8) * N_AC
    frames = jax.device_put(rng.integers(0, 256, (b, H, W), dtype=np.uint8))
    payload = rng.integers(0, 2, (b, cap), dtype=np.uint8)
    delta_arr = jnp.float32(20.0).reshape(1)
    lim = jnp.asarray([b * cap, 0], jnp.int32)

    results = []
    for spec in args.variants.split(","):
        name, _, sstr = spec.partition(":")
        stripe = int(sstr) if sstr else 120
        rows = jax.device_put(np.asarray(
            payload_to_rows(jnp.asarray(payload), H, W, N_AC, stripe)))
        run, bytes_per = build_variant(
            name, stripe, ("parallel", "arbitrary"), False)

        @jax.jit
        def chained(f, r, run=run):
            # rows is an ARG, not a closure constant: baked-in it bloats the
            # HLO past the relay's remote-compile size limit at batch 512
            def body(_, fr):
                out = run(fr, r, delta_arr, lim)
                while isinstance(out, tuple):
                    out = out[0]
                return out
            out = jax.lax.fori_loop(0, args.chain, body, f)
            return jnp.sum(out, dtype=jnp.int32)

        _ = int(chained(frames, rows))  # compile + warm
        tdir = REPO / "benchmarks" / "traces" / (
            "devroof_" + spec.replace(":", "_"))
        if tdir.exists():
            shutil.rmtree(tdir)
        t0 = time.perf_counter()
        with jax.profiler.trace(str(tdir)):
            _ = int(chained(frames, rows))
        wall = time.perf_counter() - t0
        summ = parse_device_timeline(tdir)
        summ.update({
            "variant": spec,
            "stripe": stripe,
            "batch": b,
            "chain": args.chain,
            "wall_ms_per_iter": round(1e3 * wall / args.chain, 3),
            "bytes_per_frame": bytes_per,
        })
        if "iter_period_ms" in summ:
            summ["device_gbps"] = round(
                b * bytes_per / (summ["iter_period_ms"] / 1e3) / 1e9, 1)
            summ["device_fps"] = round(
                b / (summ["iter_period_ms"] / 1e3), 1)
        results.append(summ)
        print(json.dumps(summ), flush=True)
        if not args.keep_traces:
            shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
