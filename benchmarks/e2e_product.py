"""The HONEST end-to-end product benchmark (VERDICT-r2 item 1).

Measures the real file->file path — native FFmpeg decode -> device QIM ->
native encode — against its own measured stage rates, so the claim "the
pipeline adds nothing on top of the codec" is proven, not extrapolated:

1. standalone stage rates on THIS host: decode (gray+bgr, the embed read),
   decode (gray only, the extract read), encode per codec (write_gray),
   device embed, device extract;
2. e2e embed per codec + e2e extract, stage-timed, in two configurations:
   - typical: 256x256 secret -> payload spans ~2 of 64 frames (the product
     case; codec-bound by construction);
   - saturated: 1536x1536 secret -> payload spans ~58 frames (every stage
     hot every batch; the worst case for pipeline overhead);
3. efficiency = e2e_fps / ideal_fps where ideal composes the measured
   standalone stage rates: serial sum on a 1-core host, max-stage when
   cores allow genuine overlap (the Prefetcher + encoder pool + one-deep
   device pipeline exist for that). Both ideals are printed; the one that
   matches the host is the claim.

Run with the CPU backend by default: on the dev host the TPU sits behind a
tunnel whose transfer latency is not a property of the product (a real TPU
host feeds HBM over PCIe). Pass --platform axon/tpu on real TPU metal.

Prints one JSON line per phase and writes E2E_BENCH.json at the repo root.

Reference point being beaten: the whole of the reference's
embed_process.py:88-152 is this same path at 0.445 fps (BASELINE.md).
"""

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _force_platform(name: str) -> None:
    os.environ["JAX_PLATFORMS"] = name
    import jax

    # sitecustomize may have imported jax with the env's platform already
    jax.config.update("jax_platforms", name)


def _rate(n_frames: int, seconds: float) -> float:
    return round(n_frames / seconds, 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default="cpu")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--codecs", default="FFV1,HFYU,RGBA")
    args = ap.parse_args()
    _force_platform(args.platform)

    import numpy as np

    import jax
    import jax.numpy as jnp

    from stegotpu import crypto
    from stegotpu.config import StegoConfig
    from stegotpu.image import save_image_gray
    from stegotpu.native.videoio import (
        NativeVideoReader,
        NativeVideoWriter,
        available,
    )
    from stegotpu.ops.dispatch import embed_fn, extract_fn
    from stegotpu.pipeline import embed_image_in_video, extract_image_from_video
    from stegotpu.utils.jaxcache import enable_compilation_cache
    from stegotpu.utils.profiling import StageTimer

    assert available(), "native I/O layer unavailable — e2e bench needs it"
    enable_compilation_cache()

    W, H, N, B = 1920, 1080, args.frames, args.batch
    codecs = args.codecs.split(",")
    d = Path(tempfile.mkdtemp(prefix="stego-e2e-"))
    rng = np.random.default_rng(0)
    results: list[dict] = []

    def emit(rec: dict) -> None:
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # ---- fixtures: lossless 1080p cover with cheap motion, two secrets ----
    base = rng.integers(48, 208, (H, W), dtype=np.uint8)
    frames = np.stack([np.roll(base, 7 * i, axis=1) for i in range(N)])
    cover = d / "cover.avi"
    w = NativeVideoWriter(cover, W, H, 30.0, codec="ffv1")
    for i in range(0, N, B):
        w.write_gray(frames[i : i + B])
    w.close()
    secrets = {}
    for name, px in (("typical", 256), ("saturated", 1536)):
        p = d / f"secret_{name}.png"
        save_image_gray(rng.integers(0, 256, (px, px), dtype=np.uint8), p)
        secrets[name] = p
    priv, pub_c = crypto.setup_receiver_keys(d / "k.pem", d / "p.pem")

    # ---- standalone stage rates ----
    # Every rate is best-of-2: the dev host is a shared single core and a
    # noisy neighbor can slow any single measurement ~15%; the faster pass
    # is the truer rate (interference only ever slows).
    stage = {}

    def best2(measure) -> float:
        return max(measure(), measure())

    def _decode_rate(read_name):
        def m():
            t0 = time.perf_counter()
            r = NativeVideoReader(cover)
            read = getattr(r, read_name)
            n = 0
            while (got := read(B, H, W)) is not None:
                n += (got[0] if isinstance(got, tuple) else got).shape[0]
            r.close()
            return _rate(n, time.perf_counter() - t0)
        return m

    stage["decode_both"] = best2(_decode_rate("read_batch_both"))
    stage["decode_gray"] = best2(_decode_rate("read_batch_gray"))
    stage["decode_bgr"] = best2(_decode_rate("read_batch"))

    cfg = StegoConfig()
    cap = cfg.frame_capacity_bits(H, W)
    payload = rng.integers(0, 2, (B, cap), dtype=np.uint8)
    delta = jnp.float32(cfg.delta)
    efn = embed_fn(cfg.kernel, H, W)
    xfn = extract_fn(cfg.kernel, H, W)
    jax.block_until_ready(
        efn(jnp.asarray(frames[:B]), jnp.asarray(payload), jnp.int32(B * cap), delta, cfg.num_ac_coeffs)[0]
    )
    t0 = time.perf_counter()
    n = 0
    for _ in range(4):
        jax.block_until_ready(
            efn(jnp.asarray(frames[:B]), jnp.asarray(payload), jnp.int32(B * cap), delta, cfg.num_ac_coeffs)[0]
        )
        n += B
    stage["device_embed"] = _rate(n, time.perf_counter() - t0)
    jax.block_until_ready(xfn(jnp.asarray(frames[:B]), delta, cfg.num_ac_coeffs))
    t0 = time.perf_counter()
    n = 0
    for _ in range(4):
        jax.block_until_ready(xfn(jnp.asarray(frames[:B]), delta, cfg.num_ac_coeffs))
        n += B
    stage["device_extract"] = _rate(n, time.perf_counter() - t0)

    # encode rates are CONTENT-dependent: QIM-saturated stego frames carry
    # more high-frequency entropy and cost FFV1 ~1.45x more than the clean
    # cover (measured). The saturated-scenario ideal must use the stego
    # rate or the pipeline gets blamed for the codec's honest work.
    stego_frames = np.concatenate([
        np.asarray(efn(jnp.asarray(frames[i : i + B]),
                       jnp.asarray(rng.integers(0, 2, (B, cap), dtype=np.uint8)),
                       jnp.int32(B * cap), delta, cfg.num_ac_coeffs)[0])
        for i in range(0, N, B)
    ])
    for codec in codecs:
        native = {"FFV1": "ffv1", "HFYU": "huffyuv", "RGBA": "rawvideo"}[codec]
        for content, data in (("clean", frames), ("stego", stego_frames)):
            def m(native=native, data=data, codec=codec, content=content):
                t0 = time.perf_counter()
                w = NativeVideoWriter(d / f"enc.{codec}.{content}.avi", W, H,
                                      30.0, codec=native)
                for i in range(0, N, B):
                    w.write_gray(data[i : i + B])
                w.close()
                return _rate(N, time.perf_counter() - t0)
            stage[f"encode_{codec}_{content}"] = best2(m)

    ncores = os.cpu_count() or 1
    emit({"phase": "stage_rates_fps", "host_cores": ncores,
          "platform": jax.default_backend(), **stage})

    def _glue_pct(wall: float, timer) -> float:
        return round(max(0.0, wall - sum(timer.totals.values())) / wall * 100, 1)

    def ideals(stages_fps: list[float]) -> tuple[float, float]:
        serial = 1.0 / sum(1.0 / s for s in stages_fps)
        overlap = min(stages_fps)
        return round(serial, 2), round(overlap, 2)

    # ---- e2e runs (2 passes each; report the warm steady state — compile
    # and OS caches amortize across runs via the persistent jit cache) ----
    for scenario, secret in secrets.items():
        for codec in codecs:
            cfg_c = StegoConfig(codec=codec)
            best_dt, timer = None, None
            for _pass in range(3):
                t = StageTimer()
                t0 = time.perf_counter()
                res = embed_image_in_video(cover, secret,
                                           d / f"st_{scenario}_{codec}",
                                           pub_c, cfg_c, batch_frames=B,
                                           timer=t)
                dt = time.perf_counter() - t0
                if best_dt is None or dt < best_dt:
                    best_dt, timer = dt, t
            assert res.success, f"embed failed ({scenario}/{codec})"
            fps = _rate(N, best_dt)
            # device runs only on payload-carrying frames; weight it, and
            # weight the encode rate by the stego/clean frame mix
            payload_frames = -(-res.total_payload_bits // cap)
            dev_weight = payload_frames / N
            enc = 1.0 / (
                dev_weight / stage[f"encode_{codec}_stego"]
                + (1 - dev_weight) / stage[f"encode_{codec}_clean"]
            )
            # the pipeline's GraySwitch decodes BGR-only once the payload
            # completes, so the decode ideal mixes both/bgr the same way
            dec = 1.0 / (
                dev_weight / stage["decode_both"]
                + (1 - dev_weight) / stage["decode_bgr"]
            )
            serial, overlap = ideals(
                [dec, stage["device_embed"] / max(dev_weight, 1e-9), enc]
            )
            ideal = serial if ncores == 1 else overlap
            bottleneck = max(timer.totals, key=timer.totals.get)
            emit({
                "phase": f"embed_e2e_{scenario}", "codec": codec, "fps": fps,
                "frames": N, "payload_bits": res.total_payload_bits,
                "ideal_serial_fps": serial, "ideal_overlap_fps": overlap,
                # CROSS-RUN estimator (noisy): the standalone stage rates and
                # the e2e run rarely see the same noisy-neighbor interference
                # on a shared core, so this can drift past 1.0 — the
                # within-run glue number below is the load-bearing claim
                "efficiency_vs_ideal_crossrun": round(fps / ideal, 3),
                # WITHIN-RUN estimator (noise-robust): wall time not
                # attributable to any stage = pure pipeline glue
                "glue_overhead_within_run_pct": _glue_pct(best_dt, timer),
                "bottleneck_stage": bottleneck,
                "stage_totals_s": {k: round(v, 3) for k, v in timer.totals.items()},
            })

        # extract reads only until the payload completes
        best_dt, timer = None, None
        for _pass in range(3):
            t = StageTimer()
            t0 = time.perf_counter()
            ext = extract_image_from_video(d / f"st_{scenario}_{codecs[0]}.avi",
                                           priv, StegoConfig(codec=codecs[0]),
                                           batch_frames=B, timer=t)
            dt = time.perf_counter() - t0
            if best_dt is None or dt < best_dt:
                best_dt, timer = dt, t
        assert ext.success and ext.hash_ok, f"extract failed: {ext.error}"
        frames_read = ext.frames_read  # frames actually decoded (batched)
        fps = _rate(frames_read, best_dt)
        serial, overlap = ideals([stage["decode_gray"], stage["device_extract"]])
        ideal = serial if ncores == 1 else overlap
        bottleneck = max(timer.totals, key=timer.totals.get)
        emit({
            "phase": f"extract_e2e_{scenario}", "codec": codecs[0], "fps": fps,
            "frames_read": frames_read,
            "ideal_serial_fps": serial, "ideal_overlap_fps": overlap,
            "efficiency_vs_ideal_crossrun": round(fps / ideal, 3),  # noisy
            "glue_overhead_within_run_pct": _glue_pct(best_dt, timer),
            "bottleneck_stage": bottleneck,
            "stage_totals_s": {k: round(v, 3) for k, v in timer.totals.items()},
        })

    out = REPO / "E2E_BENCH.json"
    out.write_text("\n".join(json.dumps(r) for r in results) + "\n")
    print(f"# wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
