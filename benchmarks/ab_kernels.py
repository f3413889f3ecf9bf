"""A/B microbenchmark: baseline (blockify) vs fast (image-layout) kernels.

Measurement note (axon remote TPU): block_until_ready does not reliably wait
through the relay — every timed iteration must end in a scalar device->host
readback, which forces the full dependency chain.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


import time

import numpy as np


def main(b=16, h=1080, w=1920, n_ac=10, iters=10):
    import jax
    import jax.numpy as jnp

    from stegotpu.utils.jaxcache import enable_compilation_cache
    enable_compilation_cache()
    from stegotpu.ops import qim
    from stegotpu.ops.experimental import qim_fast

    cap = (h // 8) * (w // 8) * n_ac
    rng = np.random.default_rng(0)
    frames = jax.device_put(rng.integers(0, 256, (b, h, w), dtype=np.uint8))
    payload = jax.device_put(rng.integers(0, 2, (b, cap), dtype=np.uint8))
    tot = jnp.int32(b * cap)
    d = jnp.float32(20)

    @jax.jit
    def emb_b(f, p):
        s, bp = qim.embed_frames(f, p, tot, d, n_ac)
        return jnp.sum(s, dtype=jnp.int32) + bp[0]

    @jax.jit
    def emb_f(f, p):
        s, bp = qim_fast.embed_frames_fast(f, p, tot, d, n_ac)
        return jnp.sum(s, dtype=jnp.int32) + bp[0]

    @jax.jit
    def ext_b(f):
        return jnp.sum(qim.extract_frames(f, d, n_ac), dtype=jnp.int32)

    @jax.jit
    def ext_f(f):
        return jnp.sum(qim_fast.extract_frames_fast(f, d, n_ac), dtype=jnp.int32)

    @jax.jit
    def rt_b(f, p):
        s, bp, e = qim.embed_and_extract_frames(f, p, tot, d, n_ac)
        return jnp.sum(s, dtype=jnp.int32) + jnp.sum(e, dtype=jnp.int32)

    @jax.jit
    def rt_f(f, p):
        s, bp, e = qim_fast.embed_and_extract_frames_fast(f, p, tot, d, n_ac)
        return jnp.sum(s, dtype=jnp.int32) + jnp.sum(e, dtype=jnp.int32)

    @jax.jit
    def rt_f_err(f, p):
        _, _, e = qim_fast.embed_and_extract_frames_fast(f, p, tot, d, n_ac)
        return jnp.sum((e != p).astype(jnp.int32))

    def bench(fn, name):
        _ = float(fn())  # warmup, full completion
        t0 = time.perf_counter()
        for _i in range(iters):
            _ = float(fn())
        dt = time.perf_counter() - t0
        print(f"{name}: {b * iters / dt:.0f} fps ({dt / iters * 1e3:.2f} ms/iter)",
              flush=True)

    bench(lambda: emb_b(frames, payload), "embed baseline (latency)")
    bench(lambda: emb_f(frames, payload), "embed fast (latency)")
    bench(lambda: ext_b(frames), "extract baseline (latency)")
    bench(lambda: ext_f(frames), "extract fast (latency)")
    bench(lambda: rt_b(frames, payload), "roundtrip baseline (latency)")
    bench(lambda: rt_f(frames, payload), "roundtrip fast (latency)")
    print("fast roundtrip bit errors:", int(rt_f_err(frames, payload)), flush=True)

    # Steady-state device throughput: chain K dependent round trips inside one
    # jit (stego feeds the next embed), one scalar readback at the end —
    # dispatch/relay latency amortizes to zero, and the data dependency makes
    # the device execute every iteration for real.
    K = 20

    def chained(roundtrip):
        @jax.jit
        def run(f, p):
            def body(_, carry):
                s, _, e = roundtrip(carry, p, tot, d, n_ac)
                # keep extract in the chain: fold its bits into the next cover
                return s ^ (e[:, :1, None] & 0)
            out = jax.lax.fori_loop(0, K, body, f)
            return jnp.sum(out, dtype=jnp.int32)
        return run

    from stegotpu.ops import pallas_kernel

    for name, rt in [("baseline", qim.embed_and_extract_frames),
                     ("fast", qim_fast.embed_and_extract_frames_fast),
                     ("pallas", pallas_kernel.embed_and_extract_frames_pallas)]:
        run = chained(rt)
        _ = float(run(frames, payload))  # compile + warmup
        t0 = time.perf_counter()
        _ = float(run(frames, payload))
        dt = time.perf_counter() - t0
        print(f"roundtrip {name} (throughput): {b * K / dt:.0f} fps "
              f"({dt / K * 1e3:.2f} ms/iter)", flush=True)


if __name__ == "__main__":
    main()
