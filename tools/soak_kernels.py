"""One-off randomized deep soak: kernels vs the scalar scipy oracle.

Samples random (H, W, num_ac, delta, payload fraction, cover style) configs
and checks, for BOTH device kernels (xla and pallas-interpret on CPU):

  - payload round trip is exact on mid-luma covers (BER=0);
  - extraction of the kernel's stego by the ORACLE (scipy, scalar loop —
    the reference's arithmetic) recovers the payload exactly: wire-level
    robustness, not just self-consistency;
  - extraction of the ORACLE's stego by the kernels recovers it too;
  - bits_per_frame accounting matches the oracle's embedded count.

Run: JAX_PLATFORMS=cpu python tools/soak_kernels.py [n_configs] [seed]
Prints one line per failure and a summary; exit 1 on any failure.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from reference_model import embed_frame_oracle, extract_frame_oracle
from stegotpu.ops import pallas_kernel as pk
from stegotpu.ops import qim


def one_config(rng: np.random.Generator) -> list[str]:
    h = 8 * int(rng.integers(2, 13))
    # any 8-multiple width since r4's lane padding (non-128 multiples
    # exercise the pad/mask path; the old 128-only sampling is a subset)
    w = 8 * int(rng.integers(4, 61))
    num_ac = int(rng.integers(1, 33))
    delta = int(rng.integers(9, 49))
    frac = float(rng.uniform(0.05, 1.0))
    style = rng.choice(["midluma", "textured"])
    lo, hi = (48, 208) if style == "midluma" else (64, 192)
    frame = rng.integers(lo, hi, (h, w), dtype=np.uint8)

    cap = (h // 8) * (w // 8) * num_ac
    total = max(1, int(cap * frac))
    payload = np.zeros(cap, np.uint8)
    payload[:total] = rng.integers(0, 2, total)
    bitstr = "".join(map(str, payload[:total]))
    tag = f"h={h} w={w} N={num_ac} d={delta} total={total}/{cap} {style}"
    errs: list[str] = []

    stego_o, n_o = embed_frame_oracle(frame, bitstr, delta, num_ac)
    if n_o != total:
        errs.append(f"{tag}: oracle embedded {n_o} != {total}")

    args = (jnp.asarray(frame[None]), jnp.asarray(payload[None]),
            jnp.int32(total), jnp.float32(delta), num_ac)
    for name, embed, extract in (
        ("xla", qim.embed_frames, qim.extract_frames),
        ("pallas", pk.embed_frames_pallas, pk.extract_frames_pallas),
    ):
        stego_k, bpf = embed(*args)
        stego_k = np.asarray(stego_k)[0]
        if int(np.asarray(bpf)[0]) != total:
            errs.append(f"{tag} [{name}]: bpf {int(np.asarray(bpf)[0])} != {total}")
        # kernel stego -> oracle extract (the reference's arithmetic)
        got = extract_frame_oracle(stego_k, delta, num_ac)[:total]
        if got != bitstr:
            bad = sum(a != b for a, b in zip(got, bitstr))
            errs.append(f"{tag} [{name}]: oracle misreads kernel stego "
                        f"({bad}/{total} bits)")
        # oracle stego -> kernel extract
        ex = np.asarray(extract(jnp.asarray(stego_o[None]),
                                jnp.float32(delta), num_ac)).reshape(-1)
        if not np.array_equal(ex[:total], payload[:total]):
            bad = int((ex[:total] != payload[:total]).sum())
            errs.append(f"{tag} [{name}]: kernel misreads oracle stego "
                        f"({bad}/{total} bits)")
        # self round trip
        ex2 = np.asarray(extract(jnp.asarray(stego_k[None]),
                                 jnp.float32(delta), num_ac)).reshape(-1)
        if not np.array_equal(ex2[:total], payload[:total]):
            bad = int((ex2[:total] != payload[:total]).sum())
            errs.append(f"{tag} [{name}]: self round trip ({bad}/{total} bits)")
    return errs


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    rng = np.random.default_rng(seed)
    failures = 0
    for i in range(n):
        errs = one_config(rng)
        for e in errs:
            print(f"FAIL {e}")
        failures += len(errs)
        if (i + 1) % 10 == 0:
            print(f"... {i + 1}/{n} configs, {failures} failures")
    print(f"soak done: {n} configs, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
