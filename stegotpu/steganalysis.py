"""Steganalysis: detect QIM/DCT embedding and estimate its parameters.

The reference's 'security evaluation' is a simulated loop + time.sleep
(reference: evaluation.py:235-264). This module provides the real thing — an
honest attack on the scheme itself, because QIM's lattice snap is highly
detectable: payload-carrying AC coefficients sit exactly on multiples of
delta (up to uint8 re-quantization noise), while natural-content coefficients
are spread continuously.

Detector: for candidate delta values, measure the fraction of AC
coefficients (flat indices 1..N) whose distance to the nearest delta-multiple
is < eps*delta. Clean video scores ~2*eps everywhere; a stego video spikes
hard at the true delta (and its divisors). Computed on device, vmapped over
the candidate grid; only the score vector crosses the host boundary.

This is also the honest security statement for users: QIM steganography is
NOT steganographically secure against a warden who suspects the channel —
its security rests entirely on the AES-GCM/ECDH layer protecting the
*content*, not the embedding's invisibility. docs/COMPATIBILITY.md carries
the same caveat.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from stegotpu.config import BLOCK
from stegotpu.ops.dct import blockify, kron_dct_matrix


@functools.partial(jax.jit, static_argnames=("num_ac",))
def lattice_scores(
    frames: jnp.ndarray,
    deltas: jnp.ndarray,
    num_ac: int,
    eps: float = 0.08,
) -> jnp.ndarray:
    """Per-frame fraction of AC coefficients within eps*delta of the lattice.

    frames: (B, H, W) uint8 gray; deltas: (K,) float32 candidates.
    Returns (K, B) scores in [0, 1]. Background expectation ~2*eps. Scoring
    is per frame because a payload may occupy only some frames: the true
    delta saturates (score -> ~1) on payload-carrying frames specifically.
    """
    xb = blockify(frames.astype(jnp.float32))
    k64 = jnp.asarray(kron_dct_matrix())
    y = jnp.einsum("bnc,kc->bnk", xb, k64, preferred_element_type=jnp.float32)
    b = frames.shape[0]
    ac = y[..., 1 : 1 + num_ac].reshape(b, -1)  # (B, slots)

    def score(delta):
        q = jnp.round(ac / delta)
        dist = jnp.abs(ac - q * delta) / delta
        # exclude near-zero coefficients: they sit on EVERY lattice and would
        # drown the signal (flat image regions have many exact zeros)
        informative = jnp.abs(ac) > (0.75 * delta)
        frac = jnp.sum(jnp.where(informative & (dist < eps), 1.0, 0.0), axis=-1)
        denom = jnp.maximum(jnp.sum(informative.astype(jnp.float32), axis=-1), 1.0)
        return frac / denom

    return jax.vmap(score)(deltas)


@functools.partial(jax.jit, static_argnames=())
def _per_slot_scores(frames: jnp.ndarray, delta: jnp.ndarray,
                     eps: float = 0.08) -> jnp.ndarray:
    """Lattice score per flat in-block coefficient index (64,) at one delta.

    QIM snaps exactly the slots c = 1..N, so at the true delta the scores
    saturate for c <= N and fall to background beyond — which recovers N.
    """
    xb = blockify(frames.astype(jnp.float32))
    k64 = jnp.asarray(kron_dct_matrix())
    y = jnp.einsum("bnc,kc->bnk", xb, k64, preferred_element_type=jnp.float32)
    q = jnp.round(y / delta)
    dist = jnp.abs(y - q * delta) / delta
    informative = jnp.abs(y) > (0.75 * delta)
    frac = jnp.sum(jnp.where(informative & (dist < eps), 1.0, 0.0), axis=1)
    denom = jnp.maximum(jnp.sum(informative.astype(jnp.float32), axis=1), 1.0)
    return frac / denom  # (B, 64): per frame, payload frames saturate


def estimate_num_ac(frames_gray: np.ndarray, delta: float,
                    score_floor: float = 0.85) -> int:
    """Recover the out-of-band num_ac parameter from lattice structure.

    Returns the largest N such that ALL slots 1..N saturate the lattice at
    `delta` on the best (payload-carrying) frame — 0 if none do. Together
    with the recovered delta this gives a warden everything
    `stegotpu inspect` needs: the scheme hides content (AES-GCM), not
    parameters.
    """
    per_frame = np.asarray(_per_slot_scores(jnp.asarray(frames_gray),
                                            jnp.float32(delta)))  # (B, 64)
    scores = per_frame.max(axis=0)
    n = 0
    for c in range(1, scores.shape[0]):
        if scores[c] > score_floor:
            n = c
        else:
            break
    return n


@dataclasses.dataclass
class SteganalysisReport:
    deltas: np.ndarray          # candidate grid
    scores: np.ndarray          # lattice scores per candidate
    background: float           # median score (clean expectation)
    best_delta: int             # strongest candidate
    best_score: float
    detection_ratio: float      # best_score / background
    verdict: str                # "stego-likely" | "clean-likely"

    @property
    def detected(self) -> bool:
        return self.verdict == "stego-likely"


def analyze_frames(
    frames_gray: np.ndarray,
    num_ac: int = 10,
    delta_min: int = 6,
    delta_max: int = 64,
    threshold: float = 3.0,
    score_floor: float = 0.85,
) -> SteganalysisReport:
    """Scan a delta grid and flag QIM lattice structure.

    Verdict requires BOTH a detection ratio above `threshold` AND a raw
    per-frame score above `score_floor`: true QIM saturates the lattice on
    payload frames (score ~0.95-1.0), while synthetic low-texture content can
    align coincidentally with some delta but never saturates.
    """
    deltas = np.arange(delta_min, delta_max + 1, dtype=np.float32)
    per_frame = np.asarray(
        lattice_scores(jnp.asarray(frames_gray), jnp.asarray(deltas), num_ac)
    )  # (K, B)
    scores = per_frame.max(axis=1)  # best frame per candidate delta
    background = float(np.median(scores))
    best_idx = int(np.argmax(scores))
    best_score = float(scores[best_idx])
    ratio = best_score / max(background, 1e-6)
    detected = ratio > threshold and best_score > score_floor
    return SteganalysisReport(
        deltas=deltas,
        scores=scores,
        background=background,
        best_delta=int(deltas[best_idx]),
        best_score=best_score,
        detection_ratio=ratio,
        verdict="stego-likely" if detected else "clean-likely",
    )


def read_gray_frames(path, max_frames: int = 4) -> np.ndarray:
    """First frames of a video as a (B, H, W) uint8 gray stack (the shared
    front half of analyze_video and the steganalyze CLI)."""
    from stegotpu.ops.color import bgr_to_gray_np
    from stegotpu.video import VideoReader

    frames = []
    with VideoReader(path) as reader:
        for _ in range(max_frames):
            f = reader.read_frame()
            if f is None:
                break
            frames.append(bgr_to_gray_np(f))
    if not frames:
        raise IOError(f"no frames readable from '{path}'")
    return np.stack(frames)


def analyze_video(
    path, num_ac: int = 10, max_frames: int = 4, **kw
) -> SteganalysisReport:
    """Steganalyze the first frames of a video file."""
    return analyze_frames(read_gray_frames(path, max_frames), num_ac=num_ac,
                          **kw)
