"""Quality metrics as jitted on-device reductions: PSNR, SSIM, BER.

The reference's metrics are host-side and partly buggy: its local ``psnr``
subtracts raw uint8 arrays (wraps around, evaluation.py:14) and its SSIM uses
a nonstandard ``data_range = max - min`` (evaluation.py:26). Both are fixed
here (SURVEY.md §6 "bugs to NOT reproduce"): differences are computed in
float and SSIM uses the standard data_range=255 for 8-bit content, via the
standard 11x11 Gaussian-window formulation (sigma=1.5, K1=0.01, K2=0.03).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return jnp.mean(d * d)


@jax.jit
def psnr(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """PSNR in dB for 8-bit content; inf when identical."""
    m = mse(a, b)
    return jnp.where(m == 0, jnp.inf, 10.0 * jnp.log10(255.0 * 255.0 / m))


@jax.jit
def ber(bits_a: jnp.ndarray, bits_b: jnp.ndarray) -> jnp.ndarray:
    """Bit error rate between two equal-length 0/1 arrays."""
    return jnp.mean((bits_a != bits_b).astype(jnp.float32))


def _gaussian_1d(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    g = _gaussian_1d(size, sigma)
    return np.outer(g, g).astype(np.float32)


def _gauss_filter_batch(x: jnp.ndarray) -> jnp.ndarray:
    """Separable 11x11 Gaussian, VALID padding, over (N, H, W) stacks.

    Two 1-D passes (22 taps/px) instead of the dense 11x11 window
    (121 taps/px) — identical output, ~5.5x less work. Each pass is a
    shift-and-add over static slices rather than a lax.conv: a 1-channel
    1-D conv hits XLA:CPU's generic (scalar) conv path, ~15x slower than
    these fully-vectorized fused multiply-adds; on TPU both lower to VPU
    elementwise work, so shift-and-add is the right form everywhere.
    """
    g = _gaussian_1d()
    h, w = x.shape[-2], x.shape[-1]
    y = sum(float(g[k]) * x[:, :, k : k + w - 10] for k in range(11))
    return sum(float(g[k]) * y[:, k : k + h - 10, :] for k in range(11))


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM over an (H, W) image pair, standard Wang et al. parameters.

    Gaussian 11x11 window (sigma 1.5), K1=0.01, K2=0.03, 'valid' padding.
    Runs as grouped convolutions on device.
    """
    return ssim_batch(a[None], b[None], data_range)[0]


@jax.jit
def psnr_batch(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-frame PSNR over (B, H, W) stacks; inf where identical."""
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    m = jnp.mean(d * d, axis=(-2, -1))
    return jnp.where(m == 0, jnp.inf, 10.0 * jnp.log10(255.0 * 255.0 / m))


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim_batch(a: jnp.ndarray, b: jnp.ndarray,
               data_range: float = 255.0) -> jnp.ndarray:
    """Per-frame SSIM over (B, H, W) stacks — the five moment maps ride one
    batched separable conv (the whole batch is one device pass)."""
    if a.shape[-1] < 11 or a.shape[-2] < 11:
        # the 11x11 VALID-padded window needs >= 11 px per axis; smaller
        # frames would hit negative slice stops (cryptic broadcast crash)
        # or all-empty windows (silent NaN) — match skimage's clear error
        raise ValueError(
            f"SSIM needs frames >= 11px per side, got {a.shape[-2]}x"
            f"{a.shape[-1]} (win_size exceeds image)")
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    bsz = a.shape[0]
    stacked = jnp.concatenate([a, b, a * a, b * b, a * b], axis=0)
    f = _gauss_filter_batch(stacked)
    mu_a, mu_b = f[:bsz], f[bsz : 2 * bsz]
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = f[2 * bsz : 3 * bsz] - mu_a2
    var_b = f[3 * bsz : 4 * bsz] - mu_b2
    cov = f[4 * bsz :] - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2.0 * mu_ab + c1) * (2.0 * cov + c2)
    den = (mu_a2 + mu_b2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(-2, -1))


# Host-side implementations ---------------------------------------------------
# Pure numpy/scipy: used by the evaluation CLI and other one-shot host paths,
# where paying a device jit compile for a single image pair is absurd (first
# remote TPU compile of the SSIM conv costs minutes over the tunnel). The
# jitted versions above are for batched on-device evaluation inside pipelines.

def psnr_np(a: np.ndarray, b: np.ndarray) -> float:
    d = a.astype(np.float64) - b.astype(np.float64)
    m = float(np.mean(d * d))
    if m == 0:
        return float("inf")
    return 10.0 * float(np.log10(255.0 * 255.0 / m))


def ssim_np(a: np.ndarray, b: np.ndarray, data_range: float = 255.0) -> float:
    from scipy.ndimage import correlate

    if a.shape[-1] < 11 or a.shape[-2] < 11:
        raise ValueError(
            f"SSIM needs frames >= 11px per side, got {a.shape[-2]}x"
            f"{a.shape[-1]} (win_size exceeds image)")
    a = a.astype(np.float64)
    b = b.astype(np.float64)
    win = _gaussian_kernel().astype(np.float64)

    def filt(x):
        return correlate(x, win, mode="constant")[5:-5, 5:-5]

    mu_a, mu_b = filt(a), filt(b)
    var_a = filt(a * a) - mu_a**2
    var_b = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2.0 * mu_a * mu_b + c1) * (2.0 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return float(np.mean(num / den))


def ber_np(a: np.ndarray, b: np.ndarray) -> float:
    return float(np.mean(a != b))
