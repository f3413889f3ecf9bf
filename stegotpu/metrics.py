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


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("data_range",))
def ssim(a: jnp.ndarray, b: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """Mean SSIM over an (H, W) image pair, standard Wang et al. parameters.

    Gaussian 11x11 window (sigma 1.5), K1=0.01, K2=0.03, 'valid' padding.
    Runs as grouped convolutions on device.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    win = jnp.asarray(_gaussian_kernel())[None, None]  # (1, 1, 11, 11) OIHW

    def filt(x):
        return jax.lax.conv_general_dilated(
            x[None, None], win, window_strides=(1, 1), padding="VALID"
        )[0, 0]

    mu_a, mu_b = filt(a), filt(b)
    mu_a2, mu_b2, mu_ab = mu_a * mu_a, mu_b * mu_b, mu_a * mu_b
    var_a = filt(a * a) - mu_a2
    var_b = filt(b * b) - mu_b2
    cov = filt(a * b) - mu_ab
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    num = (2.0 * mu_ab + c1) * (2.0 * cov + c2)
    den = (mu_a2 + mu_b2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den)


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
