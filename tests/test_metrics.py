"""Metric correctness: PSNR (no uint8 wraparound — the reference's bug),
SSIM vs direct numpy computation, BER."""

import jax.numpy as jnp
import numpy as np

from stegotpu.metrics import ber, ber_np, psnr, psnr_np, ssim, ssim_np


def test_psnr_identical_is_inf(rng):
    a = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    assert psnr_np(a, a) == float("inf")


def test_psnr_no_uint8_wraparound():
    """The reference's evaluation.psnr subtracts raw uint8 (wraps around,
    evaluation.py:14). Ours must compute the true value."""
    a = np.zeros((8, 8), np.uint8)
    b = np.full((8, 8), 255, np.uint8)
    expected = 10 * np.log10(255.0**2 / 255.0**2)  # == 0 dB
    assert abs(psnr_np(a, b) - expected) < 1e-5


def test_psnr_known_value(rng):
    a = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    noise = rng.integers(-3, 4, a.shape)
    b = np.clip(a.astype(int) + noise, 0, 255).astype(np.uint8)
    mse = np.mean((a.astype(float) - b.astype(float)) ** 2)
    expected = 10 * np.log10(255.0**2 / mse)
    assert abs(psnr_np(a, b) - expected) < 1e-4
    # device (jitted) version agrees with the host version
    assert abs(float(psnr(jnp.asarray(a), jnp.asarray(b))) - expected) < 1e-3


def test_ssim_identical_is_one(rng):
    a = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    assert abs(ssim_np(a, a) - 1.0) < 1e-6


def test_ssim_decreases_with_noise(rng):
    a = rng.integers(0, 256, (64, 64), dtype=np.uint8)
    small = np.clip(a.astype(int) + rng.integers(-2, 3, a.shape), 0, 255).astype(np.uint8)
    big = np.clip(a.astype(int) + rng.integers(-60, 61, a.shape), 0, 255).astype(np.uint8)
    s_small, s_big = ssim_np(a, small), ssim_np(a, big)
    assert 0 < s_big < s_small <= 1.0


def test_ssim_vs_direct_gaussian_numpy(rng):
    """Independent numpy implementation of Wang et al. SSIM as cross-check."""
    from scipy.ndimage import correlate

    a = rng.integers(0, 256, (48, 48)).astype(np.float64)
    b = np.clip(a + rng.normal(0, 5, a.shape), 0, 255)

    x = np.arange(11) - 5.0
    g = np.exp(-(x**2) / (2 * 1.5**2))
    g /= g.sum()
    win = np.outer(g, g)

    def filt(img):
        return correlate(img, win, mode="constant")[5:-5, 5:-5]

    mu_a, mu_b = filt(a), filt(b)
    va = filt(a * a) - mu_a**2
    vb = filt(b * b) - mu_b**2
    cov = filt(a * b) - mu_a * mu_b
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    expected = np.mean(
        ((2 * mu_a * mu_b + c1) * (2 * cov + c2))
        / ((mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    )
    assert abs(ssim_np(a, b) - expected) < 1e-9  # host impl, float64
    # device SSIM runs in float32; 1e-3 covers conv accumulation error
    assert abs(float(ssim(jnp.asarray(a), jnp.asarray(b))) - expected) < 1e-3


def test_ber_device_matches_host(rng):
    a = rng.integers(0, 2, 512).astype(np.uint8)
    b = a.copy()
    b[::7] ^= 1
    assert abs(float(ber(jnp.asarray(a), jnp.asarray(b))) - ber_np(a, b)) < 1e-7


def test_ber(rng):
    a = rng.integers(0, 2, 1000).astype(np.uint8)
    b = a.copy()
    assert ber_np(a, b) == 0.0
    b[:100] ^= 1
    assert abs(ber_np(a, b) - 0.1) < 1e-6
