"""DCT-II basis matrices for the 8x8 block transform.

The reference computes the per-block transform as two separable 1-D scipy
``fftpack.dct(..., norm='ortho')`` calls per axis (reference:
config_and_setup.py:135,168). On TPU the same transform is expressed as
matmuls so it lands on the MXU:

- separable form: ``Y = M @ X @ M.T`` with the orthonormal DCT-II matrix M;
- fused form used by the kernels here: flatten each 8x8 block row-major to a
  64-vector and apply the Kronecker matrix ``K = M (x) M`` once:
  ``vec(M X M^T) = (M (x) M) vec(X)`` for row-major vec. A whole batch of
  blocks is then ONE (nblocks, 64) @ (64, 64) matmul, and the flat coefficient
  order automatically matches the reference's row-major ``flatten()``
  (config_and_setup.py:136).

The inverse transform matrix is K.T (K is orthonormal).
"""

from __future__ import annotations

import functools

import numpy as np

from stegotpu.config import BLOCK


@functools.lru_cache(maxsize=None)
def dct_matrix(n: int = BLOCK, dtype=np.float32) -> np.ndarray:
    """Orthonormal DCT-II matrix: M[k, j] = s(k) * cos(pi*(2j+1)*k / (2n)).

    s(0) = sqrt(1/n), s(k>0) = sqrt(2/n). Matches
    ``scipy.fftpack.dct(x, norm='ortho')`` applied along an axis.
    """
    k = np.arange(n)[:, None].astype(np.float64)
    j = np.arange(n)[None, :].astype(np.float64)
    mat = np.cos(np.pi * (2.0 * j + 1.0) * k / (2.0 * n))
    mat *= np.sqrt(2.0 / n)
    mat[0, :] *= np.sqrt(0.5)
    out = mat.astype(dtype)
    out.setflags(write=False)  # lru_cache shares this array process-wide
    return out


@functools.lru_cache(maxsize=None)
def kron_dct_matrix(n: int = BLOCK, dtype=np.float32) -> np.ndarray:
    """K = M (x) M, the (n^2, n^2) one-shot 2-D DCT operator on flattened blocks.

    Computed in float64 and cast once, so K.T @ K is orthonormal to float64
    accuracy before the cast.
    """
    m = dct_matrix(n, np.float64)
    out = np.kron(m, m).astype(dtype)
    out.setflags(write=False)  # lru_cache shares this array process-wide
    return out


def blockify(frames: np.ndarray, block: int = BLOCK) -> np.ndarray:
    """(..., H, W) -> (..., H//b * W//b, b*b) flattened blocks, row-major.

    Block order (row of blocks outer, column inner) and the row-major flatten
    within each block match the reference's loop nesting and ``flatten()``
    (config_and_setup.py:129-136). Works on numpy and jax arrays.
    """
    *lead, h, w = frames.shape
    bh, bw = h // block, w // block
    x = frames.reshape(*lead, bh, block, bw, block)
    x = x.swapaxes(-3, -2)  # (..., bh, bw, block, block)
    return x.reshape(*lead, bh * bw, block * block)


def unblockify(blocks: np.ndarray, height: int, width: int, block: int = BLOCK) -> np.ndarray:
    """Inverse of blockify: (..., nb, b*b) -> (..., H, W)."""
    *lead, _, _ = blocks.shape
    bh, bw = height // block, width // block
    x = blocks.reshape(*lead, bh, bw, block, block)
    x = x.swapaxes(-3, -2)  # (..., bh, block, bw, block)
    return x.reshape(*lead, height, width)
