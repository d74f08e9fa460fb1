"""Quantization + zigzag device kernels.

Parity: ``quantize_block`` divides by the f32 table and rounds half away
from zero — Rust's ``f32::round`` (pixo ``src/jpeg/quantize.rs:99-105``).
``jnp.round`` is round-half-to-even, so halves are fixed up explicitly.
Zigzag is a fixed gather (``src/jpeg/quantize.rs:107-113``).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..jpeg.tables import ZIGZAG


def round_half_away(x):
    """Rust f32::round semantics: round half away from zero, elementwise."""
    t = jnp.trunc(x)
    frac = x - t  # exact in f32 for |x| < 2^24
    mag = jnp.abs(frac)
    half_up = jnp.where(x >= 0, t + 1.0, t - 1.0)
    nearest = jnp.round(x)  # half-to-even; equals target except at exact .5
    return jnp.where(mag == 0.5, half_up, nearest)


def round_half_away_np(x: np.ndarray) -> np.ndarray:
    t = np.trunc(x)
    frac = (x - t).astype(x.dtype)
    half_up = np.where(x >= 0, t + 1.0, t - 1.0).astype(x.dtype)
    nearest = np.round(x)
    return np.where(np.abs(frac) == 0.5, half_up, nearest)


def quantize_blocks(dct, qtable):
    """[..., 8, 8] f32 DCT / broadcastable f32 table -> int16 (natural order)."""
    q = round_half_away(dct / qtable)
    return q.astype(jnp.int16)


def zigzag_blocks(coeffs):
    """[..., 8, 8] or [..., 64] -> [..., 64] zigzag-ordered."""
    flat = coeffs.reshape(coeffs.shape[: -2] + (64,)) if coeffs.shape[-1] == 8 else coeffs
    return flat[..., jnp.asarray(ZIGZAG)]


def quantize_blocks_np(dct: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    q = round_half_away_np((dct / qtable).astype(np.float32))
    return q.astype(np.int16)


def zigzag_blocks_np(coeffs: np.ndarray) -> np.ndarray:
    flat = coeffs.reshape(coeffs.shape[:-2] + (64,)) if coeffs.shape[-1] == 8 else coeffs
    return flat[..., ZIGZAG]
