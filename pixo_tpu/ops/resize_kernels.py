"""Resize device kernels: nearest / bilinear / Lanczos3.

Behavioral parity with pixo ``src/resize.rs:298-560``:
  - nearest: src = round((dst+0.5)*ratio - 0.5) clamped (``:298-330``),
  - bilinear: align-corners ratios (src-1)/(dst-1), single f32 lerp pass,
    round-half-away + clamp (``:333-390``),
  - Lanczos3: separable horizontal-then-vertical with per-destination
    normalized windows, filter support scaled by max(scale, 1), and the
    reference's *intermediate u8 rounding* between the two passes
    (``:393-560``).

TPU-first: the Lanczos windows become dense [dst, src] weight matrices so
each pass is one MXU matmul over the whole image (SURVEY §2.7: "separable
conv with precomputed weight matrices -> two matmuls"); nearest/bilinear
are gathers + fused elementwise lerps.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .quantize import round_half_away


def _nearest_indices(src: int, dst: int) -> np.ndarray:
    ratio = src / dst
    centers = (np.arange(dst, dtype=np.float32) + 0.5) * ratio - 0.5
    # f32::round = half away from zero; centers >= -0.5 so floor(x+0.5) works
    idx = np.floor(centers + 0.5).astype(np.int64)
    return np.clip(idx, 0, src - 1)


@functools.partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_nearest(img, *, dst_w: int, dst_h: int):
    """[H, W, C] uint8 -> [dst_h, dst_w, C] uint8 (pure gather)."""
    h, w = img.shape[0], img.shape[1]
    ys = jnp.asarray(_nearest_indices(h, dst_h))
    xs = jnp.asarray(_nearest_indices(w, dst_w))
    return img[ys][:, xs]


@functools.partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_bilinear(img, *, dst_w: int, dst_h: int):
    """[H, W, C] uint8 -> [dst_h, dst_w, C] uint8 via one fused lerp pass."""
    h, w = img.shape[0], img.shape[1]
    y_ratio = (h - 1) / (dst_h - 1) if dst_h > 1 else 0.0
    x_ratio = (w - 1) / (dst_w - 1) if dst_w > 1 else 0.0

    yf = jnp.arange(dst_h, dtype=jnp.float32) * jnp.float32(y_ratio)
    xf = jnp.arange(dst_w, dtype=jnp.float32) * jnp.float32(x_ratio)
    y0 = jnp.floor(yf).astype(jnp.int32)
    x0 = jnp.floor(xf).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    fy = (yf - y0.astype(jnp.float32))[:, None, None]
    fx = (xf - x0.astype(jnp.float32))[None, :, None]

    f = img.astype(jnp.float32)
    p00 = f[y0][:, x0]
    p01 = f[y0][:, x1]
    p10 = f[y1][:, x0]
    p11 = f[y1][:, x1]
    top = p00 * (1.0 - fx) + p01 * fx
    bottom = p10 * (1.0 - fx) + p11 * fx
    value = top * (1.0 - fy) + bottom * fy
    return jnp.clip(round_half_away(value), 0.0, 255.0).astype(jnp.uint8)


def _lanczos_kernel(x: np.ndarray, a: float = 3.0) -> np.ndarray:
    out = np.zeros_like(x)
    tiny = np.abs(x) < np.finfo(np.float32).eps
    inside = (~tiny) & (np.abs(x) < a)
    px = math.pi * x[inside]
    pxa = px / a
    out[inside] = (a * np.sin(px) * np.sin(pxa)) / (px * pxa)
    out[tiny] = 1.0
    return out


def lanczos_weight_matrix(src: int, dst: int, a: float = 3.0) -> np.ndarray:
    """Dense [dst, src] f32 weight matrix with normalized Lanczos windows."""
    scale = src / dst
    filter_scale = max(scale, 1.0)
    support = a * filter_scale
    mat = np.zeros((dst, src), dtype=np.float32)
    for d in range(dst):
        center = (d + 0.5) * scale - 0.5
        start = max(int(np.floor(center - support)), 0)
        end = min(int(np.ceil(center + support)) + 1, src)
        xs = (np.arange(start, end, dtype=np.float32) - np.float32(center)) / np.float32(
            filter_scale
        )
        w = _lanczos_kernel(xs.astype(np.float32), a).astype(np.float32)
        s = np.float32(w.sum())
        if abs(float(s)) > np.finfo(np.float32).eps:
            w = w / s
        mat[d, start:end] = w
    return mat


@functools.partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_lanczos3_batch(imgs, *, dst_w: int, dst_h: int):
    """[B, H, W, C] uint8 -> [B, dst_h, dst_w, C] uint8: one fused dispatch
    resizes a whole same-shape group (bit-identical to the per-image path;
    the weight matmuls batch along B on the MXU)."""
    fn = functools.partial(resize_lanczos3.__wrapped__, dst_w=dst_w, dst_h=dst_h)
    return jax.vmap(fn)(imgs)


@functools.partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_lanczos3(img, *, dst_w: int, dst_h: int):
    """[H, W, C] uint8 -> [dst_h, dst_w, C] uint8 via two weight matmuls.

    Matches the reference's separable structure including the intermediate
    u8 round/clamp between horizontal and vertical passes.
    """
    h, w = img.shape[0], img.shape[1]
    wx = jnp.asarray(lanczos_weight_matrix(w, dst_w))  # [dst_w, w]
    wy = jnp.asarray(lanczos_weight_matrix(h, dst_h))  # [dst_h, h]

    # channel-major layout keeps both passes as plain [M, K] @ [K, N]
    # matmuls on the MXU (a trailing c=3/4 axis defeats XLA's tiling)
    f = img.astype(jnp.float32).transpose(2, 0, 1)  # [c, h, w]
    # Horizontal: [c, h, w] @ [w, dst_w]
    t = jax.lax.dot_general(
        f, wx.T, (((2,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [c, h, dst_w]
    t = jnp.clip(round_half_away(t), 0.0, 255.0)  # intermediate u8 rounding
    # Vertical: [dst_h, h] @ [h, dst_w] per channel
    o = jax.lax.dot_general(
        t, wy.T, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # [c, dst_w, dst_h]  (contracted h; dims become [c, dst_w, dst_h])
    o = o.transpose(2, 1, 0)  # -> [dst_h, dst_w, c]
    return jnp.clip(round_half_away(o), 0.0, 255.0).astype(jnp.uint8)
