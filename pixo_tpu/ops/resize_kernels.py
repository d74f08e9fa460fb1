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


def _lanczos_kernel_f32(x: np.float32, a: np.float32) -> np.float32:
    """One kernel tap, every op rounded to f32 in the reference\'s exact
    order (resize.rs:391-403)."""
    f32 = np.float32
    ax = abs(x)
    if ax < np.finfo(np.float32).eps:
        return f32(1.0)
    if ax >= a:
        return f32(0.0)
    pi = f32(math.pi)
    px = f32(pi * x)
    pxa = f32(px / a)
    return f32(
        f32(f32(a * np.sin(px, dtype=np.float32)) * np.sin(pxa, dtype=np.float32))
        / f32(px * pxa)
    )


@functools.lru_cache(maxsize=256)
def lanczos_taps(src: int, dst: int, a: float = 3.0):
    """Per-destination Lanczos windows in tap form (cached: the f32
    scalar-order weight computation is a Python loop that costs more
    than the resize itself; the jit tier only pays it at trace time).

    Returns (starts [dst] int32, weights [dst, K] f32) with windows
    right-padded by zero weights — an EXACT no-op during the serial f32
    accumulation (adding f32(px * 0.0) == +0.0 never rounds).  The f32
    op order of the weight computation and normalization mirrors
    resize.rs:414-456.
    """
    f32 = np.float32
    scale = f32(src) / f32(dst)
    filter_scale = max(scale, f32(1.0))
    support = f32(f32(a) * filter_scale)
    eps = np.finfo(np.float32).eps
    starts, windows = [], []
    for d in range(dst):
        center = f32(f32(f32(d) + f32(0.5)) * scale - f32(0.5))
        start = max(int(np.floor(f32(center - support))), 0)
        end = min(int(np.ceil(f32(center + support))) + 1, src)
        ws = []
        wsum = f32(0.0)
        for s in range(start, end):
            x = f32(f32(f32(s) - center) / filter_scale)
            wv = _lanczos_kernel_f32(x, f32(a))
            ws.append(wv)
            wsum = f32(wsum + wv)
        if abs(wsum) > eps:
            ws = [f32(w_ / wsum) for w_ in ws]
        starts.append(start)
        windows.append(ws)
    k = max(len(w) for w in windows)
    weights = np.zeros((dst, k), np.float32)
    for d, ws in enumerate(windows):
        weights[d, : len(ws)] = ws
    return np.asarray(starts, np.int32), weights


def lanczos_weight_matrix(src: int, dst: int, a: float = 3.0) -> np.ndarray:
    """Dense [dst, src] f32 weight matrix (kept for the matmul-based
    throughput analyses in benches; the production path uses
    ``lanczos_taps`` for serial-f32 byte parity)."""
    starts, weights = lanczos_taps(src, dst, a)
    mat = np.zeros((dst, src), dtype=np.float32)
    for d in range(dst):
        k = weights.shape[1]
        end = min(starts[d] + k, src)
        mat[d, starts[d]:end] = weights[d, : end - starts[d]]
    return mat


@functools.partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_lanczos3_batch(imgs, *, dst_w: int, dst_h: int):
    """[B, H, W, C] uint8 -> [B, dst_h, dst_w, C] uint8: one fused dispatch
    resizes a whole same-shape group (bit-identical to the per-image path;
    the weight matmuls batch along B on the MXU)."""
    fn = functools.partial(resize_lanczos3.__wrapped__, dst_w=dst_w, dst_h=dst_h)
    return jax.vmap(fn)(imgs)


def _lanczos_pass(img_u8, starts, weights):
    """One separable pass along axis 0: [S, N, C] u8 -> [dst, N, C] u8.

    The tap loop is a ``lax.scan`` so the f32 accumulator rounds after
    every multiply-add in the reference\'s exact serial order
    (resize.rs:459-513) — bit-identical to the scalar loop, verified
    against the pixo WASM oracle.  Right-padded zero-weight taps are
    exact no-ops (+0.0 cannot change an f32 sum).
    """
    s_dim = img_u8.shape[0]
    dst, k = weights.shape
    f = img_u8.astype(jnp.float32)  # [S, N, C]
    starts_j = jnp.asarray(starts)
    w_j = jnp.asarray(weights)

    def step(acc, i):
        idx = jnp.clip(starts_j + i, 0, s_dim - 1)  # [dst]
        px = f[idx]  # [dst, N, C]
        return acc + px * w_j[:, i][:, None, None], None

    acc0 = jnp.zeros((dst,) + f.shape[1:], jnp.float32)
    acc, _ = jax.lax.scan(step, acc0, jnp.arange(k))
    return jnp.clip(round_half_away(acc), 0.0, 255.0).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("dst_w", "dst_h"))
def resize_lanczos3(img, *, dst_w: int, dst_h: int):
    """[H, W, C] uint8 -> [dst_h, dst_w, C] uint8, horizontal then
    vertical pass with the reference's intermediate u8 round/clamp —
    byte-identical to pixo (test_oracle_parity.py)."""
    h, w = img.shape[0], img.shape[1]
    sx, wx = lanczos_taps(w, dst_w)
    sy, wy = lanczos_taps(h, dst_h)
    # horizontal: operate along W by transposing it to axis 0
    t = _lanczos_pass(img.transpose(1, 0, 2), sx, wx)  # [dst_w, H, C]
    # vertical: H is axis 0 after transposing back
    o = _lanczos_pass(t.transpose(1, 0, 2), sy, wy)  # [dst_h, dst_w, C]
    return o


def resize_lanczos3_np(img: np.ndarray, *, dst_w: int, dst_h: int) -> np.ndarray:
    """NumPy mirror of the serial-f32 Lanczos pass pair (kernel-equality
    oracle for the native host tier).

    NumPy never fuses, so a per-tap loop of (acc + px*w) reproduces the
    reference's serial rounding exactly — this is the authoritative
    order.  The jit tier matches it bit-for-bit on TPU; on XLA:CPU the
    compiler FMA-contracts inside the scan and a ~1e-5 fraction of
    pixels can differ by 1 (same drift class as the DCT note above).
    """
    from .quantize import round_half_away_np

    def vpass(sp: np.ndarray, starts, weights):
        s_dim = sp.shape[0]
        dst, k = weights.shape
        acc = np.zeros((dst,) + sp.shape[1:], np.float32)
        f = sp.astype(np.float32)
        for i in range(k):
            idx = np.clip(starts + i, 0, s_dim - 1)
            acc = acc + f[idx] * weights[:, i][:, None, None]
        return np.clip(round_half_away_np(acc), 0.0, 255.0).astype(np.uint8)

    h, w = img.shape[0], img.shape[1]
    sx, wx = lanczos_taps(w, dst_w)
    sy, wy = lanczos_taps(h, dst_h)
    t = vpass(img.transpose(1, 0, 2), sx, wx)
    return vpass(t.transpose(1, 0, 2), sy, wy)
