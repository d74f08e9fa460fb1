"""Device PNG unfilter (SURVEY §7.6: "device unfilter — Up parallel,
Sub/Paeth row-scan").

Reconstruction is sequential in x (Sub/Average/Paeth use the left
neighbor) and in y (Up/Average/Paeth use the row above), but the
dependency cone — (y, x-bpp), (y-1, x), (y-1, x-bpp) — admits an
anti-diagonal wavefront: with rows skewed by ONE step each, step t
reconstructs byte (y, t - y) for every row in parallel.  All arithmetic
is u8 mod-256 in int32, so the device result is bit-identical to the
serial host tiers (native C++ `png_unfilter` / the Python fallback);
asserted in test_kernel_equality.py.

Batched over images ([B, H, RB] with per-row filter ids), one scan
reconstructs the whole batch — the decode-side analog of the wavefront
FS dither.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = ["unfilter_device", "unfilter_device_batch"]


@functools.partial(jax.jit, static_argnames=("bpp",))
def unfilter_device_batch(rows: jnp.ndarray, filters: jnp.ndarray, *, bpp: int):
    """[B, H, RB] uint8 filtered rows + [B, H] int32 filter ids ->
    [B, H, RB] uint8 reconstructed scanlines."""
    B, H, RB = rows.shape
    T = RB + H - 1
    rows_i = rows.astype(jnp.int32)

    # Skew: skewed[b, y, y + x] = rows[b, y, x]
    cols = jnp.arange(H)[:, None] + jnp.arange(RB)[None, :]  # [H, RB]
    skewed = jnp.zeros((B, H, T), jnp.int32)
    skewed = skewed.at[:, jnp.arange(H)[:, None], cols].set(rows_i)

    f = filters.astype(jnp.int32)  # [B, H]
    ys = jnp.arange(H)

    # carry: the last bpp+1 reconstructed bytes per row, newest last:
    # lags[..., -1] = out(y, x-1), lags[..., -k] = out(y, x-k)
    K = bpp + 1

    def step(lags, t):
        x = t - ys  # [H]
        active = (x >= 0) & (x < RB)
        a = lags[:, :, K - bpp]  # own row, lag bpp:   out(y, x-bpp)
        up = jnp.pad(lags, ((0, 0), (1, 0), (0, 0)))[:, :H]  # row above
        b = up[:, :, K - 1]      # lag 1 of row y-1:   out(y-1, x)
        c = up[:, :, 0]          # lag bpp+1 of y-1:   out(y-1, x-bpp)
        # zero the left/up neighbours outside the image (PNG spec edges)
        left_ok = (x >= bpp)[None, :]
        a = jnp.where(left_ok, a, 0)
        c = jnp.where(left_ok, c, 0)
        up_ok = (ys > 0)[None, :]
        b = jnp.where(up_ok, b, 0)
        c = jnp.where(up_ok, c, 0)

        raw = skewed[:, :, t]  # [B, H]
        # predictors per filter id
        p0 = jnp.zeros_like(raw)
        p1 = a
        p2 = b
        p3 = (a + b) >> 1
        pp = a + b - c
        pa = jnp.abs(pp - a)
        pb = jnp.abs(pp - b)
        pc = jnp.abs(pp - c)
        p4 = jnp.where(
            (pa <= pb) & (pa <= pc), a, jnp.where(pb <= pc, b, c)
        )
        pred = jnp.select(
            [f == 0, f == 1, f == 2, f == 3, f == 4],
            [p0, p1, p2, p3, p4],
        )
        val = (raw + pred) & 0xFF
        val = jnp.where(active[None, :], val, 0)
        new_lags = jnp.concatenate([lags[:, :, 1:], val[:, :, None]], axis=2)
        return new_lags, val

    lags0 = jnp.zeros((B, H, K), jnp.int32)
    _, ys_out = jax.lax.scan(step, lags0, jnp.arange(T))  # [T, B, H]

    out_bht = ys_out.transpose(1, 2, 0)  # [B, H, T]
    out = jnp.take_along_axis(out_bht, cols[None], axis=2)  # [B, H, RB]
    return out.astype(jnp.uint8)


def unfilter_device(rows, filters, *, bpp: int):
    """Single-image [H, RB] variant."""
    return unfilter_device_batch(rows[None], filters[None], bpp=bpp)[0]
