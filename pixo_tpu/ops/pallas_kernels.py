"""Pallas TPU kernels for the hot per-row ops.

``filter_bank_pallas`` fuses the PNG filter bank — all five filter
candidates plus their sum-|i8| scores — into a single VMEM-resident pass
per row tile (the flagship kernel named by BASELINE.json; the XLA path in
ops/png_filters.py is the portable fallback and the equality oracle).

Design notes (pallas_guide.md):
  - rows are tiled on the sublane axis; the row-byte axis stays whole so
    the intra-row left-shift is a pure lane slice,
  - the up-row neighbor is passed as a second pre-shifted input, making
    the kernel embarrassingly tile-parallel (no halo DMA needed),
  - all arithmetic in int32 on the VPU; scores reduce along the lane axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _filter_bank_kernel(bpp: int, x_ref, up_ref, cand_ref, score_ref):
    x = x_ref[...].astype(jnp.int32)
    up = up_ref[...].astype(jnp.int32)
    th, rb = x.shape

    zero_cols = jnp.zeros((th, bpp), jnp.int32)
    left = jnp.concatenate([zero_cols, x[:, :-bpp]], axis=1) if rb > bpp else jnp.zeros_like(x)
    ul = jnp.concatenate([zero_cols, up[:, :-bpp]], axis=1) if rb > bpp else jnp.zeros_like(x)

    f_none = x
    f_sub = (x - left) & 0xFF
    f_up = (x - up) & 0xFF
    f_avg = (x - ((left + up) >> 1)) & 0xFF

    p = left + up - ul
    pa = jnp.abs(p - left)
    pb = jnp.abs(p - up)
    pc = jnp.abs(p - ul)
    pred = jnp.where((pa <= pb) & (pa <= pc), left, jnp.where(pb <= pc, up, ul))
    f_paeth = (x - pred) & 0xFF

    cands = [f_none, f_sub, f_up, f_avg, f_paeth]
    for i, c in enumerate(cands):
        cand_ref[i, :, :] = c
        mag = jnp.minimum(c, 256 - c)
        mag = jnp.where(c == 0, 0, mag)
        score_ref[:, i] = jnp.sum(mag, axis=1)


@functools.partial(jax.jit, static_argnames=("bpp", "interpret"))
def filter_bank_pallas(rows_i32, up_i32, *, bpp: int, interpret: bool = False):
    """[H, RB] int32 raw rows + pre-shifted up rows ->
    (candidates [5, H, RB] int32, scores [H, 5] int32)."""
    h, rb = rows_i32.shape
    tile_h = 8
    pad_h = (-h) % tile_h
    if pad_h:
        rows_i32 = jnp.pad(rows_i32, ((0, pad_h), (0, 0)))
        up_i32 = jnp.pad(up_i32, ((0, pad_h), (0, 0)))
    hp = h + pad_h

    grid = (hp // tile_h,)
    cands, scores = pl.pallas_call(
        functools.partial(_filter_bank_kernel, bpp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_h, rb), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, rb), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((5, tile_h, rb), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_h, 5), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((5, hp, rb), jnp.int32),
            jax.ShapeDtypeStruct((hp, 5), jnp.int32),
        ),
        interpret=interpret,
    )(rows_i32, up_i32)
    return cands[:, :h, :], scores[:h, :]


def filter_bank(rows_u8, bpp: int, *, use_pallas: bool | None = None):
    """Dispatch wrapper: Pallas on TPU, XLA elsewhere.

    rows_u8: [H, RB] uint8 device array. Returns (cands [5,H,RB] i32,
    scores [H,5] i32) matching ops/png_filters internals bit-exactly.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        x = rows_u8.astype(jnp.int32)
        up = jnp.concatenate(
            [jnp.zeros((1, x.shape[1]), jnp.int32), x[:-1]], axis=0
        )
        return filter_bank_pallas(x, up, bpp=bpp)
    from .png_filters import _candidates, _signed_abs_scores

    cands = _candidates(rows_u8, bpp)
    return cands, _signed_abs_scores(cands)
