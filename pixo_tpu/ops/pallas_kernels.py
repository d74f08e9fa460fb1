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


# ======================= batched 8x8 DCT / IDCT ==============================
# Pallas tiers for the JPEG transform pair.  Blocks ride the LANE axis
# ([8, 8, N] layout) so every AAN/jidctint temporary is an [8, N]-shaped
# VPU op; the butterfly helpers are shared with the XLA tiers
# (ops/dct.py, ops/jpeg_decode.py), so the operation ORDER is identical
# by construction.  Exactness: the int32 IDCT is bit-exact on every
# backend (incl. interpret mode).  The f32 DCT is bit-exact on the
# Mosaic/TPU path (no mul+add contraction — asserted by the on-chip
# suite, tests/test_tpu_onchip.py); under interpret mode on XLA:CPU the
# kernel body is jit-compiled and LLVM FMA-contracts it, the same
# half-ULP drift documented for the XLA tier in ops/dct.py.

_DCT_LANES = 512


def _dct_aan_kernel(x_ref, o_ref):
    from .dct import _aan_1d

    x = x_ref[...]  # [8, 8, TB] f32: [row, col, block]
    rows_done = _aan_1d([x[:, i, :] for i in range(8)])   # rows pass
    t = jnp.stack(rows_done, axis=1)                      # [8(row), 8(col), TB]
    cols_done = _aan_1d([t[i, :, :] for i in range(8)])   # columns pass
    o_ref[...] = jnp.stack(cols_done, axis=0)


def _idct_int_kernel(x_ref, o_ref):
    from .jpeg_decode import (CONST_BITS, PASS1_BITS, ROUND_OUTPUT,
                              ROUND_PASS1, _idct_pass)

    x = x_ref[...]  # [8, 8, TB] int32 natural-order dequantized
    ws = _idct_pass([x[i, :, :] for i in range(8)],
                    lambda v: (v + ROUND_PASS1) >> (CONST_BITS - PASS1_BITS))
    w = jnp.stack(ws, axis=0)                             # [8(row), 8(col), TB]
    outs = _idct_pass(
        [w[:, i, :] for i in range(8)],
        lambda v: jnp.clip(
            ((v + ROUND_OUTPUT) >> (CONST_BITS + PASS1_BITS + 3)) + 128, 0, 255),
    )
    o_ref[...] = jnp.stack(outs, axis=1)


def _blocks_to_lanes(blocks, dtype):
    """[..., 8, 8] -> ([8, 8, Npad], lead_shape, n)."""
    lead = blocks.shape[:-2]
    n = 1
    for d in lead:
        n *= int(d)
    x = blocks.reshape((n, 8, 8)).astype(dtype)
    xt = jnp.transpose(x, (1, 2, 0))
    npad = -(-max(n, 1) // _DCT_LANES) * _DCT_LANES
    if npad != n:
        xt = jnp.pad(xt, ((0, 0), (0, 0), (0, npad - n)))
    return xt, lead, n


def _lanes_to_blocks(out, lead, n):
    return jnp.transpose(out[:, :, :n], (2, 0, 1)).reshape(lead + (8, 8))


@functools.partial(jax.jit, static_argnames=("interpret",))
def dct8x8_aan_pallas(blocks, *, interpret: bool = False):
    """Forward AAN DCT over [..., 8, 8] f32 blocks; bit-exact with
    ops/dct.py dct8x8_aan (same helper, same op order)."""
    xt, lead, n = _blocks_to_lanes(blocks, jnp.float32)
    out = pl.pallas_call(
        _dct_aan_kernel,
        grid=(xt.shape[2] // _DCT_LANES,),
        in_specs=[pl.BlockSpec((8, 8, _DCT_LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8, _DCT_LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.float32),
        interpret=interpret,
    )(xt)
    return _lanes_to_blocks(out, lead, n)


@functools.partial(jax.jit, static_argnames=("interpret",))
def idct8x8_int_pallas(blocks, *, interpret: bool = False):
    """jidctint inverse over [..., 8, 8] int32 natural-order dequantized
    coefficients -> uint8 pixels; bit-exact with ops/jpeg_decode.py
    idct8x8_int (same helper, same int32 wrap semantics)."""
    xt, lead, n = _blocks_to_lanes(blocks, jnp.int32)
    out = pl.pallas_call(
        _idct_int_kernel,
        grid=(xt.shape[2] // _DCT_LANES,),
        in_specs=[pl.BlockSpec((8, 8, _DCT_LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 8, _DCT_LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(xt.shape, jnp.int32),
        interpret=interpret,
    )(xt)
    return _lanes_to_blocks(out, lead, n).astype(jnp.uint8)
