"""Device-side JPEG symbol histograms for optimized Huffman tables.

BASELINE.json maps "Huffman code construction ... as data-parallel
hash/histogram passes on device"; this is that histogram half for the
JPEG optimize_huffman pass (SURVEY §2.4 maps the reference's two-pass
counting, pixo src/jpeg/huffman.rs count path, to [K]). Symbol counts
are computed from the zigzag coefficient blocks entirely on device —
DC size categories (per-component diffs with restart-boundary resets)
and AC run/size symbols including ZRL splits and end-of-block — and
match the host counter (``jpeg/packer.py count_symbols`` and the
native ``jpeg_count_symbols``) exactly.

The serial-looking parts dissolve into scans: the DC predictor chain is
a static gather (the previous same-component block index is a function
of the static scan pattern and restart interval only, so it's computed
host-side once per shape), and each block's zero-run lengths come from
a cumulative max of nonzero positions. Table construction itself (a
<=256-leaf package-merge / heap build) stays on host — it is O(symbol
alphabet), not O(pixels), and runs once per image.

Default remains the host counter (the coefficient stream lands on the
host for entropy packing anyway, so host counting adds no transfer);
``PIXO_TPU_HUFFMAN=device`` opts the count onto the device, which wins
when the host core is the binding budget and the coefficients are
already device-resident (the batch encode path) — the d2h cost is two
12-bin and two 256-bin histograms instead of a second host pass over
the [N, 64] stream.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _prev_block_index(
    n: int, pattern: Tuple[int, ...], restart_interval: Optional[int]
) -> np.ndarray:
    """For each block in scan order: index of the previous block of the
    same component within the same restart segment, or -1.

    Static per (n, pattern, restart_interval): the DC predictor chain
    depends only on the scan structure, never on coefficient values.
    """
    bpm = len(pattern)
    comp = np.tile(np.asarray(pattern, np.int64), n // bpm)
    mcu = np.arange(n) // bpm
    seg = mcu // restart_interval if restart_interval else np.zeros(n, np.int64)
    prev_idx = np.full(n, -1, np.int64)
    for c in set(pattern):
        idxs = np.flatnonzero(comp == c)
        prev = np.concatenate(([-1], idxs[:-1]))
        ok = (prev >= 0) & (seg[idxs] == seg[np.maximum(prev, 0)])
        prev_idx[idxs] = np.where(ok, prev, -1)
    return prev_idx


def _category(v):
    """JPEG size category = bit length of |v| (0 for 0), as integer
    compares (no float log2 — must be exact at powers of two)."""
    av = jnp.abs(v.astype(jnp.int32))
    cat = jnp.zeros_like(av)
    for k in range(16):
        cat = cat + (av >= (1 << k)).astype(jnp.int32)
    return cat


@jax.jit
def _count_device(zz, prev_idx, tclass):
    dc = zz[:, 0].astype(jnp.int32)
    prev = jnp.where(prev_idx >= 0, dc[jnp.maximum(prev_idx, 0)], 0)
    dccat = _category(dc - prev)
    dc_hist = jnp.zeros((2, 12), jnp.int32).at[tclass, dccat].add(1)

    v = zz[:, 1:].astype(jnp.int32)  # [n, 63]
    nz = (v != 0).astype(jnp.int32)
    pos = jnp.arange(1, 64, dtype=jnp.int32)
    # last nonzero position at-or-before each slot (0 = none yet)
    lastnz = jax.lax.associative_scan(jnp.maximum, jnp.where(v != 0, pos, 0), axis=1)
    prevlast = jnp.concatenate(
        [jnp.zeros((v.shape[0], 1), jnp.int32), lastnz[:, :-1]], axis=1
    )
    run = pos - prevlast - 1  # zeros since the previous nonzero
    rs = ((run % 16) << 4) | _category(v)
    tb = jnp.broadcast_to(tclass[:, None], v.shape)
    ac_hist = jnp.zeros((2, 256), jnp.int32)
    ac_hist = ac_hist.at[tb, rs].add(nz)                 # run/size symbols
    ac_hist = ac_hist.at[tb, 0xF0].add((run // 16) * nz)  # ZRL splits
    eob = (lastnz[:, -1] < 63).astype(jnp.int32)          # incl. all-zero
    ac_hist = ac_hist.at[tclass, 0x00].add(eob)
    return dc_hist, ac_hist


def count_symbols_device(
    zz,
    pattern: Sequence[int],
    restart_interval: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Device histogram of DC/AC symbols, bit-equal to the host counter.

    Accepts host or device-resident ``zz`` ([N, 64] int16 zigzag blocks
    in scan order). Returns (dc_lum[12], dc_chrom[12], ac_lum[256],
    ac_chrom[256]) as int64 NumPy arrays, matching
    ``packer.count_symbols``.
    """
    pattern = tuple(pattern)
    n = int(zz.shape[0])
    prev_idx = _prev_block_index(n, pattern, restart_interval)
    comp = np.tile(np.asarray(pattern, np.int64), n // len(pattern))
    tclass = (comp != 0).astype(np.int32)
    dc_hist, ac_hist = _count_device(
        jnp.asarray(zz), jnp.asarray(prev_idx), jnp.asarray(tclass)
    )
    dc_hist = np.asarray(dc_hist, np.int64)
    ac_hist = np.asarray(ac_hist, np.int64)
    return dc_hist[0], dc_hist[1], ac_hist[0], ac_hist[1]
