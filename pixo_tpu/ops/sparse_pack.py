"""Device-side coefficient compaction for the JPEG entropy packer.

The dense handoff ships [N, 64] int16 zigzag blocks (128 B/block) to the
host, which then scans for nonzeros — on typical q85 content fewer than
6 of the 63 AC slots are nonzero, so >90% of the transferred bytes and
the host's memory traffic are zeros. This kernel compacts the stream on
the device (the "category/RS symbolization on device" half of SURVEY
§2.4's entropy-coding mapping; the reference does the equivalent scan on
the CPU inside encode_block, pixo src/jpeg/huffman.rs:423-481):

  dc[N]      int16  — DC coefficients (the host computes diffs per
                      component during packing, as before)
  counts[N]  uint8  — number of nonzero ACs per block
  poss[cap]  uint8  — zigzag positions (1..63) of the nonzero ACs,
                      concatenated in block order
  vals[cap]  int16  — the nonzero AC values, same order
  total      int32  — total nonzeros; total > cap means overflow and the
                      caller must fall back to the dense path

The host packer (native ``jpeg_pack_scan_sparse``) reads ~3 B per
nonzero instead of 128 B per block and emits a byte-identical scan.
Compaction is a cumsum + one scatter — fixed shapes, fully jittable,
vmappable over a batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

DEFAULT_CAP_PER_BLOCK = 8


@functools.partial(jax.jit, static_argnames=("cap_per_block",))
def sparsify_blocks(zz, cap_per_block: int = DEFAULT_CAP_PER_BLOCK):
    """[N, 64] int16 zigzag blocks -> (dc, counts, poss, vals, total).

    ``poss``/``vals`` have fixed length N*cap_per_block; entries past
    ``total`` are padding (never read by the host). If total > cap the
    compacted arrays are invalid and the caller must use the dense path.
    """
    n = zz.shape[0]
    cap = n * cap_per_block
    dc = zz[:, 0]
    ac = zz[:, 1:]
    nz = ac != 0
    counts = nz.sum(axis=1, dtype=jnp.int32).astype(jnp.uint8)
    total = nz.sum(dtype=jnp.int32)

    flat_nz = nz.reshape(-1)
    flat_vals = ac.reshape(-1)
    flat_pos = jnp.tile(jnp.arange(1, 64, dtype=jnp.uint8), n)
    # destination slot in the compacted stream; non-selected lanes and
    # overflow spill into a discarded slot at index `cap`
    idx = jnp.cumsum(flat_nz) - 1
    dest = jnp.where(flat_nz, jnp.minimum(idx, cap), cap)
    vals = jnp.zeros(cap + 1, jnp.int16).at[dest].set(flat_vals)[:cap]
    poss = jnp.zeros(cap + 1, jnp.uint8).at[dest].set(flat_pos)[:cap]
    return dc, counts, poss, vals, total


@functools.partial(jax.jit, static_argnames=("cap_per_block",))
def sparsify_blocks_batch(zz, cap_per_block: int = DEFAULT_CAP_PER_BLOCK):
    """[B, N, 64] -> per-image compacted streams (vmapped)."""
    return jax.vmap(
        lambda b: sparsify_blocks(b, cap_per_block=cap_per_block)
    )(zz)


# Per-block capacity for the padded (top-k) layout. 16 slots cover every
# block seen on photographic q85 content with 2x headroom (measured max 8
# on the bench gradients); a block with more nonzeros trips the per-image
# ``maxcount`` overflow. Callers escalate to PADDED_CAP_MAX (noisy/dense
# content; re-compaction from the on-device coefficients costs ~1 ms) and
# only beyond that fall back to the dense path.
PADDED_CAP_PER_BLOCK = 8
# Escalation ladder: callers re-compact at the smallest tier that holds
# the measured per-block maxcount, and fall back to the dense path above
# the top tier (a cap-48 stream at 3 B/entry already exceeds the 128 B
# dense block, so wider tiers would be counterproductive). The default
# cap of 8 keeps the common smooth-content stream small — the pack
# stage's host DRAM traffic (and the PCIe handoff) scale with
# cap: 27 B/block at cap 8 vs 51 at 16 vs 99 at 32 vs 131 dense.
PADDED_CAP_TIERS = (8, 16, 32)
PADDED_CAP_MAX = 32


@functools.partial(jax.jit, static_argnames=("cap_per_block",))
def sparsify_blocks_padded(zz, cap_per_block: int = PADDED_CAP_PER_BLOCK):
    """[N, 64] int16 -> per-block padded streams via ``lax.top_k``.

    The global compaction above is exact but its destination scatter
    serializes on the TPU (~45 ms per 16x512x512 batch — 45x the cost of
    the coefficient pipeline it follows). This variant keeps the nonzero
    ACs *per block* instead: for every block, the first ``cap_per_block``
    nonzero (position, value) pairs in zigzag order, found with one
    ``top_k`` over a packed (64-pos)<<16 | value key — a vectorized
    sorting network, ~1 ms for the same batch. Positions are unique per
    block so the key order is total; absent lanes pack to 0 and sort
    last.

    Returns (dc [N] int16, counts [N] uint8, poss [N, cap] uint8,
    vals [N, cap] int16, total int32, maxcount int32). ``maxcount`` >
    ``cap_per_block`` means some block overflowed its slots and the
    padded arrays are invalid — callers must use the dense path (same
    contract as the flat layout's ``total > cap``). Flattening the padded
    rows by ``counts`` reproduces the flat stream byte-for-byte
    (``padded_to_flat``), so the host packer sees identical input.
    """
    ac = zz[:, 1:].astype(jnp.int32)  # [N, 63]
    nz = ac != 0
    pos = jnp.arange(1, 64, dtype=jnp.int32)
    key = jnp.where(nz, 64 - pos, 0)
    packed = (key << 16) | (ac & 0xFFFF)
    top, _ = jax.lax.top_k(packed, cap_per_block)  # desc by key
    keyk = top >> 16
    vals = (top & 0xFFFF).astype(jnp.uint16).astype(jnp.int16)
    poss = jnp.where(keyk > 0, 64 - keyk, 0).astype(jnp.uint8)
    counts32 = nz.sum(axis=-1, dtype=jnp.int32)
    return (
        zz[:, 0],
        counts32.astype(jnp.uint8),
        poss,
        vals,
        counts32.sum(dtype=jnp.int32),
        counts32.max(),
    )


@functools.partial(jax.jit, static_argnames=("cap_per_block",))
def sparsify_blocks_padded_batch(zz, cap_per_block: int = PADDED_CAP_PER_BLOCK):
    """[B, N, 64] -> per-image padded streams (vmapped top-k)."""
    return jax.vmap(
        lambda b: sparsify_blocks_padded(b, cap_per_block=cap_per_block)
    )(zz)


def padded_to_flat(counts, poss, vals):
    """Host-side flatten: padded [N, cap] rows -> the flat streams the
    native sparse packer consumes (identical to ``sparsify_blocks``
    output for the same coefficients). NumPy boolean indexing — a
    memcpy-class pass over ~cap bytes per block."""
    import numpy as np

    mask = np.arange(poss.shape[1], dtype=np.int64)[None, :] < (
        counts.astype(np.int64)[:, None]
    )
    return poss[mask], vals[mask]
