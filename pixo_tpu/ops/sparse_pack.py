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
