"""Device-side LZ77 assist kernels.

SURVEY §2.2 maps the LZ77 matcher as [HK]: hash/bucket construction and
candidate match scoring are data-parallel device passes, while the final
greedy/lazy token selection stays sequential on the host. These kernels
are the device half:

  - ``hash4``: the 4-gram rolling hash for every position in one pass
    (the analog of the reference's per-position ``update_hash``,
    ``src/compress/lz77.rs:864``),
  - ``batched_match_lengths``: vectorized match-length scoring between
    arbitrary (position, candidate) pairs — the ``simd::match_length``
    analog (``src/simd/mod.rs:113-132``) over thousands of candidates at
    once instead of 16 bytes at a time.

Deployment note: on this dev harness the TPU tunnel's device-to-host
bandwidth (single-digit MB/s) makes shipping byte streams to the device
a net loss, so the production DEFLATE path keeps matching on the host
(native C++). On hosts with real PCIe these kernels let the device
pre-score candidate tables for the optimal parser; they are tested
against NumPy mirrors either way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

HASH_BITS = 16


@jax.jit
def hash4(data_u8):
    """[N] uint8 -> [N] int32 4-gram hashes (positions N-3.. hash trailing
    bytes as if zero-padded; callers mask the tail)."""
    d = data_u8.astype(jnp.uint32)
    n = d.shape[0]

    def shifted(k):
        pad = jnp.zeros((k,), jnp.uint32)
        return jnp.concatenate([d[k:], pad])

    v = d | (shifted(1) << 8) | (shifted(2) << 16) | (shifted(3) << 24)
    return ((v * jnp.uint32(2654435761)) >> jnp.uint32(32 - HASH_BITS)).astype(jnp.int32)


def hash4_np(data: np.ndarray) -> np.ndarray:
    d = data.astype(np.uint64)
    n = len(d)
    v = np.zeros(n, np.uint64)
    for k in range(4):
        sh = np.zeros(n, np.uint64)
        sh[: n - k] = d[k:]
        v |= sh << (8 * k)
    return (((v & 0xFFFFFFFF) * 2654435761) % (1 << 32) >> (32 - HASH_BITS)).astype(
        np.int32
    )


@functools.partial(jax.jit, static_argnames=("max_len",))
def batched_match_lengths(data_u8, pos, cand, *, max_len: int = 258):
    """Match lengths between data[pos..] and data[cand..] for many pairs.

    data_u8: [N] uint8; pos, cand: [M] int32. Returns [M] int32 lengths
    (capped at max_len and at the end of the buffer).
    """
    n = data_u8.shape[0]
    offs = jnp.arange(max_len, dtype=jnp.int32)
    a_idx = pos[:, None] + offs[None, :]
    b_idx = cand[:, None] + offs[None, :]
    in_range = a_idx < n
    a = data_u8[jnp.clip(a_idx, 0, n - 1)]
    b = data_u8[jnp.clip(b_idx, 0, n - 1)]
    eq = (a == b) & in_range
    # length = index of first mismatch
    first_bad = jnp.argmin(eq, axis=1)
    all_eq = jnp.all(eq, axis=1)
    return jnp.where(all_eq, max_len, first_bad).astype(jnp.int32)


def batched_match_lengths_np(
    data: np.ndarray, pos: np.ndarray, cand: np.ndarray, max_len: int = 258
) -> np.ndarray:
    out = np.zeros(len(pos), np.int32)
    n = len(data)
    for i, (p, c) in enumerate(zip(pos.tolist(), cand.tolist())):
        ln = 0
        while ln < max_len and p + ln < n and data[p + ln] == data[(c + ln) % max(n, 1)] and c + ln < n:
            ln += 1
        out[i] = ln
    return out
