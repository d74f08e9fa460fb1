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
        pad = jnp.zeros((min(k, n),), jnp.uint32)
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


@functools.partial(jax.jit, static_argnames=("k",))
def chain_candidates(data_u8, *, k: int = 16):
    """First k hash-chain candidates per position, with exact match lengths.

    The host Matcher's chain at position p is exactly the positions
    q < p sharing p's 4-byte hash, nearest first (every position is
    inserted; ``core.cpp Matcher::insert``). A lexicographic sort by
    (hash, position) makes the chain the k sorted predecessors within
    the same-hash run, so one sort + k shifted compares reproduce the
    first k chain steps for EVERY position in parallel.

    Returns (cand [N, k] int32, lens [N, k] int32); cand is -1 past the
    chain end (callers resume the host walk from m.prev there). Tail
    positions (pos+4 > n) are never inserted by the host and get unique
    sentinel keys so they join no bucket.
    """
    n = data_u8.shape[0]
    h = hash4(data_u8)
    pos = jnp.arange(n, dtype=jnp.int32)
    key = jnp.where(pos + 4 <= n, h, (1 << HASH_BITS) + pos)
    skey, spos = jax.lax.sort((key, pos), num_keys=2)

    cols = []
    for kk in range(1, k + 1):
        pad = min(kk, n)
        c = jnp.concatenate(
            [jnp.full((pad,), -1, jnp.int32), spos[: max(n - kk, 0)]]
        )
        ck = jnp.concatenate(
            [jnp.full((pad,), -1, jnp.int32), skey[: max(n - kk, 0)]]
        )
        cols.append(jnp.where(ck == skey, c, -1))
    cand_sorted = jnp.stack(cols, axis=1)  # [N, k] in sorted order
    cand = jnp.zeros((n, k), jnp.int32).at[spos].set(cand_sorted)

    flat = cand.reshape(-1)
    pos_rep = jnp.repeat(pos, k)
    lens = batched_match_lengths(data_u8, pos_rep, jnp.maximum(flat, 0))
    lens = jnp.where(flat >= 0, lens, 0).reshape(n, k)
    return cand, lens


def chain_candidates_np(data: np.ndarray, k: int = 16):
    """NumPy mirror of ``chain_candidates`` via literal chain simulation."""
    n = len(data)
    head: dict = {}
    prev = np.full(n, -1, np.int64)
    cand = np.full((n, k), -1, np.int32)
    lens = np.zeros((n, k), np.int32)
    for p in range(n):
        if p + 4 <= n:
            h = int(hash4_np(data[p : p + 4])[0])
            c = head.get(h, -1)
            for kk in range(k):
                if c < 0:
                    break
                cand[p, kk] = c
                lens[p, kk] = batched_match_lengths_np(
                    data, np.array([p]), np.array([c])
                )[0]
                c = prev[c]
            prev[p] = head.get(h, -1)
            head[h] = p
    return cand, lens


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
