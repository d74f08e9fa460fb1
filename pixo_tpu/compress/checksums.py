"""CRC-32 and Adler-32 checksums.

From-scratch implementations with parity to pixo ``src/compress/crc32.rs``
(slicing-by-8, poly 0xEDB88320) and ``src/compress/adler32.rs`` (mod 65521
with NMAX batching). The hot path is the C++ native library; the NumPy
versions here are the fallback and the test oracle cross-check (both must
agree with ``zlib.crc32`` / ``zlib.adler32``).

A device (jnp) Adler-32 is provided as two prefix sums for use inside fused
pipelines (SURVEY §2.2 TPU mapping: "[K] two prefix-sums").
"""

from __future__ import annotations

import numpy as np

_CRC_POLY = 0xEDB88320


def _build_crc_table() -> np.ndarray:
    table = np.zeros((8, 256), dtype=np.uint32)
    t0 = np.zeros(256, dtype=np.uint32)
    for i in range(256):
        c = i
        for _ in range(8):
            c = (c >> 1) ^ (_CRC_POLY if (c & 1) else 0)
        t0[i] = c
    table[0] = t0
    for k in range(1, 8):
        prev = table[k - 1]
        table[k] = t0[prev & 0xFF] ^ (prev >> np.uint32(8))
    return table


_CRC_TABLE = _build_crc_table()
_T0 = _CRC_TABLE[0]


def crc32(data: bytes, crc: int = 0) -> int:
    """CRC-32 (IEEE, reflected). NumPy table-driven fallback path."""
    c = np.uint32(~crc & 0xFFFFFFFF)
    arr = np.frombuffer(data, dtype=np.uint8)
    # Byte-serial but table-driven; native path supersedes this for large data.
    for b in arr:
        c = _T0[(c ^ b) & np.uint32(0xFF)] ^ (c >> np.uint32(8))
    return int(~c & 0xFFFFFFFF)


class Crc32:
    """Incremental CRC-32 (mirrors pixo's ``Crc32`` struct)."""

    def __init__(self) -> None:
        self._crc = 0

    def update(self, data: bytes) -> None:
        self._crc = crc32(data, self._crc)

    def finalize(self) -> int:
        return self._crc


_ADLER_MOD = 65521
_ADLER_NMAX = 5552


def adler32(data: bytes, adler: int = 1) -> int:
    """Adler-32 with NMAX batching, vectorized with NumPy.

    For a chunk of bytes d[0..n): a' = a + sum(d); b' = b + n*a + sum((n-i)*d[i]).
    """
    a = adler & 0xFFFF
    b = (adler >> 16) & 0xFFFF
    arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
    n = len(arr)
    pos = 0
    while pos < n:
        chunk = arr[pos : pos + _ADLER_NMAX]
        m = len(chunk)
        csum = int(chunk.sum())
        # sum of prefix-weighted bytes: b gains a*m + sum_{i<m} (m-i)*d[i]
        weights = np.arange(m, 0, -1, dtype=np.uint64)
        wsum = int((chunk * weights).sum())
        b = (b + a * m + wsum) % _ADLER_MOD
        a = (a + csum) % _ADLER_MOD
        pos += m
    return ((b << 16) | a) & 0xFFFFFFFF


def adler32_jnp(data_u8, adler: int = 1):
    """Device Adler-32 over a uint8 jnp array: chunked reductions + scan.

    Each 2048-byte chunk contributes two weighted sums (int32-safe without
    x64); a lax.scan carries (a, b) mod 65521 across chunks — the TPU
    reformulation of the NMAX batching in the reference's adler32.
    """
    import jax
    import jax.numpy as jnp

    chunk = 2048
    n = int(data_u8.shape[0])
    pad = (-n) % chunk
    d = jnp.pad(data_u8, (0, pad)).astype(jnp.int32).reshape(-1, chunk)
    nchunks = d.shape[0]
    lengths = jnp.minimum(
        jnp.maximum(n - jnp.arange(nchunks, dtype=jnp.int32) * chunk, 0), chunk
    )
    j = jnp.arange(chunk, dtype=jnp.int32)
    csums = jnp.sum(d, axis=1)  # padding bytes are zero
    wsums = jnp.sum(d * jnp.maximum(lengths[:, None] - j[None, :], 0), axis=1)

    def step(carry, x):
        a, b = carry
        csum, wsum, m = x
        b = (b + a * m + wsum) % _ADLER_MOD
        a = (a + csum) % _ADLER_MOD
        return (a, b), None

    a0 = jnp.int32(adler & 0xFFFF)
    b0 = jnp.int32((adler >> 16) & 0xFFFF)
    (a, b), _ = jax.lax.scan(step, (a0, b0), (csums, wsums, lengths))
    return (b.astype(jnp.uint32) << 16) | a.astype(jnp.uint32)
