"""DEFLATE front-end: native C++ stack with stdlib fallback.

The production path is the from-scratch C++ DEFLATE in pixo_tpu/native
(hash-chain LZ77 + lazy matching + dynamic/fixed/stored blocks), the
architectural rebuild of pixo ``src/compress/{lz77,deflate,huffman}.rs``.
When the native library is unavailable the Python ``zlib`` module serves
as the fallback (valid, equivalent-ratio output).
"""

from __future__ import annotations

import zlib as _zlib


def _parity_default() -> bool:
    import os

    return os.environ.get("PIXO_TPU_DEFLATE_PARITY") == "1"


def deflate_zlib(
    data: bytes, level: int = 6, parity: bool = None, packed: bool = False
) -> bytes:
    """zlib-wrapped DEFLATE stream at the given level (1-9).

    ``parity=True`` (or ``PIXO_TPU_DEFLATE_PARITY=1``) selects the
    reference-parity decision layer: the reference's exact matcher
    traversal, level ladder, lazy/incompressible state machines, block
    policy, entropy gate, stream-level stored comparison, and (round 3)
    its exact BinaryHeap+Kraft Huffman table build — byte-verified
    against the pixo WASM oracle (tests/test_oracle_parity.py).

    ``packed=True`` selects the reference's deflate_zlib_packed policy
    (compress_packed_zlib, deflate.rs:972-1062) — the path every
    reference PNG encode takes: never block-splits, literal-only
    streams >= 8 KiB go stored.  ``packed=False`` mirrors the general
    deflate_zlib: level>=5 inputs in (1 KiB, 512 KiB] use the
    coarse-to-fine block split search.  Ignored outside parity mode.

    Default (parity off) is the performance path: never-worse
    exact-cost decisions and the deeper level-2/6 search.
    """
    from ..native import native_deflate

    if parity is None:
        parity = _parity_default()
    out = native_deflate(data, level, True, parity=parity, packed=packed)
    if out is not None:
        return out
    return _zlib.compress(data, level)


def deflate_raw(
    data: bytes, level: int = 6, parity: bool = None, packed: bool = False
) -> bytes:
    """Raw DEFLATE stream (no zlib wrapper)."""
    from ..native import native_deflate

    if parity is None:
        parity = _parity_default()
    out = native_deflate(data, level, False, parity=parity, packed=packed)
    if out is not None:
        return out
    c = _zlib.compressobj(level, _zlib.DEFLATED, -15)
    return c.compress(data) + c.flush()


def deflate_optimal_zlib(data: bytes, iterations: int = 5) -> bytes:
    """Zopfli-style iterative optimal parse (pixo ``deflate_optimal_zlib``):
    per-position sublen match tables + entropy cost model + shortest-path
    DP, iterated. Falls back to max-level greedy when native unavailable.

    ``PIXO_TPU_LZ77=device`` routes the match-table build's first chain
    steps through the device (hash bucketing + batched match-length
    scoring, ``ops/lz77_assist.chain_candidates``); the host walks only
    chain tails. Byte-identical output either way. Off by default: the
    dev tunnel's MB/s d2h makes shipping [N, K] candidate tables a net
    loss — flip it on real PCIe/ICI hosts.
    """
    import os

    from ..native import native_deflate_optimal, native_deflate_optimal_parity

    if _parity_default():
        # Parity mode: the reference's exact iterative-refinement path
        # (deflate_optimal_zlib mirror — log2f cost model, cached sublen
        # squeeze, stats blending, split search), byte-identical to the
        # WASM oracle (tests/test_oracle_parity.py).
        out = native_deflate_optimal_parity(data, iterations)
        if out is not None:
            return out

    out = None
    if os.environ.get("PIXO_TPU_LZ77") == "device" and data:
        out = _deflate_optimal_device_assisted(data, iterations)
    if out is None:
        out = native_deflate_optimal(data, iterations, True)
    greedy = deflate_zlib(data, 9)
    if out is not None and len(out) < len(greedy):
        return out
    return greedy


def _deflate_optimal_device_assisted(data: bytes, iterations: int):
    import numpy as np

    from ..native import native_deflate_optimal_assisted
    from ..ops.lz77_assist import chain_candidates

    arr = np.frombuffer(data, dtype=np.uint8)
    cand, lens = chain_candidates(arr, k=16)
    return native_deflate_optimal_assisted(
        data, iterations, True, np.asarray(cand), np.asarray(lens)
    )


def _zlib_inflate_capped(data: bytes, wbits: int, expected_size: int | None) -> bytes:
    """zlib fallback with the same decompression-bomb guard as the native
    path: never materialize more than expected_size+1 bytes (the +1 makes
    oversize detectable), and reject trailing unconsumed compressed input."""
    if expected_size is None:
        return _zlib.decompress(data, wbits)
    from ..errors import InvalidDecode

    d = _zlib.decompressobj(wbits)
    try:
        out = d.decompress(data, expected_size + 1)
    except _zlib.error as e:
        raise InvalidDecode(f"inflate failed: {e}") from e
    if len(out) > expected_size:
        raise InvalidDecode(
            f"inflated output exceeds expected size {expected_size}"
        )
    if d.unconsumed_tail:
        raise InvalidDecode("inflate: compressed input after expected output")
    return out


def inflate_zlib(data: bytes, expected_size: int | None = None) -> bytes:
    """Inverse of deflate_zlib; uses the native INFLATE when available."""
    from ..native import native_inflate

    if expected_size is not None:
        out = native_inflate(data, expected_size, True)
        if out is not None:
            return out
    return _zlib_inflate_capped(data, _zlib.MAX_WBITS, expected_size)


def inflate_raw(data: bytes, expected_size: int | None = None) -> bytes:
    from ..native import native_inflate

    if expected_size is not None:
        out = native_inflate(data, expected_size, False)
        if out is not None:
            return out
    return _zlib_inflate_capped(data, -15, expected_size)
