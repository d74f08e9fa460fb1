"""Threaded batch decode: the decode-side analog of the encode batch APIs.

The entropy stages (INFLATE, Huffman decode) are host-serial per file but
independent across files, and the native decoders release the GIL, so a
thread pool gives true host parallelism (the same contract as the
threaded native packing on the encode side; reference analog: rayon
work-stealing, ``Cargo.toml:47``). The thumbnail pipeline uses the same
pattern internally (``parallel/pipeline.py``); these are the standalone
surfaces.
"""

from __future__ import annotations

import concurrent.futures
import functools
from typing import Callable, List, Sequence

from .jpeg_decoder import JpegImage, decode_jpeg
from .png_decoder import PngImage, decode_png


def _map_threaded(fn: Callable, files: Sequence[bytes], workers: int) -> list:
    if len(files) <= 1:
        return [fn(f) for f in files]
    with concurrent.futures.ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(fn, files))


def decode_png_batch(
    files: Sequence[bytes],
    *,
    keep_bit_depth: bool = False,
    workers: int = 8,
) -> List[PngImage]:
    """Decode many PNGs concurrently on host threads (order preserved)."""
    fn = functools.partial(decode_png, keep_bit_depth=keep_bit_depth)
    return _map_threaded(fn, files, workers)


def decode_jpeg_batch(
    files: Sequence[bytes],
    *,
    fancy_upsampling: bool = False,
    workers: int = 8,
) -> List[JpegImage]:
    """Decode many JPEGs concurrently on host threads (order preserved)."""
    fn = functools.partial(decode_jpeg, fancy_upsampling=fancy_upsampling)
    return _map_threaded(fn, files, workers)
