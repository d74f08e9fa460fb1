"""From-scratch DEFLATE/LZ77/Huffman stack + checksums (host stage)."""

from .checksums import adler32, crc32, Crc32
from .deflate import (
    deflate_optimal_zlib,
    deflate_raw,
    deflate_zlib,
    inflate_raw,
    inflate_zlib,
)
from .huffman import build_code_lengths, build_codes, generate_canonical_codes

__all__ = [
    "adler32",
    "crc32",
    "Crc32",
    "deflate_zlib",
    "deflate_raw",
    "deflate_optimal_zlib",
    "inflate_zlib",
    "inflate_raw",
    "build_code_lengths",
    "build_codes",
    "generate_canonical_codes",
]
