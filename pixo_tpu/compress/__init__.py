"""From-scratch DEFLATE/LZ77/Huffman stack + checksums (host stage)."""

from .checksums import adler32, crc32, Crc32

__all__ = ["adler32", "crc32", "Crc32"]
