"""JPEG encoder (baseline, progressive, trellis) — see encoder.py."""

from ..options import JpegOptions, Subsampling
from .encoder import compute_coefficients, encode, encode_batch
from .tables import HuffmanTables, QuantizationTables, ZIGZAG


def encode_into(output: bytearray, data, options: JpegOptions) -> None:
    """Buffer-reuse variant (parity: ``encode_into``, src/jpeg/mod.rs:328)."""
    output.clear()
    output += encode(data, options)

__all__ = [
    "JpegOptions",
    "Subsampling",
    "encode",
    "encode_batch",
    "encode_into",
    "compute_coefficients",
    "HuffmanTables",
    "QuantizationTables",
    "ZIGZAG",
]
