"""JPEG encoder (baseline, progressive, trellis) — see encoder.py."""

from ..options import JpegOptions, Subsampling
from .encoder import compute_coefficients, encode, encode_batch
from .tables import HuffmanTables, QuantizationTables, ZIGZAG

__all__ = [
    "JpegOptions",
    "Subsampling",
    "encode",
    "encode_batch",
    "compute_coefficients",
    "HuffmanTables",
    "QuantizationTables",
    "ZIGZAG",
]
