"""PNG encoder (lossless + lossy palette quantization) — see encoder.py."""

from ..options import FilterStrategy, PngOptions, QuantizationMode
from .encoder import encode, encode_batch, encode_indexed

__all__ = [
    "FilterStrategy",
    "PngOptions",
    "QuantizationMode",
    "encode",
    "encode_batch",
    "encode_indexed",
]
