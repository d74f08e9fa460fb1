"""Decoders: PNG (chunk parse + inflate + unfilter) and JPEG (baseline).

Capability parity with pixo ``src/decode/`` (feature `cli`): the entropy
stages run on host (INFLATE / Huffman decode are inherently serial), the
pixel math (dequant + IDCT + upsample + color, bit-depth expansion) runs
as batched device kernels.
"""

from .png_decoder import PngImage, decode_png
from .jpeg_decoder import JpegImage, decode_jpeg
from .batch import decode_jpeg_batch, decode_png_batch

__all__ = [
    "PngImage", "JpegImage", "decode_png", "decode_jpeg",
    "decode_png_batch", "decode_jpeg_batch",
]
