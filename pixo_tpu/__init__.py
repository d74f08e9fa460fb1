"""pixo_tpu — a TPU-native batched image codec framework.

A from-scratch rebuild of the capabilities of the pixo image compression
library (PNG/JPEG encode + decode, DEFLATE stack, resize, lossy palette
quantization, CLI) designed array-first for TPUs: the pixel-parallel math
runs as fused JAX/Pallas kernels over batched ``[B, H, W, C]`` arrays, the
inherently sequential bit-stream assembly runs as a thin native (C++)
host stage, and batches shard across chips with ``jax.sharding``.

Public API mirrors pixo's (``src/lib.rs``):

    from pixo_tpu import png, jpeg, resize, decode
    from pixo_tpu import ColorType, PngOptions, JpegOptions

    jpeg_bytes = jpeg.encode(pixels, JpegOptions.fast(w, h, quality=85))
    png_bytes  = png.encode(pixels, PngOptions.balanced(w, h))

plus batched entry points (``jpeg.encode_batch``, ``png.encode_batch``)
that are the real TPU workhorses.
"""

from . import errors
from .color import ColorType, rgb_to_ycbcr
from .options import (
    FilterStrategy,
    JpegOptions,
    PngOptions,
    QuantizationMode,
    QuantizationOptions,
    ResizeFilter,
    ResizeOptions,
    Subsampling,
)

__version__ = "0.5.0"

from . import jpeg  # noqa: E402
from . import png  # noqa: E402

__all__ = [
    "ColorType",
    "FilterStrategy",
    "JpegOptions",
    "PngOptions",
    "QuantizationMode",
    "QuantizationOptions",
    "ResizeFilter",
    "ResizeOptions",
    "Subsampling",
    "errors",
    "jpeg",
    "png",
    "rgb_to_ycbcr",
    "__version__",
]
