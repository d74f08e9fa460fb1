"""Public resize API (parity: pixo ``src/resize.rs:163-293``)."""

from __future__ import annotations

import numpy as np

from . import errors
from .options import ResizeFilter, ResizeOptions
from .ops.resize_kernels import resize_bilinear, resize_lanczos3, resize_nearest

MAX_RESIZE_DIMENSION = 1 << 24


def resize(data, options: ResizeOptions) -> np.ndarray:
    """Resize an image; accepts flat bytes or [H, W, C] uint8 array.

    Returns a [dst_h, dst_w, C] uint8 array (C = bytes/pixel; squeezed for
    grayscale input arrays of shape [H, W]).
    """
    sw, sh = options.src_width, options.src_height
    dw, dh = options.dst_width, options.dst_height
    if sw == 0 or sh == 0:
        raise errors.InvalidDimensions(sw, sh)
    if dw == 0 or dh == 0:
        raise errors.InvalidDimensions(dw, dh)
    for dim in (sw, sh, dw, dh):
        if dim > MAX_RESIZE_DIMENSION:
            raise errors.ImageTooLarge(dw, dh, MAX_RESIZE_DIMENSION)
    bpp = options.color_type.bytes_per_pixel

    squeeze = False
    if isinstance(data, np.ndarray):
        if data.ndim == 2:
            arr = data[..., None]
            squeeze = True
        else:
            arr = data
        arr = np.ascontiguousarray(arr, dtype=np.uint8)
        if arr.shape != (sh, sw, bpp):
            expected = sh * sw * bpp
            raise errors.InvalidDataLength(expected, arr.size)
    else:
        expected = sh * sw * bpp
        if len(data) != expected:
            raise errors.InvalidDataLength(expected, len(data))
        arr = np.frombuffer(bytes(data), np.uint8).reshape(sh, sw, bpp)

    if (sw, sh) == (dw, dh):
        out = arr.copy()
    elif options.filter == ResizeFilter.NEAREST:
        out = np.asarray(resize_nearest(arr, dst_w=dw, dst_h=dh))
    elif options.filter == ResizeFilter.BILINEAR:
        out = np.asarray(resize_bilinear(arr, dst_w=dw, dst_h=dh))
    else:
        out = None
        if _resize_tier() == "host":
            out = _lanczos_host(arr, dw, dh)
        if out is None:
            out = np.asarray(resize_lanczos3(arr, dst_w=dw, dst_h=dh))

    return out[..., 0] if squeeze else out


def _resize_tier() -> str:
    """"device" (jnp kernels, default) or "host" (native AVX2 Lanczos —
    no XLA dispatch; the one-shot CLI latency tier).  PIXO_TPU_RESIZE
    overrides.  Tiers are bit-identical (tests/test_resize.py)."""
    import os

    return os.environ.get("PIXO_TPU_RESIZE", "device")


def _lanczos_host(arr: np.ndarray, dw: int, dh: int):
    from .native import native_resize_lanczos3
    from .ops.resize_kernels import lanczos_taps

    h, w = arr.shape[:2]
    sx, wx = lanczos_taps(w, dw)
    sy, wy = lanczos_taps(h, dh)
    return native_resize_lanczos3(arr, sx, wx, sy, wy)


def resize_into(output: bytearray, data, options: ResizeOptions) -> None:
    """Buffer-reuse variant (parity: ``resize_into``, src/resize.rs:180)."""
    output.clear()
    output += resize(data, options).tobytes()
