"""PNG encoder: device filter bank + native DEFLATE + chunk framing.

Pipeline parity with pixo ``encode_into`` (``src/png/mod.rs:437-590``):
validate -> [quantization] -> color-type/palette reduction -> signature +
IHDR (+PLTE/tRNS) -> alpha optimization -> per-row filtering (device
kernel) -> DEFLATE(zlib) -> IDAT 256 KiB chunks -> IEND.

TPU-first: filtering for the whole image (and, in ``encode_batch``, the
whole batch) is one fused device dispatch; DEFLATE is the native host
stage (the device/host split mandated by BASELINE.json).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from .. import errors
from ..color import ColorType
from ..compress.deflate import deflate_optimal_zlib, deflate_zlib
from ..options import (
    MAX_DIMENSION,
    FilterStrategy,
    PngOptions,
    QuantizationMode,
)
from ..ops.png_filters import apply_filters
from . import chunks, reduce


def _validate(options: PngOptions, data_len: int) -> int:
    """data_len counts samples at 8-bit (any input dtype is cast to u8,
    the historical contract) and BYTES at 16-bit; returns bytes/pixel at
    the option depth."""
    if not (1 <= options.compression_level <= 9):
        raise errors.InvalidCompressionLevel(options.compression_level)
    if options.bit_depth not in (8, 16):
        raise errors.CompressionError(
            f"unsupported bit depth {options.bit_depth} (8 or 16)"
        )
    w, h = options.width, options.height
    if w == 0 or h == 0:
        raise errors.InvalidDimensions(w, h)
    if w > MAX_DIMENSION or h > MAX_DIMENSION:
        raise errors.ImageTooLarge(w, h, MAX_DIMENSION)
    bpp = options.color_type.bytes_per_pixel * (options.bit_depth // 8)
    expected = w * h * bpp
    if data_len != expected:
        raise errors.InvalidDataLength(expected, data_len)
    return bpp


def _as_pixels(data, options: PngOptions, bpp: int) -> np.ndarray:
    """-> [N, bpp] uint8 pixel matrix."""
    if isinstance(data, np.ndarray):
        arr = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    else:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
    return arr.reshape(-1, bpp)


def _compress(filtered: bytes, options: PngOptions) -> bytes:
    if options.optimal_compression:
        return deflate_optimal_zlib(filtered, 5)
    # packed=True: the reference PNG path is deflate_zlib_packed (no
    # block splitting) — matters only in parity mode
    return deflate_zlib(filtered, options.compression_level, packed=True)


# Adam7 pass grid (x_start, y_start, x_step, y_step): the decoder owns
# the canonical table (PNG spec §8.2); sharing it keeps encode/decode in
# lockstep. Beyond parity: the reference has no interlace on either side.
from ..decode.png_decoder import ADAM7_PASSES as _ADAM7  # noqa: E402


def _filter_adam7(
    samples: np.ndarray,
    width: int,
    height: int,
    bit_depth: int,
    bpp: int,
    strategy: FilterStrategy,
    verbose_filter_log: bool = False,
) -> bytes:
    """Filter an image as 7 Adam7 passes and concatenate the streams.

    ``samples`` is [H, W, bpp] uint8 for bit_depth == 8, or [H, W] raw
    (unpacked) samples for bit_depth < 8 — each pass is its own reduced
    image: rows re-packed at the pass width, filtered independently
    (filters never cross pass boundaries, PNG spec §8.2).
    """
    parts = []
    for x0, y0, dx, dy in _ADAM7:
        sub = samples[y0::dy, x0::dx]
        ph, pw = sub.shape[:2]
        if ph == 0 or pw == 0:
            continue
        if bit_depth == 8:
            row_bytes = pw * bpp
            payload = np.ascontiguousarray(sub).tobytes()
            fbpp = bpp
        else:
            payload = reduce.pack_bits_rows(
                np.ascontiguousarray(sub).reshape(-1), pw, bit_depth
            )
            row_bytes = (pw * bit_depth + 7) // 8
            fbpp = 1
        parts.append(
            apply_filters(
                payload, pw, ph, row_bytes, fbpp, strategy,
                verbose_filter_log=verbose_filter_log,
            )
        )
    return b"".join(parts)


def _finish(out: bytearray, filtered: bytes, options: PngOptions) -> bytes:
    """DEFLATE the filtered stream and close the file (IDAT + IEND)."""
    compressed = _compress(filtered, options)
    chunks.write_idat_chunks(out, compressed)
    chunks.write_iend(out)
    return bytes(out)


def encode(data, options: PngOptions, *, filter_fn=None) -> bytes:
    """Encode one image (flat bytes or [H, W, C] uint8 array) to PNG bytes.

    ``filter_fn`` overrides the filtering stage (same signature as
    ``apply_filters`` minus the keyword args); used by the row-sharded
    tensor-parallel path (``parallel.encode_png_row_sharded``).
    """
    if isinstance(data, np.ndarray):
        # element count at 8-bit (any dtype is cast to u8, the historical
        # behavior); byte count at 16-bit, where a 2-byte dtype counts 2
        data_len = data.size * (
            data.dtype.itemsize
            if options.bit_depth == 16 and data.dtype.itemsize == 2 else 1
        )
    else:
        data_len = len(data)
    bpp = _validate(options, data_len)
    w, h = options.width, options.height

    if options.bit_depth == 16:
        # Beyond parity (the reference encoder is 8-bit only): filtering
        # operates on the big-endian byte stream with the PNG-mandated
        # byte offset bpp = channels*2; quantization and the 8-bit
        # reductions do not apply at this depth.
        if options.quantization.mode != QuantizationMode.OFF:
            raise errors.CompressionError(
                "quantization requires 8-bit input"
            )
        if isinstance(data, np.ndarray) and data.dtype.itemsize == 2:
            if data.dtype.kind != "u":
                raise errors.CompressionError(
                    f"16-bit input must be uint16 or raw bytes, got {data.dtype}"
                )
            # byteorder-agnostic: astype('>u2') normalizes '<u2'/'=u2'/'>u2'
            payload16 = data.astype(">u2").tobytes()
        elif isinstance(data, np.ndarray):
            if data.dtype != np.uint8:
                raise errors.CompressionError(
                    f"16-bit input must be uint16 or raw bytes, got {data.dtype}"
                )
            payload16 = np.ascontiguousarray(data).tobytes()
        else:
            payload16 = bytes(data)  # already big-endian sample bytes
        out = bytearray()
        out += chunks.PNG_SIGNATURE
        chunks.write_ihdr(
            out, w, h, 16, options.color_type.png_color_type,
            interlace=1 if options.interlace else 0,
        )
        if options.interlace:
            if filter_fn is not None:
                raise errors.CompressionError(
                    "filter_fn override is incompatible with interlaced output"
                )
            samples = np.frombuffer(payload16, np.uint8).reshape(h, w, bpp)
            filtered = _filter_adam7(
                samples, w, h, 8, bpp, options.filter_strategy,
                verbose_filter_log=options.verbose_filter_log,
            )
        elif filter_fn is not None:
            filtered = filter_fn(
                payload16, w, h, w * bpp, bpp, options.filter_strategy
            )
        else:
            filtered = apply_filters(
                payload16, w, h, w * bpp, bpp, options.filter_strategy,
                verbose_filter_log=options.verbose_filter_log,
            )
        return _finish(out, filtered, options)

    pixels = _as_pixels(data, options, bpp)

    # Quantization decision (parity: src/png/mod.rs:470-512)
    mode = options.quantization.mode
    max_colors = min(options.quantization.max_colors, 256)
    should_quantize = False
    if mode == QuantizationMode.FORCE:
        should_quantize = options.color_type in (ColorType.RGB, ColorType.RGBA)
    elif mode == QuantizationMode.AUTO:
        if options.color_type in (ColorType.RGB, ColorType.RGBA):
            from . import quantize as q

            should_quantize = q.should_quantize_auto(pixels, max_colors)

    if should_quantize:
        from . import quantize as q

        palette_rgba, indices = q.quantize_image(
            pixels, w, h, max_colors, options.quantization.dithering
        )
        plte = palette_rgba[:, :3]
        alpha = reduce.maybe_trim_transparency(palette_rgba[:, 3])
        return encode_indexed(indices, w, h, plte, alpha, options)

    out = bytearray()
    out += chunks.PNG_SIGNATURE

    red = reduce.maybe_reduce_color_type(
        pixels, w, h, options.color_type,
        options.reduce_color_type, options.reduce_palette,
    )
    chunks.write_ihdr(
        out, w, h, red.bit_depth, red.color_type_byte,
        interlace=1 if options.interlace else 0,
    )

    if red.palette is not None:
        chunks.write_chunk(out, b"PLTE", red.palette[:, :3].tobytes())
        if (red.palette[:, 3] != 255).any():
            chunks.write_chunk(out, b"tRNS", red.palette[:, 3].tobytes())

    payload = red.data
    if options.optimize_alpha and red.palette is None and red.effective_color_type in (
        ColorType.RGBA, ColorType.GRAY_ALPHA
    ):
        px = np.frombuffer(payload, dtype=np.uint8).reshape(-1, red.bytes_per_pixel)
        payload = reduce.optimize_alpha(px, red.effective_color_type).tobytes()

    if options.interlace:
        if filter_fn is not None:
            # Adam7 filters per pass through its own path; a per-row
            # filter override (the row-sharded dispatch) cannot apply.
            # Fail loudly rather than silently ignoring the override.
            raise errors.CompressionError(
                "filter_fn override is incompatible with interlaced output"
            )
        if red.bit_depth == 8:
            samples = np.frombuffer(payload, np.uint8).reshape(
                h, w, red.bytes_per_pixel
            )
        else:
            samples = red.samples.reshape(h, w)
        filtered = _filter_adam7(
            samples, w, h, red.bit_depth, red.bytes_per_pixel,
            options.filter_strategy,
            verbose_filter_log=options.verbose_filter_log,
        )
        return _finish(out, filtered, options)

    if red.bit_depth < 8:
        row_bytes = (w * red.bit_depth + 7) // 8
    else:
        row_bytes = w * red.bytes_per_pixel

    if filter_fn is not None:
        filtered = filter_fn(
            payload, w, h, row_bytes, red.bytes_per_pixel,
            options.filter_strategy,
        )
    else:
        filtered = apply_filters(
            payload, w, h, row_bytes, red.bytes_per_pixel,
            options.filter_strategy,
            verbose_filter_log=options.verbose_filter_log,
        )
    # strip_metadata: our encoder writes no ancillary metadata chunks, so
    # stripping is a no-op here (recompression paths strip via decode.strip).
    return _finish(out, filtered, options)


def encode_indexed(
    data,
    width: int,
    height: int,
    palette: np.ndarray,
    transparency: Optional[np.ndarray] = None,
    options: Optional[PngOptions] = None,
) -> bytes:
    """Encode pre-indexed data with an explicit palette.

    Parity: ``encode_indexed_into`` (``src/png/mod.rs:1814-1886``) —
    8-bit indexed, palette-aware filter override (adaptive -> None).
    """
    options = options or PngOptions(width=width, height=height)
    palette = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    if not (1 <= len(palette) <= 256):
        raise errors.CompressionError(
            f"Invalid palette length: {len(palette)} (must be 1-256)"
        )
    if transparency is not None:
        transparency = np.asarray(transparency, dtype=np.uint8).reshape(-1)
        if len(transparency) > len(palette):
            raise errors.CompressionError(
                f"Transparency length {len(transparency)} exceeds palette "
                f"length {len(palette)}"
            )
    if isinstance(data, np.ndarray):
        indexed = np.ascontiguousarray(data, dtype=np.uint8).reshape(-1)
    else:
        indexed = np.frombuffer(bytes(data), dtype=np.uint8)
    expected = width * height
    if indexed.size != expected:
        raise errors.InvalidDataLength(expected, indexed.size)

    out = bytearray()
    out += chunks.PNG_SIGNATURE
    chunks.write_ihdr(
        out, width, height, 8, 3,
        interlace=1 if options.interlace else 0,
    )
    chunks.write_chunk(out, b"PLTE", palette.tobytes())
    if transparency is not None:
        chunks.write_chunk(out, b"tRNS", transparency.tobytes())

    strategy = options.filter_strategy
    if strategy in (
        FilterStrategy.ADAPTIVE,
        FilterStrategy.ADAPTIVE_FAST,
        FilterStrategy.MIN_SUM,
        FilterStrategy.BIGRAMS,
    ):
        strategy = FilterStrategy.NONE

    if options.interlace:
        filtered = _filter_adam7(
            indexed.reshape(height, width, 1), width, height, 8, 1,
            strategy, verbose_filter_log=options.verbose_filter_log,
        )
    else:
        filtered = apply_filters(
            indexed.tobytes(), width, height, width, 1, strategy,
            verbose_filter_log=options.verbose_filter_log,
        )
    return _finish(out, filtered, options)


_BATCH_FALLBACK_WARNED = False


def _accelerated_backend() -> bool:
    """True when the default jax backend is an accelerator.

    A seam: tests of the fallback policy patch THIS (not
    jax.default_backend globally, which would also flip kernel-tier
    switches like the Pallas filter bank onto the wrong platform)."""
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        return False



def encode_batch(imgs: np.ndarray, options: PngOptions) -> List[bytes]:
    """Encode a batch [B, H, W, C] of same-shape images.

    On an accelerator backend this delegates to the fused sharded
    pipeline (one batched device filter dispatch + threaded host DEFLATE,
    ``parallel.encode_png_batch_sharded`` — bytes equal per-image
    ``encode``, tested there). On the CPU backend the per-image native
    filter tier (AVX2) beats the XLA-CPU batch dispatch by ~8x, so images
    encode individually on a thread pool instead (the native stages
    release the GIL; same bytes).
    """
    if _accelerated_backend():
        try:
            from ..parallel import encode_png_batch_sharded

            return encode_png_batch_sharded(imgs, options)
        except errors.PixoError:
            raise  # validation/encode errors are real; don't re-encode
        except (RuntimeError, OSError) as e:
            # Backend/mesh init failures only (jax runtime errors derive
            # from RuntimeError): degrade to the host path, but say so —
            # a silent fallback would hide sharding regressions as a perf
            # cliff.  Anything else (TypeError, ValueError, ...) is a
            # bug in the batch path and must surface.
            global _BATCH_FALLBACK_WARNED
            if not _BATCH_FALLBACK_WARNED:
                _BATCH_FALLBACK_WARNED = True
                import warnings

                warnings.warn(
                    "encode_batch: sharded device path failed "
                    f"({type(e).__name__}: {e}); falling back to per-image "
                    "host encode",
                    RuntimeWarning,
                    stacklevel=2,
                )
    if imgs.shape[0] > 1:
        import concurrent.futures

        with concurrent.futures.ThreadPoolExecutor(max_workers=8) as ex:
            return list(ex.map(lambda i: encode(imgs[i], options),
                               range(imgs.shape[0])))
    return [encode(imgs[i], options) for i in range(imgs.shape[0])]
