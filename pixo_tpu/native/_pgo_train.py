"""PGO training battery for the native tier.

Run as a subprocess by ``pixo_tpu.native._try_build`` between the
``-fprofile-generate`` and ``-fprofile-use`` compiles: it exercises every
hot native entry point through the public package API with deterministic
synthetic inputs, so the optimized build has real branch/count profiles
for the DEFLATE matcher, the JPEG coefficient+pack pipeline, the PNG
filter bank, decode, resize and the palette kernels.  Functions that a
profile-use build never saw executed are laid out as cold by GCC, so
coverage here is a performance matter, not just a nicety.

Keep this fast (~10-20 s on one slow core) and fully deterministic: no
wall-clock, no RNG without a fixed seed, no network, no fixture files.
"""

import os
import sys

# The training build must never try to reach a TPU: force the CPU backend
# before anything imports jax.
os.environ["JAX_PLATFORMS"] = "cpu"  # never touch a TPU tunnel at build time
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
# Pin every tier to the native host path: the point of training is the
# NATIVE library's profile, and skipping XLA dispatch keeps the whole
# battery to a few seconds (no CPU-backend compiles at build time).
os.environ["PIXO_TPU_COEFFS"] = "host"
os.environ["PIXO_TPU_RESIZE"] = "host"
os.environ["PIXO_TPU_TRELLIS"] = "host"
os.environ["PIXO_TPU_QUANTIZE"] = "host"
os.environ["PIXO_TPU_PNG_FILTER"] = "native"
os.environ["PIXO_TPU_DECODE_PIXELS"] = "host"

import numpy as np  # noqa: E402


def _payloads():
    rng = np.random.default_rng(0)
    text = (b"the quick brown fox jumps over the lazy dog. " * 6000)[: 256 << 10]
    rand = rng.integers(0, 256, 256 << 10, dtype=np.uint8).tobytes()
    # photo-like residual rows: smooth noise differentiated along rows
    base = rng.normal(0, 40, (128, 2048)).cumsum(axis=1)
    photo = np.diff(base, axis=1, prepend=0).astype(np.int16).astype(np.uint8).tobytes()
    # gradient residuals: long zero runs with periodic nonzeros
    ramp = np.tile(np.arange(2048, dtype=np.uint8), (128, 1))
    resid = np.diff(ramp.astype(np.int16), axis=1, prepend=0).astype(np.uint8).tobytes()
    # Sub-filtered interleaved RGB rows: the photographic-residual class the
    # PNG encoder actually deflates (bpp-strided diffs of smooth channels)
    yy, xx = np.mgrid[0:96, 0:1024].astype(np.float32)
    chans = [
        np.clip(120 + 70 * np.sin(yy / 11 + k) + 50 * np.cos(xx / 17 - k)
                + rng.normal(0, 12, (96, 1024)), 0, 255)
        for k in range(3)
    ]
    rgb = np.stack(chans, -1).astype(np.uint8)
    rows = rgb.reshape(96, -1).astype(np.int16)
    sub = (rows - np.concatenate([np.zeros((96, 3), np.int16), rows[:, :-3]], 1))
    subresid = sub.astype(np.uint8).tobytes()
    return [text, rand, photo, resid, subresid]


def train_deflate():
    from pixo_tpu.compress.deflate import (
        deflate_optimal_zlib,
        deflate_zlib,
        inflate_zlib,
    )

    for payload in _payloads():
        for level in (1, 2, 6, 9):
            out = deflate_zlib(payload, level)
            assert inflate_zlib(out, len(payload)) == payload
        # the parity decision layer has its own matcher/emitter
        deflate_zlib(payload[: 64 << 10], 6, parity=True)
    deflate_optimal_zlib(_payloads()[0][: 32 << 10], 3)


def train_codecs():
    import pixo_tpu
    from pixo_tpu import ColorType, JpegOptions, PngOptions, Subsampling
    from pixo_tpu import decode, jpeg, png

    rng = np.random.default_rng(1)
    yy, xx = np.mgrid[0:160, 0:160].astype(np.float32)
    smooth = (
        96
        + 80 * np.sin(yy / 17.0)
        + 60 * np.cos(xx / 23.0)
        + rng.normal(0, 6, (160, 160))
    )
    img = np.clip(
        np.stack([smooth, np.roll(smooth, 7, 0), np.roll(smooth, 13, 1)], -1),
        0,
        255,
    ).astype(np.uint8)
    h, w = img.shape[:2]

    # JPEG: baseline fused fast path, 420/444, optimized-huffman, progressive
    for sub in (Subsampling.S420, Subsampling.S444):
        opts = JpegOptions(width=w, height=h, quality=85, subsampling=sub)
        blob = jpeg.encode(img, opts)
        decode.decode_jpeg(blob)
    opts = JpegOptions(width=w, height=h, quality=85, subsampling=Subsampling.S420)
    opts.optimize_huffman = True
    jpeg.encode(img, opts)
    jpeg.encode(img, JpegOptions.from_preset(w, h, 85, 2))  # progressive+trellis
    jpeg.encode_batch(
        np.stack([img, img[:, ::-1]]),
        JpegOptions(width=w, height=h, quality=80, subsampling=Subsampling.S420),
    )

    # PNG: filter bank + DEFLATE + decode (fast and balanced presets)
    for preset in (0, 1):
        p = PngOptions.from_preset(w, h, preset)
        p.color_type = ColorType.RGB
        blob = png.encode(img, p)
        decode.decode_png(blob)
    # lossy palette path: quantize + dither + indexed encode
    p = PngOptions.from_preset(w, h, 1)
    p.color_type = ColorType.RGBA
    rgba = np.dstack([img, np.full((h, w), 255, np.uint8)])
    from pixo_tpu.options import QuantizationMode, QuantizationOptions

    p.quantization = QuantizationOptions(mode=QuantizationMode.AUTO, dithering=True)
    png.encode(rgba, p)

    # resize both directions
    from pixo_tpu import resize as rz
    from pixo_tpu.options import ResizeFilter, ResizeOptions

    for dw, dh in ((64, 64), (320, 320)):
        rz.resize(
            img,
            ResizeOptions(
                src_width=w,
                src_height=h,
                dst_width=dw,
                dst_height=dh,
                color_type=ColorType.RGB,
                filter=ResizeFilter.LANCZOS3,
            ),
        )

    # checksums
    from pixo_tpu.native import native_adler32, native_crc32

    p = PngOptions.from_preset(w, h, 0)
    p.color_type = ColorType.RGB
    blob = png.encode(img, p)
    native_adler32(blob)
    native_crc32(blob)
    assert pixo_tpu.__version__


def main() -> int:
    train_deflate()
    try:
        train_codecs()
    except Exception as exc:  # pragma: no cover - training is best-effort
        # deflate profiles alone still cover the matcher; don't fail the
        # build over an optional surface
        print(f"pgo-train: codec battery skipped: {exc}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
