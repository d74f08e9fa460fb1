"""End-to-end demo (the web playground analog): compress an image every
way the framework supports and print a size/quality report.

Usage: python examples/demo.py [input.png|input.jpg]
Without an argument, a synthetic photographic test image is used.
"""

import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main() -> None:
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from pixo_tpu import (
        ColorType,
        JpegOptions,
        PngOptions,
        QuantizationMode,
        jpeg,
        png,
    )
    from pixo_tpu.decode import decode_jpeg, decode_png
    from pixo_tpu.cli import load_image
    from pixo_tpu.resize import resize
    from pixo_tpu.options import ResizeFilter, ResizeOptions
    from pixo_tpu.utils.synthetic import synth_gradient

    if len(sys.argv) > 1:
        data = open(sys.argv[1], "rb").read()
        img, w, h, ct = load_image(data)
        if img.shape[2] == 4:
            img = img[..., :3]
        print(f"input: {sys.argv[1]} ({w}x{h}, {len(data)} bytes)")
    else:
        g = synth_gradient(384, 512, 3).astype(np.int32)
        noise = np.random.default_rng(0).integers(-18, 19, g.shape)
        img = np.clip(g + noise, 0, 255).astype(np.uint8)
        h, w = img.shape[:2]
        print(f"input: synthetic photographic {w}x{h}")

    raw = img.nbytes
    results = []

    for name, make in [
        ("JPEG fast q85", lambda: jpeg.encode(img, JpegOptions.fast(w, h, 85))),
        ("JPEG balanced q85", lambda: jpeg.encode(img, JpegOptions.balanced(w, h, 85))),
        ("JPEG max q85 (prog+trellis)", lambda: jpeg.encode(img, JpegOptions.max(w, h, 85))),
        ("PNG fast", lambda: png.encode(
            img, PngOptions.fast(w, h).replace(color_type=ColorType.RGB))),
        ("PNG balanced", lambda: png.encode(
            img, PngOptions.balanced(w, h).replace(color_type=ColorType.RGB))),
        ("PNG max (optimal deflate)", lambda: png.encode(
            img, PngOptions.max(w, h).replace(color_type=ColorType.RGB))),
    ]:
        out = make()
        results.append((name, len(out)))

    lossy = PngOptions.balanced(w, h).replace(color_type=ColorType.RGB)
    lossy.quantization.mode = QuantizationMode.FORCE
    lossy.quantization.max_colors = 128
    lossy.quantization.dithering = True
    results.append(("PNG lossy 128c dithered", len(png.encode(img, lossy))))

    print(f"\n{'codec':30s} {'bytes':>9s} {'vs raw':>8s}")
    for name, n in results:
        print(f"{name:30s} {n:9d} {n / raw * 100:7.1f}%")

    # round-trip + thumbnail
    enc = jpeg.encode(img, JpegOptions.fast(w, h, 90))
    dec = decode_jpeg(enc)
    thumb = resize(dec.pixels, ResizeOptions(
        src_width=w, src_height=h, dst_width=128, dst_height=128,
        color_type=ColorType.RGB, filter=ResizeFilter.LANCZOS3))
    tjpg = jpeg.encode(thumb, JpegOptions.fast(128, 128, 85))
    print(f"\nthumbnail pipeline: decode -> 128x128 lanczos -> re-encode "
          f"= {len(tjpg)} bytes")


if __name__ == "__main__":
    main()
