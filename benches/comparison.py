"""Cross-library comparison bench (the criterion benches/comparison.rs
analog): our encoders vs Pillow (libjpeg/zlib-backed) on synthetic and
reference-fixture content. Reports sizes and times.

Usage: python benches/comparison.py [--device cpu|default]
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, min_time=0.3):
    fn()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < min_time:
        fn()
        n += 1
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()
    if args.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from PIL import Image

    from pixo_tpu import ColorType, JpegOptions, PngOptions, jpeg, png
    from pixo_tpu.utils.synthetic import synth_gradient, synth_noise, synth_text_like

    cases = {
        "gradient-512": synth_gradient(512, 512, 3),
        "noise-256": synth_noise(256, 256, 3),
        "text-512": synth_text_like(512, 512, 3),
    }
    fixtures = Path("/root/reference/tests/fixtures")
    if fixtures.is_dir():
        for name in ("rocket.png", "avatar-color.png"):
            p = fixtures / name
            if p.exists():
                img = Image.open(p)
                img.load()
                cases[name] = np.asarray(img.convert("RGB"))

    print(f"{'case':18s} {'codec':28s} {'bytes':>9s} {'ms':>8s}")
    for name, img in cases.items():
        h, w = img.shape[:2]

        jopts = JpegOptions(width=w, height=h, quality=85, color_type=ColorType.RGB)
        t = timeit(lambda: jpeg.encode(img, jopts))
        size = len(jpeg.encode(img, jopts))
        print(f"{name:18s} {'pixo_tpu jpeg q85':28s} {size:9d} {t*1e3:8.2f}")

        jopts_max = JpegOptions.max(w, h, 85)
        t = timeit(lambda: jpeg.encode(img, jopts_max), min_time=0.1)
        size = len(jpeg.encode(img, jopts_max))
        print(f"{name:18s} {'pixo_tpu jpeg max preset':28s} {size:9d} {t*1e3:8.2f}")

        buf = io.BytesIO()

        def pil_jpeg():
            b = io.BytesIO()
            Image.fromarray(img, "RGB").save(b, "JPEG", quality=85)
            return b

        t = timeit(pil_jpeg)
        size = len(pil_jpeg().getvalue())
        print(f"{name:18s} {'Pillow/libjpeg q85':28s} {size:9d} {t*1e3:8.2f}")

        popts = PngOptions.balanced(w, h).replace(color_type=ColorType.RGB)
        t = timeit(lambda: png.encode(img, popts), min_time=0.1)
        size = len(png.encode(img, popts))
        print(f"{name:18s} {'pixo_tpu png balanced':28s} {size:9d} {t*1e3:8.2f}")

        def pil_png():
            b = io.BytesIO()
            Image.fromarray(img, "RGB").save(b, "PNG", optimize=True)
            return b

        t = timeit(pil_png, min_time=0.1)
        size = len(pil_png().getvalue())
        print(f"{name:18s} {'Pillow/zlib optimize':28s} {size:9d} {t*1e3:8.2f}")
        print()


if __name__ == "__main__":
    main()
