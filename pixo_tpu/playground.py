"""Playground job function (the reference ``compress-client.ts`` analog).

One importable module-level job so the worker-pool service
(``pixo_tpu.parallel.service``) can pickle it into spawned worker
processes — functions defined inside ``examples/playground.py`` (loaded
by path, not import) cannot cross the process boundary.

Semantics mirror the reference web client's ``compressImage`` /
``resizeImage`` (``web/src/lib/compress-client.ts:62-117``): decode,
optional Lanczos resize, then PNG or JPEG encode per the form options.
"""

from __future__ import annotations

import time


def compress_bytes(data: bytes, params: dict) -> tuple[bytes, dict]:
    """One job: decode -> [resize] -> encode with the requested options."""
    import numpy as np

    from pixo_tpu import ColorType, JpegOptions, PngOptions, jpeg, png
    from pixo_tpu.cli import load_image
    from pixo_tpu.options import (
        QuantizationMode,
        QuantizationOptions,
        ResizeFilter,
        ResizeOptions,
        Subsampling,
    )
    from pixo_tpu.resize import resize as do_resize

    t0 = time.perf_counter()
    px, w, h, _src_ct = load_image(data)  # our own decoders
    px = np.asarray(px)
    if px.ndim == 2:
        px = px[..., None]
    px = px.reshape(h, w, -1)
    c = px.shape[2]

    rw = int(params.get("rw") or 0)
    rh = int(params.get("rh") or 0)
    if rw and rh:
        ct = {1: ColorType.GRAY, 2: ColorType.GRAY_ALPHA,
              3: ColorType.RGB, 4: ColorType.RGBA}[c]
        px = np.asarray(
            do_resize(
                px,
                ResizeOptions(
                    src_width=w, src_height=h, dst_width=rw, dst_height=rh,
                    color_type=ct, filter=ResizeFilter.LANCZOS3,
                ),
            )
        ).reshape(rh, rw, c)
        h, w = rh, rw

    fmt = params.get("format", "auto")
    name = params.get("name", "image")
    if fmt == "auto":
        fmt = "jpeg" if name.lower().endswith((".jpg", ".jpeg")) else "png"
    preset = int(params.get("preset", 1))
    quality = int(params.get("quality", 85))

    if fmt == "jpeg":
        if c == 4:  # strip alpha like the playground's stripAlpha
            px = px[..., :3]
            c = 3
        opts = JpegOptions.from_preset(w, h, quality, preset)
        if c == 1:
            opts.color_type = ColorType.GRAY
            px = px[..., 0]
        opts.subsampling = (
            Subsampling.S420 if params.get("sub420") == "true"
            else Subsampling.S444
        )
        out = jpeg.encode(np.ascontiguousarray(px), opts)
        ext, mime = "jpg", "image/jpeg"
    else:
        opts = PngOptions.from_preset(w, h, preset)
        opts.color_type = {1: ColorType.GRAY, 2: ColorType.GRAY_ALPHA,
                           3: ColorType.RGB, 4: ColorType.RGBA}[c]
        if params.get("lossless") != "true":
            opts.quantization = QuantizationOptions(
                mode=QuantizationMode.AUTO, max_colors=256, dithering=True
            )
        out = png.encode(np.ascontiguousarray(px), opts)
        ext, mime = "png", "image/png"

    stem = name.rsplit(".", 1)[0] or "image"
    meta = {
        "width": w,
        "height": h,
        "out_size": len(out),
        "out_name": f"{stem}.pixo.{ext}",
        "mime": mime,
        "elapsed_ms": (time.perf_counter() - t0) * 1000.0,
    }
    return bytes(out), meta
