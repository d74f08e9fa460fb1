"""Thumbnail pipeline benchmark (BASELINE.json config #5:
decode -> resize -> re-encode, batched).

Usage: python benches/pipeline.py [--n 128] [--device cpu|default]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--chunk", type=int, default=64)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()
    if args.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.device == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from pixo_tpu import JpegOptions, jpeg
    from pixo_tpu.parallel import thumbnail_pipeline
    from pixo_tpu.utils.synthetic import synth_gradient

    base = synth_gradient(args.size, args.size, 3)
    rng = np.random.default_rng(0)
    imgs = np.stack(
        [np.roll(base, int(s), axis=1) for s in rng.integers(0, 64, args.n)]
    )
    opts = JpegOptions.fast(args.size, args.size, 90)
    encoded = jpeg.encode_batch(imgs, opts)
    total_in = sum(len(e) for e in encoded)

    # warm (compiles full-chunk batch shapes)
    thumbnail_pipeline(
        encoded[: args.chunk], thumb_size=128, quality=85,
        host_workers=args.workers, chunk_size=args.chunk,
    )
    stats = {}
    t0 = time.perf_counter()
    thumbs = thumbnail_pipeline(
        encoded, thumb_size=128, quality=85,
        host_workers=args.workers, chunk_size=args.chunk, stats=stats,
    )
    dt = time.perf_counter() - t0
    total_out = sum(len(t) for t in thumbs)
    mp = args.n * args.size * args.size / 1e6
    print(
        f"thumbnail pipeline: {args.n} x {args.size}x{args.size} -> 128x128 "
        f"in {dt*1000:.0f} ms = {args.n/dt:.1f} img/s ({mp/dt:.1f} MP/s in), "
        f"{total_in//args.n} B/in avg -> {total_out//args.n} B/out avg"
    )
    print(
        "  stage wall: decode-wait "
        f"{stats['decode_wait_s']*1000:.0f} ms "
        f"({args.n/max(stats['decode_wait_s'],1e-9):.0f} img/s), "
        f"device {stats['device_s']*1000:.0f} ms "
        f"({args.n/max(stats['device_s'],1e-9):.0f} img/s), "
        f"pack {stats['pack_s']*1000:.0f} ms "
        f"({args.n/max(stats['pack_s'],1e-9):.0f} img/s); "
        f"chunk={args.chunk} workers={args.workers}"
    )


if __name__ == "__main__":
    main()
