"""Headline benchmark: JPEG q85 4:2:0 encode throughput (MP/s per chip).

Matches the reference's headline config (BENCHMARKS.md:85 — 512x512
gradient, q85, 4:2:0 baseline ≈ 202 MP/s on Apple Silicon single-core;
BASELINE.json north star: ≥250 MP/s/chip). End-to-end: device coefficient
pipeline + native host entropy packing, batched.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_MPS = 202.0  # reference: 512x512 gradient, q85 420, 1.3 ms


def synth_gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack(
        [
            (xx * 255 // max(w - 1, 1)),
            (yy * 255 // max(h - 1, 1)),
            ((xx + yy) * 255 // max(w + h - 2, 1)),
        ],
        axis=-1,
    ).astype(np.uint8)


def main() -> None:
    from pixo_tpu import JpegOptions
    from pixo_tpu.parallel import encode_jpeg_batch_sharded, make_mesh

    size = int(os.environ.get("BENCH_SIZE", "512"))
    batch = int(os.environ.get("BENCH_BATCH", "32"))
    rounds = int(os.environ.get("BENCH_ROUNDS", "3"))
    workers = min(os.cpu_count() or 8, 16)

    base = synth_gradient(size, size)
    # vary images slightly so host packing sees realistic distinct streams
    rng = np.random.default_rng(0)
    shifts = rng.integers(0, 17, batch)
    imgs = np.stack([np.roll(base, int(s), axis=1) for s in shifts])

    opts = JpegOptions(width=size, height=size, quality=85)
    from pixo_tpu.options import Subsampling

    opts.subsampling = Subsampling.S420
    mesh = make_mesh()

    # warmup (compile + caches)
    encode_jpeg_batch_sharded(imgs[:4], opts, mesh, host_workers=workers)

    t0 = time.perf_counter()
    total_bytes = 0
    for _ in range(rounds):
        out = encode_jpeg_batch_sharded(imgs, opts, mesh, host_workers=workers)
        total_bytes += sum(len(o) for o in out)
    dt = time.perf_counter() - t0

    megapixels = size * size * batch * rounds / 1e6
    mps = megapixels / dt
    print(
        f"bench: {batch}x{size}x{size} q85 420, {rounds} rounds, "
        f"{dt*1000:.0f} ms total, {total_bytes//(batch*rounds)} B/img avg, "
        f"{workers} host workers",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": "jpeg_q85_420_encode_throughput",
        "value": round(mps, 1),
        "unit": "MP/s/chip",
        "vs_baseline": round(mps / BASELINE_MPS, 3),
    }))


if __name__ == "__main__":
    main()
