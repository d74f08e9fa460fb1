"""Lossy PNG palette quantization.

Behavioral parity with pixo ``src/png/mod.rs:1160-1762``:
  - sampled histogram (50k cap, stride sampling, counts scaled by stride,
    8192-color cap keeping most frequent),
  - median-cut with perceptual split scores (G*4 > A*3 > R*2 > B*1),
    population-median split clamped so both halves are non-empty,
  - 2-iteration K-means refinement with redmean perceptual distance,
  - 6-6-6 RGB LUT (256Ki entries) for O(1) nearest lookup, alpha fallback,
  - optional Floyd-Steinberg dithering on RGB only (7/16, 3/16, 5/16, 1/16),
  - auto-quantize heuristic: quantize iff max_colors < unique <=
    32*max_colors over a 20k-pixel sample.

TPU mapping (SURVEY §2.3): histogram/median-cut/K-means/LUT vectorize;
this host implementation is NumPy-vectorized (the LUT build is a
[262144, K] distance reduction). FS dithering is an inherently sequential
2D error-diffusion recurrence; the native C++ path handles it at speed
(pixo_tpu/native), with a Python mirror for fallback/tests.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _keys_rgba(pixels: np.ndarray) -> np.ndarray:
    """[N, 3|4] uint8 -> u32 keys (r<<24 | g<<16 | b<<8 | a)."""
    r = pixels[:, 0].astype(np.uint32)
    g = pixels[:, 1].astype(np.uint32)
    b = pixels[:, 2].astype(np.uint32)
    a = (
        pixels[:, 3].astype(np.uint32)
        if pixels.shape[1] == 4
        else np.full(len(pixels), 255, np.uint32)
    )
    return (r << 24) | (g << 16) | (b << 8) | a


def should_quantize_auto(pixels: np.ndarray, max_colors: int) -> bool:
    """Sampled unique-color heuristic (``should_quantize_auto``, ``:1708-1762``)."""
    total = len(pixels)
    if total == 0:
        return False
    stride = max(total // 20_000, 1)
    sampled = pixels[::stride]
    if pixels.shape[1] == 3:
        keys = (
            (sampled[:, 0].astype(np.uint32) << 16)
            | (sampled[:, 1].astype(np.uint32) << 8)
            | sampled[:, 2].astype(np.uint32)
        )
    else:
        keys = _keys_rgba(sampled)
    threshold = max_colors * 32
    unique = len(np.unique(keys))
    return max_colors < unique <= threshold


def perceptual_distance_sq(c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
    """Redmean distance, broadcastable over [..., 4] int arrays (``:1405-1430``)."""
    c1 = c1.astype(np.int64)
    c2 = c2.astype(np.int64)
    dr = c1[..., 0] - c2[..., 0]
    dg = c1[..., 1] - c2[..., 1]
    db = c1[..., 2] - c2[..., 2]
    da = c1[..., 3] - c2[..., 3]
    r_mean = (c1[..., 0] + c2[..., 0]) >> 1
    r_weight = 512 + r_mean
    b_weight = 767 - r_mean
    dist = (r_weight * dr * dr + 1024 * dg * dg + b_weight * db * db) >> 8
    return dist + da * da


def nearest_palette_indices(colors: np.ndarray, palette: np.ndarray) -> np.ndarray:
    """[N, 4] colors x [K, 4] palette -> [N] uint8 argmin redmean distance.

    Native AVX2 when available; the fallback chunks N and computes in
    int32 (a whole-[N, K] int64 broadcast allocated gigabytes of
    temporaries — 33 s per call at N=256Ki on the 1-vCPU host).
    """
    from ..native import native_nearest_palette

    colors = np.ascontiguousarray(colors, np.uint8)
    out = native_nearest_palette(colors, palette)
    if out is not None:
        return out
    n = len(colors)
    result = np.empty(n, np.uint8)
    c32 = colors.astype(np.int32)
    p32 = palette.astype(np.int32)
    step = max(1, (1 << 22) // max(len(palette), 1))
    for lo in range(0, n, step):
        c = c32[lo : lo + step, None, :]
        p = p32[None, :, :]
        dr = c[..., 0] - p[..., 0]
        dg = c[..., 1] - p[..., 1]
        db = c[..., 2] - p[..., 2]
        da = c[..., 3] - p[..., 3]
        rm = (c[..., 0] + p[..., 0]) >> 1
        d = (((512 + rm) * dr * dr + 1024 * dg * dg + (767 - rm) * db * db)
             >> 8) + da * da
        result[lo : lo + step] = np.argmin(d, axis=1).astype(np.uint8)
    return result


def _sampled_histogram(pixels: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """-> (colors [K, 4] uint8, counts [K] uint32), sampled + capped."""
    total = len(pixels)
    stride = max(total // 50_000, 1)
    keys = _keys_rgba(pixels[::stride])
    skeys = np.sort(keys)
    uniq, counts = np.unique(skeys, return_counts=True)
    counts = counts.astype(np.uint64) * stride
    counts = np.minimum(counts, np.iinfo(np.uint32).max).astype(np.uint32)
    if len(uniq) > 8192:
        # keep the most frequent 8192 (mod.rs:1577-1581). The reference
        # tie-breaks arbitrarily (sort_unstable); a stable lowest-key
        # tie-break degenerates when counts are uniform (e.g. smooth
        # gradients sample ~50k distinct colors once each, and "first 8192
        # keys" is just the darkest corner of the color cube). Spread ties
        # deterministically over the color space with a multiplicative
        # hash instead: same most-frequent contract, uniform tie coverage.
        tie = (uniq * np.uint32(2654435761)) >> np.uint32(16)
        order = np.lexsort((tie, -counts.astype(np.int64)))[:8192]
        uniq, counts = uniq[order], counts[order]
    colors = np.stack(
        [(uniq >> 24) & 0xFF, (uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF],
        axis=1,
    ).astype(np.uint8)
    return colors, counts


class _Box:
    __slots__ = ("colors", "counts", "mins", "maxs", "_score")

    def __init__(self, colors: np.ndarray, counts: np.ndarray):
        self.colors = colors
        self.counts = counts
        self.mins = colors.min(axis=0).astype(np.int32)
        self.maxs = colors.max(axis=0).astype(np.int32)
        # cached: the selection loop re-consults every box's score each
        # round (O(boxes^2) evaluations; 86 ms/encode uncached)
        ranges = self.maxs - self.mins
        scores = (
            int(ranges[0]) * 2, int(ranges[1]) * 4,
            int(ranges[2]) * 1, int(ranges[3]) * 3,
        )
        channel, best = 0, scores[0]
        for c in (1, 2, 3):
            if scores[c] > best:
                channel, best = c, scores[c]
        self._score = (channel, best)

    def range_score(self) -> Tuple[int, int]:
        """(channel, perceptual score) with weights R*2, G*4, B*1, A*3."""
        return self._score

    def can_split(self) -> bool:
        return len(self.colors) > 1

    def split(self) -> Tuple["_Box", "_Box"]:
        channel, _ = self.range_score()
        order = np.argsort(self.colors[:, channel], kind="stable")
        colors, counts = self.colors[order], self.counts[order]
        total = int(counts.sum(dtype=np.uint64))
        acc = np.cumsum(counts.astype(np.uint64))
        hits = np.nonzero(acc >= total // 2)[0]
        split_idx = int(hits[0]) if len(hits) else 0
        split_idx = min(split_idx, max(len(colors) - 2, 0))
        return (
            _Box(colors[: split_idx + 1], counts[: split_idx + 1]),
            _Box(colors[split_idx + 1 :], counts[split_idx + 1 :]),
        )

    def centroid(self) -> np.ndarray:
        total = int(self.counts.sum(dtype=np.uint64))
        if total == 0:
            return np.array([0, 0, 0, 255], np.uint8)
        sums = (self.colors.astype(np.uint64) * self.counts[:, None]).sum(axis=0)
        return (sums // total).astype(np.uint8)


def median_cut_palette(
    colors: np.ndarray, counts: np.ndarray, max_colors: int, refine: bool = True
) -> np.ndarray:
    if len(colors) == 0:
        return np.array([[0, 0, 0, 255]], np.uint8)
    boxes = [_Box(colors, counts)]
    while len(boxes) < max_colors:
        scores = [b.range_score()[1] for b in boxes]
        # Rust max_by_key keeps the LAST maximal element on ties
        # (mod.rs:1311-1317); reproduce for palette-order byte parity.
        best = max(scores)
        idx = len(scores) - 1 - scores[::-1].index(best)
        if not boxes[idx].can_split():
            break
        box = boxes.pop(idx)
        left, right = box.split()
        if len(left.colors):
            boxes.append(left)
        if len(right.colors):
            boxes.append(right)
    palette = np.stack([b.centroid() for b in boxes])
    if not refine:
        return palette
    return refine_palette_kmeans(palette, colors, counts)


def refine_palette_kmeans(
    palette: np.ndarray, colors: np.ndarray, counts: np.ndarray, iterations: int = 2
) -> np.ndarray:
    """Weighted K-means refinement with redmean assignment (``:1346-1390``)."""
    if len(palette) == 0 or len(colors) == 0:
        return palette
    palette = palette.copy()
    for _ in range(iterations):
        assign = nearest_palette_indices(colors, palette)
        w = counts.astype(np.uint64)
        sums = np.zeros((len(palette), 4), np.uint64)
        totals = np.zeros(len(palette), np.uint64)
        np.add.at(sums, assign, colors.astype(np.uint64) * w[:, None])
        np.add.at(totals, assign, w)
        nonzero = totals > 0
        palette[nonzero] = (sums[nonzero] // totals[nonzero, None]).astype(np.uint8)
    return palette


_LUT_GRID = None


def _lut_grid() -> np.ndarray:
    """[262144, 4] uint8: 6-6-6 grid expanded to 8-bit, alpha 255."""
    global _LUT_GRID
    if _LUT_GRID is None:
        v6 = np.arange(64, dtype=np.uint8)
        v8 = (v6 << 2) | (v6 >> 4)
        r = np.repeat(v8, 64 * 64)
        g = np.tile(np.repeat(v8, 64), 64)
        b = np.tile(v8, 64 * 64)
        a = np.full(64 * 64 * 64, 255, np.uint8)
        _LUT_GRID = np.stack([r, g, b, a], axis=1)
    return _LUT_GRID


class PaletteLut:
    """6-6-6 opaque LUT + direct redmean fallback for alpha (``:1448-1499``)."""

    def __init__(self, palette: np.ndarray):
        from ..native import native_palette_lut

        self.palette = palette
        lut = native_palette_lut(palette)
        if lut is None:
            grid = _lut_grid()
            # chunked to bound the [262144, K] distance matrix memory
            lut = np.empty(64 * 64 * 64, np.uint8)
            step = 65536
            for i in range(0, len(grid), step):
                lut[i : i + step] = nearest_palette_indices(
                    grid[i : i + step], palette
                )
        self.opaque_lut = lut

    def lookup_many(self, rgba: np.ndarray) -> np.ndarray:
        """[N, 4] -> [N] uint8 indices."""
        r6 = rgba[:, 0] >> 2
        g6 = rgba[:, 1] >> 2
        b6 = rgba[:, 2] >> 2
        idx = (
            (r6.astype(np.int64) << 12) | (g6.astype(np.int64) << 6) | b6.astype(np.int64)
        )
        out = self.opaque_lut[idx]
        alpha_mask = rgba[:, 3] != 255
        if alpha_mask.any():
            out = out.copy()
            out[alpha_mask] = nearest_palette_indices(rgba[alpha_mask], self.palette)
        return out


def _dither_floyd_steinberg(
    rgba: np.ndarray, width: int, height: int, palette: np.ndarray, lut: PaletteLut
) -> np.ndarray:
    """Sequential FS error diffusion (``:1634-1698``); native path when available."""
    from ..native import native_dither_fs

    out = native_dither_fs(rgba, width, height, palette, lut.opaque_lut)
    if out is not None:
        return out
    return _dither_fs_py(rgba, width, height, palette, lut)


def _dither_fs_py(
    rgba: np.ndarray, width: int, height: int, palette: np.ndarray, lut: PaletteLut
) -> np.ndarray:
    pal = palette.astype(np.float32)
    opaque_lut = lut.opaque_lut
    indices = np.empty(width * height, np.uint8)
    err = np.zeros((3, width + 2), np.float32)
    nxt = np.zeros((3, width + 2), np.float32)
    pix = rgba.reshape(height, width, 4)
    for y in range(height):
        row = pix[y]
        for x in range(width):
            r, g, b, a = row[x]
            adj_r = min(max(float(r) + err[0, x + 1], 0.0), 255.0)
            adj_g = min(max(float(g) + err[1, x + 1], 0.0), 255.0)
            adj_b = min(max(float(b) + err[2, x + 1], 0.0), 255.0)
            ar, ag, ab = int(adj_r), int(adj_g), int(adj_b)
            if a == 255:
                idx = opaque_lut[((ar >> 2) << 12) | ((ag >> 2) << 6) | (ab >> 2)]
            else:
                idx = nearest_palette_indices(
                    np.array([[ar, ag, ab, a]], np.uint8), palette
                )[0]
            indices[y * width + x] = idx
            p = pal[idx]
            er, eg, eb = ar - p[0], ag - p[1], ab - p[2]
            err[0, x + 2] += er * (7.0 / 16.0)
            err[1, x + 2] += eg * (7.0 / 16.0)
            err[2, x + 2] += eb * (7.0 / 16.0)
            nxt[0, x] += er * (3.0 / 16.0)
            nxt[1, x] += eg * (3.0 / 16.0)
            nxt[2, x] += eb * (3.0 / 16.0)
            nxt[0, x + 1] += er * (5.0 / 16.0)
            nxt[1, x + 1] += eg * (5.0 / 16.0)
            nxt[2, x + 1] += eb * (5.0 / 16.0)
            nxt[0, x + 2] += er * (1.0 / 16.0)
            nxt[1, x + 2] += eg * (1.0 / 16.0)
            nxt[2, x + 2] += eb * (1.0 / 16.0)
        err.fill(0.0)
        err, nxt = nxt, err
    return indices


def _quantize_mode() -> str:
    import os

    return os.environ.get("PIXO_TPU_QUANTIZE", "host")


def _pad_hist(colors: np.ndarray, counts: np.ndarray, m: int = 8192):
    """Pad to a fixed M with zero-count entries (one compiled shape).
    Zero-weight colors cannot move a k-means centroid, so results are
    bit-equal to the unpadded host computation."""
    k = len(colors)
    pc = np.zeros((m, 4), np.uint8)
    pw = np.zeros(m, np.uint32)
    pc[:k] = colors
    pw[:k] = counts
    return pc, pw


def _device_kmeans_weights(counts: np.ndarray):
    """Weights safe for the device k-means' int32 accumulators, or None.

    Centroids are floor(sum(c*w) / sum(w)); dividing every weight by a
    common divisor leaves both quotients' exact rational unchanged, so
    the result is bit-equal.  Histogram counts are sample counts scaled
    by the sampling stride (``_sampled_histogram``), so their GCD
    absorbs the stride and the reduced weights sum to the raw sample
    count (<= ~100k) — far inside int32 range.  For arbitrary caller
    weights whose GCD is 1 the reduction can be a no-op; return None
    then so callers take the (uint64) host tier instead of overflowing.
    """
    nz = counts[counts > 0]
    if len(nz) == 0:
        return counts
    g = int(np.gcd.reduce(nz.astype(np.uint64)))
    reduced = (counts.astype(np.uint64) // max(g, 1)).astype(np.uint32)
    if int(reduced.sum(dtype=np.uint64)) * 255 >= 2**31:
        return None
    return reduced


def _pad_palette(palette: np.ndarray, k: int = 256) -> np.ndarray:
    """Pad to K entries with duplicates of entry 0: duplicates at higher
    indices can never win a first-min tie, so assignments, LUTs and
    dithers over the padded palette equal the unpadded ones."""
    if len(palette) == k:
        return palette
    return np.concatenate(
        [palette, np.tile(palette[:1], (k - len(palette), 1))]
    )


def _quantize_device(
    rgba: np.ndarray,
    width: int,
    height: int,
    max_colors: int,
    dithering: bool,
    colors: np.ndarray,
    counts: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Device tier: median-cut boxes stay host (tiny sequential search);
    k-means refinement, 6-6-6 LUT build, and FS dithering run as device
    kernels, bit-equal to the host tier (test_kernel_equality.py)."""
    from ..ops import quantize_device as qd

    pal0 = median_cut_palette(colors, counts, max_colors, refine=False)
    true_k = len(pal0)
    dw = _device_kmeans_weights(counts)
    if dw is None:  # int32-unsafe weights: exact host refinement instead
        pal = refine_palette_kmeans(pal0, colors, counts)
    else:
        pc, pw = _pad_hist(colors, dw)
        pal = np.asarray(
            qd.kmeans_refine_device(
                _pad_palette(pal0), pc, pw, np.int32(true_k)
            )
        )
    # re-pad with the FINAL entry 0 so padded rows are true duplicates
    # again (harmless in first-min ties) for the LUT/dither stages
    pal = _pad_palette(pal[:true_k])
    lut = np.asarray(qd.palette_lut_device(pal))
    rgba_img = rgba.reshape(1, height, width, 4)
    has_alpha = bool((rgba[:, 3] != 255).any())
    if dithering:
        idx = np.asarray(
            qd.dither_fs_device(
                rgba_img, pal[None], lut[None], has_alpha=has_alpha
            )
        )[0].reshape(-1)
    else:
        plut = PaletteLut.__new__(PaletteLut)
        plut.palette = pal
        plut.opaque_lut = lut
        idx = plut.lookup_many(rgba)
    return pal[:true_k], idx.astype(np.uint8)


def quantize_batch(
    imgs: np.ndarray,
    max_colors: int,
    dithering: bool,
):
    """[B, H, W, 3|4] uint8 -> list of (palette [K,4], indices [H*W]).

    The batched device tier: per-image sampled histograms and median-cut
    boxes on host (small sequential work), then ONE batched device
    dispatch each for k-means refinement, LUT build, and wavefront FS
    dithering across the whole batch.  Images whose sampled histogram
    already fits max_colors take the exact-mapping host branch (identical
    to quantize_image).  Bytes equal per-image quantize_image in every
    case."""
    import os

    from ..ops import quantize_device as qd

    b, h, w = imgs.shape[:3]
    flat = imgs.reshape(b, h * w, imgs.shape[3])
    results: list = [None] * b
    if os.environ.get("PIXO_TPU_QUANTIZE") == "host":
        # explicit host pin: honor the same escape hatch quantize_image does
        for i in range(b):
            results[i] = quantize_image(
                flat[i], w, h, max_colors, dithering, mode="host"
            )
        return results
    dev_members = []
    for i in range(b):
        pixels = flat[i]
        colors, counts = _sampled_histogram(pixels)
        if len(colors) <= max_colors:
            results[i] = quantize_image(pixels, w, h, max_colors, dithering)
        elif _device_kmeans_weights(counts) is None:
            # int32-unsafe weights for the device k-means: exact host tier
            results[i] = quantize_image(
                pixels, w, h, max_colors, dithering, mode="host"
            )
        else:
            dev_members.append((i, pixels, colors, counts))
    if not dev_members:
        return results

    pals0, pcs, pws, rgbas, true_ks = [], [], [], [], []
    for _, pixels, colors, counts in dev_members:
        pal0 = median_cut_palette(colors, counts, max_colors, refine=False)
        true_ks.append(len(pal0))
        pals0.append(_pad_palette(pal0))
        pc, pw = _pad_hist(colors, _device_kmeans_weights(counts))
        pcs.append(pc)
        pws.append(pw)
        rgba = (
            pixels
            if pixels.shape[1] == 4
            else np.concatenate(
                [pixels, np.full((len(pixels), 1), 255, np.uint8)], axis=1
            )
        )
        rgbas.append(rgba.reshape(h, w, 4))
    import jax

    pal_b = np.asarray(
        jax.vmap(qd.kmeans_refine_device)(
            np.stack(pals0),
            np.stack(pcs),
            np.stack(pws),
            np.asarray(true_ks, np.int32),
        )
    )
    pal_b = np.stack(
        [_pad_palette(pal_b[j][: true_ks[j]]) for j in range(len(true_ks))]
    )
    lut_b = np.asarray(jax.vmap(qd.palette_lut_device)(pal_b))
    rgba_b = np.stack(rgbas)
    has_alpha = bool((rgba_b[..., 3] != 255).any())
    if dithering:
        idx_b = np.asarray(
            qd.dither_fs_device(rgba_b, pal_b, lut_b, has_alpha=has_alpha)
        ).reshape(len(dev_members), -1)
    else:
        idx_b = []
        for j in range(len(dev_members)):
            plut = PaletteLut.__new__(PaletteLut)
            plut.palette = pal_b[j]
            plut.opaque_lut = lut_b[j]
            idx_b.append(plut.lookup_many(rgba_b[j].reshape(-1, 4)))
    for j, (i, _, _colors, _counts) in enumerate(dev_members):
        results[i] = (
            pal_b[j][: true_ks[j]],
            np.asarray(idx_b[j]).astype(np.uint8),
        )
    return results


def quantize_image(
    pixels: np.ndarray,
    width: int,
    height: int,
    max_colors: int,
    dithering: bool,
    mode: str = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """[N, 3|4] uint8 -> (palette [K, 4] uint8, indices [N] uint8).

    ``mode`` selects the execution tier: "host" (native C++/NumPy,
    default) or "device" (batched TPU kernels, bit-equal outputs);
    defaults to the PIXO_TPU_QUANTIZE env var."""
    rgba = (
        pixels
        if pixels.shape[1] == 4
        else np.concatenate(
            [pixels, np.full((len(pixels), 1), 255, np.uint8)], axis=1
        )
    )
    colors, counts = _sampled_histogram(pixels)

    if len(colors) <= max_colors:
        # Exact mapping: sampled colors are the palette; binary-search by key
        # with redmean fallback for unsampled colors.
        palette = colors
        keys = _keys_rgba(rgba)
        pal_keys = _keys_rgba(palette.astype(np.uint8))
        order = np.argsort(pal_keys)
        sorted_keys = pal_keys[order]
        pos = np.searchsorted(sorted_keys, keys)
        pos_c = np.minimum(pos, len(sorted_keys) - 1)
        found = sorted_keys[pos_c] == keys
        indices = np.empty(len(keys), np.uint8)
        indices[found] = order[pos_c[found]].astype(np.uint8)
        if (~found).any():
            indices[~found] = nearest_palette_indices(rgba[~found], palette)
        return palette, indices

    if (mode or _quantize_mode()) == "device":
        return _quantize_device(
            rgba, width, height, max_colors, dithering, colors, counts
        )
    palette = median_cut_palette(colors, counts, max_colors)
    lut = PaletteLut(palette)
    if not dithering:
        return palette, lut.lookup_many(rgba)
    return palette, _dither_floyd_steinberg(rgba, width, height, palette, lut)
