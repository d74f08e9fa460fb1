"""Device (TPU) kernels for lossy PNG quantization.

Device analogs of ``png/quantize.py`` (semantics source:
``/root/reference/src/png/mod.rs:1160-1701``), bit-identical to the host
tier and batched over images:

  - ``nearest_palette_device``: redmean argmin in int32 (mod.rs:1405-1430)
  - ``kmeans_refine_device``: 2-iteration weighted refinement
    (mod.rs:1346-1390) via segment sums
  - ``palette_lut_device``: the 6-6-6 opaque LUT as one batched distance
    reduction (mod.rs:1448-1499)
  - ``dither_fs_device``: Floyd-Steinberg error diffusion as an
    anti-diagonal *wavefront* ``lax.scan`` — step t processes pixel
    (y, t - 2y) for every row in parallel, which satisfies FS's
    left/up-left/up/up-right dependency cone.  Bit-identity with the
    sequential host scan holds because every error term is a dyadic
    rational (k/16 times an integer in [-255, 255]) whose partial sums
    stay exactly representable in f32, so summation order cannot change
    the result (see test_kernel_equality.py::TestDitherDevice).

Integer-range contract: color sums inside k-means use int32; callers
must guarantee ``sum(counts) * 255 < 2**31``.  The png.quantize callers
enforce this by dividing each histogram's counts by their GCD first
(``_device_kmeans_weights`` — exact, since floor quotients are invariant
under a common weight divisor, and stride-scaled counts always share the
stride as a divisor) and fall back to the uint64 host tier for any
weight vector that cannot be reduced into range.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "nearest_palette_device",
    "kmeans_refine_device",
    "palette_lut_device",
    "dither_fs_device",
]


def _redmean_dist(colors: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    """[..., N, 4] x [..., K, 4] uint8 -> [..., N, K] int32 distances."""
    c = colors.astype(jnp.int32)[..., :, None, :]
    p = palette.astype(jnp.int32)[..., None, :, :]
    dr = c[..., 0] - p[..., 0]
    dg = c[..., 1] - p[..., 1]
    db = c[..., 2] - p[..., 2]
    da = c[..., 3] - p[..., 3]
    rm = (c[..., 0] + p[..., 0]) >> 1
    dist = ((512 + rm) * dr * dr + 1024 * dg * dg + (767 - rm) * db * db) >> 8
    return dist + da * da


@jax.jit
def nearest_palette_device(colors: jnp.ndarray, palette: jnp.ndarray):
    """[N, 4] x [K, 4] uint8 -> [N] int32 argmin redmean (first on ties,
    matching the reference's strict-< scan)."""
    return jnp.argmin(_redmean_dist(colors, palette), axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iterations",))
def kmeans_refine_device(
    palette: jnp.ndarray,
    colors: jnp.ndarray,
    counts: jnp.ndarray,
    k_valid=None,
    iterations: int = 2,
):
    """Weighted k-means refinement, bit-equal to the host tier.

    palette [K, 4] uint8, colors [M, 4] uint8, counts [M] (int) ->
    [K, 4] uint8.  Pad M with counts==0 entries freely: zero-weight
    colors cannot move a centroid.  When the palette itself is padded,
    pass ``k_valid`` (number of real entries): padded rows are masked
    out of the assignment — after one update they no longer duplicate a
    real entry and could otherwise steal assignments.
    """
    k = palette.shape[0]
    colors_i = colors.astype(jnp.int32)
    w = counts.astype(jnp.int32)
    if k_valid is None:
        k_valid = jnp.int32(k)
    invalid = jnp.arange(k) >= k_valid  # [K]

    def body(_, pal):
        dist = _redmean_dist(colors_i, pal)  # [M, K]
        dist = jnp.where(invalid[None, :], jnp.iinfo(jnp.int32).max, dist)
        assign = jnp.argmin(dist, axis=-1)
        wc = colors_i * w[:, None]  # [M, 4]
        sums = jax.ops.segment_sum(wc, assign, num_segments=k)  # [K, 4]
        totals = jax.ops.segment_sum(w, assign, num_segments=k)  # [K]
        nz = totals > 0
        new = jnp.where(
            nz[:, None],
            sums // jnp.maximum(totals, 1)[:, None],
            pal.astype(jnp.int32),
        )
        return new.astype(jnp.uint8)

    return jax.lax.fori_loop(0, iterations, body, palette.astype(jnp.uint8))


def _lut_grid() -> np.ndarray:
    # the host tier's cached [262144, 4] 6-6-6 grid — one definition, so
    # the device LUT can never diverge from the host LUT it must equal
    # (lazy import: png.quantize imports this module inside functions)
    from ..png.quantize import _lut_grid as host_grid

    return host_grid()


@jax.jit
def palette_lut_device(palette: jnp.ndarray) -> jnp.ndarray:
    """[K, 4] uint8 -> [262144] uint8 6-6-6 nearest-palette LUT.

    Chunked over the grid (8 x 32768) to bound the distance-matrix
    working set; one fused reduction per chunk.
    """
    grid = jnp.asarray(_lut_grid()).reshape(8, 32768, 4)

    def chunk(g):
        return jnp.argmin(_redmean_dist(g, palette), axis=-1).astype(jnp.uint8)

    return jax.lax.map(chunk, grid).reshape(-1)


# ---------------------------------------------------------------------------
# Wavefront Floyd-Steinberg dithering
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("has_alpha",))
def dither_fs_device(
    rgba: jnp.ndarray,
    palette: jnp.ndarray,
    lut: jnp.ndarray,
    *,
    has_alpha: bool = False,
):
    """Batched FS dithering: [B, H, W, 4] u8, [B, K, 4] u8, [B, 262144] u8
    -> [B, H, W] int32 palette indices, bit-equal to the host scan.

    The scan runs W + 2(H-1) wavefront steps; step t handles pixel
    (y, t - 2y) for all rows at once.  Error state per row is the last
    three quantization errors (the exact contributions rows below need),
    shifted every step with zeros outside the row extent — which
    reproduces the host's implicit boundary zeros.

    ``has_alpha=False`` compiles out the direct-redmean fallback (RGB
    sources are statically all-opaque).
    """
    B, H, W = rgba.shape[0], rgba.shape[1], rgba.shape[2]
    T = W + 2 * (H - 1)
    pal_f = palette.astype(jnp.float32)  # [B, K, 4]
    pal_i = palette.astype(jnp.int32)

    # Skew: skewed[b, y, 2y + x] = rgba[b, y, x]
    skewed = jnp.zeros((B, H, T, 4), dtype=jnp.uint8)
    cols = 2 * jnp.arange(H)[:, None] + jnp.arange(W)[None, :]  # [H, W]
    skewed = skewed.at[:, jnp.arange(H)[:, None], cols, :].set(rgba)

    ys_range = jnp.arange(H)

    def step(carry, t):
        # lag1/lag2/lag3: [B, H, 3] f32 — er(y, x-1), er(y, x-2), er(y, x-3)
        lag1, lag2, lag3 = carry
        x = t - 2 * ys_range  # [H]
        active = (x >= 0) & (x < W)  # [H]

        # neighbours from the row above (already 2 columns ahead)
        up1 = jnp.pad(lag1, ((0, 0), (1, 0), (0, 0)))[:, :H]  # er(y-1, x+1)
        up2 = jnp.pad(lag2, ((0, 0), (1, 0), (0, 0)))[:, :H]  # er(y-1, x)
        up3 = jnp.pad(lag3, ((0, 0), (1, 0), (0, 0)))[:, :H]  # er(y-1, x-1)
        err_in = (
            lag1 * (7.0 / 16.0)
            + up3 * (1.0 / 16.0)
            + up2 * (5.0 / 16.0)
            + up1 * (3.0 / 16.0)
        )  # [B, H, 3]

        px = skewed[:, :, t, :]  # [B, H, 4] u8 (zeros when inactive)
        adj = jnp.clip(px[..., :3].astype(jnp.float32) + err_in, 0.0, 255.0)
        ai = jnp.floor(adj).astype(jnp.int32)  # [B, H, 3]

        packed = (ai[..., 0] >> 2) << 12 | (ai[..., 1] >> 2) << 6 | (
            ai[..., 2] >> 2
        )  # [B, H]
        idx = jnp.take_along_axis(lut, packed, axis=1).astype(jnp.int32)

        if has_alpha:
            a = px[..., 3].astype(jnp.int32)
            cand = jnp.concatenate([ai, a[..., None]], axis=-1)  # [B, H, 4]
            # leading batch dim shared: [B, H, 4] x [B, K, 4] -> [B, H, K]
            direct = jnp.argmin(
                _redmean_dist(cand, pal_i), axis=-1
            ).astype(jnp.int32)
            idx = jnp.where(a == 255, idx, direct)

        chosen = jax.vmap(lambda p, i: p[i, :3])(pal_f, idx)  # [B, H, 3]
        er = ai.astype(jnp.float32) - chosen  # integer-valued f32
        er = jnp.where(active[None, :, None], er, 0.0)

        return (er, lag1, lag2), idx

    init = tuple(jnp.zeros((B, H, 3), jnp.float32) for _ in range(3))
    _, ys = jax.lax.scan(step, init, jnp.arange(T))  # ys: [T, B, H]

    # Unskew: out[b, y, x] = ys[2y + x, b, y]
    ys_bht = ys.transpose(1, 2, 0)  # [B, H, T]
    out = jnp.take_along_axis(
        ys_bht, cols[None, :, :].astype(jnp.int32), axis=2
    )  # [B, H, W]
    return out
