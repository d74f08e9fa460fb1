"""Batched device analysis for PNG lossless reductions.

The per-image reduction decisions of ``png.reduce.maybe_reduce_color_type``
(pixo ``src/png/mod.rs:683-836``) are all-reduce predicates: all-gray,
all-opaque, and a <=256-unique-colors palette screen. For the sharded batch
path these run as ONE fused device dispatch over the whole batch (SURVEY
§2.3 "all-reduce predicates"), so a balanced-preset batch only falls back
to per-image host encoding for the images where an image-dependent layout
(palette indices, sub-8-bit packing) actually applies.

Routing is conservative-by-construction: an image is batched only when the
predicates *prove* the per-image path would take the same layout
(passthrough / alpha-strip / gray-alpha), so batched bytes always equal the
per-image encoder's output. The palette screen mirrors the host's sampled
early rejection (``png/reduce.py build_palette``): a strided sample with
>256 unique colors proves the full image has >256; samples <=256 route to
the per-image path where ``build_palette`` makes the exact decision.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SAMPLE_CAP = 4096  # must match png/reduce.py's _SAMPLE_CAP


@functools.partial(jax.jit, static_argnames=("stride",))
def _analysis_kernel(px, *, stride: int):
    """px: [B, N, bpp(3|4)] uint8 -> (all_gray, all_opaque, palette_possible)."""
    all_gray = jnp.all(
        (px[..., 0] == px[..., 1]) & (px[..., 1] == px[..., 2]), axis=1
    )
    r = px[..., 0].astype(jnp.uint32)
    g = px[..., 1].astype(jnp.uint32)
    b = px[..., 2].astype(jnp.uint32)
    if px.shape[-1] == 4:
        all_opaque = jnp.all(px[..., 3] == 255, axis=1)
        a = px[..., 3].astype(jnp.uint32)
    else:
        all_opaque = jnp.ones(px.shape[0], bool)
        a = jnp.full(r.shape, 255, jnp.uint32)
    keys = (r << 24) | (g << 16) | (b << 8) | a
    samp = jnp.sort(keys[:, ::stride], axis=1)
    nuniq = jnp.sum(samp[:, 1:] != samp[:, :-1], axis=1) + 1
    return all_gray, all_opaque, nuniq <= 256


def analyze_png_batch(px_dev):
    """[B, N, 3|4] uint8 (device or host) -> host bool arrays
    (all_gray, all_opaque, palette_possible)."""
    n = px_dev.shape[1]
    stride = max(n // _SAMPLE_CAP, 1)
    ag, ao, pp = _analysis_kernel(jnp.asarray(px_dev), stride=stride)
    return np.asarray(ag), np.asarray(ao), np.asarray(pp)


@functools.partial(jax.jit, static_argnames=("mode", "opt_alpha"))
def _transform_kernel(px, *, mode: str, opt_alpha: bool):
    """Per-group device layout transform. px: [Bg, N, bpp_in] uint8.

    mode: "pass" (identity + optional alpha-zeroing), "strip"
    (RGBA->RGB, pixo ``src/png/mod.rs:326-334`` analog), "ga" (RGBA->
    GrayAlpha). Alpha-zeroing mirrors ``optimize_alpha``
    (``src/png/mod.rs:633-671``): color channels of fully transparent
    pixels are cleared.
    """
    if mode == "strip":
        return px[..., :3]
    if mode == "ga":
        out = jnp.stack([px[..., 0], px[..., 3]], axis=-1)
    else:
        out = px
    if opt_alpha and out.shape[-1] in (2, 4):
        alpha = out[..., -1:]
        colors = jnp.where(alpha == 0, jnp.uint8(0), out[..., :-1])
        out = jnp.concatenate([colors, alpha], axis=-1)
    return out


def transform_png_group(px_group, mode: str, opt_alpha: bool) -> np.ndarray:
    """Apply one group's layout transform on device; return host [Bg, N*bpp_out]."""
    out = _transform_kernel(jnp.asarray(px_group), mode=mode, opt_alpha=opt_alpha)
    arr = np.asarray(out)
    return arr.reshape(arr.shape[0], -1)
