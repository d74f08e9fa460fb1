"""Block/MCU extraction for JPEG: pad + color convert + level shift + tile.

Parity targets:
  - ``extract_block`` (pixo ``src/jpeg/mod.rs:1565-1606``): 8x8 tiles with
    edge-clamp replication padding, YCbCr via the fixed-point converter,
    level shift -128.
  - ``extract_mcu_420`` (``:1608-1656``): 16x16 MCUs -> 4 Y blocks in
    (by, bx) = (0,0),(0,1),(1,0),(1,1) order + 2x2-averaged Cb/Cr
    (f32 sum * 0.25 - 128, exact).

TPU-first: instead of per-block scalar loops, the whole image is padded
once (edge mode == the reference's coordinate clamp), converted in one
vectorized pass, and tiled via reshape/transpose (a pure layout change XLA
compiles to no-ops or cheap copies). Output blocks are emitted in *scan
order* (interleaved per MCU) so the host bit-packer can consume a single
contiguous [nblocks, 64] stream.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..color import rgb_to_ycbcr


def _pad_to_multiple(img, mult: int):
    """Edge-replicate pad [H, W, C] (or [H, W]) up to multiples of ``mult``."""
    h, w = img.shape[0], img.shape[1]
    ph = (-h) % mult
    pw = (-w) % mult
    if ph == 0 and pw == 0:
        return img
    pad_width = [(0, ph), (0, pw)] + [(0, 0)] * (img.ndim - 2)
    return jnp.pad(img, pad_width, mode="edge")


def _tile_8x8(plane):
    """[H, W] -> [H//8 * W//8, 8, 8] in raster block order."""
    h, w = plane.shape
    t = plane.reshape(h // 8, 8, w // 8, 8)
    return t.transpose(0, 2, 1, 3).reshape(-1, 8, 8)


def blocks_444(rgb) -> jnp.ndarray:
    """[H, W, 3] uint8 -> [nmcu*3, 8, 8] f32 level-shifted blocks, scan order.

    Scan order per MCU is (Y, Cb, Cr), MCUs in raster order.
    """
    img = _pad_to_multiple(rgb, 8)
    ycc = rgb_to_ycbcr(img).astype(jnp.float32) - 128.0
    planes = [_tile_8x8(ycc[..., c]) for c in range(3)]  # each [nmcu, 8, 8]
    stacked = jnp.stack(planes, axis=1)  # [nmcu, 3, 8, 8]
    return stacked.reshape(-1, 8, 8)


def blocks_gray(gray) -> jnp.ndarray:
    """[H, W] uint8 -> [nblocks, 8, 8] f32 level-shifted blocks, raster order."""
    img = _pad_to_multiple(gray, 8)
    return _tile_8x8(img.astype(jnp.float32) - 128.0)


def blocks_420(rgb) -> jnp.ndarray:
    """[H, W, 3] uint8 -> [nmcu*6, 8, 8] f32 blocks in 4:2:0 scan order.

    Per 16x16 MCU: Y(0,0), Y(0,1), Y(1,0), Y(1,1), Cb, Cr. Chroma is the
    2x2 average of the fixed-point-converted u8 Cb/Cr values, computed as
    f32 sum * 0.25 (exact; matches the reference's arithmetic).
    """
    img = _pad_to_multiple(rgb, 16)
    h, w = img.shape[0], img.shape[1]
    ycc = rgb_to_ycbcr(img)
    yf = ycc[..., 0].astype(jnp.float32) - 128.0

    # Chroma 2x2 average, then level shift.
    cb = ycc[..., 1].astype(jnp.float32)
    cr = ycc[..., 2].astype(jnp.float32)

    def avg2x2(p):
        q = p.reshape(h // 2, 2, w // 2, 2)
        s = q[:, 0, :, 0] + q[:, 0, :, 1] + q[:, 1, :, 0] + q[:, 1, :, 1]
        return s * 0.25 - 128.0

    cbs = avg2x2(cb)  # [h/2, w/2]
    crs = avg2x2(cr)

    n_mcu_y = h // 16
    n_mcu_x = w // 16
    # Y plane: group into 16x16 MCUs, then 2x2 grid of 8x8 blocks per MCU.
    yt = yf.reshape(n_mcu_y, 2, 8, n_mcu_x, 2, 8)
    # -> [nmcu_y, nmcu_x, by, bx, 8, 8]
    yt = yt.transpose(0, 3, 1, 4, 2, 5).reshape(n_mcu_y * n_mcu_x, 4, 8, 8)

    cbt = _tile_8x8(cbs).reshape(n_mcu_y * n_mcu_x, 1, 8, 8)
    crt = _tile_8x8(crs).reshape(n_mcu_y * n_mcu_x, 1, 8, 8)

    mcus = jnp.concatenate([yt, cbt, crt], axis=1)  # [nmcu, 6, 8, 8]
    return mcus.reshape(-1, 8, 8)


def blocks_422(rgb) -> jnp.ndarray:
    """[H, W, 3] uint8 -> [nmcu*4, 8, 8] f32 blocks in 4:2:2 scan order.

    Per 16x8 MCU: Y(left), Y(right), Cb, Cr. Chroma is the horizontal
    pair average of the fixed-point-converted u8 Cb/Cr values, computed
    as f32 sum * 0.5 (exact). Beyond parity: the reference has no 4:2:2
    encode path (``src/jpeg/mod.rs:96-300``); the MCU walk follows its
    4:2:0 scheme (``extract_mcu_420``, ``:1608-1656``) restricted to one
    block row.
    """
    h0, w0 = rgb.shape[0], rgb.shape[1]
    ph0 = (-h0) % 8
    pw0 = (-w0) % 16
    img = rgb
    if ph0 or pw0:
        img = jnp.pad(img, [(0, ph0), (0, pw0), (0, 0)], mode="edge")
    h, w = img.shape[0], img.shape[1]
    ycc = rgb_to_ycbcr(img)
    yf = ycc[..., 0].astype(jnp.float32) - 128.0
    cb = ycc[..., 1].astype(jnp.float32)
    cr = ycc[..., 2].astype(jnp.float32)

    def avg2h(p):
        q = p.reshape(h, w // 2, 2)
        return (q[:, :, 0] + q[:, :, 1]) * 0.5 - 128.0

    cbs = avg2h(cb)  # [h, w/2]
    crs = avg2h(cr)

    n_mcu_y = h // 8
    n_mcu_x = w // 16
    # Y plane: 16x8 MCUs, two side-by-side 8x8 blocks per MCU.
    yt = yf.reshape(n_mcu_y, 8, n_mcu_x, 2, 8)
    yt = yt.transpose(0, 2, 3, 1, 4).reshape(n_mcu_y * n_mcu_x, 2, 8, 8)
    cbt = _tile_8x8(cbs).reshape(n_mcu_y * n_mcu_x, 1, 8, 8)
    crt = _tile_8x8(crs).reshape(n_mcu_y * n_mcu_x, 1, 8, 8)
    mcus = jnp.concatenate([yt, cbt, crt], axis=1)  # [nmcu, 4, 8, 8]
    return mcus.reshape(-1, 8, 8)


def scan_layout(
    width: int, height: int, color: str, subsampling: str
) -> Tuple[int, int, Tuple[int, ...]]:
    """(n_mcus, blocks_per_mcu, component-id pattern per MCU).

    Component ids: 0=Y, 1=Cb, 2=Cr. Matches the reference's MCU traversal
    (``encode_scan``, ``src/jpeg/mod.rs:1408-1570``).
    """
    if color == "gray":
        pw, ph = (width + 7) & ~7, (height + 7) & ~7
        return (pw // 8) * (ph // 8), 1, (0,)
    if subsampling == "420":
        pw, ph = (width + 15) & ~15, (height + 15) & ~15
        return (pw // 16) * (ph // 16), 6, (0, 0, 0, 0, 1, 2)
    if subsampling == "422":
        pw, ph = (width + 15) & ~15, (height + 7) & ~7
        return (pw // 16) * (ph // 8), 4, (0, 0, 1, 2)
    pw, ph = (width + 7) & ~7, (height + 7) & ~7
    return (pw // 8) * (ph // 8), 3, (0, 1, 2)


# ---------------------------------------------------------------------------
# NumPy mirrors for kernel-equality tests (scalar extract_block semantics:
# coordinate clamp + fixed-point convert + level shift).
# ---------------------------------------------------------------------------

def blocks_444_np(rgb: "np.ndarray") -> "np.ndarray":
    import numpy as np

    from ..color import rgb_to_ycbcr_np

    h, w = rgb.shape[:2]
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    ys = np.minimum(np.arange(ph), h - 1)
    xs = np.minimum(np.arange(pw), w - 1)
    img = rgb[ys][:, xs]
    ycc = rgb_to_ycbcr_np(img).astype(np.float32) - 128.0
    # block order (by, bx, c) — vectorized form of the scalar loop
    t = ycc.reshape(ph // 8, 8, pw // 8, 8, 3)
    return np.ascontiguousarray(
        t.transpose(0, 2, 4, 1, 3).reshape(-1, 8, 8)
    )


def blocks_gray_np(gray: "np.ndarray") -> "np.ndarray":
    import numpy as np

    h, w = gray.shape[:2]
    ph, pw = (h + 7) & ~7, (w + 7) & ~7
    ys = np.minimum(np.arange(ph), h - 1)
    xs = np.minimum(np.arange(pw), w - 1)
    img = gray[ys][:, xs].astype(np.float32) - 128.0
    t = img.reshape(ph // 8, 8, pw // 8, 8)
    return np.ascontiguousarray(t.transpose(0, 2, 1, 3).reshape(-1, 8, 8))


def blocks_420_np(rgb: "np.ndarray") -> "np.ndarray":
    import numpy as np

    from ..color import rgb_to_ycbcr_np

    h, w = rgb.shape[:2]
    ph, pw = (h + 15) & ~15, (w + 15) & ~15
    ys = np.minimum(np.arange(ph), h - 1)
    xs = np.minimum(np.arange(pw), w - 1)
    img = rgb[ys][:, xs]
    ycc = rgb_to_ycbcr_np(img)
    yf = ycc[..., 0].astype(np.float32) - 128.0
    cb = ycc[..., 1].astype(np.float32)
    cr = ycc[..., 2].astype(np.float32)

    def avg(p):
        q = p.reshape(ph // 2, 2, pw // 2, 2)
        return (q[:, 0, :, 0] + q[:, 0, :, 1] + q[:, 1, :, 0] + q[:, 1, :, 1]) * 0.25 - 128.0

    cbs, crs = avg(cb), avg(cr)
    nmy, nmx = ph // 16, pw // 16
    # Y: per-MCU 2x2 blocks in (by, bx) order
    ymcu = (
        yf.reshape(nmy, 2, 8, nmx, 2, 8)
        .transpose(0, 3, 1, 4, 2, 5)
        .reshape(nmy, nmx, 4, 8, 8)
    )
    cbb = cbs.reshape(nmy, 8, nmx, 8).transpose(0, 2, 1, 3)[:, :, None]
    crb = crs.reshape(nmy, 8, nmx, 8).transpose(0, 2, 1, 3)[:, :, None]
    mcu = np.concatenate([ymcu, cbb, crb], axis=2)  # [nmy, nmx, 6, 8, 8]
    return np.ascontiguousarray(mcu.reshape(-1, 8, 8))

def blocks_422_np(rgb: "np.ndarray") -> "np.ndarray":
    import numpy as np

    from ..color import rgb_to_ycbcr_np

    h, w = rgb.shape[:2]
    ph, pw = (h + 7) & ~7, (w + 15) & ~15
    ys = np.minimum(np.arange(ph), h - 1)
    xs = np.minimum(np.arange(pw), w - 1)
    img = rgb[ys][:, xs]
    ycc = rgb_to_ycbcr_np(img)
    yf = ycc[..., 0].astype(np.float32) - 128.0
    cb = ycc[..., 1].astype(np.float32)
    cr = ycc[..., 2].astype(np.float32)

    def avg(p):
        q = p.reshape(ph, pw // 2, 2)
        return (q[:, :, 0] + q[:, :, 1]) * 0.5 - 128.0

    cbs, crs = avg(cb), avg(cr)
    nmy, nmx = ph // 8, pw // 16
    ymcu = (
        yf.reshape(nmy, 8, nmx, 2, 8)
        .transpose(0, 2, 3, 1, 4)
        .reshape(nmy, nmx, 2, 8, 8)
    )
    cbb = cbs.reshape(nmy, 8, nmx, 8).transpose(0, 2, 1, 3)[:, :, None]
    crb = crs.reshape(nmy, 8, nmx, 8).transpose(0, 2, 1, 3)[:, :, None]
    mcu = np.concatenate([ymcu, cbb, crb], axis=2)  # [nmy, nmx, 4, 8, 8]
    return np.ascontiguousarray(mcu.reshape(-1, 8, 8))
