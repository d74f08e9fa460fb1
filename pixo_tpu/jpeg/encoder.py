"""JPEG encoder: batched TPU device pipeline + host entropy stage.

Pipeline (parity with pixo ``src/jpeg/mod.rs:328-447`` / ``encode_scan``):

  device (jit, one fused program over all blocks of all images):
    pad -> fixed-point RGB->YCbCr -> level shift -> MCU blockify (scan
    order) -> AAN f32 DCT -> quantize (round half away) -> zigzag
  host:
    [optimize_huffman] symbol histograms -> canonical tables (16-bit
    overflow falls back to K.3 std tables) -> Huffman bit-pack with 0xFF
    stuffing + restart markers -> marker framing.

Unlike the reference — which recomputes every coefficient a second time
when optimize_huffman is on (``src/jpeg/mod.rs:684-824``) — the device
coefficients are computed once and reused for both the histogram pass and
the packing pass.
"""

from __future__ import annotations

import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .. import errors
from ..color import ColorType
from ..options import MAX_DIMENSION, JpegOptions, Subsampling
from ..ops.blockify import (
    blocks_420,
    blocks_422,
    blocks_444,
    blocks_gray,
    scan_layout,
)
from ..ops.dct import dct8x8_aan
from ..ops.quantize import quantize_blocks, zigzag_blocks
from . import markers, packer
from .tables import HuffmanTables, QuantizationTables


def _validate(options: JpegOptions, data_len: int) -> int:
    if options.quality == 0 or options.quality > 100:
        raise errors.InvalidQuality(options.quality)
    if options.restart_interval is not None and options.restart_interval == 0:
        raise errors.InvalidRestartInterval(0)
    w, h = options.width, options.height
    if w == 0 or h == 0:
        raise errors.InvalidDimensions(w, h)
    if w > MAX_DIMENSION or h > MAX_DIMENSION:
        raise errors.ImageTooLarge(w, h, MAX_DIMENSION)
    if options.color_type == ColorType.RGB:
        bpp = 3
    elif options.color_type == ColorType.GRAY:
        bpp = 1
    else:
        raise errors.UnsupportedColorType("JPEG supports RGB and Gray")
    expected = w * h * bpp
    if data_len != expected:
        raise errors.InvalidDataLength(expected, data_len)
    return bpp


@functools.partial(jax.jit, static_argnames=("color", "subsampling"))
def _device_coeffs(img, lum_q, chrom_q, *, color: str, subsampling: str):
    """One image [H, W, C?] uint8 -> [nblocks, 64] int16 zigzag coeffs."""
    if color == "gray":
        blocks = blocks_gray(img)
        qmap = lum_q.reshape(1, 8, 8)
        bpm = 1
    elif subsampling == "420":
        blocks = blocks_420(img)
        qmap = jnp.stack([lum_q] * 4 + [chrom_q] * 2).reshape(6, 8, 8)
        bpm = 6
    elif subsampling == "422":
        blocks = blocks_422(img)
        qmap = jnp.stack([lum_q] * 2 + [chrom_q] * 2).reshape(4, 8, 8)
        bpm = 4
    else:
        blocks = blocks_444(img)
        qmap = jnp.stack([lum_q, chrom_q, chrom_q]).reshape(3, 8, 8)
        bpm = 3
    dct = dct8x8_aan(blocks)
    grouped = dct.reshape(-1, bpm, 8, 8)
    coeffs = quantize_blocks(grouped, qmap[None])
    return zigzag_blocks(coeffs).reshape(-1, 64)


def _coeff_tier() -> str:
    """"device" (jnp kernels, default) or "host" (NumPy mirrors — no XLA
    dispatch; the one-shot CLI latency tier).  PIXO_TPU_COEFFS overrides.
    Both tiers are bit-identical (the mirrors ARE the kernel-equality
    oracles, tests/test_kernel_equality.py)."""
    import os

    return os.environ.get("PIXO_TPU_COEFFS", "device")


def auto_host_tier(env_var: str) -> bool:
    """Backend-aware tier policy shared by the batch entry points, the
    thumbnail pipeline, and the playground: prefer the native host tier
    when (a) the user has not set ``env_var`` explicitly, (b) the default
    jax backend is CPU, and (c) the native library actually loaded (the
    pure-NumPy mirrors are far slower than the XLA-CPU dispatch, so
    without the .so the device tier stays the right default). Explicit
    env always wins; callers must treat env=="host" as host regardless."""
    if os.environ.get(env_var) is not None:
        return False
    from ..native import native_available

    if not native_available():
        return False
    try:
        return jax.default_backend() == "cpu"
    except Exception:  # noqa: BLE001 — backend probe failed; keep device
        return False


def compute_coefficients_host(
    img: np.ndarray, options: JpegOptions, quant: QuantizationTables
) -> np.ndarray:
    """Host coefficient pipeline: pad/blockify -> AAN f32 DCT ->
    quantize -> zigzag, bit-equal to _device_coeffs without touching
    XLA (no compile/dispatch latency for one-shot runs).  Native AVX2
    path when available (~20x the NumPy mirrors, identical bytes);
    NumPy mirrors as the fallback and equality oracle."""
    from ..native import native_jpeg_coefficients
    from ..ops.blockify import blocks_420_np, blocks_444_np, blocks_gray_np
    from ..ops.dct import dct8x8_aan_np
    from ..ops.quantize import quantize_blocks_np, zigzag_blocks_np

    lum = quant.luminance_table.reshape(8, 8).astype(np.float32)
    chrom = quant.chrominance_table.reshape(8, 8).astype(np.float32)

    if options.color_type == ColorType.GRAY:
        nat_mode = "gray"
    else:
        nat_mode = options.subsampling.value
    nat = native_jpeg_coefficients(img, nat_mode, lum, chrom)
    if nat is not None:
        return nat
    if options.color_type == ColorType.GRAY:
        blocks = blocks_gray_np(img)
        qmap = lum[None]
        bpm = 1
    elif options.subsampling == Subsampling.S420:
        blocks = blocks_420_np(img)
        qmap = np.stack([lum] * 4 + [chrom] * 2)
        bpm = 6
    elif options.subsampling == Subsampling.S422:
        from ..ops.blockify import blocks_422_np

        blocks = blocks_422_np(img)
        qmap = np.stack([lum] * 2 + [chrom] * 2)
        bpm = 4
    else:
        blocks = blocks_444_np(img)
        qmap = np.stack([lum, chrom, chrom])
        bpm = 3
    dct = dct8x8_aan_np(blocks)
    coeffs = quantize_blocks_np(dct.reshape(-1, bpm, 8, 8), qmap[None])
    return zigzag_blocks_np(coeffs).reshape(-1, 64)


def compute_coefficients(
    img: np.ndarray, options: JpegOptions, quant: QuantizationTables
) -> np.ndarray:
    """Coefficient pipeline for one image; returns host [nblocks, 64] i16.
    Tier per :func:`_coeff_tier` (device kernels / NumPy host mirrors,
    bit-identical).  On a CPU default backend the native host tier is
    both ~13x faster at 3 MP and the bit-faithful one (XLA:CPU
    FMA-contracts inside the fused DCT; see benches/BENCHMARKS.md
    f32-exactness note), so the backend-aware auto policy applies here
    exactly as in :func:`_trellis_coefficients`."""
    if _coeff_tier() == "host" or auto_host_tier("PIXO_TPU_COEFFS"):
        return compute_coefficients_host(img, options, quant)
    color = "gray" if options.color_type == ColorType.GRAY else "rgb"
    sub = options.subsampling.value
    lum = jnp.asarray(quant.luminance_table.reshape(8, 8))
    chrom = jnp.asarray(quant.chrominance_table.reshape(8, 8))
    zz = _device_coeffs(jnp.asarray(img), lum, chrom, color=color, subsampling=sub)
    return np.asarray(zz)


@functools.partial(jax.jit, static_argnames=("color", "subsampling"))
def _device_dct_zz(img, *, color: str, subsampling: str):
    """One image -> [nblocks, 64] f32 unquantized DCT, zigzag order.

    Feeds the host/native trellis quantizer (preset max path).
    """
    if color == "gray":
        blocks = blocks_gray(img)
    elif subsampling == "420":
        blocks = blocks_420(img)
    elif subsampling == "422":
        blocks = blocks_422(img)
    else:
        blocks = blocks_444(img)
    dct = dct8x8_aan(blocks)
    return zigzag_blocks(dct.reshape(-1, 64).astype(jnp.float32))


def _trellis_coefficients(
    img: np.ndarray, options: JpegOptions, quant: QuantizationTables,
    pattern: Sequence[int], mode: str = None,
) -> np.ndarray:
    """``mode``: "host" / "device" / None (None consults PIXO_TPU_TRELLIS,
    default host).  The batch entry points pass "device" when the total
    block count exceeds the measured crossover (parallel.pipeline)."""
    import os

    from ..jpeg.tables import ZIGZAG
    from . import trellis

    if mode is None:
        mode = os.environ.get("PIXO_TPU_TRELLIS", "host")
    color = "gray" if options.color_type == ColorType.GRAY else "rgb"
    sub = options.subsampling.value
    lum_zz = quant.luminance_table[ZIGZAG]
    chrom_zz = quant.chrominance_table[ZIGZAG]
    if mode != "device" and (
        _coeff_tier() == "host" or auto_host_tier("PIXO_TPU_COEFFS")
    ):
        # host trellis fed by the native AVX2 DCT: same AAN op order as
        # the device tier (bit-equal; contract-off), no XLA dispatch.
        # On XLA:CPU the jit DCT additionally FMA-contracts inside large
        # fusions (half-ULP drift on ~46% of values), so the native
        # front-end is the MORE faithful one there — it matches the TPU
        # backend and the WASM oracle bit-for-bit.
        from ..native import native_jpeg_dct_zz

        nat_mode = "gray" if color == "gray" else sub
        dct_nat = native_jpeg_dct_zz(img, nat_mode)
        if dct_nat is not None:
            return trellis.trellis_quantize(dct_nat, pattern, lum_zz, chrom_zz)
    dct_dev = _device_dct_zz(jnp.asarray(img), color=color, subsampling=sub)
    if mode == "device":
        # fused path: DCT output stays on device, only the quantized int16
        # stream comes back (half the round-trip traffic of host trellis)
        from ..ops.trellis_device import trellis_quantize_batch_device

        nb = dct_dev.shape[0]
        pat = np.asarray(pattern, np.int32)
        sel = np.tile(pat, nb // len(pattern) + 1)[:nb] != 0
        q = np.where(
            sel[:, None], chrom_zz[None, :].astype(np.float32),
            lum_zz[None, :].astype(np.float32),
        )
        out = trellis_quantize_batch_device(dct_dev, jnp.asarray(q))
        return np.asarray(out).astype(np.int16)
    return trellis.trellis_quantize(np.asarray(dct_dev), pattern, lum_zz, chrom_zz)


def _pack(
    zz: np.ndarray,
    pattern: Sequence[int],
    tables: HuffmanTables,
    restart_interval: Optional[int],
) -> bytes:
    from ..native import native_available, native_pack_scan

    if native_available():
        return native_pack_scan(zz, pattern, tables, restart_interval)
    return packer.pack_scan(zz, pattern, tables, restart_interval)


def _count(
    zz: np.ndarray, pattern: Sequence[int], restart_interval: Optional[int]
):
    # PIXO_TPU_HUFFMAN=device computes the optimize-Huffman histograms
    # on device (BASELINE.json's histogram-pass mapping; the d2h payload
    # is four small histograms instead of a second host pass over the
    # [N, 64] stream). Default stays host: the coefficients land on the
    # host for entropy packing anyway, so host counting adds no transfer.
    if os.environ.get("PIXO_TPU_HUFFMAN") == "device":
        from ..ops.huffman_device import count_symbols_device

        return count_symbols_device(zz, pattern, restart_interval)
    from ..native import native_available, native_count_symbols

    if native_available():
        return native_count_symbols(zz, pattern, restart_interval)
    return packer.count_symbols(zz, pattern, restart_interval)


def _build_tables(
    zz: np.ndarray,
    pattern: Sequence[int],
    options: JpegOptions,
) -> HuffmanTables:
    if not (options.optimize_huffman or options.optimal_huffman):
        return HuffmanTables.default()
    dc_lum, dc_chrom, ac_lum, ac_chrom = _count(zz, pattern, options.restart_interval)
    is_gray = options.color_type == ColorType.GRAY
    built = HuffmanTables.optimized_from_counts(
        dc_lum,
        None if is_gray else dc_chrom,
        ac_lum,
        None if is_gray else ac_chrom,
        optimal=options.optimal_huffman,
    )
    return built if built is not None else HuffmanTables.default()


def _as_image_array(data, options: JpegOptions, bpp: int) -> np.ndarray:
    if isinstance(data, np.ndarray) and data.ndim >= 2:
        arr = data
    else:
        arr = np.frombuffer(bytes(data), dtype=np.uint8)
        shape = (options.height, options.width) if bpp == 1 else (
            options.height, options.width, bpp)
        arr = arr.reshape(shape)
    if arr.dtype != np.uint8:
        raise errors.UnsupportedColorType("pixel data must be uint8")
    if bpp == 1 and arr.ndim == 3:
        arr = arr[..., 0]
    return np.ascontiguousarray(arr)


def _emit_jpeg(
    zz: np.ndarray,
    img: np.ndarray,
    options: JpegOptions,
    quant: QuantizationTables,
    pattern: Sequence[int],
    trellis_mode: str = None,
) -> bytes:
    """Frame + entropy-code one image from its device coefficients."""
    out = bytearray()
    markers.write_soi(out)
    markers.write_app0(out)
    markers.write_dqt(out, quant)
    if options.progressive:
        from . import progressive

        # Trellis applies to the progressive coefficient pass only (parity:
        # the reference's baseline scan never consults use_trellis).
        zz_scan = (
            _trellis_coefficients(img, options, quant, pattern, trellis_mode)
            if options.trellis_quant
            else zz
        )
        sa = getattr(options, "progressive_sa", True)
        huff = None
        if not sa:
            # Single-table mode (parity script): tables counted over the
            # actual scan symbols so EOBn codes exist (progressive.py's
            # divergence note), one DHT up front.
            script = progressive.get_script(options)
            comp_blocks = progressive.split_components(
                zz_scan, pattern, options.width, options.height
            )
            is_gray = options.color_type == ColorType.GRAY
            huff = progressive.build_progressive_tables(
                comp_blocks, script, is_gray, optimal=options.optimal_huffman
            )
            if huff is None:
                huff = HuffmanTables()
        markers.write_sof(
            out, markers.SOF2, options.width, options.height,
            options.color_type, options.subsampling,
        )
        if huff is not None:
            markers.write_dht(out, huff)
        # SA mode: per-scan optimized tables, each DHT emitted by
        # encode_progressive right before its scan (libjpeg/mozjpeg
        # optimize_coding scheme).
        # restart_interval is ignored in progressive mode: the progressive
        # scan coders emit no RSTn markers, so advertising a DRI interval
        # desyncs decoders (the reference has this bug — it writes DRI at
        # src/jpeg/mod.rs:409 but its scans never restart; not reproduced).
        progressive.encode_progressive(out, zz_scan, pattern, options, huff)
    else:
        huff = (
            _build_tables(zz, pattern, options)
            if zz is not None
            else HuffmanTables.default()
        )
        markers.write_sof(
            out, markers.SOF0, options.width, options.height,
            options.color_type, options.subsampling,
        )
        markers.write_dht(out, huff)
        if options.restart_interval is not None:
            markers.write_dri(out, options.restart_interval)
        markers.write_sos(out, options.color_type)
        payload = None
        if zz is None:
            # Fused latency tier (see _fused_ok): coefficients + pack in
            # one native call, byte-identical to the two-stage path.
            from ..native import native_jpeg_encode_scan

            if options.color_type == ColorType.GRAY:
                mode = "gray"
            else:
                mode = options.subsampling.value
            payload = native_jpeg_encode_scan(
                img, mode, quant.luminance_table, quant.chrominance_table,
                pattern, huff, options.restart_interval,
            )
        if payload is None:
            if zz is None:
                zz = compute_coefficients(img, options, quant)
            payload = _pack(zz, pattern, huff, options.restart_interval)
        out += payload
    markers.write_eoi(out)
    return bytes(out)


def _emit_with_sa_fallback(
    zz, img, options: JpegOptions, quant: QuantizationTables,
    pattern: Sequence[int], n_blocks: int, trellis_mode: str = None,
) -> bytes:
    """_emit_jpeg plus the small-image SA fallback, shared by the
    single-image and batch entry points so batch == single byte-for-byte.

    Small images: the SA script's 18 per-scan DHT+SOS headers can
    outweigh its entropy win (measured crossover is well under 2048
    blocks); emit the 7-scan single-table variant too and keep the
    smaller file. Cheap where it triggers — blocks are few."""
    out = _emit_jpeg(zz, img, options, quant, pattern, trellis_mode)
    if (
        options.progressive
        and getattr(options, "progressive_sa", True)
        and n_blocks <= 2048
    ):
        alt = _emit_jpeg(
            zz, img, options.replace(progressive_sa=False), quant, pattern,
            trellis_mode,
        )
        if len(alt) < len(out):
            return alt
    return out


def _fused_ok(options: JpegOptions) -> bool:
    """True when the baseline default-table configuration (exactly the
    fast preset / one-shot CLI default) can take the single-call fused
    native path: coefficients+pack in C++, no [nblocks, 64] int16
    materialization and one ctypes crossing instead of two. Optimized-
    Huffman encodes need the coefficient array for the counting pass,
    and progressive re-derives coefficients itself, so neither fuses."""
    if options.progressive or options.optimize_huffman or options.optimal_huffman:
        return False
    if not (_coeff_tier() == "host" or auto_host_tier("PIXO_TPU_COEFFS")):
        return False
    from ..native import native_has_fused_encode

    return native_has_fused_encode()


def encode(data, options: JpegOptions) -> bytes:
    """Encode one image (flat bytes or [H, W, C] uint8 array) to JPEG bytes."""
    if isinstance(data, np.ndarray):
        data_len = data.size
    else:
        data_len = len(data)
    bpp = _validate(options, data_len)
    img = _as_image_array(data, options, bpp)

    quant = QuantizationTables(options.quality)
    color = "gray" if options.color_type == ColorType.GRAY else "rgb"
    sub = options.subsampling.value
    n_mcus, bpm, pattern = scan_layout(options.width, options.height, color, sub)
    # progressive + trellis re-derives its coefficients inside _emit_jpeg
    # (the reference's baseline scan never consults use_trellis, so the
    # plain-quantized pass exists only for the non-trellis paths) — was a
    # full wasted DCT+quantize pass, ~40% of max-preset encode at 3 MP
    zz = (
        None
        if (options.progressive and options.trellis_quant) or _fused_ok(options)
        else compute_coefficients(img, options, quant)
    )
    return _emit_with_sa_fallback(
        zz, img, options, quant, pattern, n_mcus * bpm
    )


@functools.partial(jax.jit, static_argnames=("color", "subsampling"))
def _device_coeffs_batch(imgs, lum_q, chrom_q, *, color: str, subsampling: str):
    """[B, H, W, C?] uint8 -> [B, nblocks, 64] int16 zigzag coeffs."""
    fn = functools.partial(
        _device_coeffs.__wrapped__, color=color, subsampling=subsampling
    )
    return jax.vmap(lambda im: fn(im, lum_q, chrom_q))(imgs)


def encode_batch(imgs: np.ndarray, options: JpegOptions) -> List[bytes]:
    """Encode a batch [B, H, W, C] of same-shape images.

    The device computes coefficients for the whole batch in one dispatch
    (the TPU analog of the reference's rayon block parallelism,
    ``src/jpeg/mod.rs:1137-1230``); the host packs each stream.
    """
    b = imgs.shape[0]
    bpp = _validate(options, imgs[0].size)
    del bpp
    quant = QuantizationTables(options.quality)
    color = "gray" if options.color_type == ColorType.GRAY else "rgb"
    sub = options.subsampling.value
    n_mcus, bpm, pattern = scan_layout(options.width, options.height, color, sub)
    n_blocks = n_mcus * bpm

    # progressive+trellis re-derives coefficients inside _emit_jpeg; the
    # plain-quantized pass would be dead work (see encode())
    plain_unused = options.progressive and options.trellis_quant

    if _coeff_tier() == "host" or auto_host_tier("PIXO_TPU_COEFFS"):
        # host tier: the native AVX2 pipeline per image on a thread pool
        # (ctypes releases the GIL) — no XLA dispatch at all
        import concurrent.futures

        fused = _fused_ok(options)

        def one(i: int) -> bytes:
            zz = (
                None
                if plain_unused or fused
                else compute_coefficients_host(imgs[i], options, quant)
            )
            return _emit_with_sa_fallback(
                zz, imgs[i], options, quant, pattern, n_blocks
            )

        with concurrent.futures.ThreadPoolExecutor() as ex:
            return list(ex.map(one, range(b)))

    if plain_unused:
        return [
            _emit_with_sa_fallback(
                None, imgs[i], options, quant, pattern, n_blocks
            )
            for i in range(b)
        ]
    lum = jnp.asarray(quant.luminance_table.reshape(8, 8))
    chrom = jnp.asarray(quant.chrominance_table.reshape(8, 8))
    zz_all = np.asarray(
        _device_coeffs_batch(jnp.asarray(imgs), lum, chrom, color=color, subsampling=sub)
    )

    return [
        _emit_with_sa_fallback(
            zz_all[i], imgs[i], options, quant, pattern, n_blocks
        )
        for i in range(b)
    ]
