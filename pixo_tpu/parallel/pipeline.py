"""Sharded batch pipelines: the TPU analog of the reference's rayon layer.

- ``jpeg_coeffs_sharded``: one jit dispatch computes zigzag coefficients
  for a whole batch sharded across the mesh (DP over images; the TPU
  equivalent of rayon block parallelism, pixo ``src/jpeg/mod.rs:1137-1230``).
- ``encode_jpeg_batch_sharded`` / ``encode_png_batch_sharded``: device
  fan-out + multithreaded native host packing (ctypes releases the GIL,
  so a thread pool gives true host parallelism — the analog of the
  reference's rayon work-stealing).
- ``thumbnail_pipeline``: decode -> resize -> re-encode over a batch with
  a double-buffered device/host overlap (the pipeline-parallel analog of
  the reference's main-thread <-> web-worker split,
  ``web/src/lib/compress-client.ts:16-63``).
"""

from __future__ import annotations

import concurrent.futures
import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..color import ColorType
from ..jpeg import encoder as jenc
from ..jpeg.tables import QuantizationTables
from ..options import JpegOptions, PngOptions, ResizeFilter, ResizeOptions, Subsampling
from ..ops.blockify import scan_layout
from .mesh import batch_sharding, make_mesh


def _color_sub(options: JpegOptions):
    color = "gray" if options.color_type == ColorType.GRAY else "rgb"
    sub = "420" if options.subsampling == Subsampling.S420 else "444"
    return color, sub


@functools.lru_cache(maxsize=64)
def _coeffs_jitted(color: str, sub: str, sharding):
    """Cached jitted sharded-coefficients step: rebuilding jax.jit(lambda)
    per call would recompile on every batch of a stream."""
    fn = functools.partial(
        jenc._device_coeffs_batch.__wrapped__, color=color, subsampling=sub
    )
    return jax.jit(fn, out_shardings=sharding)


def jpeg_coeffs_sharded(imgs, options: JpegOptions, mesh=None):
    """[B, H, W, C] uint8 -> [B, nblocks, 64] int16 coefficients, with the
    batch axis sharded across the mesh. Returns a sharded jax array."""
    mesh = mesh or make_mesh()
    color, sub = _color_sub(options)
    quant = QuantizationTables(options.quality)
    lum = jnp.asarray(quant.luminance_table.reshape(8, 8))
    chrom = jnp.asarray(quant.chrominance_table.reshape(8, 8))
    sharding = batch_sharding(mesh)
    b = imgs.shape[0]
    n_dev = mesh.devices.size
    pad = (-b) % n_dev
    arr = jnp.asarray(imgs)
    if pad:
        arr = jnp.concatenate([arr, jnp.repeat(arr[:1], pad, axis=0)], axis=0)
    imgs_sharded = jax.device_put(arr, sharding)
    out = _coeffs_jitted(color, sub, sharding)(imgs_sharded, lum, chrom)
    return out[:b] if pad else out


def _use_sparse_fast_path(options: JpegOptions) -> bool:
    from ..native import native_available

    return (not options.optimize_huffman and not options.progressive
            and native_available())


def _pack_compacted_batch(
    zz_dev, compacted, n: int, options: JpegOptions, pattern,
    ex: concurrent.futures.ThreadPoolExecutor,
) -> List[bytes]:
    """Fetch device-compacted (position,value) streams and entropy-pack on
    host threads (ctypes releases the GIL -> true host parallelism). Falls
    back to the dense threaded packer on compaction overflow."""
    from ..jpeg.tables import HuffmanTables
    from ..native import (
        native_pack_scan,
        native_pack_scan_batch,
        native_pack_scan_sparse,
    )

    huff = HuffmanTables()
    dc_d, counts_d, poss_d, vals_d, total_d = compacted
    totals = np.asarray(total_d)
    cap = poss_d.shape[1]
    if (totals <= cap).all():
        dc_h, counts_h = np.asarray(dc_d), np.asarray(counts_d)
        poss_h, vals_h = np.asarray(poss_d), np.asarray(vals_d)

        def pack_sparse(i: int) -> bytes:
            return native_pack_scan_sparse(
                dc_h[i], counts_h[i], poss_h[i], vals_h[i],
                pattern, huff, options.restart_interval,
            )

        return list(ex.map(pack_sparse, range(n)))
    zz_all = np.asarray(zz_dev)
    return native_pack_scan_batch(
        zz_all, pattern, huff, options.restart_interval,
        nthreads=ex._max_workers,
    ) or [
        native_pack_scan(zz_all[i], pattern, huff, options.restart_interval)
        for i in range(n)
    ]


def _assemble_jpeg(scan: bytes, options: JpegOptions, quant) -> bytes:
    """Wrap a baseline std-table entropy scan in the JPEG marker frame."""
    from ..jpeg import markers
    from ..jpeg.tables import HuffmanTables

    out = bytearray()
    markers.write_soi(out)
    markers.write_app0(out)
    markers.write_dqt(out, quant)
    markers.write_sof(
        out, markers.SOF0, options.width, options.height,
        options.color_type, options.subsampling,
    )
    markers.write_dht(out, HuffmanTables())
    if options.restart_interval is not None:
        markers.write_dri(out, options.restart_interval)
    markers.write_sos(out, options.color_type)
    out += scan
    markers.write_eoi(out)
    return bytes(out)


def encode_jpeg_batch_sharded(
    imgs: np.ndarray,
    options: JpegOptions,
    mesh=None,
    host_workers: int = 8,
) -> List[bytes]:
    """Batched JPEG encode: sharded device coefficients + threaded packing.

    Fast path (baseline + std tables): the device compacts the coefficient
    stream (ops/sparse_pack.py) so the host fetches ~5x fewer bytes over
    PCIe and the packer touches ~3 B per nonzero AC."""
    quant = QuantizationTables(options.quality)
    color, sub = _color_sub(options)
    _, _, pattern = scan_layout(options.width, options.height, color, sub)

    if _use_sparse_fast_path(options):
        from ..ops.sparse_pack import sparsify_blocks_batch

        zz_dev = jpeg_coeffs_sharded(imgs, options, mesh)
        compacted = sparsify_blocks_batch(zz_dev)
        with concurrent.futures.ThreadPoolExecutor(
            max_workers=host_workers
        ) as ex:
            scans = _pack_compacted_batch(
                zz_dev, compacted, imgs.shape[0], options, pattern, ex
            )
        if scans is not None:
            return [_assemble_jpeg(s, options, quant) for s in scans]

    zz_all = np.asarray(jpeg_coeffs_sharded(imgs, options, mesh))

    def pack_one(i: int) -> bytes:
        return jenc._emit_jpeg(zz_all[i], imgs[i], options, quant, pattern)

    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        return list(ex.map(pack_one, range(imgs.shape[0])))


def encode_png_batch_sharded(
    imgs: np.ndarray,
    options: PngOptions,
    mesh=None,
    host_workers: int = 8,
) -> List[bytes]:
    """Batched PNG encode: one fused device dispatch filters the whole
    batch; DEFLATE + chunk framing fan out over host threads.

    Falls back to per-image encoding when per-image reductions or
    quantization are enabled (those produce image-dependent layouts)."""
    from ..options import QuantizationMode
    from ..png import chunks as pchunks
    from ..png import encoder as penc

    simple = (
        not options.reduce_color_type
        and not options.reduce_palette
        and not options.optimize_alpha
        and options.quantization.mode == QuantizationMode.OFF
    )
    if not simple:
        with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
            return list(
                ex.map(lambda i: penc.encode(imgs[i], options), range(imgs.shape[0]))
            )

    from ..ops.png_filters import apply_filters_batch

    b = imgs.shape[0]
    w, h = options.width, options.height
    bpp = options.color_type.bytes_per_pixel
    penc._validate(options, imgs[0].size)
    row_bytes = w * bpp
    filtered = apply_filters_batch(
        imgs.reshape(b, -1), w, h, row_bytes, bpp, options.filter_strategy
    )

    def finish(i: int) -> bytes:
        out = bytearray()
        out += pchunks.PNG_SIGNATURE
        pchunks.write_ihdr(out, w, h, 8, options.color_type.png_color_type)
        compressed = penc._compress(filtered[i], options)
        pchunks.write_idat_chunks(out, compressed)
        pchunks.write_iend(out)
        return bytes(out)

    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        return list(ex.map(finish, range(b)))


def encode_jpeg_stream(
    batches,
    options: JpegOptions,
    mesh=None,
    host_workers: int = 8,
):
    """Double-buffered device->host encode pipeline (the PP analog of the
    reference's main-thread <-> worker split, SURVEY §2.8).

    ``batches`` is an iterable of [B, H, W, C] uint8 arrays. While the
    host packs batch i, the device already computes coefficients for
    batch i+1; JAX's async dispatch provides the overlap — we simply keep
    one batch in flight. Yields lists of encoded bytes per batch.
    """
    mesh = mesh or make_mesh()
    quant = QuantizationTables(options.quality)
    color, sub = _color_sub(options)
    _, _, pattern = scan_layout(options.width, options.height, color, sub)

    sparse = _use_sparse_fast_path(options)
    if sparse:
        from ..ops.sparse_pack import sparsify_blocks_batch

    def dispatch(imgs):
        zz_dev = jpeg_coeffs_sharded(imgs, options, mesh)  # async dispatch
        compacted = sparsify_blocks_batch(zz_dev) if sparse else None
        return imgs, zz_dev, compacted

    def finish(prev, ex) -> List[bytes]:
        imgs, zz_dev, compacted = prev  # fetches wait on batch i-1 only
        if sparse:
            scans = _pack_compacted_batch(
                zz_dev, compacted, imgs.shape[0], options, pattern, ex
            )
            return [_assemble_jpeg(s, options, quant) for s in scans]
        zz_host = np.asarray(zz_dev)
        return list(
            ex.map(
                lambda i: jenc._emit_jpeg(
                    zz_host[i], imgs[i], options, quant, pattern
                ),
                range(imgs.shape[0]),
            )
        )

    prev = None
    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        for imgs in iter(batches):
            nxt = dispatch(imgs)
            if prev is not None:
                yield finish(prev, ex)
            prev = nxt
        if prev is not None:
            yield finish(prev, ex)


def decode_jpeg_batch(
    encoded: Sequence[bytes], host_workers: int = 8
) -> List["object"]:
    """Threaded batched JPEG decode (entropy stage releases the GIL in C++)."""
    from ..decode import decode_jpeg

    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        return list(ex.map(decode_jpeg, encoded))


def decode_png_batch(
    encoded: Sequence[bytes], host_workers: int = 8
) -> List["object"]:
    """Threaded batched PNG decode (inflate/unfilter release the GIL)."""
    from ..decode import decode_png

    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        return list(ex.map(decode_png, encoded))


def thumbnail_pipeline(
    encoded: Sequence[bytes],
    thumb_size: int = 128,
    quality: int = 85,
    host_workers: int = 8,
) -> List[bytes]:
    """Batched decode -> resize -> re-encode (BASELINE.json config #5).

    Stage 1 (host threads): entropy decode of inputs.
    Stage 2 (device): batched resize for same-shape groups.
    Stage 3 (host threads + device): JPEG re-encode.
    """
    from ..cli import load_image
    from ..resize import resize as do_resize

    def decode_one(data: bytes):
        px, w, h, _ct = load_image(data)
        return px, w, h

    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        decoded = list(ex.map(decode_one, encoded))

    # Stage 2: resize each image on device (per-shape jit caches by shape;
    # repeated shapes in a corpus amortize to one compile).
    thumbs = np.empty((len(decoded), thumb_size, thumb_size, 3), np.uint8)
    for i, (px, w, h) in enumerate(decoded):
        if px.shape[2] == 4:
            px = px[..., :3]
        elif px.shape[2] == 2:
            px = np.repeat(px[..., :1], 3, axis=-1)
        elif px.shape[2] == 1:
            px = np.repeat(px, 3, axis=-1)
        ropts = ResizeOptions(
            src_width=w, src_height=h, dst_width=thumb_size, dst_height=thumb_size,
            color_type=ColorType.RGB, filter=ResizeFilter.LANCZOS3,
        )
        thumbs[i] = do_resize(np.ascontiguousarray(px), ropts)

    # Stage 3: one batched sharded device dispatch + threaded packing.
    jopts = JpegOptions(
        width=thumb_size, height=thumb_size, quality=quality,
        color_type=ColorType.RGB,
    )
    return encode_jpeg_batch_sharded(thumbs, jopts, host_workers=host_workers)
