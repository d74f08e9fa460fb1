"""Independent minimal PNG writer for conformance tests.

Deliberately shares NO code with pixo_tpu: chunks, bit packing, Adam7
pass extraction, and row filtering are implemented from the PNG spec
directly (struct + zlib only). This stands in for the PNGSuite corpus
(reference: tests/support/pngsuite.rs downloads the real files; this
environment has no egress), generating every valid
(color type x bit depth x interlace x filter) combination so the
decoder is exercised on *foreign* files, not just its own encoder's
output.
"""

import struct
import zlib

import numpy as np

# (x_start, y_start, x_step, y_step) per PNG spec Adam7 table
ADAM7_PASSES = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]

CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def _pack_rows(samples: np.ndarray, bit_depth: int) -> np.ndarray:
    """[H, W*C] int samples -> [H, row_bytes] uint8 (MSB-first packing)."""
    h, n = samples.shape
    if bit_depth == 8:
        return samples.astype(np.uint8)
    if bit_depth == 16:
        out = np.zeros((h, n * 2), np.uint8)
        out[:, 0::2] = (samples >> 8).astype(np.uint8)
        out[:, 1::2] = (samples & 0xFF).astype(np.uint8)
        return out
    # sub-byte: spread each sample into bit_depth bits, MSB-first
    bits = np.zeros((h, n, bit_depth), np.uint8)
    for b in range(bit_depth):
        bits[:, :, b] = (samples >> (bit_depth - 1 - b)) & 1
    flat = bits.reshape(h, -1)
    pad = (-flat.shape[1]) % 8
    if pad:
        flat = np.pad(flat, ((0, 0), (0, pad)))
    return np.packbits(flat, axis=1)


def _filter_rows(packed: np.ndarray, bpp: int, mode) -> bytes:
    """Apply PNG filters to packed rows. ``mode`` is None (filter 0),
    an int (fixed filter), or 'cycle' (row index % 5)."""
    h, rb = packed.shape
    out = bytearray()
    prev = np.zeros(rb, np.int32)
    for y in range(h):
        cur = packed[y].astype(np.int32)
        f = 0 if mode is None else (y % 5 if mode == "cycle" else int(mode))
        left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]]) if rb > 0 else cur
        up_left = (
            np.concatenate([np.zeros(bpp, np.int32), prev[:-bpp]]) if rb > 0 else prev
        )
        if f == 0:
            filt = cur
        elif f == 1:
            filt = cur - left
        elif f == 2:
            filt = cur - prev
        elif f == 3:
            filt = cur - (left + prev) // 2
        else:
            p = left + prev - up_left
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - up_left)
            pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, up_left))
            filt = cur - pred
        out.append(f)
        out += (filt & 0xFF).astype(np.uint8).tobytes()
        prev = cur
    return bytes(out)


def write_png(
    samples: np.ndarray,
    bit_depth: int,
    color_type: int,
    palette: np.ndarray = None,
    trns: bytes = None,
    interlace: int = 0,
    filter_mode=None,
    level: int = 6,
) -> bytes:
    """Build a complete PNG file.

    ``samples``: [H, W] ints (gray/palette) or [H, W, C] ints; values must
    already fit ``bit_depth``. ``palette``: [N, 3] uint8 for color type 3.
    ``trns``: raw tRNS chunk payload bytes (palette alphas or colorkey).
    """
    if samples.ndim == 2:
        samples = samples[:, :, None]
    h, w, c = samples.shape
    assert c == CHANNELS[color_type]
    samples = samples.reshape(h, w * c).astype(np.int64)
    bpp = max((c * bit_depth) // 8, 1)

    if interlace:
        raw = bytearray()
        full = samples.reshape(h, w, c)
        for (x0, y0, dx, dy) in ADAM7_PASSES:
            sub = full[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            packed = _pack_rows(sub.reshape(sub.shape[0], -1), bit_depth)
            raw += _filter_rows(packed, bpp, filter_mode)
        raw = bytes(raw)
    else:
        packed = _pack_rows(samples, bit_depth)
        raw = _filter_rows(packed, bpp, filter_mode)

    out = bytearray(b"\x89PNG\r\n\x1a\n")
    out += _chunk(
        b"IHDR",
        struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, interlace),
    )
    if palette is not None:
        out += _chunk(b"PLTE", np.asarray(palette, np.uint8).tobytes())
    if trns is not None:
        out += _chunk(b"tRNS", trns)
    out += _chunk(b"IDAT", zlib.compress(raw, level))
    out += _chunk(b"IEND", b"")
    return bytes(out)
