"""JPEG decoder: baseline + progressive.

Baseline behavioral parity with pixo ``src/decode/jpeg.rs``:
  - marker parse (APP skip, DQT 8/16-bit, SOF0, DHT, DRI, SOS),
  - Huffman entropy decode with restart-marker handling and 0xFF00
    unstuffing,
  - then the batched device pipeline: dequant + integer IDCT + nearest
    upsample + fixed-point YCbCr->RGB (pixo_tpu.ops.jpeg_decode).

Progressive (SOF2) decode is beyond parity — the reference *rejects*
progressive files (src/decode/jpeg.rs SOF2 branch), which means its own
max-preset encoder output cannot be fed back through its CLI. Here the
full T.81 G.1.2 scan set is supported (spectral selection + successive
approximation: DC first/refine, AC first/refine with EOB runs), so our
progressive output round-trips through our own decoder.

The entropy stage is host-sequential (per-symbol bit stream); everything
after it is one fused device dispatch over all blocks.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from .. import errors
from ..color import ColorType
from ..ops.jpeg_decode import (
    assemble_plane,
    dequant_idct_blocks,
    upsample_nearest,
    upsample_triangle,
    ycbcr_to_rgb_int,
)

SOF_UNSUPPORTED = {0xC1, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF}


@dataclasses.dataclass
class JpegImage:
    width: int
    height: int
    color_type: ColorType
    pixels: np.ndarray  # [H, W, 3] RGB or [H, W] gray

    @property
    def data(self) -> bytes:
        return self.pixels.tobytes()


@dataclasses.dataclass
class _Component:
    comp_id: int
    h: int
    v: int
    quant_id: int
    dc_table: int = 0
    ac_table: int = 0


class _HuffTable:
    """Canonical decode table: per-length (min_code, max_code, value offset)."""

    __slots__ = ("min_code", "max_code", "val_idx", "vals", "lut", "spec")

    LUT_BITS = 8

    def __init__(self, bits: bytes, vals: bytes):
        if len(bits) != 16:
            raise errors.InvalidDecode("truncated DHT segment")
        if len(vals) < sum(bits):
            raise errors.InvalidDecode("truncated DHT value list")
        self.vals = vals
        self.spec = (bytes(bits), bytes(vals))  # for the native decoders
        self.min_code = [0] * 17
        self.max_code = [-1] * 17
        self.val_idx = [0] * 17
        code = 0
        k = 0
        for ln in range(1, 17):
            count = bits[ln - 1]
            if count:
                self.val_idx[ln] = k
                self.min_code[ln] = code
                self.max_code[ln] = code + count - 1
                k += count
                code += count
            if code > (1 << ln):
                # over-subscribed canonical code space (Kraft sum > 1)
                raise errors.InvalidDecode("invalid DHT code counts")
            code <<= 1
        self.lut = None  # built on first Python-tier decode; the native
        # decoders only consume .spec, so eager construction would cost
        # ~0.2 ms/image of pure-Python loops for nothing

    def _build_lut(self):
        bits, vals = self.spec
        # fast 8-bit lookahead: (symbol, length) or (-1, 0)
        self.lut = [(-1, 0)] * (1 << self.LUT_BITS)
        code = 0
        k = 0
        for ln in range(1, self.LUT_BITS + 1):
            for _ in range(bits[ln - 1]):
                prefix = code << (self.LUT_BITS - ln)
                for fill in range(1 << (self.LUT_BITS - ln)):
                    self.lut[prefix | fill] = (vals[k], ln)
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_MsbReader") -> int:
        if self.lut is None:
            self._build_lut()
        peek = reader.peek(self.LUT_BITS)
        sym, ln = self.lut[peek]
        if ln and reader.has_bits(ln):
            reader.consume(ln)
            return sym
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if self.max_code[ln] >= 0 and code <= self.max_code[ln] and code >= self.min_code[ln]:
                return self.vals[self.val_idx[ln] + code - self.min_code[ln]]
        raise errors.InvalidDecode("invalid Huffman code")


class _MsbReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 48 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def has_bits(self, n: int) -> bool:
        if self.nbits < n:
            self._fill()
        return self.nbits >= n

    def peek(self, n: int) -> int:
        if self.nbits < n:
            self._fill()
        if self.nbits >= n:
            return (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        # zero-pad past the end
        avail = self.nbits
        return (self.acc << (n - avail)) & ((1 << n) - 1) if avail else 0

    def consume(self, n: int) -> None:
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1 if self.nbits else 0

    def read_bit(self) -> int:
        if not self.has_bits(1):
            raise errors.InvalidDecode("out of entropy data")
        self.nbits -= 1
        bit = (self.acc >> self.nbits) & 1
        self.acc &= (1 << self.nbits) - 1 if self.nbits else 0
        return bit

    def read_bits(self, n: int) -> int:
        if n == 0:
            return 0
        if not self.has_bits(n):
            raise errors.InvalidDecode("out of entropy data")
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1 if self.nbits else 0
        return v


def _extend(bits: int, size: int) -> int:
    """JPEG EXTEND: map `size`-bit magnitude bits to signed value."""
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (2 << (size - 1)) + 1
    return bits


def decode_jpeg(data: bytes, fancy_upsampling: bool = False) -> JpegImage:
    """Decode a baseline JPEG. ``fancy_upsampling=True`` uses libjpeg-style
    triangle chroma interpolation (beyond-parity quality option; the
    default nearest matches the reference decoder)."""
    if len(data) < 4 or data[0] != 0xFF or data[1] != 0xD8:
        raise errors.InvalidDecode("not a JPEG file (missing SOI)")
    pos = 2
    qtables: Dict[int, np.ndarray] = {}
    dc_tables: Dict[int, _HuffTable] = {}
    ac_tables: Dict[int, _HuffTable] = {}
    dc_specs: Dict[int, tuple] = {}
    ac_specs: Dict[int, tuple] = {}
    components: List[_Component] = []
    width = height = 0
    restart_interval = 0
    sof_seen = False
    progressive = False

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise errors.InvalidDecode("expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise errors.InvalidDecode("no scan data before EOI")
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if pos + 2 > len(data):
            raise errors.InvalidDecode("truncated marker segment")
        seg_len = (data[pos] << 8) | data[pos + 1]
        if seg_len < 2 or pos + seg_len > len(data):
            raise errors.InvalidDecode("invalid segment length")
        seg = data[pos + 2 : pos + seg_len]
        pos += seg_len

        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq = seg[i] >> 4
                tq = seg[i] & 0x0F
                i += 1
                nbytes = 128 if pq else 64
                if i + nbytes > len(seg):
                    raise errors.InvalidDecode("truncated DQT segment")
                if pq == 0:
                    qtables[tq] = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.uint16)
                else:
                    qtables[tq] = np.frombuffer(seg[i : i + 128], ">u2").astype(np.uint16)
                i += nbytes
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc = seg[i] >> 4
                th = seg[i] & 0x0F
                bits = seg[i + 1 : i + 17]
                total = sum(bits)
                if len(bits) < 16 or i + 17 + total > len(seg):
                    raise errors.InvalidDecode("truncated DHT segment")
                vals = seg[i + 17 : i + 17 + total]
                table = _HuffTable(bits, vals)
                if tc == 0:
                    dc_tables[th] = table
                    dc_specs[th] = (bits, vals)
                else:
                    ac_tables[th] = table
                    ac_specs[th] = (bits, vals)
                i += 17 + total
        elif marker in (0xC0, 0xC2):  # SOF0 baseline / SOF2 progressive
            sof_seen = True
            progressive = marker == 0xC2
            if len(seg) < 6:
                raise errors.InvalidDecode("truncated SOF segment")
            height = (seg[1] << 8) | seg[2]
            width = (seg[3] << 8) | seg[4]
            ncomp = seg[5]
            if seg[0] != 8:
                raise errors.UnsupportedDecode("non-8-bit precision")
            if ncomp not in (1, 3):
                raise errors.UnsupportedDecode(f"{ncomp} components")
            if len(seg) < 6 + 3 * ncomp:
                raise errors.InvalidDecode("truncated SOF segment")
            components = []
            for c in range(ncomp):
                off = 6 + c * 3
                comp = _Component(seg[off], seg[off + 1] >> 4, seg[off + 1] & 0x0F,
                                  seg[off + 2])
                if not (1 <= comp.h <= 4 and 1 <= comp.v <= 4):
                    raise errors.InvalidDecode("invalid sampling factors")
                components.append(comp)
            # fractional-ratio sampling (e.g. 3:2) has no integer upsample;
            # reject like libjpeg's "fractional sampling not implemented"
            sof_max_h = max(c.h for c in components)
            sof_max_v = max(c.v for c in components)
            for comp in components:
                if sof_max_h % comp.h or sof_max_v % comp.v:
                    raise errors.UnsupportedDecode("fractional sampling ratios")
        elif marker in SOF_UNSUPPORTED:
            raise errors.UnsupportedDecode(f"SOF marker 0xFF{marker:02X} (non-baseline)")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise errors.InvalidDecode("truncated DRI segment")
            restart_interval = (seg[0] << 8) | seg[1]
        elif marker == 0xDA:  # SOS
            if not sof_seen:
                raise errors.InvalidDecode("SOS before SOF")
            if not seg:
                raise errors.InvalidDecode("truncated SOS segment")
            if progressive:
                return _decode_progressive(
                    data, pos, seg, width, height, components, qtables,
                    dc_tables, ac_tables, restart_interval, fancy_upsampling,
                )
            ns = seg[0]
            if not 1 <= ns <= 4 or len(seg) < 1 + 2 * ns + 3:
                raise errors.InvalidDecode("truncated SOS segment")
            for c in range(ns):
                cid = seg[1 + c * 2]
                tsel = seg[2 + c * 2]
                for comp in components:
                    if comp.comp_id == cid:
                        comp.dc_table = tsel >> 4
                        comp.ac_table = tsel & 0x0F
            scan_data = data[pos:]
            return _decode_scan(
                scan_data, width, height, components, qtables,
                dc_tables, ac_tables, dc_specs, ac_specs, restart_interval,
                fancy_upsampling,
            )
    raise errors.InvalidDecode("no SOS marker found")


def _split_entropy(scan_data: bytes) -> Tuple[List[bytes], int]:
    """Split entropy-coded bytes at RST markers; unstuff 0xFF00.

    Returns (segments, consumed_length_up_to_EOI_or_end).

    Vectorized over 0xFF positions: the entropy stream contains ~1 0xFF
    per 256 bytes, so the Python loop touches only marker/stuffing sites
    and everything between them is a slice copy (the per-byte loop cost
    6+ ms per 512x512 decode).
    """
    arr = np.frombuffer(scan_data, np.uint8)
    n = len(scan_data)
    ff = np.nonzero(arr == 0xFF)[0]
    if len(ff) == 0:
        return [scan_data], n

    # Fast path (no restart markers): classify every 0xFF site at once,
    # truncate at the first real marker, and drop the stuffing zeros with
    # one vectorized delete. The per-site Python loop below costs ~0.5 ms
    # per photo-class 512x512 scan; this path is ~30 us.
    valid = ff + 1 < n
    nxt = np.full(len(ff), 0xFF, np.uint8)  # trailing 0xFF ends the scan
    nxt[valid] = arr[np.minimum(ff + 1, n - 1)][valid]
    is_stuff = (nxt == 0x00) & valid
    is_rst = (nxt >= 0xD0) & (nxt <= 0xD7) & valid
    is_end = ~(is_stuff | is_rst)
    if is_end.any():
        end_i = int(np.argmax(is_end))
        limit = int(ff[end_i])
        consumed_fast = limit
    else:
        end_i = len(ff)
        limit = n
        consumed_fast = n
    if not is_rst[:end_i].any():
        stuff_pos = ff[:end_i][is_stuff[:end_i]]
        seg = np.delete(arr[:limit], stuff_pos + 1).tobytes()
        return [seg], consumed_fast

    segments: List[bytes] = []
    parts: List[bytes] = []
    start = 0
    consumed = n
    for pos in ff:
        pos = int(pos)
        if pos < start:
            continue  # second byte of an already-consumed pair
        if pos + 1 >= n:
            parts.append(scan_data[start:pos])
            consumed = pos
            start = pos
            break
        nxt = arr[pos + 1]
        if nxt == 0x00:
            parts.append(scan_data[start:pos + 1])  # keep the 0xFF
            start = pos + 2
        elif 0xD0 <= nxt <= 0xD7:
            parts.append(scan_data[start:pos])
            segments.append(b"".join(parts))
            parts = []
            start = pos + 2
        else:  # real marker (EOI or otherwise): end of scan
            parts.append(scan_data[start:pos])
            consumed = pos
            start = pos
            break
    else:
        parts.append(scan_data[start:n])
        start = n
    segments.append(b"".join(parts))
    return segments, consumed if start != n else n


def _decode_scan(
    scan_data: bytes,
    width: int,
    height: int,
    components: List[_Component],
    qtables: Dict[int, np.ndarray],
    dc_tables: Dict[int, _HuffTable],
    ac_tables: Dict[int, _HuffTable],
    dc_specs: Dict[int, tuple],
    ac_specs: Dict[int, tuple],
    restart_interval: int,
    fancy_upsampling: bool = False,
) -> JpegImage:
    if width == 0 or height == 0:
        raise errors.InvalidDecode("zero dimensions")
    max_h = max(c.h for c in components)
    max_v = max(c.v for c in components)
    if max_h == 0 or max_v == 0 or max_h > 4 or max_v > 4:
        raise errors.InvalidDecode("invalid sampling factors")
    mcu_w = 8 * max_h
    mcu_h = 8 * max_v
    mcu_cols = (width + mcu_w - 1) // mcu_w
    mcu_rows = (height + mcu_h - 1) // mcu_h
    total_mcus = mcu_cols * mcu_rows

    for comp in components:
        if comp.quant_id not in qtables:
            raise errors.InvalidDecode("missing quantization table")
        if comp.dc_table not in dc_tables or comp.ac_table not in ac_tables:
            raise errors.InvalidDecode("missing Huffman table")

    segments, _ = _split_entropy(scan_data)

    comp_h = [c.h for c in components]
    comp_v = [c.v for c in components]
    if segments and _pixel_tier() == "host":
        # Fused whole-image native decode (entropy + IDCT + upsample +
        # color, one call, no coefficient round-trip).  None means the
        # library is missing, the geometry declined, or the stream is
        # corrupt — the two-stage path below re-runs and surfaces the
        # proper error, so semantics are unchanged.
        from ..native import native_jpeg_decode_baseline

        nat = native_jpeg_decode_baseline(
            segments, restart_interval, total_mcus, mcu_cols, mcu_rows,
            comp_h, comp_v, max_h, max_v, width, height,
            [dc_specs[c.dc_table] for c in components],
            [ac_specs[c.ac_table] for c in components],
            [qtables[c.quant_id].astype(np.uint16) for c in components],
            fancy=fancy_upsampling,
        )
        if nat is not None:
            if restart_interval and len(segments) < -(-total_mcus // restart_interval):
                raise errors.InvalidDecode("missing restart segment")
            ct = ColorType.GRAY if len(components) == 1 else ColorType.RGB
            return JpegImage(width, height, ct, nat)

    # Per-component coefficient stores over the MCU-padded block grid.
    # np.empty is safe: both the native decoder (memset per block) and the
    # Python fallback (whole-block assignment) write every block of the
    # padded grid before it is read.
    coeffs = [
        np.empty((mcu_rows * c.v * mcu_cols * c.h, 64), np.int16)
        for c in components
    ]

    from ..native import native_jpeg_decode_scan

    prev_dc_arr = np.zeros(len(components), np.int32)
    dcs = [dc_specs[c.dc_table] for c in components]
    acs = [ac_specs[c.ac_table] for c in components]
    # one native call for the whole scan: the segment loop (and the DC
    # predictor reset per restart segment) runs inside the library
    native_ok = bool(segments) and native_jpeg_decode_scan(
        segments, restart_interval, total_mcus, mcu_cols,
        comp_h, comp_v, dcs, acs, coeffs, prev_dc_arr
    )
    if native_ok and restart_interval and len(segments) < -(-total_mcus // restart_interval):
        raise errors.InvalidDecode("missing restart segment")
    if native_ok:
        return _finish_scan(coeffs, width, height, components, qtables,
                            mcu_cols, mcu_rows, max_h, max_v, fancy_upsampling)

    seg_idx = 0
    reader = _MsbReader(segments[0]) if segments else _MsbReader(b"")
    prev_dc = [0] * len(components)

    for mcu in range(total_mcus):
        if restart_interval and mcu > 0 and mcu % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise errors.InvalidDecode("missing restart segment")
            reader = _MsbReader(segments[seg_idx])
            prev_dc = [0] * len(components)
        my, mx = divmod(mcu, mcu_cols)
        for ci, comp in enumerate(components):
            dc_t = dc_tables[comp.dc_table]
            ac_t = ac_tables[comp.ac_table]
            for by in range(comp.v):
                for bx in range(comp.h):
                    block = np.zeros(64, np.int16)
                    # DC
                    s = dc_t.decode(reader)
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    # wrap like 16-bit coefficient storage would: a corrupt
                    # stream may accumulate past int16 without being invalid
                    # at any single step
                    prev_dc[ci] = ((prev_dc[ci] + diff + 0x8000) & 0xFFFF) - 0x8000
                    block[0] = prev_dc[ci]
                    # AC
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(reader)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise errors.InvalidDecode("AC index overflow")
                        block[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    row = my * comp.v + by
                    col = mx * comp.h + bx
                    coeffs[ci][row * (mcu_cols * comp.h) + col] = block

    return _finish_scan(coeffs, width, height, components, qtables,
                        mcu_cols, mcu_rows, max_h, max_v, fancy_upsampling)


def _pixel_tier() -> str:
    """"host" (NumPy mirrors; ~5x the XLA-CPU path for one image on a
    small host) or "device" (jnp kernels — the batch/TPU tier).  Env
    override PIXO_TPU_DECODE_PIXELS; default: host on the CPU backend,
    device otherwise.  Both tiers are bit-equal (test_kernel_equality)."""
    import os

    mode = os.environ.get("PIXO_TPU_DECODE_PIXELS")
    if mode in ("host", "device"):
        return mode
    try:
        import jax

        return "host" if jax.default_backend() == "cpu" else "device"
    except Exception:  # noqa: BLE001
        return "host"


def _finish_scan(coeffs, width, height, components, qtables,
                 mcu_cols, mcu_rows, max_h, max_v,
                 fancy_upsampling: bool = False) -> JpegImage:
    """Pixel tail: dequant + IDCT + assemble + upsample + color convert."""
    from ..ops.jpeg_decode import dequant_idct_blocks_np, ycbcr_to_rgb_int_np

    if _pixel_tier() == "host":
        from ..native import native_jpeg_decode_pixels

        nat = native_jpeg_decode_pixels(
            [np.asarray(coeffs[ci]) for ci in range(len(components))],
            [qtables[c.quant_id].astype(np.uint16) for c in components],
            [c.h for c in components], [c.v for c in components],
            mcu_cols, mcu_rows, max_h, max_v, width, height,
            fancy=fancy_upsampling,
        )
        if nat is not None:
            ct = ColorType.GRAY if len(components) == 1 else ColorType.RGB
            return JpegImage(width, height, ct, nat)
    if not fancy_upsampling and _pixel_tier() == "host":
        # NumPy fallback is nearest-only; fancy falls through to the jnp
        # tier below when the native path declines
        planes = []
        for ci, comp in enumerate(components):
            q = qtables[comp.quant_id].astype(np.int32)
            blocks = dequant_idct_blocks_np(
                np.asarray(coeffs[ci]), q[None, :]
            ).astype(np.int32)
            bw = mcu_cols * comp.h
            bh = mcu_rows * comp.v
            plane = blocks.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            plane = plane.reshape(bh * 8, bw * 8)
            if max_v // comp.v > 1:
                plane = np.repeat(plane, max_v // comp.v, axis=0)
            if max_h // comp.h > 1:
                plane = np.repeat(plane, max_h // comp.h, axis=1)
            planes.append(plane)
        if len(components) == 1:
            gray = planes[0][:height, :width].astype(np.uint8)
            return JpegImage(width, height, ColorType.GRAY, gray)
        y = planes[0][:height, :width]
        cb = planes[1][:height, :width] - 128
        cr = planes[2][:height, :width] - 128
        return JpegImage(
            width, height, ColorType.RGB, ycbcr_to_rgb_int_np(y, cb, cr)
        )

    planes = []
    for ci, comp in enumerate(components):
        q = qtables[comp.quant_id].astype(np.int32)
        blocks = dequant_idct_blocks(jnp.asarray(coeffs[ci]), jnp.asarray(q)[None, :])
        bw = mcu_cols * comp.h
        bh = mcu_rows * comp.v
        plane = assemble_plane(blocks.astype(jnp.int32), bw, bh)
        ups = upsample_triangle if fancy_upsampling else upsample_nearest
        plane = ups(plane, max_h // comp.h, max_v // comp.v)
        planes.append(plane)

    if len(components) == 1:
        gray = np.asarray(planes[0][:height, :width]).astype(np.uint8)
        return JpegImage(width, height, ColorType.GRAY, gray)

    y = planes[0][:height, :width]
    cb = planes[1][:height, :width] - 128
    cr = planes[2][:height, :width] - 128
    rgb = np.asarray(ycbcr_to_rgb_int(y, cb, cr))
    return JpegImage(width, height, ColorType.RGB, rgb)


# ===================== progressive (SOF2) scan decode ========================
# Beyond parity: the reference rejects SOF2 (src/decode/jpeg.rs). Algorithms
# follow ITU-T T.81 G.1.2 (the same successive-approximation scheme our
# encoder emits in pixo_tpu/jpeg/progressive.py), so max-preset output
# round-trips through our own decoder.


def _prog_dc_first(reader, dc_t, block, al, prev_dc, ci):
    s = dc_t.decode(reader)
    diff = _extend(reader.read_bits(s), s) if s else 0
    # wrap into int16 range (see the baseline scan): corruption-robust
    prev_dc[ci] = ((prev_dc[ci] + diff + 0x8000) & 0xFFFF) - 0x8000
    block[0] = (((prev_dc[ci] << al) + 0x8000) & 0xFFFF) - 0x8000


def _prog_dc_refine(reader, block, al):
    if reader.read_bit():
        block[0] = int(block[0]) | (1 << al)


def _prog_ac_first(reader, ac_t, block, ss, se, al, eobrun):
    """Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = ac_t.decode(reader)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            return eobrun
        k += r
        if k > se:
            raise errors.InvalidDecode("AC index overflow in progressive scan")
        block[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _prog_ac_refine(reader, ac_t, block, ss, se, al, eobrun):
    """T.81 G.1.2.3 correction-bit pass. Returns the updated EOB run."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = ac_t.decode(reader)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r < 15:
                    # full count here: the correction tail below handles the
                    # rest of the *current* block and then decrements
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # r == 15: ZRL — pass 16 zero-history coefficients
            else:
                if s != 1:
                    raise errors.InvalidDecode("invalid refinement magnitude")
                val = p1 if reader.read_bit() else m1
            # advance past `r` zero-history coefficients, applying
            # correction bits to every nonzero-history one along the way
            while k <= se:
                if block[k] != 0:
                    if reader.read_bit() and (int(block[k]) & p1) == 0:
                        block[k] += p1 if block[k] > 0 else m1
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val:
                if k > se:
                    raise errors.InvalidDecode("AC index overflow in refinement")
                block[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if block[k] != 0:
                if reader.read_bit() and (int(block[k]) & p1) == 0:
                    block[k] += p1 if block[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _seg_unit_ranges(nsegments, total_units, restart_interval):
    """Unit range [u0, u1) covered by each entropy segment of a scan."""
    if not restart_interval:
        return [(0, total_units)] + [(0, 0)] * (nsegments - 1)
    return [
        (si * restart_interval, min((si + 1) * restart_interval, total_units))
        for si in range(nsegments)
    ]


def _prog_dc_scan_native(segments, total_units, restart_interval, mcu_cols,
                         ns, scan_comps, components, blk_dims, dc_ts, ah, al,
                         coeffs) -> bool:
    """Run a whole progressive DC scan through the native decoder.

    Returns False when the native library is unavailable (the caller then
    runs the pure-Python unit loop); raises InvalidDecode on malformed
    entropy data or missing restart segments.
    """
    from ..native import NativeDecodeError, native_jpeg_prog_dc_segment

    scan_ci = [ci for ci, _, _ in scan_comps]
    ch = [components[ci].h for ci in scan_ci]
    cv = [components[ci].v for ci in scan_ci]
    bws = [blk_dims[ci][1] for ci in scan_ci]
    specs = [t.spec for t in dc_ts] if ah == 0 else None
    planes = [coeffs[ci] for ci in scan_ci]
    prev_dc = np.zeros(ns, np.int32)
    ranges = _seg_unit_ranges(len(segments), total_units, restart_interval)
    try:
        for seg, (u0, u1) in zip(segments, ranges):
            if u0 >= u1:
                continue
            prev_dc[:] = 0
            if not native_jpeg_prog_dc_segment(
                seg, u0, u1, mcu_cols, ns > 1, ch, cv, bws, specs, ah, al,
                planes, prev_dc,
            ):
                return False
    except NativeDecodeError:
        raise errors.InvalidDecode("invalid progressive entropy data")
    if restart_interval and len(segments) < -(-total_units // restart_interval):
        raise errors.InvalidDecode("missing restart segment")
    return True


def _prog_ac_scan_native(segments, total_units, restart_interval, stride, bw,
                         ss, se, ah, al, ac_t, plane) -> bool:
    """Run a whole progressive AC scan through the native decoder.

    Same contract as _prog_dc_scan_native. The EOB run resets at each
    restart segment (as the Python loop does) and carries across units
    within a segment.
    """
    from ..native import NativeDecodeError, native_jpeg_prog_ac_segment

    eobrun = np.zeros(1, np.int64)
    ranges = _seg_unit_ranges(len(segments), total_units, restart_interval)
    try:
        for seg, (u0, u1) in zip(segments, ranges):
            if u0 >= u1:
                continue
            eobrun[0] = 0
            if not native_jpeg_prog_ac_segment(
                seg, u0, u1, stride, bw, ss, se, ah, al, ac_t.spec, plane,
                eobrun,
            ):
                return False
    except NativeDecodeError:
        raise errors.InvalidDecode("invalid progressive entropy data")
    if restart_interval and len(segments) < -(-total_units // restart_interval):
        raise errors.InvalidDecode("missing restart segment")
    return True


def _decode_progressive(
    data: bytes,
    pos: int,
    sos_seg: bytes,
    width: int,
    height: int,
    components: List[_Component],
    qtables: Dict[int, np.ndarray],
    dc_tables: Dict[int, _HuffTable],
    ac_tables: Dict[int, _HuffTable],
    restart_interval: int,
    fancy_upsampling: bool,
) -> JpegImage:
    """Drive all scans of a progressive stream, then run the device tail."""
    if width == 0 or height == 0:
        raise errors.InvalidDecode("zero dimensions")
    max_h = max(c.h for c in components)
    max_v = max(c.v for c in components)
    if max_h == 0 or max_v == 0 or max_h > 4 or max_v > 4:
        raise errors.InvalidDecode("invalid sampling factors")
    mcu_cols = (width + 8 * max_h - 1) // (8 * max_h)
    mcu_rows = (height + 8 * max_v - 1) // (8 * max_v)
    for comp in components:
        if comp.quant_id not in qtables:
            raise errors.InvalidDecode("missing quantization table")

    coeffs = [
        np.zeros((mcu_rows * c.v * mcu_cols * c.h, 64), np.int16)
        for c in components
    ]
    comp_by_id = {c.comp_id: i for i, c in enumerate(components)}
    # ceil block dims of each component's *actual* sample area (non-
    # interleaved scans iterate this grid, not the MCU-padded one)
    blk_dims = []
    for c in components:
        cw = -(-width * c.h // max_h)
        ch = -(-height * c.v // max_v)
        blk_dims.append((-(-ch // 8), -(-cw // 8)))

    while True:
        # ---- decode the scan whose header is in sos_seg ----
        if not sos_seg:
            raise errors.InvalidDecode("truncated SOS segment")
        ns = sos_seg[0]
        if not 1 <= ns <= 4 or len(sos_seg) < 1 + 2 * ns + 3:
            raise errors.InvalidDecode("truncated SOS segment")
        scan_comps = []
        for c in range(ns):
            cid = sos_seg[1 + c * 2]
            tsel = sos_seg[2 + c * 2]
            if cid not in comp_by_id:
                raise errors.InvalidDecode("scan references unknown component")
            scan_comps.append((comp_by_id[cid], tsel >> 4, tsel & 0x0F))
        ss = sos_seg[1 + ns * 2]
        se = sos_seg[2 + ns * 2]
        ah_al = sos_seg[3 + ns * 2]
        ah, al = ah_al >> 4, ah_al & 0x0F
        if ss > se or se > 63 or (ss == 0) != (se == 0):
            raise errors.InvalidDecode("invalid spectral selection")
        if ss > 0 and ns != 1:
            raise errors.InvalidDecode("interleaved AC scan")

        segments, consumed = _split_entropy(data[pos:])
        pos += consumed

        if ss == 0:  # DC scan (possibly interleaved)
            dc_ts = []
            for ci, dc_sel, _ in scan_comps:
                if ah == 0 and dc_sel not in dc_tables:
                    raise errors.InvalidDecode("missing Huffman table")
                dc_ts.append(dc_tables.get(dc_sel))
            total_units = mcu_cols * mcu_rows if ns > 1 else (
                blk_dims[scan_comps[0][0]][0] * blk_dims[scan_comps[0][0]][1]
            )
            native_done = _prog_dc_scan_native(
                segments, total_units, restart_interval, mcu_cols, ns,
                scan_comps, components, blk_dims, dc_ts, ah, al, coeffs,
            )
            reader = None if native_done else _MsbReader(segments[0])
            seg_idx = 0
            prev_dc = [0] * len(components)
            for unit in range(0 if native_done else total_units):
                if restart_interval and unit > 0 and unit % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise errors.InvalidDecode("missing restart segment")
                    reader = _MsbReader(segments[seg_idx])
                    prev_dc = [0] * len(components)
                for si, (ci, _, _) in enumerate(scan_comps):
                    comp = components[ci]
                    stride = mcu_cols * comp.h
                    if ns > 1:
                        my, mx = divmod(unit, mcu_cols)
                        for by in range(comp.v):
                            for bx in range(comp.h):
                                idx = (my * comp.v + by) * stride + mx * comp.h + bx
                                block = coeffs[ci][idx]
                                if ah == 0:
                                    _prog_dc_first(reader, dc_ts[si], block, al, prev_dc, ci)
                                else:
                                    _prog_dc_refine(reader, block, al)
                    else:
                        by, bx = divmod(unit, blk_dims[ci][1])
                        block = coeffs[ci][by * stride + bx]
                        if ah == 0:
                            _prog_dc_first(reader, dc_ts[si], block, al, prev_dc, ci)
                        else:
                            _prog_dc_refine(reader, block, al)
        else:  # AC scan: single component, raster over its ceil block grid
            ci, _, ac_sel = scan_comps[0]
            if ac_sel not in ac_tables:
                raise errors.InvalidDecode("missing Huffman table")
            ac_t = ac_tables[ac_sel]
            comp = components[ci]
            stride = mcu_cols * comp.h
            bh, bw = blk_dims[ci]
            native_done = _prog_ac_scan_native(
                segments, bh * bw, restart_interval, stride, bw,
                ss, se, ah, al, ac_t, coeffs[ci],
            )
            reader = None if native_done else _MsbReader(segments[0])
            seg_idx = 0
            eobrun = 0
            for unit in range(0 if native_done else bh * bw):
                if restart_interval and unit > 0 and unit % restart_interval == 0:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise errors.InvalidDecode("missing restart segment")
                    reader = _MsbReader(segments[seg_idx])
                    eobrun = 0
                by, bx = divmod(unit, bw)
                block = coeffs[ci][by * stride + bx]
                if ah == 0:
                    eobrun = _prog_ac_first(reader, ac_t, block, ss, se, al, eobrun)
                else:
                    eobrun = _prog_ac_refine(reader, ac_t, block, ss, se, al, eobrun)

        # ---- parse markers until the next SOS or EOI ----
        sos_seg = None
        while pos + 2 <= len(data):
            if data[pos] != 0xFF:
                raise errors.InvalidDecode("expected marker between scans")
            marker = data[pos + 1]
            pos += 2
            if marker == 0xD9:  # EOI
                return _finish_scan(coeffs, width, height, components, qtables,
                                    mcu_cols, mcu_rows, max_h, max_v,
                                    fancy_upsampling)
            if marker == 0x01 or 0xD0 <= marker <= 0xD7:
                continue
            if pos + 2 > len(data):
                raise errors.InvalidDecode("truncated marker segment")
            seg_len = (data[pos] << 8) | data[pos + 1]
            if seg_len < 2 or pos + seg_len > len(data):
                raise errors.InvalidDecode("invalid segment length")
            seg = data[pos + 2 : pos + seg_len]
            pos += seg_len
            if marker == 0xC4:  # DHT between scans
                i = 0
                while i < len(seg):
                    tc = seg[i] >> 4
                    th = seg[i] & 0x0F
                    bits = seg[i + 1 : i + 17]
                    total = sum(bits)
                    vals = seg[i + 17 : i + 17 + total]
                    if tc == 0:
                        dc_tables[th] = _HuffTable(bits, vals)
                    else:
                        ac_tables[th] = _HuffTable(bits, vals)
                    i += 17 + total
            elif marker == 0xDB:  # DQT between scans
                i = 0
                while i < len(seg):
                    pq = seg[i] >> 4
                    tq = seg[i] & 0x0F
                    i += 1
                    nbytes = 128 if pq else 64
                    if i + nbytes > len(seg):
                        raise errors.InvalidDecode("truncated DQT segment")
                    if pq == 0:
                        qtables[tq] = np.frombuffer(seg[i : i + 64], np.uint8).astype(np.uint16)
                    else:
                        qtables[tq] = np.frombuffer(seg[i : i + 128], ">u2").astype(np.uint16)
                    i += nbytes
            elif marker == 0xDD:  # DRI between scans
                if len(seg) < 2:
                    raise errors.InvalidDecode("truncated DRI segment")
                restart_interval = (seg[0] << 8) | seg[1]
            elif marker == 0xDA:
                sos_seg = seg
                break
            # APPn/COM and others: skipped
        if sos_seg is None:
            raise errors.InvalidDecode("progressive stream missing EOI")
