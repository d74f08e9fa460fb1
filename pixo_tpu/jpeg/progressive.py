"""Progressive JPEG encoding (spectral selection + successive approximation).

Behavioral parity with pixo ``src/jpeg/progressive.rs`` and the scan
drivers in ``src/jpeg/mod.rs:1248-1406``:
  - 7-scan ``simple_progressive_script`` (the default used by ``encode``),
    plus the fuller ``default_progressive_script``,
  - per-component DC scans with per-scan DC predictor reset,
  - AC-first scans with EOB-run accumulation (flush at 0x7FFF),
  - AC-refine scans with correction bits, DC refine bits.

Deliberate divergence (bug fix): the reference encodes EOB runs >= 2 with
EOBn symbols (0x10..0xE0) that exist in neither the standard K.3 tables
nor its baseline-counted optimized tables; its ``get_code_from_table``
fallback (``src/jpeg/progressive.rs:355-358``) then emits a wrong 4-bit
code, corrupting the stream for sparse images (the reference's only
progressive decode test uses 16x12 dense noise, which masks this). Here
the entropy tables for progressive scans are built from a counting pass
over the *actual* scan symbols — the libjpeg/mozjpeg approach — so EOBn
codes always exist and compression improves; if table building overflows
(>16-bit codes) we fall back to std tables and flush EOB runs as repeated
single EOBs, which is semantically identical and always valid.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..bits import BitWriterMsb
from ..color import ColorType
from ..options import JpegOptions
from . import markers
from .tables import HuffmanTables


@dataclasses.dataclass
class ScanSpec:
    components: Tuple[int, ...]
    ss: int
    se: int
    ah: int
    al: int

    @property
    def is_dc_scan(self) -> bool:
        return self.ss == 0 and self.se == 0

    @property
    def is_refinement(self) -> bool:
        return self.ah > 0


def simple_progressive_script() -> List[ScanSpec]:
    """Default-used script (``src/jpeg/progressive.rs:98-110``)."""
    return [
        ScanSpec((0,), 0, 0, 0, 0),
        ScanSpec((1,), 0, 0, 0, 0),
        ScanSpec((2,), 0, 0, 0, 0),
        ScanSpec((0,), 1, 10, 0, 0),
        ScanSpec((0,), 11, 63, 0, 0),
        ScanSpec((1,), 1, 63, 0, 0),
        ScanSpec((2,), 1, 63, 0, 0),
    ]


def default_progressive_script() -> List[ScanSpec]:
    """Fuller mozjpeg-style script with successive approximation
    (``src/jpeg/progressive.rs:68-96``)."""
    return [
        ScanSpec((0,), 0, 0, 0, 1),
        ScanSpec((1,), 0, 0, 0, 1),
        ScanSpec((2,), 0, 0, 0, 1),
        ScanSpec((0,), 1, 5, 0, 2),
        ScanSpec((0,), 6, 14, 0, 2),
        ScanSpec((0,), 15, 63, 0, 1),
        ScanSpec((1,), 1, 63, 0, 1),
        ScanSpec((2,), 1, 63, 0, 1),
        ScanSpec((0,), 0, 0, 1, 0),
        ScanSpec((1,), 0, 0, 1, 0),
        ScanSpec((2,), 0, 0, 1, 0),
        ScanSpec((0,), 1, 5, 2, 1),
        ScanSpec((0,), 1, 5, 1, 0),
        ScanSpec((0,), 6, 14, 2, 1),
        ScanSpec((0,), 6, 14, 1, 0),
        ScanSpec((0,), 15, 63, 1, 0),
        ScanSpec((1,), 1, 63, 1, 0),
        ScanSpec((2,), 1, 63, 1, 0),
    ]


def gray_progressive_script() -> List[ScanSpec]:
    return [
        ScanSpec((0,), 0, 0, 0, 0),
        ScanSpec((0,), 1, 10, 0, 0),
        ScanSpec((0,), 11, 63, 0, 0),
    ]


def _category(value: int) -> int:
    return int(abs(value)).bit_length()


class WriterSink:
    """Emits Huffman codes + raw bits into a BitWriterMsb."""

    __slots__ = ("writer", "codes", "lengths", "fallback_single_eob")

    def __init__(self, writer: BitWriterMsb, codes, lengths):
        self.writer = writer
        self.codes = codes
        self.lengths = lengths
        self.fallback_single_eob = lengths[0x10] == 0 if len(lengths) > 0x10 else True

    def sym(self, s: int) -> None:
        self.writer.write_bits(int(self.codes[s]), int(self.lengths[s]))

    def bits(self, value: int, nbits: int) -> None:
        if nbits:
            self.writer.write_bits(value, nbits)

    def flush_eob_run(self, eob_run: int) -> int:
        if eob_run == 0:
            return 0
        if self.fallback_single_eob:
            # std-table fallback: N single EOBs (one per all-zero band)
            for _ in range(eob_run):
                self.sym(0x00)
            return 0
        nbits = max(eob_run.bit_length() - 1, 0)
        self.sym(nbits << 4)
        if nbits > 0:
            self.bits(eob_run - (1 << nbits), nbits)
        return 0


class CountSink:
    """Counts symbol frequencies; ignores raw bits."""

    __slots__ = ("counts",)

    def __init__(self, counts: np.ndarray):
        self.counts = counts

    def sym(self, s: int) -> None:
        self.counts[s] += 1

    def bits(self, value: int, nbits: int) -> None:
        pass

    def flush_eob_run(self, eob_run: int) -> int:
        if eob_run == 0:
            return 0
        nbits = max(eob_run.bit_length() - 1, 0)
        self.counts[nbits << 4] += 1
        return 0


def encode_dc_scan_component(
    sink, blocks: np.ndarray, al: int, refinement: bool, raw_writer=None
) -> None:
    prev_dc = 0
    for dc in blocks[:, 0].tolist():
        if refinement:
            sink.bits((abs(dc) >> al) & 1, 1)
        else:
            shifted = (dc - prev_dc) >> al
            cat = _category(shifted)
            sink.sym(cat)
            if cat > 0:
                bits = (shifted - 1) if shifted < 0 else shifted
                sink.bits(bits & ((1 << cat) - 1), cat)
        prev_dc = dc


def encode_ac_first_block(sink, zz: Sequence[int], ss: int, se: int, al: int,
                          eob_run: int) -> int:
    k = se
    while k >= ss and (zz[k] >> al) == 0:
        if k == ss:
            break
        k -= 1
    last_nonzero = k
    if last_nonzero == ss and (zz[ss] >> al) == 0:
        eob_run += 1
        if eob_run == 0x7FFF:
            eob_run = sink.flush_eob_run(eob_run)
        return eob_run

    if eob_run > 0:
        eob_run = sink.flush_eob_run(eob_run)

    zero_run = 0
    for k in range(ss, last_nonzero + 1):
        coef = zz[k] >> al
        if coef == 0:
            zero_run += 1
            continue
        while zero_run >= 16:
            sink.sym(0xF0)
            zero_run -= 16
        cat = _category(coef)
        sink.sym((zero_run << 4) | cat)
        bits = (coef - 1) if coef < 0 else coef
        sink.bits(bits & ((1 << cat) - 1), cat)
        zero_run = 0

    if last_nonzero < se:
        eob_run = 1
    return eob_run


def encode_ac_refine_block(sink, zz: Sequence[int], ss: int, se: int, al: int,
                           eob_run: int) -> int:
    correction_bits: List[int] = []
    zero_run = 0
    for k in range(ss, se + 1):
        coef = zz[k]
        abs_coef = abs(coef)
        if abs_coef > (1 << al):
            correction_bits.append((abs_coef >> al) & 1)
        elif (abs_coef >> al) & 1:
            if eob_run > 0:
                eob_run = sink.flush_eob_run(eob_run)
            while zero_run >= 16:
                sink.sym(0xF0)
                for bit in correction_bits:
                    sink.bits(bit, 1)
                correction_bits.clear()
                zero_run -= 16
            sink.sym((zero_run << 4) | 1)
            sink.bits(0 if coef < 0 else 1, 1)
            for bit in correction_bits:
                sink.bits(bit, 1)
            correction_bits.clear()
            zero_run = 0
        else:
            zero_run += 1

    if zero_run > 0 or correction_bits:
        eob_run += 1
        if eob_run == 0x7FFF:
            eob_run = sink.flush_eob_run(eob_run)
    for bit in correction_bits:
        sink.bits(bit, 1)
    return eob_run


def split_components(
    zz: np.ndarray, pattern: Sequence[int], width: int, height: int
) -> List[np.ndarray]:
    """Scan-interleaved [nblocks, 64] -> per-component block lists in the
    order T.81 requires for non-interleaved scans: raster order over each
    component's own block grid, cropped to its ceil dimensions.

    Divergence note (bug fix): the reference feeds its progressive scans
    MCU-ordered, MCU-padded Y blocks (``src/jpeg/mod.rs:1137-1230``); for
    4:2:0 that is both the wrong order and — when a dimension is ≡ 8
    (mod 16) — the wrong block *count* for a non-interleaved scan, so its
    420 progressive output desyncs in spec-conforming decoders.
    """
    bpm = len(pattern)
    grouped = zz.reshape(-1, bpm, 64)
    pat = np.asarray(pattern)
    out: List[np.ndarray] = []
    if bpm == 6:  # 4:2:0
        nmx = ((width + 15) & ~15) // 16
        nmy = ((height + 15) & ~15) // 16
        # Y: MCU-order [nmcu, 4] -> raster [2*nmy, 2*nmx], crop to ceil dims
        y = grouped[:, :4, :].reshape(nmy, nmx, 2, 2, 64)
        y = y.transpose(0, 2, 1, 3, 4).reshape(2 * nmy, 2 * nmx, 64)
        yb_w = (width + 7) // 8
        yb_h = (height + 7) // 8
        y = np.ascontiguousarray(y[:yb_h, :yb_w]).reshape(-1, 64)
        # Chroma grids equal the MCU grid exactly: ceil(ceil(dim/2)/8).
        cb = np.ascontiguousarray(grouped[:, 4, :]).reshape(-1, 64)
        cr = np.ascontiguousarray(grouped[:, 5, :]).reshape(-1, 64)
        return [y, cb, cr]
    for comp in range(3):
        slots = np.nonzero(pat == comp)[0]
        if len(slots) == 0:
            out.append(np.zeros((0, 64), zz.dtype))
        else:
            out.append(np.ascontiguousarray(grouped[:, slots, :]).reshape(-1, 64))
    return out


def _run_scan(scan: ScanSpec, comp_blocks, dc_sinks, ac_sinks) -> None:
    """Drive one scan through per-component sinks (write or count mode)."""
    if scan.is_dc_scan:
        for comp in scan.components:
            blocks = comp_blocks[comp]
            if len(blocks) == 0:
                continue
            encode_dc_scan_component(
                dc_sinks[comp], blocks, scan.al, scan.is_refinement
            )
        return
    for comp in scan.components:
        blocks = comp_blocks[comp]
        if len(blocks) == 0:
            continue
        sink = ac_sinks[comp]
        eob_run = 0
        block_list = blocks.tolist()
        if scan.ah == 0:
            for block in block_list:
                eob_run = encode_ac_first_block(
                    sink, block, scan.ss, scan.se, scan.al, eob_run
                )
        else:
            for block in block_list:
                eob_run = encode_ac_refine_block(
                    sink, block, scan.ss, scan.se, scan.al, eob_run
                )
        if eob_run > 0:
            sink.flush_eob_run(eob_run)


def build_progressive_tables(
    comp_blocks, script: List[ScanSpec], is_gray: bool, optimal: bool = False
) -> Optional[HuffmanTables]:
    """Count the actual progressive scan symbols and build matching tables."""
    from ..native import native_count_progressive_scan

    dc_counts = [np.zeros(12, np.int64), np.zeros(12, np.int64)]
    ac_counts = [np.zeros(256, np.int64), np.zeros(256, np.int64)]
    native_done = True
    for scan in script:
        for comp in scan.components:
            blocks = comp_blocks[comp]
            if len(blocks) == 0:
                continue
            t = 0 if comp == 0 else 1
            if not native_count_progressive_scan(
                blocks, scan.ss, scan.se, scan.ah, scan.al,
                dc_counts[t], ac_counts[t],
            ):
                native_done = False
                break
        if not native_done:
            break
    if not native_done:
        dc_counts = [np.zeros(12, np.int64), np.zeros(12, np.int64)]
        ac_counts = [np.zeros(256, np.int64), np.zeros(256, np.int64)]
        dc_sinks = [CountSink(dc_counts[0 if c == 0 else 1]) for c in range(3)]
        ac_sinks = [CountSink(ac_counts[0 if c == 0 else 1]) for c in range(3)]
        for scan in script:
            _run_scan(scan, comp_blocks, dc_sinks, ac_sinks)
    # DC refinement scans emit raw bits only; ensure non-empty DC counts.
    for c in range(2 if not is_gray else 1):
        if dc_counts[c].sum() == 0:
            dc_counts[c][0] = 1
        if ac_counts[c].sum() == 0:
            ac_counts[c][0] = 1
    return HuffmanTables.optimized_from_counts(
        dc_counts[0],
        None if is_gray else dc_counts[1],
        ac_counts[0],
        None if is_gray else ac_counts[1],
        optimal=optimal,
    )


def get_script(options: JpegOptions) -> List[ScanSpec]:
    if options.color_type == ColorType.GRAY:
        return gray_progressive_script()
    return simple_progressive_script()


def encode_progressive(
    out: bytearray,
    zz: np.ndarray,
    pattern: Sequence[int],
    options: JpegOptions,
    tables: HuffmanTables,
) -> None:
    comp_blocks = split_components(zz, pattern, options.width, options.height)
    script = get_script(options)

    from ..native import native_encode_progressive_scan

    for scan in script:
        markers.write_sos_progressive(
            out, scan.components, scan.ss, scan.se, scan.ah, scan.al
        )
        # Native fast path: every script scan is single-component, so one
        # C++ call produces the whole scan's entropy bytes.
        if len(scan.components) == 1 and len(comp_blocks[scan.components[0]]):
            comp = scan.components[0]
            if comp == 0:
                dcc, dcl = tables.dc_lum_codes, tables.dc_lum_lengths
                acc, acl = tables.ac_lum_codes, tables.ac_lum_lengths
            else:
                dcc, dcl = tables.dc_chrom_codes, tables.dc_chrom_lengths
                acc, acl = tables.ac_chrom_codes, tables.ac_chrom_lengths
            scan_bytes = native_encode_progressive_scan(
                comp_blocks[comp], scan.ss, scan.se, scan.ah, scan.al,
                dcc, dcl, acc, acl,
            )
            if scan_bytes is not None:
                out += scan_bytes
                continue
        writer = BitWriterMsb()
        dc_sinks = []
        ac_sinks = []
        for c in range(3):
            if c == 0:
                dc_sinks.append(WriterSink(writer, tables.dc_lum_codes, tables.dc_lum_lengths))
                ac_sinks.append(WriterSink(writer, tables.ac_lum_codes, tables.ac_lum_lengths))
            else:
                dc_sinks.append(WriterSink(writer, tables.dc_chrom_codes, tables.dc_chrom_lengths))
                ac_sinks.append(WriterSink(writer, tables.ac_chrom_codes, tables.ac_chrom_lengths))
        _run_scan(scan, comp_blocks, dc_sinks, ac_sinks)
        out += writer.finish()
