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


def sa_optimized_script() -> List[ScanSpec]:
    """The shipping max-preset script (round 5): the libjpeg standard
    successive-approximation scan ordering with the luma first band
    widened to 1-8 — chosen by a measured search over script candidates
    (benches/BENCHMARKS.md §6). Against the mozjpeg-style 18-scan script
    (``default_progressive_script``) it is 1.2-3.8% smaller on every
    benchmark fixture AND 4 scans shorter (fewer DHT+SOS headers, less
    emission work); it beats mozjpeg's own quoted sizes on all five
    group-6 fixtures (gradient 8.1 vs 8.2 KB, browser -2.5%,
    multi-agent -1.7%, review -2.8%, web -3.0%), with decoded pixels
    identical to the 18-scan script's (all scans fully refine to Al=0,
    so the script choice never changes coefficients, only stream
    layout). Whole-band 1-63 refinement scans beat per-band
    refinements because each refinement scan pays a table + header and
    splits EOB runs at band boundaries."""
    return [
        ScanSpec((0,), 0, 0, 0, 1),
        ScanSpec((1,), 0, 0, 0, 1),
        ScanSpec((2,), 0, 0, 0, 1),
        ScanSpec((0,), 1, 8, 0, 2),
        ScanSpec((2,), 1, 63, 0, 1),
        ScanSpec((1,), 1, 63, 0, 1),
        ScanSpec((0,), 9, 63, 0, 2),
        ScanSpec((0,), 1, 63, 2, 1),
        ScanSpec((0,), 0, 0, 1, 0),
        ScanSpec((1,), 0, 0, 1, 0),
        ScanSpec((2,), 0, 0, 1, 0),
        ScanSpec((2,), 1, 63, 1, 0),
        ScanSpec((1,), 1, 63, 1, 0),
        ScanSpec((0,), 1, 63, 1, 0),
    ]


def gray_sa_optimized_script() -> List[ScanSpec]:
    """Luma-only rows of :func:`sa_optimized_script`."""
    return [
        ScanSpec((0,), 0, 0, 0, 1),
        ScanSpec((0,), 1, 8, 0, 2),
        ScanSpec((0,), 9, 63, 0, 2),
        ScanSpec((0,), 1, 63, 2, 1),
        ScanSpec((0,), 0, 0, 1, 0),
        ScanSpec((0,), 1, 63, 1, 0),
    ]


def gray_progressive_script() -> List[ScanSpec]:
    return [
        ScanSpec((0,), 0, 0, 0, 0),
        ScanSpec((0,), 1, 10, 0, 0),
        ScanSpec((0,), 11, 63, 0, 0),
    ]


def gray_sa_progressive_script() -> List[ScanSpec]:
    """Luma-only successive-approximation script (the component-0 scans
    of :func:`default_progressive_script`)."""
    return [
        ScanSpec((0,), 0, 0, 0, 1),
        ScanSpec((0,), 1, 5, 0, 2),
        ScanSpec((0,), 6, 14, 0, 2),
        ScanSpec((0,), 15, 63, 0, 1),
        ScanSpec((0,), 0, 0, 1, 0),
        ScanSpec((0,), 1, 5, 2, 1),
        ScanSpec((0,), 1, 5, 1, 0),
        ScanSpec((0,), 6, 14, 2, 1),
        ScanSpec((0,), 6, 14, 1, 0),
        ScanSpec((0,), 15, 63, 1, 0),
    ]


def _category(value: int) -> int:
    return int(abs(value)).bit_length()


class WriterSink:
    """Emits Huffman codes + raw bits into a BitWriterMsb."""

    __slots__ = ("writer", "codes", "lengths", "fallback_single_eob")

    def __init__(self, writer: BitWriterMsb, codes, lengths, eobn_ok=None):
        self.writer = writer
        self.codes = codes
        self.lengths = lengths
        if eobn_ok is not None:
            # per-scan counted tables contain every symbol the scan emits
            # BY CONSTRUCTION (incl. the exact EOBn codes); sniffing
            # lengths[0x10] would misread a table whose runs never hit
            # the 2-3 range
            self.fallback_single_eob = not eobn_ok
        else:
            self.fallback_single_eob = (
                lengths[0x10] == 0 if len(lengths) > 0x10 else True
            )

    def sym(self, s: int) -> None:
        self.writer.write_bits(int(self.codes[s]), int(self.lengths[s]))

    def bits(self, value: int, nbits: int) -> None:
        if nbits:
            self.writer.write_bits(value, nbits)


class CountSink:
    """Counts symbol frequencies; ignores raw bits."""

    __slots__ = ("counts", "fallback_single_eob")

    def __init__(self, counts: np.ndarray):
        self.counts = counts
        # counting always assumes EOBn codes (they end up in the table
        # precisely because we count them here)
        self.fallback_single_eob = False

    def sym(self, s: int) -> None:
        self.counts[s] += 1

    def bits(self, value: int, nbits: int) -> None:
        pass


# libjpeg's MAX_CORR_BITS: cap on buffered refinement correction bits
# before the EOB run is force-flushed (bounds encoder memory; any flush
# point is spec-valid).
MAX_CORR_BITS = 1000 - 63


class EobRunState:
    """EOB-run accumulator shared by the AC scan coders.

    Refinement scans buffer each run-member block's correction bits
    (T.81 G.1.2.3 / libjpeg jcphuff emit_eobrun): the decoder reads the
    EOBn symbol FIRST, then one correction bit per already-nonzero
    coefficient of each block in the run — so the bits must trail the
    symbol in the stream.
    """

    __slots__ = ("eob_run", "pending", "total_pending")

    def __init__(self):
        self.eob_run = 0
        self.pending: List[List[int]] = []  # per-block correction bits
        self.total_pending = 0

    def add_block(self, bits: List[int]) -> None:
        self.eob_run += 1
        self.pending.append(bits)
        self.total_pending += len(bits)

    def flush(self, sink) -> None:
        if self.eob_run == 0:
            return
        if sink.fallback_single_eob:
            # std-table fallback (no EOBn codes): one single EOB per
            # block, each followed by that block's own correction bits
            for blk in self.pending:
                sink.sym(0x00)
                for bit in blk:
                    sink.bits(bit, 1)
        else:
            nbits = max(self.eob_run.bit_length() - 1, 0)
            sink.sym(nbits << 4)
            if nbits > 0:
                sink.bits(self.eob_run - (1 << nbits), nbits)
            for blk in self.pending:
                for bit in blk:
                    sink.bits(bit, 1)
        self.eob_run = 0
        self.pending = []
        self.total_pending = 0


def encode_dc_scan_component(
    sink, blocks: np.ndarray, al: int, refinement: bool, raw_writer=None
) -> None:
    """DC scan per T.81 G.1.2.1: the point transform (arithmetic shift
    by Al) applies to the DC VALUE, and the diff chain runs over the
    shifted values (libjpeg jcphuff encode_mcu_DC_first/refine)."""
    prev = 0
    for dc in blocks[:, 0].tolist():
        t = dc >> al  # Python >> is arithmetic, matching C on signed ints
        if refinement:
            sink.bits(t & 1, 1)
        else:
            shifted = t - prev
            cat = _category(shifted)
            sink.sym(cat)
            if cat > 0:
                bits = (shifted - 1) if shifted < 0 else shifted
                sink.bits(bits & ((1 << cat) - 1), cat)
            prev = t


def _pt_ac(coef: int, al: int) -> int:
    """AC point transform: magnitude shift, truncation toward zero
    (T.81 G.1.2.2; libjpeg jcphuff). Arithmetic shift would round
    negatives away from zero and desync the later refinement scans."""
    return -((-coef) >> al) if coef < 0 else (coef >> al)


def encode_ac_first_block(sink, zz: Sequence[int], ss: int, se: int, al: int,
                          run: EobRunState) -> None:
    k = se
    while k >= ss and _pt_ac(zz[k], al) == 0:
        if k == ss:
            break
        k -= 1
    last_nonzero = k
    if last_nonzero == ss and _pt_ac(zz[ss], al) == 0:
        run.add_block([])
        if run.eob_run == 0x7FFF:
            run.flush(sink)
        return

    run.flush(sink)

    zero_run = 0
    for k in range(ss, last_nonzero + 1):
        coef = _pt_ac(zz[k], al)
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
        run.add_block([])


def encode_ac_refine_block(sink, zz: Sequence[int], ss: int, se: int, al: int,
                           run: EobRunState) -> None:
    """AC refinement per libjpeg jcphuff encode_mcu_AC_refine: a
    coefficient is already-nonzero iff |coef|>>Al > 1 (i.e. it was sent
    by a previous coarser scan); ZRL is only emitted while a later
    newly-nonzero coefficient exists in this block; block-final
    correction bits are buffered into the EOB run."""
    absv: List[int] = []
    eob_idx = ss - 1  # position of the last newly-nonzero coefficient
    for k in range(ss, se + 1):
        t = abs(zz[k]) >> al
        absv.append(t)
        if t == 1:
            eob_idx = k

    zero_run = 0
    br: List[int] = []  # correction bits since the last emitted symbol
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            zero_run += 1
            continue
        while zero_run > 15 and k <= eob_idx:
            run.flush(sink)
            sink.sym(0xF0)
            for bit in br:
                sink.bits(bit, 1)
            br = []
            zero_run -= 16
        if t > 1:
            br.append(t & 1)
            continue
        # newly nonzero (scaled magnitude exactly 1)
        run.flush(sink)
        sink.sym((zero_run << 4) | 1)
        sink.bits(0 if zz[k] < 0 else 1, 1)
        for bit in br:
            sink.bits(bit, 1)
        br = []
        zero_run = 0

    if zero_run > 0 or br:
        run.add_block(br)
        if run.eob_run == 0x7FFF or run.total_pending > MAX_CORR_BITS:
            run.flush(sink)


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
    if bpm == 4:  # 4:2:2 (beyond parity: no reference encode path)
        nmx = ((width + 15) & ~15) // 16
        nmy = (height + 7) // 8  # MCU rows == Y block rows (v=1)
        # Y: MCU order [nmcu, 2] is already raster row order; crop the
        # padded right column when width % 16 is in (0, 8].
        yb_w = (width + 7) // 8
        y = grouped[:, :2, :].reshape(nmy, 2 * nmx, 64)
        y = np.ascontiguousarray(y[:, :yb_w]).reshape(-1, 64)
        # Chroma grids equal the MCU grid exactly: ceil(ceil(w/2)/8) = nmx.
        cb = np.ascontiguousarray(grouped[:, 2, :]).reshape(-1, 64)
        cr = np.ascontiguousarray(grouped[:, 3, :]).reshape(-1, 64)
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
        run = EobRunState()
        block_list = blocks.tolist()
        if scan.ah == 0:
            for block in block_list:
                encode_ac_first_block(
                    sink, block, scan.ss, scan.se, scan.al, run
                )
        else:
            for block in block_list:
                encode_ac_refine_block(
                    sink, block, scan.ss, scan.se, scan.al, run
                )
        run.flush(sink)


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
    built = HuffmanTables.optimized_from_counts(
        dc_counts[0],
        None if is_gray else dc_counts[1],
        ac_counts[0],
        None if is_gray else ac_counts[1],
        optimal=optimal,
    )
    if built is not None:
        # every EOBn symbol the scans flush was counted above, so the
        # writer may use EOBn flushes (encode_progressive keys off this;
        # the std-table fallback path has no such guarantee)
        built.counted_from_scans = True
    return built


def get_script(options: JpegOptions) -> List[ScanSpec]:
    sa = getattr(options, "progressive_sa", True)
    if options.color_type == ColorType.GRAY:
        return gray_sa_optimized_script() if sa else gray_progressive_script()
    return sa_optimized_script() if sa else simple_progressive_script()


def _build_scan_table(comp_blocks, scan: ScanSpec):
    """Count THIS scan's symbols and build a dedicated optimal table.

    Per-scan tables are the libjpeg/mozjpeg optimize_coding strategy:
    AC-first, AC-refine and DC scans have very different symbol
    distributions, so sharing one table across all scans (the single-
    table mode below) costs several percent. Returns
    (bits_spec, vals_spec, codes, lengths) or None (empty scan /
    overflow -> caller uses std tables)."""
    from ..native import native_count_progressive_scan
    from .tables import build_bits_vals_optimal, build_code_table

    is_dc = scan.is_dc_scan
    dc_counts = np.zeros(12, np.int64)
    ac_counts = np.zeros(256, np.int64)
    done = True
    for comp in scan.components:
        blocks = comp_blocks[comp]
        if len(blocks) == 0:
            continue
        if not native_count_progressive_scan(
            blocks, scan.ss, scan.se, scan.ah, scan.al, dc_counts, ac_counts
        ):
            done = False
            break
    if not done:
        dc_counts[:] = 0
        ac_counts[:] = 0
        sinks_dc = [CountSink(dc_counts)] * 3
        sinks_ac = [CountSink(ac_counts)] * 3
        _run_scan(scan, comp_blocks, sinks_dc, sinks_ac)
    counts = dc_counts if is_dc else ac_counts
    built = build_bits_vals_optimal(counts)
    if built is None:
        return None
    bits_spec, vals_spec = built
    table = build_code_table(bits_spec, vals_spec, 12 if is_dc else 256)
    if table is None:
        return None
    return bits_spec, vals_spec, table[0], table[1]


def encode_progressive(
    out: bytearray,
    zz: np.ndarray,
    pattern: Sequence[int],
    options: JpegOptions,
    tables: Optional[HuffmanTables],
) -> None:
    """Emit every scan of the script.

    ``tables`` given: single-table mode — all scans share the caller's
    tables (one DHT, written by the caller; the reference's scheme).
    ``tables`` None: per-scan mode — each symbol-carrying scan gets its
    own counted optimal table, emitted as a DHT right before its SOS
    (what libjpeg/mozjpeg do with optimize_coding; DC-refinement scans
    carry raw bits only and need no table).
    """
    comp_blocks = split_components(zz, pattern, options.width, options.height)
    script = get_script(options)
    per_scan = tables is None
    std = HuffmanTables() if per_scan else tables
    # Single-table mode ships tables COUNTED over these exact scans
    # (encoder._emit_jpeg), so every EOBn symbol the stream flushes has a
    # code by construction — but only if the count actually succeeded:
    # a std-table fallback (build_progressive_tables -> None) lacks EOBn
    # codes entirely and must flush runs as repeated single EOBs. The
    # old behavior sniffed lengths[0x10] (EOB1), which misreads a
    # counted table whose runs never hit length 2-3 — e.g. a smooth
    # low-quality chroma scan that is ONE giant EOB run (only EOB11
    # coded): the sniff chose single-EOB flushes whose 0x00 symbol has
    # no code either, emitting a zero-length scan.
    # Tables NOT counted from scans (e.g. the oracle-parity emulation
    # feeds baseline-counted tables) keep the legacy sniff (None).
    single_table_eobn = None
    if not per_scan and getattr(tables, "counted_from_scans", False):
        single_table_eobn = True

    from ..native import native_encode_progressive_scan

    for scan in script:
        comp = scan.components[0]
        if comp == 0:
            dcc, dcl = std.dc_lum_codes, std.dc_lum_lengths
            acc, acl = std.ac_lum_codes, std.ac_lum_lengths
        else:
            dcc, dcl = std.dc_chrom_codes, std.dc_chrom_lengths
            acc, acl = std.ac_chrom_codes, std.ac_chrom_lengths
        eobn_ok = single_table_eobn
        if per_scan and not (scan.is_dc_scan and scan.is_refinement):
            tid = (0x00 if scan.is_dc_scan else 0x10) | (
                0x00 if comp == 0 else 0x01
            )
            built = _build_scan_table(comp_blocks, scan)
            if built is not None:
                bits_spec, vals_spec, codes, lengths = built
                markers.write_huffman_table(out, tid, bits_spec, vals_spec)
                if scan.is_dc_scan:
                    dcc, dcl = codes, lengths
                else:
                    acc, acl = codes, lengths
                # counted tables carry every symbol the scan emits
                eobn_ok = True
            else:
                # std-table fallback: redefine the stream's table slot (an
                # earlier scan's DHT may occupy it) to the spec we encode
                # with; std tables lack EOBn codes -> single-EOB flushes
                if scan.is_dc_scan:
                    spec = ((std.dc_lum_bits, std.dc_lum_vals) if comp == 0
                            else (std.dc_chrom_bits, std.dc_chrom_vals))
                else:
                    spec = ((std.ac_lum_bits, std.ac_lum_vals) if comp == 0
                            else (std.ac_chrom_bits, std.ac_chrom_vals))
                markers.write_huffman_table(out, tid, *spec)
                eobn_ok = False
        markers.write_sos_progressive(
            out, scan.components, scan.ss, scan.se, scan.ah, scan.al
        )
        # Native fast path: every script scan is single-component, so one
        # C++ call produces the whole scan's entropy bytes.
        if len(scan.components) == 1 and len(comp_blocks[comp]):
            scan_bytes = native_encode_progressive_scan(
                comp_blocks[comp], scan.ss, scan.se, scan.ah, scan.al,
                dcc, dcl, acc, acl, eobn_ok=eobn_ok,
            )
            if scan_bytes is not None:
                out += scan_bytes
                continue
        writer = BitWriterMsb()
        dc_sinks = []
        ac_sinks = []
        for c in range(3):
            if per_scan or c == comp:
                dc_sinks.append(WriterSink(writer, dcc, dcl, eobn_ok))
                ac_sinks.append(WriterSink(writer, acc, acl, eobn_ok))
            elif c == 0:
                dc_sinks.append(WriterSink(writer, std.dc_lum_codes, std.dc_lum_lengths))
                ac_sinks.append(WriterSink(writer, std.ac_lum_codes, std.ac_lum_lengths))
            else:
                dc_sinks.append(WriterSink(writer, std.dc_chrom_codes, std.dc_chrom_lengths))
                ac_sinks.append(WriterSink(writer, std.ac_chrom_codes, std.ac_chrom_lengths))
        _run_scan(scan, comp_blocks, dc_sinks, ac_sinks)
        out += writer.finish()
