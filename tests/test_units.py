"""Unit tests transliterating the reference's inline #[cfg(test)] content:
quantization tables, zigzag, JPEG markers, categories, progressive
scripts, palette utilities, bit-depth packing, trellis edges, reductions.
"""

import numpy as np
import pytest

from pixo_tpu import ColorType, JpegOptions, Subsampling
from pixo_tpu.jpeg import markers, trellis
from pixo_tpu.jpeg.tables import (
    AC_LUM_BITS,
    DC_LUM_BITS,
    HuffmanTables,
    QuantizationTables,
    ZIGZAG,
    build_bits_vals,
    build_code_lengths,
)
from pixo_tpu.png import reduce as png_reduce
from pixo_tpu.png.quantize import (
    PaletteLut,
    median_cut_palette,
    nearest_palette_indices,
    perceptual_distance_sq,
)


class TestQuantTables:
    def test_quality_50_identity(self):
        t = QuantizationTables(50)
        assert t.luminance[0] == 16  # zigzag[0] = natural[0] = 16

    def test_quality_scaling_monotone(self):
        q50 = QuantizationTables(50)
        q90 = QuantizationTables(90)
        assert q90.luminance[0] < q50.luminance[0]

    def test_quality_clamping(self):
        assert (QuantizationTables(0).luminance == QuantizationTables(1).luminance).all()
        assert (QuantizationTables(101).luminance == QuantizationTables(100).luminance).all()

    def test_values_at_least_one(self):
        for q in (1, 25, 50, 75, 100):
            t = QuantizationTables(q)
            assert t.luminance.min() >= 1
            assert t.chrominance.min() >= 1

    def test_float_int_tables_consistent(self):
        t = QuantizationTables(85)
        np.testing.assert_array_equal(
            t.luminance_table.astype(np.uint16), t.luminance_table_int
        )


class TestZigzag:
    def test_prefix(self):
        assert list(ZIGZAG[:6]) == [0, 1, 8, 16, 9, 2]

    def test_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))


class TestHuffmanTables:
    def test_std_tables_build(self):
        t = HuffmanTables()
        assert t.dc_lum_lengths[0] > 0
        assert t.ac_lum_lengths[0x00] > 0  # EOB
        assert t.ac_lum_lengths[0xF0] > 0  # ZRL
        # canonical spot checks: AC lum EOB is code 0b1010 len 4
        assert t.ac_lum_lengths[0x00] == 4
        assert t.ac_lum_codes[0x00] == 0b1010
        # (0,1) is the 2-bit code 00
        assert t.ac_lum_lengths[0x01] == 2
        assert t.ac_lum_codes[0x01] == 0

    def test_optimized_lengths_are_depth_plus_one(self):
        # parity quirk: leaf depth + 1 (guarantees no all-ones code)
        counts = np.array([100, 50, 10, 1] + [0] * 8, dtype=np.int64)
        lengths = build_code_lengths(counts)
        assert lengths is not None
        # kraft sum <= 1/2 -> no all-ones code possible
        kraft = sum(2.0 ** -int(l) for l in lengths if l > 0)
        assert kraft <= 0.5 + 1e-9

    def test_optimized_empty_returns_none(self):
        assert build_bits_vals(np.zeros(12, np.int64)) is None

    def test_single_symbol(self):
        counts = np.zeros(12, np.int64)
        counts[3] = 7
        bits, vals = build_bits_vals(counts)
        assert bits[0] == 1 and vals == bytes([3])


class TestMarkers:
    def test_app0_bytes(self):
        out = bytearray()
        markers.write_app0(out)
        assert bytes(out) == bytes(
            [0xFF, 0xE0, 0, 16]) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])

    def test_sof0_dimensions(self):
        out = bytearray()
        markers.write_sof(out, markers.SOF0, 300, 200, ColorType.RGB, Subsampling.S444)
        assert out[0:2] == bytes([0xFF, 0xC0])
        assert int.from_bytes(out[5:7], "big") == 200  # height
        assert int.from_bytes(out[7:9], "big") == 300  # width
        assert out[10] == 1 and out[11] == 0x11  # Y id, 1x1

    def test_sof_420_sampling(self):
        out = bytearray()
        markers.write_sof(out, markers.SOF0, 16, 16, ColorType.RGB, Subsampling.S420)
        assert out[11] == 0x22

    def test_dqt_lengths(self):
        out = bytearray()
        markers.write_dqt(out, QuantizationTables(85))
        assert len(out) == 2 * (2 + 2 + 1 + 64)

    def test_sos_baseline(self):
        out = bytearray()
        markers.write_sos(out, ColorType.RGB)
        assert out[-3:] == bytes([0, 63, 0])


class TestProgressiveScripts:
    def test_simple_script_coverage(self):
        from pixo_tpu.jpeg.progressive import simple_progressive_script

        script = simple_progressive_script()
        dc = [False] * 3
        ac = [False] * 3
        for s in script:
            assert s.ss <= s.se <= 63
            for c in s.components:
                if s.is_dc_scan:
                    dc[c] = True
                else:
                    ac[c] = True
        assert all(dc) and all(ac)

    def test_default_script_uses_sa(self):
        from pixo_tpu.jpeg.progressive import default_progressive_script

        script = default_progressive_script()
        assert any(s.is_dc_scan and s.al > 0 for s in script)
        assert any(s.is_refinement for s in script)


class TestTrellis:
    def test_zero_block(self):
        out = trellis.trellis_quantize_block(np.zeros(64, np.float32), np.full(64, 16.0, np.float32))
        assert (out == 0).all()

    def test_dc_plain_rounding(self):
        dct = np.zeros(64, np.float32)
        dct[0] = 164.0
        out = trellis.trellis_quantize_block(dct, np.full(64, 16.0, np.float32))
        assert out[0] == 10  # 164/16 = 10.25 -> 10

    def test_sparsifies_marginal_coefficients(self):
        dct = np.zeros(64, np.float32)
        dct[0] = 160.0
        dct[30] = 9.0  # 9/16 = 0.56 -> rounds to 1, trellis may zero it
        q = np.full(64, 16.0, np.float32)
        out = trellis.trellis_quantize_block(dct, q)
        plain = np.round(dct / q)
        assert abs(int(out[30])) <= abs(int(plain[30]))

    def test_native_thread_count_invariant(self):
        """The native batch path splits blocks over threads; the output
        must be identical for every thread count (blocks are independent,
        each writes its own 64-coeff slice)."""
        from pixo_tpu.native import native_available, native_trellis_quantize

        if not native_available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(123)
        blocks = np.concatenate(
            [rng.normal(0, s, (64, 64)) for s in (0.4, 8.0, 60.0, 600.0)]
        ).astype(np.float32)
        q = np.linspace(2, 40, 64).astype(np.float32)
        ref = native_trellis_quantize(blocks, [0, 1], q, q * 1.5, nthreads=1)
        for nt in (2, 3, 8, 64):
            out = native_trellis_quantize(blocks, [0, 1], q, q * 1.5, nthreads=nt)
            np.testing.assert_array_equal(out, ref)

    def test_native_matches_python_mirror_random(self):
        from pixo_tpu.native import native_available, native_trellis_quantize

        if not native_available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(9)
        blocks = np.concatenate(
            [rng.normal(0, s, (24, 64)) for s in (0.3, 5.0, 40.0, 300.0)]
        ).astype(np.float32)
        q = np.linspace(1, 50, 64).astype(np.float32)
        out = native_trellis_quantize(blocks, [0], q, q, 1.0)
        for i in range(blocks.shape[0]):
            np.testing.assert_array_equal(
                out[i], trellis.trellis_quantize_block(blocks[i], q, 1.0)
            )


class TestPaletteMath:
    def test_redmean_zero_for_identical(self):
        c = np.array([[10, 20, 30, 255]], np.int64)
        assert perceptual_distance_sq(c, c)[0] == 0

    def test_nearest_prefers_exact(self):
        palette = np.array(
            [[0, 0, 0, 255], [255, 0, 0, 255], [0, 255, 0, 255]], np.uint8
        )
        colors = np.array([[255, 0, 0, 255], [0, 250, 5, 255]], np.uint8)
        idx = nearest_palette_indices(colors, palette)
        assert idx.tolist() == [1, 2]

    def test_median_cut_respects_max(self):
        rng = np.random.default_rng(0)
        colors = rng.integers(0, 256, (500, 4), dtype=np.uint8)
        colors[:, 3] = 255
        counts = np.ones(500, np.uint32)
        pal = median_cut_palette(colors, counts, 16)
        assert 1 <= len(pal) <= 16

    def test_lut_matches_direct_for_grid_colors(self):
        palette = np.array(
            [[0, 0, 0, 255], [128, 128, 128, 255], [255, 255, 255, 255]], np.uint8
        )
        lut = PaletteLut(palette)
        # colors on the 6-6-6 grid: LUT must equal direct computation
        vals = np.array([0, 85, 170, 255], np.uint8)
        vals6 = (vals >> 2 << 2) | (vals >> 2 >> 4)
        grid = np.stack(np.meshgrid(vals6, vals6, vals6), -1).reshape(-1, 3)
        rgba = np.concatenate([grid, np.full((len(grid), 1), 255, np.uint8)], 1)
        np.testing.assert_array_equal(
            lut.lookup_many(rgba), nearest_palette_indices(rgba, palette)
        )

    def test_mzeng_remapping_is_permutation(self):
        rng = np.random.default_rng(1)
        idx = rng.integers(0, 7, (30, 30)).astype(np.uint8).ravel()
        pal = rng.integers(0, 256, (7, 4), dtype=np.uint8)
        new_idx, new_pal = png_reduce.optimize_palette_order(idx, pal, 30, 30)
        # remapped data must reproduce the same pixels
        np.testing.assert_array_equal(new_pal[new_idx], pal[idx])


class TestBitDepthPacking:
    @pytest.mark.parametrize("bits", [1, 2, 4])
    def test_pack_roundtrip(self, bits):
        rng = np.random.default_rng(0)
        w, h = 13, 5  # non-byte-aligned width
        samples = rng.integers(0, 1 << bits, w * h, dtype=np.uint8)
        packed = png_reduce.pack_bits_rows(samples, w, bits)
        row_bytes = (w * bits + 7) // 8
        assert len(packed) == row_bytes * h
        # unpack and compare
        rows = np.frombuffer(packed, np.uint8).reshape(h, row_bytes)
        bits_arr = np.unpackbits(rows, axis=1)
        grouped = bits_arr.reshape(h, -1, bits)
        vals = np.zeros((h, grouped.shape[1]), np.uint8)
        for b in range(bits):
            vals = (vals << 1) | grouped[:, :, b]
        np.testing.assert_array_equal(
            vals[:, :w].ravel(), samples
        )

    def test_palette_bit_depth(self):
        assert png_reduce.palette_bit_depth(2) == 1
        assert png_reduce.palette_bit_depth(3) == 2
        assert png_reduce.palette_bit_depth(16) == 4
        assert png_reduce.palette_bit_depth(17) == 8

    def test_gray_bit_depth(self):
        assert png_reduce.reduce_gray_bit_depth(np.array([0, 1], np.uint8)) == 1
        assert png_reduce.reduce_gray_bit_depth(np.array([3], np.uint8)) == 2
        assert png_reduce.reduce_gray_bit_depth(np.array([15], np.uint8)) == 4
        assert png_reduce.reduce_gray_bit_depth(np.array([16], np.uint8)) == 8


class TestReductionPredicates:
    def test_all_gray(self):
        g = np.array([[5, 5, 5], [9, 9, 9]], np.uint8)
        assert png_reduce.all_gray_rgb(g)
        assert not png_reduce.all_gray_rgb(np.array([[5, 5, 6]], np.uint8))

    def test_analyze_rgba(self):
        opaque_gray = np.array([[7, 7, 7, 255]], np.uint8)
        assert png_reduce.analyze_rgba(opaque_gray) == (True, True)
        assert png_reduce.analyze_rgba(np.array([[7, 7, 7, 10]], np.uint8)) == (False, True)
        assert png_reduce.analyze_rgba(np.array([[7, 8, 7, 255]], np.uint8)) == (True, False)

    def test_trim_transparency(self):
        assert png_reduce.maybe_trim_transparency(np.array([255, 255], np.uint8)) is None
        t = png_reduce.maybe_trim_transparency(np.array([10, 255, 255], np.uint8))
        assert t.tolist() == [10]


class TestOptionsValidationEdges:
    def test_jpeg_max_dimension_boundary(self):
        from pixo_tpu import errors, jpeg

        with pytest.raises(errors.ImageTooLarge):
            jpeg.encode(b"", JpegOptions(width=65536, height=1))


class TestTrellisNativeStressEquality:
    """Randomized native-vs-Python-mirror equality over the regimes the
    vectorized DP branches on: extreme magnitudes (max candidate fan-out
    incl. the extended candidate), q=1 (every position nonzero), sparse
    ZRL-heavy blocks (the zero-only pass-through + ZRL reorder fallback),
    and plain photographic-range noise."""

    def _check(self, dct, q):
        py = trellis.trellis_quantize_block(dct, q)
        nat = trellis.trellis_quantize(
            dct[None], (0,), q, q, prefer_native=True
        )[0]
        np.testing.assert_array_equal(py, nat)

    def test_random_regimes(self):
        rng = np.random.default_rng(7)
        for trial in range(40):
            kind = trial % 4
            q = rng.integers(1, 100, 64).astype(np.float32)
            if kind == 0:  # extreme magnitudes near the DCT range limit
                dct = rng.uniform(-8160, 8160, 64).astype(np.float32)
            elif kind == 1:  # q=1: nonzero candidates at every position
                q = np.ones(64, np.float32)
                dct = rng.uniform(-50, 50, 64).astype(np.float32)
            elif kind == 2:  # sparse: long zero runs, ZRL events
                dct = np.zeros(64, np.float32)
                hot = rng.choice(63, size=3, replace=False) + 1
                dct[hot] = rng.uniform(-400, 400, 3).astype(np.float32)
                dct[0] = rng.uniform(-1000, 1000)
            else:  # photographic range
                dct = (rng.standard_normal(64) * 60).astype(np.float32)
            self._check(dct.astype(np.float32), q)

    def test_exact_half_ties(self):
        # fq landing exactly on n + 0.5 exercises round_half_away and the
        # floor/ceil candidate pair on both sides of zero
        q = np.full(64, 2.0, np.float32)
        dct = np.full(64, 5.0, np.float32)   # fq = 2.5 everywhere
        dct[1::2] = -5.0                     # fq = -2.5 on odd positions
        dct[0] = 33.0
        self._check(dct, q)


class TestTrellisFastPathBoundary:
    """Locks the all-tiny-AC dominance proof: at the q/2 boundary the DP
    must still return all-zero AC (a +-1 that avoids a 10-bit ZRL costs
    est(15,1) = 11.8 under the reference cost table)."""

    def test_boundary_dense(self):
        q = np.full(64, 16.0, np.float32)
        dct = np.full(64, 7.9, np.float32)
        dct[0] = 100.0
        py = trellis.trellis_quantize_block(dct, q)
        nat = trellis.trellis_quantize(dct[None], (0,), q, q, prefer_native=True)[0]
        assert (py[1:] == 0).all()
        np.testing.assert_array_equal(py, nat)

    def test_boundary_at_zrl_positions(self):
        q = np.full(64, 8.0, np.float32)
        dct = np.zeros(64, np.float32)
        dct[0] = 40.0
        for pos in (16, 32, 48):  # exactly where ZRLs fire
            dct[pos] = 3.9
        py = trellis.trellis_quantize_block(dct, q)
        nat = trellis.trellis_quantize(dct[None], (0,), q, q, prefer_native=True)[0]
        np.testing.assert_array_equal(py, nat)

    def test_just_over_boundary_not_shortcut(self):
        q = np.full(64, 16.0, np.float32)
        dct = np.zeros(64, np.float32)
        dct[0] = 100.0
        dct[20] = 8.1  # 2|dct| > q: full DP path
        py = trellis.trellis_quantize_block(dct, q)
        nat = trellis.trellis_quantize(dct[None], (0,), q, q, prefer_native=True)[0]
        np.testing.assert_array_equal(py, nat)
