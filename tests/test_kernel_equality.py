"""Device-kernel vs NumPy-mirror equality (the SIMD-vs-fallback analog).

The reference asserts every SIMD kernel byte-identical to its scalar
fallback (tests/simd_fallback_equality.rs). Here the contract is: every
JAX device kernel is bit-identical to its NumPy mirror.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pixo_tpu.ops.dct import dct8x8_aan, dct8x8_aan_np, dct8x8_matmul, idct8x8
from pixo_tpu.ops.png_filters import (
    candidates_np,
    filter_image,
    scores_np,
    _candidates,
    _signed_abs_scores,
)
from pixo_tpu.ops.quantize import (
    quantize_blocks,
    quantize_blocks_np,
    round_half_away,
    round_half_away_np,
    zigzag_blocks,
    zigzag_blocks_np,
)


class TestDct:
    def test_aan_matches_numpy_bitexact(self, rng):
        blocks = rng.uniform(-128, 127, (257, 8, 8)).astype(np.float32)
        dev = np.asarray(dct8x8_aan(jnp.asarray(blocks)))
        ref = dct8x8_aan_np(blocks)
        np.testing.assert_array_equal(dev, ref)

    def test_aan_dc_of_constant_block(self):
        block = np.full((1, 8, 8), 12.0, np.float32)
        out = dct8x8_aan_np(block)
        # DC of constant c is 8c for orthonormal scaling
        assert abs(out[0, 0, 0] - 96.0) < 1e-3
        assert np.abs(out[0][np.nonzero(1 - np.eye(8) * 0 + 0)]).max() >= 0  # smoke

    def test_aan_matches_orthonormal_dct(self, rng):
        """AAN with S-scaling equals the textbook orthonormal DCT (to fp tol)."""
        blocks = rng.uniform(-128, 127, (16, 8, 8)).astype(np.float32)
        aan = dct8x8_aan_np(blocks)
        mm = np.asarray(dct8x8_matmul(jnp.asarray(blocks)))
        np.testing.assert_allclose(aan, mm, atol=1e-1)

    def test_idct_inverts_dct(self, rng):
        blocks = rng.uniform(-128, 127, (16, 8, 8)).astype(np.float32)
        coeffs = np.asarray(dct8x8_matmul(jnp.asarray(blocks)))
        back = np.asarray(idct8x8(jnp.asarray(coeffs)))
        np.testing.assert_allclose(back, blocks, atol=1e-2)

    @pytest.mark.parametrize(
        "mode,shape",
        [
            ("gray", (41, 53)),
            ("444", (41, 53, 3)),
            ("444", (16, 16, 4)),
            ("420", (37, 61, 3)),
            ("420", (64, 64, 4)),
        ],
    )
    def test_native_dct_zz_matches_numpy_bitexact(self, rng, mode, shape):
        """The native raw-DCT trellis front-end (jpeg_dct_zz) is bit-equal
        to the NumPy mirror chain blockify -> dct8x8_aan_np -> zigzag —
        the same oracle the fused jpeg_coefficients pipeline is held to."""
        from pixo_tpu.native import native_jpeg_dct_zz
        from pixo_tpu.ops.blockify import (
            blocks_420_np,
            blocks_444_np,
            blocks_gray_np,
        )
        from pixo_tpu.ops.quantize import zigzag_blocks_np

        img = rng.integers(0, 256, shape, np.uint8)
        nat = native_jpeg_dct_zz(img, mode)
        if nat is None:
            pytest.skip("native library / AVX2 unavailable")
        fn = {"gray": blocks_gray_np, "444": blocks_444_np,
              "420": blocks_420_np}[mode]
        ref = zigzag_blocks_np(dct8x8_aan_np(fn(img)).reshape(-1, 64))
        assert nat.dtype == np.float32
        np.testing.assert_array_equal(nat, ref.astype(np.float32))


class TestQuantize:
    def test_round_half_away_semantics(self):
        x = np.array(
            [0.5, -0.5, 1.5, -1.5, 2.5, -2.5, 0.49, -0.49, 16.5, 0.0], np.float32
        )
        expect = np.array([1, -1, 2, -2, 3, -3, 0, 0, 17, 0], np.float32)
        np.testing.assert_array_equal(round_half_away_np(x), expect)
        np.testing.assert_array_equal(np.asarray(round_half_away(jnp.asarray(x))), expect)

    def test_quantize_matches_numpy(self, rng):
        dct = rng.uniform(-2000, 2000, (100, 8, 8)).astype(np.float32)
        q = rng.integers(1, 255, (8, 8)).astype(np.float32)
        dev = np.asarray(quantize_blocks(jnp.asarray(dct), jnp.asarray(q)))
        ref = quantize_blocks_np(dct, q)
        np.testing.assert_array_equal(dev, ref)

    def test_zigzag(self):
        block = np.arange(64, dtype=np.int16).reshape(1, 8, 8)
        zz = zigzag_blocks_np(block)[0]
        assert zz[0] == 0 and zz[1] == 1 and zz[2] == 8 and zz[3] == 16
        assert zz[4] == 9 and zz[5] == 2
        assert sorted(zz.tolist()) == list(range(64))
        dev = np.asarray(zigzag_blocks(jnp.asarray(block)))
        np.testing.assert_array_equal(dev, zz[None])


class TestPngFilters:
    @pytest.mark.parametrize("bpp", [1, 2, 3, 4])
    def test_candidates_match_numpy(self, rng, bpp):
        rows = rng.integers(0, 256, (23, 17 * bpp), dtype=np.uint8)
        dev = np.asarray(_candidates(jnp.asarray(rows), bpp))
        ref = candidates_np(rows, bpp)
        np.testing.assert_array_equal(dev, ref)

    def test_scores_match_numpy(self, rng):
        rows = rng.integers(0, 256, (9, 40), dtype=np.uint8)
        cands = candidates_np(rows, 4)
        dev = np.asarray(_signed_abs_scores(jnp.asarray(cands)))
        np.testing.assert_array_equal(dev, scores_np(cands))

    def test_paeth_scalar_semantics(self):
        # paeth_predictor(a, b, c) tie-breaking: a wins, then b
        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            if pa <= pb and pa <= pc:
                return a
            return b if pb <= pc else c

        rows = np.zeros((2, 6), np.uint8)
        rows[0] = [10, 20, 30, 40, 50, 60]
        rows[1] = [15, 25, 35, 45, 55, 65]
        cands = candidates_np(rows, 1)
        for x in range(6):
            a = int(rows[1, x - 1]) if x >= 1 else 0
            b = int(rows[0, x])
            c = int(rows[0, x - 1]) if x >= 1 else 0
            expect = (int(rows[1, x]) - paeth(a, b, c)) & 0xFF
            assert cands[4, 1, x] == expect

    def test_fixed_strategy_filters(self, rng):
        rows = rng.integers(0, 256, (8, 12), dtype=np.uint8)
        filtered, ids = filter_image(
            jnp.asarray(rows), bpp=3, strategy="sub",
            small_image=False, sticky_fast=False,
        )
        assert (np.asarray(ids) == 1).all()
        ref = candidates_np(rows, 3)[1]
        np.testing.assert_array_equal(np.asarray(filtered), ref)

    def test_small_image_forces_sub(self, rng):
        rows = rng.integers(0, 256, (8, 12), dtype=np.uint8)
        _, ids = filter_image(
            jnp.asarray(rows), bpp=3, strategy="adaptive",
            small_image=True, sticky_fast=False,
        )
        assert (np.asarray(ids) == 1).all()

    def test_adaptive_picks_up_for_constant_rows(self):
        # identical rows: Up filter gives all zeros from row 1 on
        rows = np.tile(np.arange(48, dtype=np.uint8) * 5, (10, 1))
        _, ids = filter_image(
            jnp.asarray(rows), bpp=3, strategy="adaptive",
            small_image=False, sticky_fast=False,
        )
        ids = np.asarray(ids)
        assert (ids[1:] == 2).all()  # Up wins on all repeated rows


class TestLz77Assist:
    def test_hash4_matches_numpy(self, rng):
        from pixo_tpu.ops.lz77_assist import hash4, hash4_np
        import jax.numpy as jnp

        data = rng.integers(0, 256, 5000, dtype=np.uint8)
        dev = np.asarray(hash4(jnp.asarray(data)))
        np.testing.assert_array_equal(dev, hash4_np(data))

    def test_match_lengths(self, rng):
        from pixo_tpu.ops.lz77_assist import (
            batched_match_lengths,
            batched_match_lengths_np,
        )
        import jax.numpy as jnp

        data = rng.integers(0, 4, 3000, dtype=np.uint8)  # repetitive
        pos = rng.integers(100, 2900, 64).astype(np.int32)
        cand = (pos - rng.integers(1, 100, 64)).astype(np.int32)
        dev = np.asarray(
            batched_match_lengths(jnp.asarray(data), jnp.asarray(pos), jnp.asarray(cand))
        )
        ref = batched_match_lengths_np(data, pos, cand)
        np.testing.assert_array_equal(dev, ref)

    def test_match_length_exact_values(self):
        from pixo_tpu.ops.lz77_assist import batched_match_lengths
        import jax.numpy as jnp

        data = np.frombuffer(b"abcabcabcXabc", np.uint8).copy()
        pos = np.array([3, 9], np.int32)
        cand = np.array([0, 0], np.int32)
        out = np.asarray(
            batched_match_lengths(jnp.asarray(data), jnp.asarray(pos), jnp.asarray(cand))
        )
        assert out[0] == 6  # "abcabc" matches from 3 vs 0
        assert out[1] == 0  # 'X' vs 'a'


class TestBlockify:
    @pytest.mark.parametrize("size", [(16, 16), (61, 47), (8, 24), (1, 1), (17, 9)])
    def test_444_matches_numpy(self, rng, size):
        from pixo_tpu.ops.blockify import blocks_444, blocks_444_np

        w, h = size
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dev = np.asarray(blocks_444(jnp.asarray(img)))
        np.testing.assert_array_equal(dev, blocks_444_np(img))

    @pytest.mark.parametrize("size", [(16, 16), (61, 47), (32, 48), (1, 1)])
    def test_420_matches_numpy(self, rng, size):
        from pixo_tpu.ops.blockify import blocks_420, blocks_420_np

        w, h = size
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dev = np.asarray(blocks_420(jnp.asarray(img)))
        np.testing.assert_array_equal(dev, blocks_420_np(img))


class TestTrellisDevice:
    """Batched device trellis vs the host implementations (VERDICT r1 #10).

    Contract: bit-identical int16 output including tie-breaking (the host
    DP's insert-then-stable-sort order is reproduced with masked dedup)."""

    def _host(self, dct, q):
        from pixo_tpu.jpeg.trellis import trellis_quantize_block

        return np.stack(
            [trellis_quantize_block(dct[i], q[i]) for i in range(dct.shape[0])]
        )

    def test_random_blocks_match_mirror(self, rng):
        from pixo_tpu.ops.trellis_device import trellis_quantize_batch_device

        dct = rng.normal(0, 80, (48, 64)).astype(np.float32)
        dct[:, 0] = rng.normal(0, 500, 48).astype(np.float32)
        dct[rng.random((48, 64)) < 0.5] = 0.0
        q = rng.integers(1, 80, (48, 64)).astype(np.float32)
        dev = np.asarray(trellis_quantize_batch_device(dct, q))
        np.testing.assert_array_equal(dev, self._host(dct, q))

    def test_sparse_and_dense_extremes(self, rng):
        from pixo_tpu.ops.trellis_device import trellis_quantize_batch_device

        q = np.full((4, 64), 16.0, np.float32)
        dct = np.zeros((4, 64), np.float32)
        dct[1] = rng.normal(0, 400, 64).astype(np.float32)  # dense
        dct[2, 63] = 100.0  # lone tail coefficient
        dct[3, 1] = 8.0     # near rounding boundary
        dev = np.asarray(trellis_quantize_batch_device(dct, q))
        np.testing.assert_array_equal(dev, self._host(dct, q))

    def test_real_dct_content_and_pattern(self, rng):
        """Full trellis_quantize(mode=device) vs host on real image DCTs
        with an interleaved lum/chrom pattern."""
        import jax.numpy as jnp

        from pixo_tpu.jpeg import encoder as jenc
        from pixo_tpu.jpeg.tables import ZIGZAG, QuantizationTables
        from pixo_tpu.jpeg.trellis import trellis_quantize
        from pixo_tpu.ops.blockify import scan_layout
        from tests.conftest import synth_gradient

        img = synth_gradient(48, 32, 3)
        dct_zz = np.asarray(
            jenc._device_dct_zz(jnp.asarray(img), color="rgb", subsampling="444")
        )
        _, _, pattern = scan_layout(48, 32, "rgb", "444")
        quant = QuantizationTables(85)
        lum_zz = quant.luminance_table[ZIGZAG]
        chrom_zz = quant.chrominance_table[ZIGZAG]
        host = trellis_quantize(dct_zz, pattern, lum_zz, chrom_zz, mode="host")
        dev = trellis_quantize(dct_zz, pattern, lum_zz, chrom_zz, mode="device")
        np.testing.assert_array_equal(dev, host)

    def test_full_max_preset_encode_matches_host(self, monkeypatch):
        """PIXO_TPU_TRELLIS=device routes the encoder's trellis through the
        batched device DP; output files must be byte-identical."""
        from pixo_tpu import JpegOptions, jpeg
        from tests.conftest import synth_gradient

        img = synth_gradient(32, 24, 3)
        opts = JpegOptions.max(32, 24, 85)
        assert opts.trellis_quant
        monkeypatch.delenv("PIXO_TPU_TRELLIS", raising=False)
        host = jpeg.encode(img, opts)
        monkeypatch.setenv("PIXO_TPU_TRELLIS", "device")
        dev = jpeg.encode(img, opts)
        assert host == dev


class TestChainCandidates:
    """Device hash-chain assist vs a literal chain simulation, and byte
    identity of the assisted optimal DEFLATE (VERDICT r1 #4)."""

    def test_matches_chain_simulation(self, rng):
        from pixo_tpu.ops.lz77_assist import chain_candidates, chain_candidates_np

        data = rng.integers(0, 6, 3000, dtype=np.uint8)  # deep chains
        c_dev, l_dev = (np.asarray(x) for x in chain_candidates(data, k=4))
        c_np, l_np = chain_candidates_np(data, k=4)
        np.testing.assert_array_equal(c_dev, c_np)
        np.testing.assert_array_equal(l_dev, l_np)

    def test_tiny_inputs(self):
        from pixo_tpu.ops.lz77_assist import chain_candidates

        for n in (0, 1, 3, 4, 5):
            data = np.arange(n, dtype=np.uint8)
            c, l = chain_candidates(data, k=3)
            assert c.shape == (n, 3) and l.shape == (n, 3)
            assert (np.asarray(c) == -1).all()  # distinct 4-grams: no chains

    def test_assisted_optimal_deflate_byte_identical(self, rng, monkeypatch):
        import zlib

        from pixo_tpu.compress.deflate import deflate_optimal_zlib
        from pixo_tpu.native import native_available

        if not native_available():
            pytest.skip("native tier unavailable")
        # PNG-residual-like content: sparse small deltas + flat runs
        resid = rng.integers(-3, 4, 20000).astype(np.int8).astype(np.uint8)
        resid[rng.random(20000) < 0.6] = 0
        payload = resid.tobytes()
        monkeypatch.delenv("PIXO_TPU_LZ77", raising=False)
        plain = deflate_optimal_zlib(payload)
        monkeypatch.setenv("PIXO_TPU_LZ77", "device")
        assisted = deflate_optimal_zlib(payload)
        assert plain == assisted
        assert zlib.decompress(assisted) == payload


class TestNearestPalette:
    """Native AVX2 redmean nearest/LUT vs the chunked NumPy mirror."""

    def test_nearest_matches_numpy(self, rng):
        import pixo_tpu.native as N
        from pixo_tpu.png import quantize as q

        colors = rng.integers(0, 256, (4000, 4), dtype=np.uint8)
        for k in (256, 200, 7, 1):
            palette = rng.integers(0, 256, (k, 4), dtype=np.uint8)
            nat = N.native_nearest_palette(colors, palette)
            if nat is None:
                pytest.skip("native tier unavailable")
            real = N.native_nearest_palette
            N.native_nearest_palette = lambda *a: None
            try:
                ref = q.nearest_palette_indices(colors, palette)
            finally:
                N.native_nearest_palette = real
            np.testing.assert_array_equal(nat, ref)

    def test_lut_matches_per_cell_nearest(self, rng):
        import pixo_tpu.native as N
        from pixo_tpu.png import quantize as q

        palette = rng.integers(0, 256, (256, 4), dtype=np.uint8)
        lut = N.native_palette_lut(palette)
        if lut is None:
            pytest.skip("native tier unavailable")
        grid = q._lut_grid()
        samp = rng.integers(0, 64 * 64 * 64, 2000)
        ref = N.native_nearest_palette(grid[samp], palette)
        np.testing.assert_array_equal(lut[samp], ref)

    def test_gradient_quantization_quality(self):
        """Regression: uniform-count histograms must not collapse the kept
        8192 colors into one corner of the color cube (stable lowest-key
        tie-break did exactly that: mean |err| 48 at 256 colors on a
        smooth gradient; must be ~5)."""
        import io

        from PIL import Image

        from pixo_tpu import ColorType, PngOptions, png
        from pixo_tpu.options import QuantizationMode, QuantizationOptions
        from tests.conftest import synth_gradient

        img = synth_gradient(256, 256, 3)
        opts = PngOptions.fast(256, 256).replace(
            color_type=ColorType.RGB,
            quantization=QuantizationOptions(
                mode=QuantizationMode.FORCE, max_colors=256, dithering=False
            ),
        )
        out = png.encode(img, opts)
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB")).astype(int)
        err = np.abs(dec - img.astype(int)).mean()
        assert err < 10.0, f"mean |err| {err:.1f}"


class TestQuantizeDeviceEquality:
    """Device lossy-quantization tier vs the host tier (SURVEY §2.3 [K]
    mapping; semantics source mod.rs:1160-1701). Everything must be
    bit-identical — including the wavefront FS dither, whose equality
    rests on FS error terms being dyadic rationals exactly representable
    in f32 (see ops/quantize_device.py docstring)."""

    def _rng(self):
        return np.random.default_rng(1234)

    def test_nearest_palette(self):
        from pixo_tpu.ops.quantize_device import nearest_palette_device
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        colors = rng.integers(0, 256, (4096, 4), dtype=np.uint8)
        palette = rng.integers(0, 256, (256, 4), dtype=np.uint8)
        host = Q.nearest_palette_indices(colors, palette).astype(np.int32)
        dev = np.asarray(nearest_palette_device(colors, palette))
        assert np.array_equal(host, dev)

    def test_nearest_palette_ties_prefer_first(self):
        from pixo_tpu.ops.quantize_device import nearest_palette_device

        palette = np.array(
            [[10, 10, 10, 255], [10, 10, 10, 255], [200, 0, 0, 255]],
            np.uint8,
        )
        colors = np.array([[10, 10, 10, 255]], np.uint8)
        assert int(np.asarray(nearest_palette_device(colors, palette))[0]) == 0

    def test_kmeans_refine_padded(self):
        from pixo_tpu.ops.quantize_device import kmeans_refine_device
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        colors = rng.integers(0, 256, (1500, 4), dtype=np.uint8)
        counts = rng.integers(1, 900, 1500).astype(np.uint32)
        palette = rng.integers(0, 256, (100, 4), dtype=np.uint8)
        host = Q.refine_palette_kmeans(palette.copy(), colors, counts)
        pc, pw = Q._pad_hist(colors, counts)
        dev = np.asarray(
            kmeans_refine_device(
                Q._pad_palette(palette), pc, pw, np.int32(100)
            )
        )[:100]
        assert np.array_equal(host, dev)

    def test_kmeans_refine_large_image_weights(self):
        """Stride-scaled counts from a multi-megapixel image would
        overflow the device kernel's int32 accumulators; the caller-side
        GCD reduction must keep centroids bit-equal to the uint64 host
        tier (regression: int32 wrap produced garbage palettes)."""
        from pixo_tpu.ops.quantize_device import kmeans_refine_device
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        colors = rng.integers(0, 256, (800, 4), dtype=np.uint8)
        # ~12 MP image: ~50k samples scaled by stride 241
        orig = rng.integers(1, 120, 800).astype(np.uint64)
        counts = (orig * 241).astype(np.uint32)
        assert int(counts.sum(dtype=np.uint64)) * 255 >= 2**31
        palette = rng.integers(0, 256, (64, 4), dtype=np.uint8)
        host = Q.refine_palette_kmeans(palette.copy(), colors, counts)
        dw = Q._device_kmeans_weights(counts)
        assert dw is not None and int(dw.sum(dtype=np.uint64)) * 255 < 2**31
        pc, pw = Q._pad_hist(colors, dw)
        dev = np.asarray(
            kmeans_refine_device(
                Q._pad_palette(palette, 64), pc, pw, np.int32(64)
            )
        )[:64]
        assert np.array_equal(host, dev)

    def test_kmeans_weights_unreducible_falls_back(self):
        from pixo_tpu.png import quantize as Q

        bad = np.array([2**31 // 255, 2**31 // 255 + 1], np.uint32)
        assert Q._device_kmeans_weights(bad) is None

    def test_palette_lut(self):
        from pixo_tpu.ops.quantize_device import palette_lut_device
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        palette = rng.integers(0, 256, (64, 4), dtype=np.uint8)
        host = np.asarray(Q.PaletteLut(palette).opaque_lut)
        dev = np.asarray(palette_lut_device(palette))
        assert np.array_equal(host, dev)

    @pytest.mark.parametrize("has_alpha", [False, True])
    def test_dither_wavefront(self, has_alpha):
        from pixo_tpu.ops.quantize_device import dither_fs_device
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        h, w = 23, 37
        rgba = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        if not has_alpha:
            rgba[..., 3] = 255
        pal = rng.integers(0, 256, (48, 4), dtype=np.uint8)
        lut = Q.PaletteLut(pal)
        host = Q._dither_fs_py(rgba.reshape(-1, 4), w, h, pal, lut)
        native = Q._dither_floyd_steinberg(
            rgba.reshape(-1, 4), w, h, pal, lut
        )
        dev = np.asarray(
            dither_fs_device(
                rgba[None], pal[None],
                np.asarray(lut.opaque_lut)[None], has_alpha=has_alpha,
            )
        )[0].reshape(-1)
        assert np.array_equal(host, native)
        assert np.array_equal(host.astype(np.int32), dev)

    def test_quantize_image_device_mode(self):
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        h, w = 40, 56
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        img = np.clip(
            np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                      (xx + yy) % 256], axis=-1)
            + rng.integers(-6, 7, (h, w, 3)),
            0, 255,
        ).astype(np.uint8)
        for dither in (True, False):
            ph, ih = Q.quantize_image(
                img.reshape(-1, 3), w, h, 64, dither, mode="host"
            )
            pd, idd = Q.quantize_image(
                img.reshape(-1, 3), w, h, 64, dither, mode="device"
            )
            assert np.array_equal(ph, pd)
            assert np.array_equal(ih, idd)

    def test_quantize_batch_matches_per_image(self):
        from pixo_tpu.png import quantize as Q

        rng = self._rng()
        h, w = 32, 44
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        imgs = np.stack([
            np.clip(
                np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                          (xx + yy + s * 37) % 256], axis=-1)
                + rng.integers(-5, 6, (h, w, 3)),
                0, 255,
            ).astype(np.uint8)
            for s in range(3)
        ])
        batch = Q.quantize_batch(imgs, 48, True)
        for i in range(3):
            ph, ih = Q.quantize_image(
                imgs[i].reshape(-1, 3), w, h, 48, True, mode="host"
            )
            pb, ib = batch[i]
            assert np.array_equal(ph, pb)
            assert np.array_equal(ih, ib)


class TestDecodePixelTiers:
    """The three JPEG decode pixel tiers — native C++ (host default),
    NumPy mirror, jnp device kernels — must be bit-identical
    (VERDICT r2 weak #8: the native tail tripled single-image decode)."""

    @pytest.mark.parametrize("sub,gray", [("420", False), ("444", False),
                                          ("444", True)])
    def test_tiers_bit_equal(self, sub, gray, monkeypatch):
        from pixo_tpu import ColorType, JpegOptions, Subsampling, jpeg
        from pixo_tpu.decode import decode_jpeg

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (41, 67, 3), dtype=np.uint8)
        opts = JpegOptions(width=67, height=41, quality=85)
        opts.subsampling = (Subsampling.S420 if sub == "420"
                            else Subsampling.S444)
        src = img
        if gray:
            opts.color_type = ColorType.GRAY
            src = img[..., 0]
        f = bytes(jpeg.encode(src, opts))
        outs = {}
        for tier in ("device", "host"):
            monkeypatch.setenv("PIXO_TPU_DECODE_PIXELS", tier)
            outs[tier] = np.asarray(decode_jpeg(f).pixels)
        assert np.array_equal(outs["device"], outs["host"])


class TestUnfilterDevice:
    """Device PNG unfilter (wavefront scan, ops/png_unfilter.py) vs the
    host tiers — bit-identical across filter mixes and bpp (the
    SURVEY §7.6 'device unfilter' kernel)."""

    @pytest.mark.parametrize("bpp,rb,h", [(3, 48, 16), (4, 64, 20),
                                          (1, 31, 9), (8, 64, 12)])
    def test_matches_host(self, bpp, rb, h):
        from pixo_tpu.decode.png_decoder import unfilter
        from pixo_tpu.ops.png_unfilter import unfilter_device

        rng = np.random.default_rng(bpp * 100 + h)
        filters = rng.integers(0, 5, h).astype(np.int32)
        payload = rng.integers(0, 256, (h, rb), dtype=np.uint8)
        raw = b"".join(
            bytes([filters[y]]) + payload[y].tobytes() for y in range(h)
        )
        host = np.asarray(unfilter(raw, h, rb, bpp)).reshape(h, rb)
        dev = np.asarray(unfilter_device(payload, filters, bpp=bpp))
        assert np.array_equal(host, dev)

    def test_batch(self):
        from pixo_tpu.decode.png_decoder import unfilter
        from pixo_tpu.ops.png_unfilter import unfilter_device_batch

        rng = np.random.default_rng(1)
        f = rng.integers(0, 5, (3, 16)).astype(np.int32)
        p = rng.integers(0, 256, (3, 16, 48), dtype=np.uint8)
        dev = np.asarray(unfilter_device_batch(p, f, bpp=3))
        for i in range(3):
            raw = b"".join(
                bytes([f[i, y]]) + p[i, y].tobytes() for y in range(16)
            )
            host = np.asarray(unfilter(raw, 16, 48, 3)).reshape(16, 48)
            assert np.array_equal(host, dev[i])


class TestHuffmanCountDevice:
    """Device symbol histograms == host counter (the optimize-Huffman
    histogram pass BASELINE.json maps to device), across subsampling
    patterns and restart intervals, including ZRL splits, all-zero
    blocks, DC-only blocks, and a nonzero in the last zigzag slot."""

    PATTERNS = [(0,), (0, 1, 2), (0, 0, 0, 0, 1, 2), (0, 0, 1, 2)]

    @pytest.mark.parametrize("pattern", PATTERNS)
    @pytest.mark.parametrize("ri", [None, 1, 3, 7])
    def test_matches_host_counter(self, pattern, ri):
        from pixo_tpu.jpeg import packer
        from pixo_tpu.ops.huffman_device import count_symbols_device

        rng = np.random.default_rng(len(pattern) * 10 + (ri or 0))
        n = len(pattern) * 13
        zz = rng.integers(-40, 40, (n, 64)).astype(np.int16)
        zz[rng.random((n, 64)) < 0.85] = 0
        zz[:, 0] = rng.integers(-1023, 1024, n)
        zz[5] = 0                      # all-zero block (bare EOB)
        zz[6, 1:] = 0                  # DC-only block
        zz[7, 63] = 9                  # last slot nonzero (no EOB)
        zz[8, 1:] = 0
        zz[8, 40] = -1                 # two ZRLs then a symbol
        want = packer.count_symbols(zz, pattern, ri)
        got = count_symbols_device(zz, pattern, ri)
        for w, g in zip(want, got):
            assert np.array_equal(np.asarray(w), g)

    def test_encode_bytes_identical_under_device_tier(self, monkeypatch):
        """optimize_huffman encode with PIXO_TPU_HUFFMAN=device emits the
        same file as the host counter."""
        from pixo_tpu.jpeg import encoder as jenc
        from pixo_tpu.options import JpegOptions

        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
        opts = JpegOptions.balanced(40, 24, quality=80)
        assert opts.optimize_huffman
        monkeypatch.delenv("PIXO_TPU_HUFFMAN", raising=False)
        host_bytes = jenc.encode(img, opts)
        monkeypatch.setenv("PIXO_TPU_HUFFMAN", "device")
        dev_bytes = jenc.encode(img, opts)
        assert host_bytes == dev_bytes
