"""JPEG conformance: marker structure + independent decode oracle (Pillow).

Mirrors the assertion strategy of the reference's tests/jpeg_conformance.rs:
SOI/EOI/APP0 byte checks, decode-oracle round trips, quality->size
monotonicity, preset coverage, restart intervals.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import ColorType, JpegOptions, Subsampling, errors, jpeg
from tests.conftest import synth_checkerboard, synth_gradient, synth_noise


def decode(data: bytes, mode: str = "RGB") -> np.ndarray:
    img = Image.open(io.BytesIO(data))
    img.load()
    return np.asarray(img.convert(mode))


class TestMarkers:
    def test_soi_eoi_app0(self, gradient_rgb):
        data = jpeg.encode(gradient_rgb, JpegOptions.fast(64, 64, 85))
        assert data[:2] == b"\xff\xd8"
        assert data[-2:] == b"\xff\xd9"
        assert data[2:4] == b"\xff\xe0"
        assert data[6:11] == b"JFIF\x00"

    def test_sof0_baseline_sof2_progressive(self, gradient_rgb):
        base = jpeg.encode(gradient_rgb, JpegOptions.fast(64, 64, 85))
        assert b"\xff\xc0" in base
        assert b"\xff\xc2" not in base

    def test_dri_present_with_restart(self, gradient_rgb):
        opts = JpegOptions(width=64, height=64, quality=85, restart_interval=4)
        data = jpeg.encode(gradient_rgb, opts)
        idx = data.find(b"\xff\xdd")
        assert idx > 0
        interval = int.from_bytes(data[idx + 4 : idx + 6], "big")
        assert interval == 4
        assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))


class TestDecodeOracle:
    @pytest.mark.parametrize("size", [(8, 8), (16, 16), (64, 64), (61, 47), (1, 1), (3, 5)])
    def test_roundtrip_sizes(self, size):
        w, h = size
        img = synth_gradient(h, w, 3)
        data = jpeg.encode(img, JpegOptions.fast(w, h, 90))
        dec = decode(data).astype(np.int32)
        err = np.abs(dec - img.astype(np.int32))
        assert err.max() <= 40  # tiny blocks have edge padding artifacts
        assert err.mean() < 10

    def test_roundtrip_420(self):
        img = synth_gradient(48, 48, 3)
        opts = JpegOptions(width=48, height=48, quality=90, subsampling=Subsampling.S420)
        dec = decode(jpeg.encode(img, opts)).astype(np.int32)
        assert np.abs(dec - img.astype(np.int32)).mean() < 10

    def test_roundtrip_gray(self):
        img = synth_gradient(32, 32, 3)[..., 0].copy()
        opts = JpegOptions(width=32, height=32, quality=90, color_type=ColorType.GRAY)
        dec = decode(jpeg.encode(img, opts), "L").astype(np.int32)
        assert np.abs(dec - img.astype(np.int32)).mean() < 4

    def test_optimized_huffman_same_pixels(self, gradient_rgb):
        base = jpeg.encode(gradient_rgb, JpegOptions(width=64, height=64, quality=85))
        opt = jpeg.encode(
            gradient_rgb,
            JpegOptions(width=64, height=64, quality=85, optimize_huffman=True),
        )
        assert len(opt) <= len(base)
        np.testing.assert_array_equal(decode(base), decode(opt))

    @pytest.mark.parametrize("prog", [False, True])
    @pytest.mark.parametrize("sub", [Subsampling.S444, Subsampling.S420])
    def test_optimal_huffman(self, prog, sub):
        """Beyond parity: package-merge tables (optimal_huffman=True) decode
        to identical pixels and are never larger than the reference's
        depth+1 scheme (optimize_huffman=True) or the std tables."""
        rng = np.random.default_rng(9)
        img = synth_gradient(56, 72, 3).astype(np.int16)
        img = (img + rng.integers(-20, 21, img.shape)).clip(0, 255).astype(np.uint8)
        common = dict(width=72, height=56, quality=85, subsampling=sub,
                      progressive=prog)
        std = jpeg.encode(img, JpegOptions(**common))
        ref_opt = jpeg.encode(img, JpegOptions(optimize_huffman=True, **common))
        opt = jpeg.encode(img, JpegOptions(optimal_huffman=True, **common))
        assert len(opt) <= len(ref_opt)
        assert len(opt) <= len(std)
        np.testing.assert_array_equal(decode(std), decode(opt))

    def test_optimal_huffman_gray_and_edge(self):
        """Gray path + tiny/solid images (degenerate histograms: single
        symbols, empty chroma) stay valid JPEGs."""
        solid = np.full((8, 8, 1), 200, np.uint8)
        opts = JpegOptions(width=8, height=8, quality=85,
                           color_type=ColorType.GRAY, optimal_huffman=True)
        dec = decode(jpeg.encode(solid, opts), "L")
        assert np.abs(dec.astype(int) - 200).max() <= 2
        one = np.array([[[13]]], np.uint8)
        opts = JpegOptions(width=1, height=1, quality=50,
                           color_type=ColorType.GRAY, optimal_huffman=True)
        decode(jpeg.encode(one, opts), "L")

    def test_restart_interval_same_pixels(self, gradient_rgb):
        a = jpeg.encode(gradient_rgb, JpegOptions(width=64, height=64, quality=85))
        b = jpeg.encode(
            gradient_rgb,
            JpegOptions(width=64, height=64, quality=85, restart_interval=2),
        )
        np.testing.assert_array_equal(decode(a), decode(b))

    def test_noise_roundtrip(self):
        img = synth_noise(40, 40)
        data = jpeg.encode(img, JpegOptions.fast(40, 40, 95))
        dec = decode(data).astype(np.int32)
        assert np.abs(dec - img.astype(np.int32)).mean() < 30

    def test_checkerboard(self):
        img = synth_checkerboard(32, 32)
        data = jpeg.encode(img, JpegOptions.fast(32, 32, 85))
        dec = decode(data).astype(np.int32)
        assert np.abs(dec - img.astype(np.int32)).mean() < 25


class TestQualityBehavior:
    def test_quality_size_monotonicity(self, gradient_rgb):
        sizes = [
            len(jpeg.encode(gradient_rgb, JpegOptions.fast(64, 64, q)))
            for q in (10, 50, 85, 95)
        ]
        assert sizes == sorted(sizes)

    def test_presets_all_decode(self, gradient_rgb):
        for preset in (0, 1, 2):
            opts = JpegOptions.from_preset(64, 64, 85, preset)
            data = jpeg.encode(gradient_rgb, opts)
            dec = decode(data).astype(np.int32)
            assert np.abs(dec - gradient_rgb.astype(np.int32)).mean() < 16


class TestValidation:
    def test_zero_dims(self):
        with pytest.raises(errors.InvalidDimensions):
            jpeg.encode(b"", JpegOptions(width=0, height=1))

    def test_bad_quality(self):
        with pytest.raises(errors.InvalidQuality):
            jpeg.encode(b"\x00" * 3, JpegOptions(width=1, height=1, quality=0))
        with pytest.raises(errors.InvalidQuality):
            jpeg.encode(b"\x00" * 3, JpegOptions(width=1, height=1, quality=101))

    def test_bad_restart(self):
        with pytest.raises(errors.InvalidRestartInterval):
            jpeg.encode(
                b"\x00" * 3, JpegOptions(width=1, height=1, restart_interval=0)
            )

    def test_bad_length(self):
        with pytest.raises(errors.InvalidDataLength):
            jpeg.encode(b"\x00" * 5, JpegOptions(width=2, height=2))

    def test_unsupported_color(self):
        with pytest.raises(errors.UnsupportedColorType):
            jpeg.encode(
                b"\x00" * 4,
                JpegOptions(width=1, height=1, color_type=ColorType.RGBA),
            )

    def test_too_large(self):
        with pytest.raises(errors.ImageTooLarge):
            jpeg.encode(b"", JpegOptions(width=70000, height=1))


class TestBatch:
    def test_batch_matches_single(self):
        imgs = np.stack([synth_gradient(24, 24), synth_noise(24, 24)])
        opts = JpegOptions.fast(24, 24, 85)
        batch = jpeg.encode_batch(imgs, opts)
        singles = [jpeg.encode(imgs[i], opts) for i in range(2)]
        assert batch == singles


class TestProgressiveRestart:
    def test_progressive_ignores_restart_interval(self, gradient_rgb):
        """DRI + progressive scans without RST markers desyncs decoders
        (a reference bug); we omit DRI in progressive mode instead."""
        import io
        from PIL import Image

        opts = JpegOptions(
            width=64, height=64, quality=85, progressive=True, restart_interval=4
        )
        data = jpeg.encode(gradient_rgb, opts)
        assert b"\xff\xdd" not in data  # no DRI segment
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        base = np.asarray(Image.open(io.BytesIO(
            jpeg.encode(gradient_rgb, opts.replace(restart_interval=None))
        )).convert("RGB"))
        np.testing.assert_array_equal(dec, base)
