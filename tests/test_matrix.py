"""Systematic config-matrix coverage (the breadth dimension of the
reference's 965-test suite): every encoder option combination against the
independent oracle."""

import io
import zlib

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import (
    ColorType,
    FilterStrategy,
    JpegOptions,
    PngOptions,
    Subsampling,
    jpeg,
    png,
)
from pixo_tpu.compress.deflate import deflate_zlib
from tests.conftest import synth_checkerboard, synth_gradient, synth_noise


def pil(data, mode):
    img = Image.open(io.BytesIO(data))
    img.load()
    return np.asarray(img.convert(mode))


CONTENTS = {
    "gradient": synth_gradient(48, 40, 4),
    "noise": synth_noise(48, 40, 4),
    "checker": synth_checkerboard(48, 40, 4),
}


class TestJpegMatrix:
    @pytest.mark.parametrize("content", sorted(CONTENTS))
    @pytest.mark.parametrize("quality", [5, 50, 95])
    @pytest.mark.parametrize("sub", list(Subsampling))
    def test_quality_subsampling_grid(self, content, quality, sub):
        img = np.ascontiguousarray(CONTENTS[content][..., :3])
        opts = JpegOptions(width=40, height=48, quality=quality, subsampling=sub)
        data = jpeg.encode(img, opts)
        dec = pil(data, "RGB")
        assert dec.shape == img.shape
        if quality >= 95 and content == "gradient":
            assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3

    @pytest.mark.parametrize("opt", [False, True])
    @pytest.mark.parametrize("prog", [False, True])
    @pytest.mark.parametrize("trellis", [False, True])
    def test_feature_grid(self, opt, prog, trellis):
        img = np.ascontiguousarray(CONTENTS["gradient"][..., :3])
        opts = JpegOptions(
            width=40, height=48, quality=85,
            optimize_huffman=opt, progressive=prog, trellis_quant=trellis,
        )
        data = jpeg.encode(img, opts)
        dec = pil(data, "RGB")
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 10

    def test_gray_progressive(self):
        g = np.ascontiguousarray(CONTENTS["gradient"][..., 0])
        opts = JpegOptions(
            width=40, height=48, quality=85,
            color_type=ColorType.GRAY, progressive=True,
        )
        data = jpeg.encode(g, opts)
        dec = pil(data, "L")
        base = pil(
            jpeg.encode(g, opts.replace(progressive=False)), "L"
        )
        np.testing.assert_array_equal(dec, base)

    def test_gray_optimized(self):
        g = np.ascontiguousarray(CONTENTS["checker"][..., 0])
        opts = JpegOptions(
            width=40, height=48, quality=85,
            color_type=ColorType.GRAY, optimize_huffman=True,
        )
        dec = pil(jpeg.encode(g, opts), "L")
        base = pil(jpeg.encode(g, opts.replace(optimize_huffman=False)), "L")
        np.testing.assert_array_equal(dec, base)

    @pytest.mark.parametrize("ri", [1, 2, 7, 100])
    def test_restart_grid(self, ri):
        img = np.ascontiguousarray(CONTENTS["noise"][..., :3])
        opts = JpegOptions(width=40, height=48, quality=85, restart_interval=ri)
        dec = pil(jpeg.encode(img, opts), "RGB")
        base = pil(jpeg.encode(img, opts.replace(restart_interval=None)), "RGB")
        np.testing.assert_array_equal(dec, base)


class TestPngMatrix:
    @pytest.mark.parametrize("content", sorted(CONTENTS))
    @pytest.mark.parametrize("strategy", [
        FilterStrategy.NONE, FilterStrategy.ADAPTIVE, FilterStrategy.BIGRAMS,
        FilterStrategy.ADAPTIVE_FAST, FilterStrategy.MIN_SUM,
    ])
    @pytest.mark.parametrize("level", [1, 9])
    def test_content_strategy_level_grid(self, content, strategy, level):
        img = CONTENTS[content]
        opts = PngOptions(
            width=40, height=48, color_type=ColorType.RGBA,
            compression_level=level, filter_strategy=strategy,
        )
        data = png.encode(img, opts)
        np.testing.assert_array_equal(pil(data, "RGBA"), img)

    @pytest.mark.parametrize("content", sorted(CONTENTS))
    def test_optimal_compression_lossless(self, content):
        img = CONTENTS[content]
        opts = PngOptions.max(40, 48)
        data = png.encode(img, opts)
        dec = np.asarray(Image.open(io.BytesIO(data)).convert("RGBA"))
        # the max preset enables optimize_alpha: RGB of fully transparent
        # pixels is zeroed by design; everything visible is lossless
        np.testing.assert_array_equal(dec[..., 3], img[..., 3])
        visible = img[..., 3] != 0
        np.testing.assert_array_equal(dec[visible], img[visible])
        assert (dec[~visible][:, :3] == 0).all() or visible.all()


class TestDeflateMatrix:
    CONTENT = {
        "empty": b"",
        "one": b"\x42",
        "run": b"\x07" * 9000,
        "cycle3": b"abc" * 5000,
        "ascii": bytes(range(32, 127)) * 200,
        "binary-structured": bytes(bytearray(
            (np.arange(30000) * 37 % 251).astype(np.uint8))),
    }

    @pytest.mark.parametrize("name", sorted(CONTENT))
    @pytest.mark.parametrize("level", [1, 2, 3, 4, 5, 6, 7, 8, 9])
    def test_all_levels_roundtrip(self, name, level):
        data = self.CONTENT[name]
        c = deflate_zlib(data, level)
        assert zlib.decompress(c) == data


class TestErrorMessages:
    def test_error_strings(self):
        from pixo_tpu import errors

        assert "3x0" in str(errors.InvalidDimensions(3, 0))
        assert "quality" in str(errors.InvalidQuality(0))
        assert "compression level" in str(errors.InvalidCompressionLevel(0))
        assert "expected 12" in str(errors.InvalidDataLength(12, 5))
        assert "65536" in str(errors.ImageTooLarge(65536, 1, 65535))
        assert "restart" in str(errors.InvalidRestartInterval(0))
        assert "bad" in str(errors.InvalidDecode("bad"))
        assert "Adam7" in str(errors.UnsupportedDecode("Adam7"))
