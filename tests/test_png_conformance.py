"""PNG conformance: byte-level structure + Pillow/zlib decode oracles.

Mirrors the assertion strategy of the reference's tests/png_conformance.rs.
"""

import io
import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import (
    ColorType,
    FilterStrategy,
    PngOptions,
    QuantizationMode,
    errors,
    png,
)
from tests.conftest import synth_checkerboard, synth_gradient, synth_noise

SIGNATURE = bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A])


def decode(data: bytes, mode: str) -> np.ndarray:
    img = Image.open(io.BytesIO(data))
    img.load()
    return np.asarray(img.convert(mode))


def parse_chunks(data: bytes):
    assert data[:8] == SIGNATURE
    pos = 8
    chunks = []
    while pos < len(data):
        length = struct.unpack(">I", data[pos : pos + 4])[0]
        ctype = data[pos + 4 : pos + 8]
        cdata = data[pos + 8 : pos + 8 + length]
        crc = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])[0]
        assert crc == (zlib.crc32(ctype + cdata) & 0xFFFFFFFF), ctype
        chunks.append((ctype, cdata))
        pos += 12 + length
    return chunks


class TestStructure:
    def test_signature_ihdr_iend(self, gradient_rgba):
        data = png.encode(gradient_rgba, PngOptions.fast(64, 64))
        chunks = parse_chunks(data)
        assert chunks[0][0] == b"IHDR"
        assert chunks[-1][0] == b"IEND"
        w, h, depth, ct, comp, filt, inter = struct.unpack(
            ">IIBBBBB", chunks[0][1]
        )
        assert (w, h) == (64, 64)
        assert depth == 8 and ct == 6 and comp == 0 and filt == 0 and inter == 0

    def test_idat_zlib_valid(self, gradient_rgba):
        data = png.encode(gradient_rgba, PngOptions.fast(64, 64))
        idat = b"".join(c for t, c in parse_chunks(data) if t == b"IDAT")
        raw = zlib.decompress(idat)
        assert len(raw) == 64 * (64 * 4 + 1)

    def test_idat_chunking(self):
        img = synth_noise(300, 300, 4)  # incompressible -> > 256 KiB IDAT
        data = png.encode(img, PngOptions.fast(300, 300))
        idats = [c for t, c in parse_chunks(data) if t == b"IDAT"]
        assert len(idats) >= 2
        assert all(len(c) <= 262144 for c in idats)

    def test_palette_chunks(self):
        lut = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
        idx = (np.indices((20, 20)).sum(0) % 3).astype(np.uint8)
        img = lut[idx]
        img4 = np.concatenate([img, np.full((20, 20, 1), 255, np.uint8)], -1)
        data = png.encode(img4, PngOptions.balanced(20, 20))
        types = [t for t, _ in parse_chunks(data)]
        assert b"PLTE" in types
        assert b"tRNS" not in types


class TestRoundTrip:
    @pytest.mark.parametrize("size", [(1, 1), (3, 2), (33, 17), (64, 64), (128, 90)])
    def test_rgba_sizes(self, size):
        w, h = size
        img = synth_gradient(h, w, 4)
        data = png.encode(img, PngOptions.fast(w, h))
        np.testing.assert_array_equal(decode(data, "RGBA"), img)

    @pytest.mark.parametrize("strategy", list(FilterStrategy))
    def test_all_strategies_lossless(self, strategy):
        img = synth_gradient(80, 70, 4)
        opts = PngOptions(
            width=70, height=80, color_type=ColorType.RGBA, filter_strategy=strategy
        )
        data = png.encode(img, opts)
        np.testing.assert_array_equal(decode(data, "RGBA"), img)

    @pytest.mark.parametrize("level", [1, 2, 6, 9])
    def test_levels_lossless(self, level):
        img = synth_noise(50, 50, 4)
        opts = PngOptions(
            width=50, height=50, color_type=ColorType.RGBA, compression_level=level
        )
        data = png.encode(img, opts)
        np.testing.assert_array_equal(decode(data, "RGBA"), img)

    def test_gray(self):
        img = synth_gradient(40, 40, 3)[..., 0].copy()
        opts = PngOptions(width=40, height=40, color_type=ColorType.GRAY)
        data = png.encode(img, opts)
        np.testing.assert_array_equal(decode(data, "L"), img)

    def test_gray_alpha(self):
        g = synth_gradient(40, 40, 3)
        img = np.stack([g[..., 0], g[..., 1]], axis=-1)
        opts = PngOptions(width=40, height=40, color_type=ColorType.GRAY_ALPHA)
        data = png.encode(img, opts)
        np.testing.assert_array_equal(decode(data, "LA"), img)

    def test_rgb(self):
        img = synth_gradient(40, 40, 3)
        opts = PngOptions(width=40, height=40, color_type=ColorType.RGB)
        data = png.encode(img, opts)
        np.testing.assert_array_equal(decode(data, "RGB"), img)


class TestReductions:
    def test_rgba_opaque_reduces_to_rgb(self):
        img = synth_gradient(40, 40, 4)
        data = png.encode(img, PngOptions.balanced(40, 40))
        chunks = parse_chunks(data)
        ct = chunks[0][1][9]
        assert ct == 2  # RGB
        np.testing.assert_array_equal(decode(data, "RGB"), img[..., :3])

    def test_rgb_gray_reduces_to_gray(self):
        g = synth_gradient(40, 40, 3)[..., 0]
        img = np.repeat(g[..., None], 3, axis=-1)
        opts = PngOptions.balanced(40, 40).replace(
            color_type=ColorType.RGB, reduce_palette=False
        )
        data = png.encode(img, opts)
        assert parse_chunks(data)[0][1][9] == 0  # Gray
        np.testing.assert_array_equal(decode(data, "L"), g)

    def test_binary_image_packs_1bit(self):
        img = (synth_checkerboard(40, 40, 3) // 255).astype(np.uint8)  # 0/1 gray
        img = np.repeat(img[..., :1], 3, axis=-1) * 255
        # black/white only -> palette of 2 -> 1-bit depth
        opts = PngOptions.balanced(40, 40).replace(color_type=ColorType.RGB)
        data = png.encode(img, opts)
        depth = parse_chunks(data)[0][1][8]
        assert depth == 1
        np.testing.assert_array_equal(decode(data, "RGB"), img)

    def test_transparent_keeps_rgba(self):
        img = synth_gradient(40, 40, 4)
        img[0, 0, 3] = 0
        data = png.encode(img, PngOptions.balanced(40, 40).replace(
            reduce_palette=False, optimize_alpha=False))
        assert parse_chunks(data)[0][1][9] == 6
        np.testing.assert_array_equal(decode(data, "RGBA"), img)

    def test_optimize_alpha_zeroes_invisible(self):
        img = synth_gradient(40, 40, 4)
        img[5:10, 5:10, 3] = 0
        data = png.encode(
            img,
            PngOptions(
                width=40, height=40, color_type=ColorType.RGBA, optimize_alpha=True
            ),
        )
        dec = decode(data, "RGBA")
        assert (dec[5:10, 5:10, :3] == 0).all()
        assert (dec[..., 3] == img[..., 3]).all()
        vis = img[..., 3] == 255
        np.testing.assert_array_equal(dec[vis], img[vis])


class TestIndexed:
    def test_encode_indexed(self):
        palette = np.array([[250, 1, 2], [3, 250, 4], [5, 6, 250]], np.uint8)
        idx = (np.indices((30, 30)).sum(0) % 3).astype(np.uint8)
        data = png.encode_indexed(idx, 30, 30, palette)
        np.testing.assert_array_equal(decode(data, "RGB"), palette[idx])

    def test_encode_indexed_trns(self):
        palette = np.array([[250, 1, 2], [3, 250, 4]], np.uint8)
        trans = np.array([128, 255], np.uint8)
        idx = (np.indices((10, 10)).sum(0) % 2).astype(np.uint8)
        data = png.encode_indexed(idx, 10, 10, palette, trans)
        dec = decode(data, "RGBA")
        assert (dec[idx == 0, 3] == 128).all()
        assert (dec[idx == 1, 3] == 255).all()

    def test_invalid_palette(self):
        with pytest.raises(errors.CompressionError):
            png.encode_indexed(np.zeros(4, np.uint8), 2, 2, np.zeros((0, 3)))


class TestLossy:
    def test_forced_quantization(self):
        img = synth_gradient(64, 64, 4)
        opts = PngOptions(width=64, height=64, color_type=ColorType.RGBA)
        opts.quantization.mode = QuantizationMode.FORCE
        opts.quantization.max_colors = 32
        data = png.encode(img, opts)
        chunks = parse_chunks(data)
        plte = next(c for t, c in chunks if t == b"PLTE")
        assert len(plte) // 3 <= 32
        dec = decode(data, "RGBA").astype(np.int32)
        assert np.abs(dec - img.astype(np.int32)).mean() < 20

    def test_lossy_smaller_than_lossless(self):
        # photographic-ish content: smooth gradient + noise, where palette
        # quantization wins (a pure gradient compresses losslessly too well)
        g = synth_gradient(128, 128, 4).astype(np.int32)
        n = np.random.default_rng(5).integers(-24, 25, g.shape)
        n[..., 3] = 0
        img = np.clip(g + n, 0, 255).astype(np.uint8)
        lossless = png.encode(img, PngOptions.balanced(128, 128))
        opts = PngOptions.balanced(128, 128)
        opts.quantization.mode = QuantizationMode.FORCE
        opts.quantization.max_colors = 64
        lossy = png.encode(img, opts)
        assert len(lossy) < len(lossless)

    def test_dithering_changes_output(self):
        img = synth_gradient(64, 64, 4)
        base = PngOptions(width=64, height=64, color_type=ColorType.RGBA)
        base.quantization.mode = QuantizationMode.FORCE
        base.quantization.max_colors = 16
        no_dither = png.encode(img, base)
        base.quantization.dithering = True
        dither = png.encode(img, base)
        assert no_dither != dither

    def test_auto_heuristic(self):
        from pixo_tpu.png.quantize import should_quantize_auto

        # few colors: no quantization needed
        few = np.zeros((1000, 4), np.uint8)
        assert not should_quantize_auto(few, 256)
        # moderate colors (> max but <= 32x): quantize
        n = 600
        moderate = np.zeros((n * 20, 4), np.uint8)
        moderate[:, 0] = np.repeat(np.arange(n) % 256, 20)
        moderate[:, 1] = np.repeat(np.arange(n) // 256, 20)
        moderate[:, 3] = 255
        assert should_quantize_auto(moderate, 256)


class TestValidation:
    def test_bad_level(self):
        with pytest.raises(errors.InvalidCompressionLevel):
            png.encode(b"\x00" * 4, PngOptions(width=1, height=1, compression_level=0))

    def test_zero_dims(self):
        with pytest.raises(errors.InvalidDimensions):
            png.encode(b"", PngOptions(width=0, height=5))

    def test_bad_length(self):
        with pytest.raises(errors.InvalidDataLength):
            png.encode(b"\x00" * 5, PngOptions(width=1, height=1))
