"""16-bit PNG encode + keep_bit_depth decode (beyond parity: the
reference encoder is 8-bit only, ``src/png/mod.rs:592-617`` always writes
depth 8, and its decoder truncates 16->8 on read).

Oracles: Pillow reads 16-bit gray exactly (mode I;16) and truncates
16-bit color to the high byte; our own decoder round-trips full 16-bit
with ``keep_bit_depth=True``.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import errors, png
from pixo_tpu.decode import decode_png
from pixo_tpu.options import (
    ColorType,
    PngOptions,
    QuantizationMode,
    QuantizationOptions,
)


class TestPng16Encode:
    def test_gray16_pillow_exact(self):
        rng = np.random.default_rng(0)
        g = rng.integers(0, 65536, (20, 30), dtype=np.uint16)
        out = png.encode(g, PngOptions(width=30, height=20,
                                       color_type=ColorType.GRAY,
                                       bit_depth=16))
        pil = np.asarray(Image.open(io.BytesIO(out)))
        assert pil.dtype in (np.uint16, np.int32)
        assert np.array_equal(pil.astype(np.uint16), g)

    @pytest.mark.parametrize("ct,ch", [(ColorType.RGB, 3),
                                       (ColorType.RGBA, 4),
                                       (ColorType.GRAY_ALPHA, 2)])
    def test_color16_roundtrip(self, ct, ch):
        rng = np.random.default_rng(ch)
        img = rng.integers(0, 65536, (17, 23, ch), dtype=np.uint16)
        out = png.encode(img, PngOptions(width=23, height=17,
                                         color_type=ct, bit_depth=16))
        own = decode_png(out, keep_bit_depth=True)
        assert own.pixels.dtype == np.uint16
        assert np.array_equal(own.pixels.reshape(img.shape), img)
        # default decode keeps reference parity: high-byte uint8
        own8 = decode_png(out)
        assert own8.pixels.dtype == np.uint8
        assert np.array_equal(
            own8.pixels.reshape(img.shape), (img >> 8).astype(np.uint8)
        )

    def test_rgb16_pillow_high_byte(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 65536, (12, 18, 3), dtype=np.uint16)
        out = png.encode(img, PngOptions(width=18, height=12,
                                         color_type=ColorType.RGB,
                                         bit_depth=16))
        pil = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        assert np.array_equal(pil, (img >> 8).astype(np.uint8))

    def test_interlaced16(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 65536, (13, 9, 4), dtype=np.uint16)
        out = png.encode(img, PngOptions(width=9, height=13,
                                         color_type=ColorType.RGBA,
                                         bit_depth=16, interlace=True))
        assert out[8 + 8 + 12] == 1  # IHDR interlace byte
        assert out[8 + 8 + 8] == 16  # IHDR bit depth
        own = decode_png(out, keep_bit_depth=True)
        assert np.array_equal(own.pixels, img)

    def test_big_endian_bytes_input(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 65536, (8, 8, 3), dtype=np.uint16)
        opts = PngOptions(width=8, height=8, color_type=ColorType.RGB,
                          bit_depth=16)
        from_arr = png.encode(img, opts)
        from_bytes = png.encode(img.astype(">u2").tobytes(), opts)
        assert from_arr == from_bytes

    def test_validation(self):
        img = np.zeros((4, 4, 3), np.uint16)
        with pytest.raises(errors.CompressionError):
            png.encode(img, PngOptions(width=4, height=4,
                                       color_type=ColorType.RGB,
                                       bit_depth=12))
        with pytest.raises(errors.CompressionError):
            png.encode(img, PngOptions(
                width=4, height=4, color_type=ColorType.RGB, bit_depth=16,
                quantization=QuantizationOptions(mode=QuantizationMode.FORCE)))
        with pytest.raises(errors.InvalidDataLength):
            png.encode(img[:, :2], PngOptions(width=4, height=4,
                                              color_type=ColorType.RGB,
                                              bit_depth=16))

    def test_big_endian_and_rejected_dtypes(self):
        rng = np.random.default_rng(6)
        img = rng.integers(0, 65536, (6, 7, 3), dtype=np.uint16)
        opts = PngOptions(width=7, height=6, color_type=ColorType.RGB,
                          bit_depth=16)
        # explicit big-endian arrays encode identically to native-order
        assert png.encode(img.astype(">u2"), opts) == png.encode(img, opts)
        # same-size non-uint dtypes are rejected loudly, not truncated
        with pytest.raises(errors.CompressionError):
            png.encode(img.astype(np.int16), opts)
        with pytest.raises(errors.CompressionError):
            png.encode(img.astype(np.float16), opts)

    def test_float_input_still_accepted_at_8bit(self):
        # historical contract: any dtype casts to u8 on the 8-bit path
        rng = np.random.default_rng(7)
        img8 = rng.integers(0, 256, (5, 5, 3))
        a = png.encode(img8.astype(np.float64),
                       PngOptions(width=5, height=5, color_type=ColorType.RGB))
        b = png.encode(img8.astype(np.uint8),
                       PngOptions(width=5, height=5, color_type=ColorType.RGB))
        assert a == b
