"""PNGSuite-analog conformance: every valid PNG format combination.

The real PNGSuite (reference: tests/support/pngsuite.rs) cannot be
downloaded here (no egress), so tests/support/png_writer.py — an
independent spec-direct writer sharing no code with pixo_tpu —
generates the same coverage locally: all color types x bit depths x
interlace x row filters, on geometries that stress Adam7 (empty
passes, single-pixel, odd sizes). Every file is decoded by our decoder
against computed source truth, and cross-checked against Pillow.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import errors
from pixo_tpu.decode import decode_png
from support.png_writer import write_png

# all valid (color_type, bit_depth) pairs per the PNG spec
VALID_COMBOS = (
    [(0, d) for d in (1, 2, 4, 8, 16)]
    + [(2, d) for d in (8, 16)]
    + [(3, d) for d in (1, 2, 4, 8)]
    + [(4, d) for d in (8, 16)]
    + [(6, d) for d in (8, 16)]
)

# odd geometries stress Adam7 pass extraction (several passes empty at
# 1x1 / 3x2; 9x9 exercises every pass with ragged tails)
SIZES = [(1, 1), (3, 2), (7, 5), (8, 8), (9, 9), (16, 13), (33, 17)]

GRAY_SCALE = {1: 255, 2: 85, 4: 17}


def _gen_samples(rng, h, w, color_type, bit_depth):
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    maxv = (1 << bit_depth) - 1
    if color_type == 3:
        maxv = min(maxv, 15)  # 16-entry palette
    shape = (h, w) if channels == 1 else (h, w, channels)
    return rng.integers(0, maxv + 1, shape).astype(np.int64)


def _expected_8bit(samples, color_type, bit_depth, palette=None, pal_alpha=None):
    """Source truth mapped through the decoder's documented semantics:
    sub-byte gray scales to full range, 16-bit keeps the high byte,
    palette indices expand through PLTE (+tRNS -> RGBA)."""
    s = samples
    if color_type == 3:
        rgb = palette[s]
        if pal_alpha is not None:
            a = np.full(s.shape, 255, np.uint8)
            valid = s < len(pal_alpha)
            a[valid] = pal_alpha[s[valid]]
            return np.concatenate([rgb, a[..., None]], axis=-1)
        return rgb
    if bit_depth < 8:
        return (s * GRAY_SCALE[bit_depth]).astype(np.uint8)
    if bit_depth == 16:
        return (s >> 8).astype(np.uint8)
    return s.astype(np.uint8)


def _pil_pixels(data, expected_channels):
    img = Image.open(io.BytesIO(data))
    if img.mode.startswith("I"):  # 16-bit gray: convert("L") clips, not scales
        return (np.asarray(img.convert("I")) >> 8).astype(np.uint8)
    mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[expected_channels]
    return np.asarray(img.convert(mode))


@pytest.mark.parametrize("interlace", [0, 1], ids=["seq", "adam7"])
@pytest.mark.parametrize("filter_mode", [None, "cycle"], ids=["f0", "fmix"])
@pytest.mark.parametrize("ct,depth", VALID_COMBOS,
                         ids=[f"ct{c}d{d}" for c, d in VALID_COMBOS])
class TestAllFormatCombos:
    def test_decode_matches_source_and_pillow(self, ct, depth, interlace,
                                              filter_mode):
        rng = np.random.default_rng(ct * 100 + depth)
        palette = rng.integers(0, 256, (16, 3)).astype(np.uint8) if ct == 3 else None
        for (h, w) in SIZES:
            s = _gen_samples(rng, h, w, ct, depth)
            data = write_png(s, depth, ct, palette=palette,
                             interlace=interlace, filter_mode=filter_mode)
            out = decode_png(data).pixels
            exp = _expected_8bit(s, ct, depth, palette)
            np.testing.assert_array_equal(
                np.squeeze(out), np.squeeze(exp),
                err_msg=f"ct={ct} depth={depth} {w}x{h} "
                        f"interlace={interlace} filters={filter_mode}",
            )
            pil = _pil_pixels(data, 1 if exp.ndim == 2 else exp.shape[-1])
            np.testing.assert_array_equal(
                np.squeeze(pil), np.squeeze(exp),
                err_msg=f"Pillow disagrees: ct={ct} depth={depth} {w}x{h}",
            )


class TestPaletteTransparency:
    @pytest.mark.parametrize("interlace", [0, 1], ids=["seq", "adam7"])
    @pytest.mark.parametrize("depth", [1, 2, 4, 8])
    def test_trns_palette(self, depth, interlace):
        rng = np.random.default_rng(depth)
        palette = rng.integers(0, 256, (16, 3)).astype(np.uint8)
        # alpha for a prefix of entries only (the common short-tRNS form)
        alpha = np.array([0, 128, 255, 7], np.uint8)
        for (h, w) in [(5, 7), (9, 9), (16, 13)]:
            s = _gen_samples(rng, h, w, 3, depth)
            data = write_png(s, depth, 3, palette=palette,
                             trns=alpha.tobytes(), interlace=interlace)
            out = decode_png(data).pixels
            exp = _expected_8bit(s, 3, depth, palette, pal_alpha=alpha)
            np.testing.assert_array_equal(out, exp)
            pil = _pil_pixels(data, 4)
            np.testing.assert_array_equal(pil, exp)


class TestPaletteEdgeParity:
    """Reference-parity corner cases (src/decode/png.rs:492-530)."""

    def test_all_opaque_trns_stays_rgb(self):
        # tRNS of all 0xFF must NOT upgrade the output to RGBA
        rng = np.random.default_rng(3)
        palette = rng.integers(0, 256, (8, 3)).astype(np.uint8)
        s = rng.integers(0, 8, (6, 6)).astype(np.int64)
        data = write_png(s, 8, 3, palette=palette,
                         trns=bytes([255, 255, 255]))
        out = decode_png(data)
        assert out.pixels.shape[-1] == 3
        np.testing.assert_array_equal(out.pixels, palette[s])

    def test_out_of_range_index_is_black(self):
        # indices past PLTE expand to opaque black, not an error
        palette = np.full((4, 3), 200, np.uint8)
        s = np.array([[0, 1], [3, 9]], np.int64)  # 9 >= 4 entries
        data = write_png(s, 8, 3, palette=palette)
        out = decode_png(data)
        np.testing.assert_array_equal(out.pixels[1, 1], [0, 0, 0])
        np.testing.assert_array_equal(out.pixels[0, 0], [200, 200, 200])
        # with non-opaque tRNS: black stays opaque
        data = write_png(s, 8, 3, palette=palette, trns=bytes([10]))
        out = decode_png(data)
        np.testing.assert_array_equal(out.pixels[1, 1], [0, 0, 0, 255])
        np.testing.assert_array_equal(out.pixels[0, 0], [200, 200, 200, 10])


class TestWriterCrossChecks:
    """The independent writer itself must be sound: its files round-trip
    through Pillow AND through our encoder's own decoder on a dense
    filter/size sweep."""

    def test_every_filter_type_large(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (64, 48, 3)).astype(np.int64)
        for fmode in [0, 1, 2, 3, 4, "cycle"]:
            data = write_png(img, 8, 2, filter_mode=fmode)
            out = decode_png(data).pixels
            np.testing.assert_array_equal(out, img.astype(np.uint8),
                                          err_msg=f"filter={fmode}")

    def test_incompressible_and_flat(self):
        rng = np.random.default_rng(1)
        noise = rng.integers(0, 256, (32, 32, 4)).astype(np.int64)
        flat = np.zeros((32, 32, 4), np.int64)
        for img in (noise, flat):
            for level in (0, 9):
                data = write_png(img, 8, 6, filter_mode="cycle", level=level)
                np.testing.assert_array_equal(
                    decode_png(data).pixels, img.astype(np.uint8))


class TestMalformedCombos:
    """Invalid header combinations must raise PixoError, matching the
    reference decoder's validation (src/decode/png.rs IHDR checks)."""

    @pytest.mark.parametrize("ct,depth", [(2, 4), (2, 1), (4, 4), (6, 2),
                                          (3, 16), (0, 3), (5, 8), (7, 8)])
    def test_invalid_ct_depth(self, ct, depth):
        img = np.zeros((4, 4, 3), np.int64)
        data = bytearray(write_png(img, 8, 2))
        # patch IHDR depth/color-type bytes and fix the CRC
        import struct
        import zlib as _z

        ihdr = bytearray(data[16:29])
        ihdr[8], ihdr[9] = depth, ct
        data[16:29] = ihdr
        data[29:33] = struct.pack(">I", _z.crc32(b"IHDR" + bytes(ihdr)))
        with pytest.raises(errors.PixoError):
            decode_png(bytes(data))

    def test_bad_filter_byte(self):
        img = np.zeros((4, 4, 3), np.int64)
        data = write_png(img, 8, 2)
        # rebuild IDAT with an out-of-range filter byte
        raw = bytearray(b"\x00" + bytes(12)) * 4
        raw[0] = 9
        import struct
        import zlib as _z

        idat = _z.compress(bytes(raw))
        out = bytearray(data[:33])
        out += struct.pack(">I", len(idat)) + b"IDAT" + idat
        out += struct.pack(">I", _z.crc32(b"IDAT" + idat))
        out += data[-12:]
        with pytest.raises(errors.PixoError):
            decode_png(bytes(out))
