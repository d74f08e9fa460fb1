"""Foundation tests: color conversion, bit writers, checksums, options.

Transliterates the assertion content of the reference's unit tests
(src/color.rs, src/bits.rs, src/compress/{crc32,adler32}.rs) without
copying code.
"""

import zlib

import numpy as np
import pytest

from pixo_tpu.bits import BitReaderLsb, BitWriterLsb, BitWriterMsb
from pixo_tpu.color import ColorType, rgb_to_ycbcr, rgb_to_ycbcr_np
from pixo_tpu.compress.checksums import adler32, adler32_jnp, crc32
from pixo_tpu.options import JpegOptions, PngOptions, FilterStrategy


class TestColor:
    def test_bytes_per_pixel(self):
        assert ColorType.GRAY.bytes_per_pixel == 1
        assert ColorType.GRAY_ALPHA.bytes_per_pixel == 2
        assert ColorType.RGB.bytes_per_pixel == 3
        assert ColorType.RGBA.bytes_per_pixel == 4

    def test_png_color_type(self):
        assert ColorType.GRAY.png_color_type == 0
        assert ColorType.GRAY_ALPHA.png_color_type == 4
        assert ColorType.RGB.png_color_type == 2
        assert ColorType.RGBA.png_color_type == 6

    def test_ycbcr_black_white(self):
        out = rgb_to_ycbcr_np(np.array([[0, 0, 0], [255, 255, 255]], np.uint8))
        assert out[0].tolist() == [0, 128, 128]
        assert out[1].tolist() == [255, 128, 128]

    def test_ycbcr_red(self):
        y, cb, cr = rgb_to_ycbcr_np(np.array([255, 0, 0], np.uint8)).tolist()
        assert 50 < y < 100
        assert cb < 128
        assert cr > 200

    def test_device_matches_numpy(self, rng):
        rgb = rng.integers(0, 256, (97, 33, 3), dtype=np.uint8)
        dev = np.asarray(rgb_to_ycbcr(rgb))
        ref = rgb_to_ycbcr_np(rgb)
        np.testing.assert_array_equal(dev, ref)


class TestBitWriters:
    def test_lsb_order(self):
        w = BitWriterLsb()
        w.write_bits(0b1, 1)
        w.write_bits(0b10, 2)
        w.write_bits(0b11111, 5)
        # bits fill from LSB: 1 | 10<<1 | 11111<<3 = 0b11111101
        assert w.finish() == bytes([0b11111101])

    def test_lsb_cross_byte(self):
        w = BitWriterLsb()
        w.write_bits(0xFFF, 12)
        w.write_bits(0x0, 4)
        assert w.finish() == bytes([0xFF, 0x0F])

    def test_lsb_flush_pads_zero(self):
        w = BitWriterLsb()
        w.write_bits(0b1, 1)
        assert w.finish() == bytes([0x01])

    def test_msb_order(self):
        w = BitWriterMsb()
        w.write_bits(0b101, 3)
        w.write_bits(0b11111, 5)
        assert w.finish() == bytes([0b10111111])

    def test_msb_stuffing(self):
        w = BitWriterMsb()
        w.write_bits(0xFF, 8)
        w.write_bits(0xAB, 8)
        assert w.finish() == bytes([0xFF, 0x00, 0xAB])

    def test_msb_flush_pads_ones(self):
        w = BitWriterMsb()
        w.write_bits(0b10, 2)
        assert w.finish() == bytes([0b10111111])

    def test_msb_pad_creates_ff_stuffing(self):
        w = BitWriterMsb()
        w.write_bits(0b1111111, 7)  # pad last bit with 1 -> 0xFF -> stuffed
        assert w.finish() == bytes([0xFF, 0x00])

    def test_lsb_reader_roundtrip(self, rng):
        w = BitWriterLsb()
        fields = []
        for _ in range(200):
            n = int(rng.integers(1, 25))
            v = int(rng.integers(0, 1 << n))
            fields.append((v, n))
            w.write_bits(v, n)
        r = BitReaderLsb(w.finish())
        for v, n in fields:
            assert r.read_bits(n) == v


class TestChecksums:
    @pytest.mark.parametrize("n", [0, 1, 3, 100, 5000, 70000])
    def test_crc32_matches_zlib(self, rng, n):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert crc32(data) == (zlib.crc32(data) & 0xFFFFFFFF)

    @pytest.mark.parametrize("n", [0, 1, 3, 100, 5000, 70000])
    def test_adler32_matches_zlib(self, rng, n):
        data = rng.integers(0, 256, n, dtype=np.uint8).tobytes()
        assert adler32(data) == (zlib.adler32(data) & 0xFFFFFFFF)

    def test_crc32_incremental(self, rng):
        data = rng.integers(0, 256, 1000, dtype=np.uint8).tobytes()
        c = crc32(data[:300])
        assert crc32(data[300:], c) == crc32(data)

    def test_adler32_jnp(self, rng):
        import jax.numpy as jnp

        data = rng.integers(0, 256, 10000, dtype=np.uint8)
        dev = int(adler32_jnp(jnp.asarray(data)))
        assert dev == (zlib.adler32(data.tobytes()) & 0xFFFFFFFF)


class TestOptions:
    def test_jpeg_presets(self):
        fast = JpegOptions.from_preset(10, 10, 85, 0)
        assert not fast.optimize_huffman and not fast.progressive
        bal = JpegOptions.from_preset(10, 10, 85, 1)
        assert bal.optimize_huffman and not bal.progressive
        mx = JpegOptions.from_preset(10, 10, 85, 2)
        assert mx.optimize_huffman and mx.progressive and mx.trellis_quant
        assert mx.subsampling.value == "420"

    def test_png_presets(self):
        fast = PngOptions.from_preset(10, 10, 0)
        assert fast.compression_level == 2
        assert fast.filter_strategy == FilterStrategy.ADAPTIVE_FAST
        bal = PngOptions.from_preset(10, 10, 1)
        assert bal.compression_level == 6 and bal.reduce_palette
        mx = PngOptions.from_preset(10, 10, 2)
        assert mx.compression_level == 9 and mx.optimal_compression
        assert mx.filter_strategy == FilterStrategy.BIGRAMS

    def test_png_lossless_flag(self):
        lossy = PngOptions.from_preset_with_lossless(10, 10, 1, False)
        from pixo_tpu.options import QuantizationMode

        assert lossy.quantization.mode == QuantizationMode.AUTO
        assert lossy.quantization.dithering


class TestDeflateHuffman:
    """DEFLATE-side Huffman (compress/huffman.py): Kraft-exactness,
    optimality properties, fixed tables (src/compress/huffman.rs analog)."""

    def test_kraft_exact_on_skewed(self, rng):
        from pixo_tpu.compress.huffman import build_code_lengths

        for max_len in (7, 15):
            for _ in range(200):
                n = int(rng.integers(2, 30))
                freqs = (1 << rng.integers(0, 20, n)).astype(np.int64)
                freqs[rng.random(n) < 0.3] = 0
                if (freqs > 0).sum() == 0:
                    continue
                lengths = build_code_lengths(freqs, max_len)
                used = lengths[lengths > 0]
                if len(used) == 0:
                    continue
                kraft = sum(2.0 ** -int(l) for l in used)
                assert abs(kraft - 1.0) < 1e-12
                assert used.max() <= max_len

    def test_more_frequent_not_longer(self):
        from pixo_tpu.compress.huffman import build_code_lengths

        freqs = [100, 50, 20, 10, 5, 1]
        lengths = build_code_lengths(freqs)
        for a, b in zip(lengths, lengths[1:]):
            assert a <= b

    def test_canonical_codes_prefix_free(self, rng):
        from pixo_tpu.compress.huffman import (
            build_code_lengths,
            generate_canonical_codes,
        )

        freqs = rng.integers(0, 100, 20)
        freqs[0] = 1
        freqs[1] = 1
        lengths = build_code_lengths(freqs, 15)
        codes = generate_canonical_codes(lengths)
        seen = set()
        for c, l in zip(codes, lengths):
            if l == 0:
                continue
            bits = format(int(c), f"0{l}b")
            for p in seen:
                assert not bits.startswith(p) and not p.startswith(bits)
            seen.add(bits)

    def test_fixed_tables(self):
        from pixo_tpu.compress.huffman import (
            fixed_distance_lengths,
            fixed_literal_lengths,
        )

        ll = fixed_literal_lengths()
        assert ll[0] == 8 and ll[144] == 9 and ll[256] == 7 and ll[280] == 8
        assert (fixed_distance_lengths() == 5).all()

    def test_reverse_bits(self):
        from pixo_tpu.compress.huffman import reverse_bits

        assert reverse_bits(0b110, 3) == 0b011
        assert reverse_bits(0b1, 1) == 0b1
        assert reverse_bits(0b10000000, 8) == 0b00000001
