"""Property-based fuzz tests (the analog of tests/fuzz/ in the reference:
structured-arbitrary inputs with dims clamped to 1-64, asserting no
panics + valid round-trips)."""

import io
import zlib

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from PIL import Image

from pixo_tpu import ColorType, JpegOptions, PngOptions, Subsampling, jpeg, png
from pixo_tpu.compress.deflate import deflate_zlib, inflate_zlib
from pixo_tpu.decode import decode_jpeg, decode_png

dims = st.integers(min_value=1, max_value=64)
quality = st.integers(min_value=1, max_value=100)
level = st.integers(min_value=1, max_value=9)

fuzz_settings = settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


class TestPngEncodeFuzz:
    @fuzz_settings
    @given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1), lvl=level,
           ct=st.sampled_from(list(ColorType)))
    def test_encode_decodes_lossless(self, w, h, seed, lvl, ct):
        rng = np.random.default_rng(seed)
        ch = ct.bytes_per_pixel
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        opts = PngOptions(width=w, height=h, color_type=ct, compression_level=lvl)
        data = png.encode(img, opts)
        r = decode_png(data)
        got = r.pixels if r.pixels.ndim == 3 else r.pixels[..., None]
        np.testing.assert_array_equal(got.reshape(h, w, ch), img)
        # independent oracle
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[ch]
        pil = np.asarray(Image.open(io.BytesIO(data)).convert(mode))
        np.testing.assert_array_equal(pil.reshape(h, w, ch), img)

    @fuzz_settings
    @given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1))
    def test_reductions_lossless(self, w, h, seed):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 4, (h, w, 4), dtype=np.uint8) * 85
        img[..., 3] = 255
        opts = PngOptions.balanced(w, h)
        data = png.encode(img, opts)
        r = decode_png(data)
        got = r.pixels if r.pixels.ndim == 3 else np.repeat(r.pixels[..., None], 3, -1)
        np.testing.assert_array_equal(got[..., :3], img[..., :3])


class TestJpegEncodeFuzz:
    @fuzz_settings
    @given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1), q=quality,
           sub=st.sampled_from(list(Subsampling)),
           opt=st.booleans(), ri=st.integers(0, 8))
    def test_encode_decodable(self, w, h, seed, q, sub, opt, ri):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        opts = JpegOptions(
            width=w, height=h, quality=q, subsampling=sub,
            optimize_huffman=opt, restart_interval=ri or None,
        )
        data = jpeg.encode(img, opts)
        pil = Image.open(io.BytesIO(data))
        pil.load()
        assert pil.size == (w, h)
        ours = decode_jpeg(data)
        assert (ours.width, ours.height) == (w, h)
        diff = np.abs(
            ours.pixels.astype(int) - np.asarray(pil.convert("RGB")).astype(int)
        )
        if sub == Subsampling.S444:
            assert diff.max() <= 2  # color-convert rounding only
        else:
            # Pillow's fancy (triangle) chroma upsampling vs our nearest
            # diverges pointwise on noisy chroma; compare in aggregate.
            assert diff.mean() <= 24

    @fuzz_settings
    @given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1), q=quality)
    def test_progressive_decodable(self, w, h, seed, q):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        opts = JpegOptions(width=w, height=h, quality=q, progressive=True)
        data = jpeg.encode(img, opts)
        pil = Image.open(io.BytesIO(data))
        pil.load()
        assert pil.size == (w, h)
        # progressive must decode pixel-identical to baseline (same coeffs)
        base = jpeg.encode(img, opts.replace(progressive=False))
        a = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        b = np.asarray(Image.open(io.BytesIO(base)).convert("RGB"))
        np.testing.assert_array_equal(a, b)


class TestDeflateFuzz:
    @fuzz_settings
    @given(data=st.binary(min_size=0, max_size=5000), lvl=level)
    def test_roundtrip(self, data, lvl):
        c = deflate_zlib(data, lvl)
        assert zlib.decompress(c) == data
        assert inflate_zlib(c, len(data)) == data

    @fuzz_settings
    @given(seed=st.integers(0, 2**32 - 1), n=st.integers(0, 20000), lvl=level)
    def test_structured_roundtrip(self, seed, n, lvl):
        rng = np.random.default_rng(seed)
        # mix of runs, copies, and noise (LZ77 stress)
        parts = []
        remaining = n
        while remaining > 0:
            kind = rng.integers(0, 3)
            ln = int(rng.integers(1, min(remaining, 500) + 1))
            if kind == 0:
                parts.append(bytes([int(rng.integers(0, 256))]) * ln)
            elif kind == 1 and parts:
                prev = b"".join(parts)
                parts.append(prev[-ln:] if len(prev) >= ln else prev)
            else:
                parts.append(rng.integers(0, 256, ln, dtype=np.uint8).tobytes())
            remaining -= ln
        data = b"".join(parts)[:n]
        c = deflate_zlib(data, lvl)
        assert zlib.decompress(c) == data


import functools


@functools.lru_cache(maxsize=None)
def _mutation_corpus():
    """Small valid streams for mutation fuzzing (encoded once)."""
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, (17, 24, 3), dtype=np.uint8)
    pal = np.concatenate(
        [rng.integers(0, 5, (20, 20, 3), dtype=np.uint8) * 51,
         np.full((20, 20, 1), 255, np.uint8)], axis=2,
    )
    out = {}
    out["png_rgb"] = bytes(
        png.encode(rgb, PngOptions(width=24, height=17,
                                   color_type=ColorType.RGB))
    )
    out["png_pal"] = bytes(png.encode(pal, PngOptions.balanced(20, 20)))
    out["jpeg_420"] = bytes(
        jpeg.encode(rgb, JpegOptions(width=24, height=17, quality=80,
                                     subsampling=Subsampling.S420,
                                     restart_interval=2))
    )
    out["jpeg_prog"] = bytes(
        jpeg.encode(rgb, JpegOptions(width=24, height=17, quality=80,
                                     progressive=True))
    )
    out["png_adam7"] = bytes(
        png.encode(rgb, PngOptions(width=24, height=17,
                                   color_type=ColorType.RGB, interlace=True))
    )
    g16 = rng.integers(0, 65536, (12, 19), dtype=np.uint16)
    out["png_gray16"] = bytes(
        png.encode(g16, PngOptions(width=19, height=12,
                                   color_type=ColorType.GRAY, bit_depth=16))
    )
    out["jpeg_gray"] = bytes(
        jpeg.encode(rgb[:, :, 0], JpegOptions(width=24, height=17, quality=80,
                                              color_type=ColorType.GRAY))
    )
    out["jpeg_422"] = bytes(
        jpeg.encode(rgb, JpegOptions(width=24, height=17, quality=80,
                                     subsampling=Subsampling.S422,
                                     restart_interval=3))
    )
    # max preset: trellis + successive-approximation scan script with
    # per-scan optimal tables — the SA refine/EOB-run decode paths
    # (VERDICT r4 task 8: extend mutation fuzzing to SA decode)
    out["jpeg_sa_max"] = bytes(
        jpeg.encode(rgb, JpegOptions.from_preset(24, 17, 80, 2))
    )
    return out


def _png_fix_crcs(data: bytes) -> bytes:
    """Recompute every chunk CRC so payload corruption survives the CRC
    check and reaches INFLATE/unfilter/expansion."""
    out = bytearray(data[:8])
    i = 8
    while i + 8 <= len(data):
        ln = int.from_bytes(data[i:i + 4], "big")
        chunk = data[i + 4:i + 8 + ln]
        if len(chunk) < 4 + ln:
            out += data[i:]
            break
        out += data[i:i + 4] + chunk
        out += zlib.crc32(chunk).to_bytes(4, "big")
        i += 12 + ln
    return bytes(out)


class TestDecodeMutationFuzz:
    """Mutation fuzzing: take VALID encoder output and truncate it, flip
    bits, or corrupt payload windows. The decoders must either succeed
    or raise PixoError — never hang, crash, or leak a foreign exception
    (zlib.error, struct.error, IndexError, ...). This is the decode-side
    complement of the reference's structured-input fuzz targets
    (tests/fuzz/fuzz_targets/*.rs), which are encode-only."""

    def _expect_clean(self, decode, data):
        from pixo_tpu import errors

        try:
            decode(bytes(data))
        except errors.PixoError:
            pass

    @fuzz_settings
    @given(key=st.sampled_from(["png_rgb", "png_pal", "png_adam7", "png_gray16"]),
           frac=st.floats(0.0, 1.0))
    def test_png_truncation(self, key, frac):
        data = _mutation_corpus()[key]
        self._expect_clean(decode_png, data[: int(len(data) * frac)])

    @fuzz_settings
    @given(key=st.sampled_from(["png_rgb", "png_pal", "png_adam7", "png_gray16"]),
           pos=st.integers(8, 10_000), bit=st.integers(0, 7))
    def test_png_bitflip(self, key, pos, bit):
        data = bytearray(_mutation_corpus()[key])
        data[pos % len(data)] ^= 1 << bit
        self._expect_clean(decode_png, data)

    @fuzz_settings
    @given(key=st.sampled_from(["png_rgb", "png_pal", "png_adam7", "png_gray16"]),
           pos=st.integers(0, 10_000), seed=st.integers(0, 2**32 - 1),
           n=st.integers(1, 16))
    def test_png_payload_corruption_reaches_inflate(self, key, pos, seed, n):
        # corrupt a window, then FIX the chunk CRCs: the corruption must
        # be handled by INFLATE / unfilter / palette expansion, not
        # masked by the CRC guard
        data = bytearray(_mutation_corpus()[key])
        rng = np.random.default_rng(seed)
        start = 8 + pos % max(len(data) - 8 - n, 1)
        data[start:start + n] = rng.integers(0, 256, n, np.uint8).tobytes()
        self._expect_clean(decode_png, _png_fix_crcs(bytes(data)))

    @fuzz_settings
    @given(key=st.sampled_from(["jpeg_420", "jpeg_422", "jpeg_prog", "jpeg_gray", "jpeg_sa_max"]),
           frac=st.floats(0.0, 1.0))
    def test_jpeg_truncation(self, key, frac):
        data = _mutation_corpus()[key]
        self._expect_clean(decode_jpeg, data[: int(len(data) * frac)])

    @fuzz_settings
    @given(key=st.sampled_from(["jpeg_420", "jpeg_422", "jpeg_prog", "jpeg_gray", "jpeg_sa_max"]),
           pos=st.integers(2, 10_000), bit=st.integers(0, 7))
    def test_jpeg_bitflip(self, key, pos, bit):
        # no CRC in JPEG: every flip lands on live marker parsing or the
        # entropy decoder
        data = bytearray(_mutation_corpus()[key])
        data[pos % len(data)] ^= 1 << bit
        self._expect_clean(decode_jpeg, data)


class TestDecodeFuzzRobustness:
    @fuzz_settings
    @given(data=st.binary(min_size=0, max_size=300))
    def test_png_decoder_never_crashes(self, data):
        from pixo_tpu import errors

        try:
            decode_png(bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]) + data)
        except errors.PixoError:
            pass

    @fuzz_settings
    @given(data=st.binary(min_size=0, max_size=300))
    def test_jpeg_decoder_never_crashes(self, data):
        from pixo_tpu import errors

        try:
            decode_jpeg(b"\xff\xd8" + data)
        except errors.PixoError:
            pass


class TestOptimalDeflateFuzz:
    """VERDICT r4 task 8: fuzz the optimal-parse DEFLATE (Zopfli-style DP,
    the reference's deflate_optimal_zlib analog) on both the perf path
    and the byte-parity path — round-trip through zlib AND our INFLATE,
    and never worse than greedy level 9 (the dispatcher's contract)."""

    def _opt(self, data, parity, iterations=2):
        import os

        from pixo_tpu.compress.deflate import deflate_optimal_zlib

        old = os.environ.get("PIXO_TPU_DEFLATE_PARITY")
        os.environ["PIXO_TPU_DEFLATE_PARITY"] = "1" if parity else "0"
        try:
            return deflate_optimal_zlib(data, iterations)
        finally:
            if old is None:
                os.environ.pop("PIXO_TPU_DEFLATE_PARITY", None)
            else:
                os.environ["PIXO_TPU_DEFLATE_PARITY"] = old

    @fuzz_settings
    @given(data=st.binary(min_size=0, max_size=3000), parity=st.booleans())
    def test_optimal_roundtrip(self, data, parity):
        c = self._opt(data, parity)
        assert zlib.decompress(c) == data
        assert inflate_zlib(c, len(data)) == data
        if not parity:
            # perf-path contract: dispatcher returns min(optimal, greedy-9).
            # The parity path instead matches the reference byte-for-byte,
            # which can emit a larger stored block on tiny inputs.
            assert len(c) <= len(deflate_zlib(data, 9))

    @fuzz_settings
    @given(seed=st.integers(0, 2**32 - 1), n=st.integers(0, 8000),
           parity=st.booleans())
    def test_optimal_structured_roundtrip(self, seed, n, parity):
        rng = np.random.default_rng(seed)
        parts, remaining = [], n
        while remaining > 0:
            kind = rng.integers(0, 3)
            ln = int(rng.integers(1, min(remaining, 400) + 1))
            if kind == 0:
                parts.append(bytes([int(rng.integers(0, 256))]) * ln)
            elif kind == 1 and parts:
                prev = b"".join(parts)
                parts.append(prev[-ln:] if len(prev) >= ln else prev)
            else:
                parts.append(rng.integers(0, 256, ln, np.uint8).tobytes())
            remaining -= ln
        data = b"".join(parts)[:n]
        c = self._opt(data, parity)
        assert zlib.decompress(c) == data
        if not parity:
            assert len(c) <= len(deflate_zlib(data, 9))

    @fuzz_settings
    @given(seed=st.integers(0, 2**32 - 1), pos=st.integers(0, 10_000),
           bit=st.integers(0, 7))
    def test_optimal_stream_bitflip_inflate_clean(self, seed, pos, bit):
        # optimal-parse output uses block splits / layouts greedy never
        # emits; corrupting it exercises INFLATE table paths the greedy
        # mutation corpus cannot reach
        from pixo_tpu import errors

        rng = np.random.default_rng(seed)
        base = rng.integers(0, 8, 2048, np.uint8).tobytes() * 2
        c = bytearray(self._opt(base, False))
        c[pos % len(c)] ^= 1 << bit
        try:
            out = inflate_zlib(bytes(c), len(base))
            assert len(out) <= len(base)
        except errors.PixoError:
            pass


class TestAdam7AndDeep16Fuzz:
    """VERDICT r4 task 8: property round-trips for the beyond-parity
    Adam7 and 16-bit encode paths (example-based coverage lives in
    test_interlace.py / test_png16.py; hypothesis sweeps dims 1-64,
    every color type, and the interlace x depth product here)."""

    CTS = [ColorType.GRAY, ColorType.GRAY_ALPHA, ColorType.RGB,
           ColorType.RGBA]

    @fuzz_settings
    @given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1),
           ct=st.sampled_from(CTS))
    def test_adam7_encode_roundtrip(self, w, h, seed, ct):
        rng = np.random.default_rng(seed)
        ch = ct.bytes_per_pixel
        img = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        data = png.encode(img, PngOptions(width=w, height=h, color_type=ct,
                                          interlace=True))
        assert data[8 + 8 + 12] == 1  # IHDR interlace byte
        own = decode_png(data)
        got = own.pixels.reshape(h, w, -1)
        np.testing.assert_array_equal(got.reshape(h, w, ch), img)
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[ch]
        pil = np.asarray(Image.open(io.BytesIO(data)).convert(mode))
        np.testing.assert_array_equal(pil.reshape(h, w, ch), img)

    @fuzz_settings
    @given(w=dims, h=dims, seed=st.integers(0, 2**32 - 1),
           ct=st.sampled_from(CTS), interlace=st.booleans())
    def test_png16_encode_roundtrip(self, w, h, seed, ct, interlace):
        rng = np.random.default_rng(seed)
        ch = ct.bytes_per_pixel
        img = rng.integers(0, 65536, (h, w, ch), dtype=np.uint16)
        data = png.encode(img, PngOptions(width=w, height=h, color_type=ct,
                                          bit_depth=16, interlace=interlace))
        assert data[8 + 8 + 8] == 16  # IHDR bit depth
        own = decode_png(data, keep_bit_depth=True)
        assert own.pixels.dtype == np.uint16
        np.testing.assert_array_equal(own.pixels.reshape(h, w, ch), img)
        # default decode = reference-parity high byte
        own8 = decode_png(data)
        np.testing.assert_array_equal(
            own8.pixels.reshape(h, w, ch), (img >> 8).astype(np.uint8))
        if ch == 1:
            # Pillow reads 16-bit gray exactly (I;16 / I)
            pil = np.asarray(Image.open(io.BytesIO(data)))
            np.testing.assert_array_equal(
                pil.astype(np.uint16).reshape(h, w), img[..., 0])
