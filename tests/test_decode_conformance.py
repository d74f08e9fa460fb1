"""Decode conformance (mirrors the strategy of tests/decode_conformance.rs):
our decoders vs our encoders (exact for PNG, coefficient-exact for JPEG)
and vs third-party encoders (Pillow) as independent oracles."""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import (
    ColorType,
    JpegOptions,
    PngOptions,
    QuantizationMode,
    Subsampling,
    errors,
    jpeg,
    png,
)
from pixo_tpu.decode import decode_jpeg, decode_png
from tests.conftest import synth_checkerboard, synth_gradient, synth_noise


class TestPngDecode:
    def test_self_roundtrip_rgba(self):
        img = synth_gradient(60, 50, 4)
        r = decode_png(png.encode(img, PngOptions.fast(50, 60)))
        assert (r.width, r.height) == (50, 60)
        assert r.color_type == ColorType.RGBA
        np.testing.assert_array_equal(r.pixels, img)

    @pytest.mark.parametrize("ct,channels", [
        (ColorType.RGB, 3), (ColorType.GRAY, 1), (ColorType.GRAY_ALPHA, 2),
    ])
    def test_self_roundtrip_color_types(self, ct, channels):
        img = synth_gradient(40, 30, 4)[..., :channels]
        if channels == 1:
            img = img[..., 0]
        img = np.ascontiguousarray(img)
        opts = PngOptions(width=30, height=40, color_type=ct)
        r = decode_png(png.encode(img, opts))
        np.testing.assert_array_equal(r.pixels, img)

    def test_pillow_encoded_input(self):
        img = synth_noise(45, 37, 3)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "PNG")
        r = decode_png(buf.getvalue())
        np.testing.assert_array_equal(r.pixels, img)

    def test_pillow_palette_input(self):
        img = synth_gradient(32, 32, 3)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").convert(
            "P", palette=Image.Palette.ADAPTIVE
        ).save(buf, "PNG")
        r = decode_png(buf.getvalue())
        pil = np.asarray(Image.open(buf).convert("RGB"))
        np.testing.assert_array_equal(r.pixels, pil)

    def test_indexed_with_trns(self):
        palette = np.array([[10, 20, 30], [200, 100, 0]], np.uint8)
        trans = np.array([99], np.uint8)
        idx = (np.indices((20, 20)).sum(0) % 2).astype(np.uint8)
        data = png.encode_indexed(idx, 20, 20, palette, trans)
        r = decode_png(data)
        assert r.color_type == ColorType.RGBA
        assert (r.pixels[idx == 0, 3] == 99).all()
        assert (r.pixels[idx == 1, 3] == 255).all()

    def test_sub_byte_depths(self):
        # our encoder packs 1/2/4-bit palettes via reduce_palette
        for ncolors in (2, 4, 16):
            lut = (np.arange(ncolors) * (255 // max(ncolors - 1, 1))).astype(np.uint8)
            idx = (np.indices((24, 24)).sum(0) % ncolors).astype(np.uint8)
            img = np.repeat(lut[idx][..., None], 3, -1)
            opts = PngOptions.balanced(24, 24).replace(color_type=ColorType.RGB)
            r = decode_png(png.encode(img, opts))
            exp = img if r.pixels.ndim == 3 else img[..., 0]
            np.testing.assert_array_equal(r.pixels, exp)

    def test_lossy_quantized_roundtrip(self):
        img = synth_gradient(64, 64, 4)
        opts = PngOptions(width=64, height=64, color_type=ColorType.RGBA)
        opts.quantization.mode = QuantizationMode.FORCE
        opts.quantization.max_colors = 32
        data = png.encode(img, opts)
        ours = decode_png(data)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert(
            "RGBA" if ours.color_type == ColorType.RGBA else "RGB"))
        np.testing.assert_array_equal(ours.pixels, pil)

    def test_rejects_garbage(self):
        with pytest.raises(errors.InvalidDecode):
            decode_png(b"not a png at all")

    def test_rejects_bad_crc(self):
        img = synth_gradient(16, 16, 4)
        data = bytearray(png.encode(img, PngOptions.fast(16, 16)))
        data[20] ^= 0xFF  # corrupt IHDR payload
        with pytest.raises(errors.InvalidDecode):
            decode_png(bytes(data))

    def test_rejects_truncated(self):
        img = synth_gradient(16, 16, 4)
        data = png.encode(img, PngOptions.fast(16, 16))
        with pytest.raises(errors.InvalidDecode):
            decode_png(data[: len(data) // 2])

    def test_rejects_invalid_interlace_method(self):
        img = synth_gradient(16, 16, 3)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "PNG")
        raw = bytearray(buf.getvalue())
        # IHDR interlace byte is at offset 8+8+12 = 28 (last IHDR data byte)
        assert raw[12:16] == b"IHDR"
        raw[28] = 2  # invalid method
        import struct, zlib as z

        crc = z.crc32(bytes(raw[12:29])) & 0xFFFFFFFF
        raw[29:33] = struct.pack(">I", crc)
        with pytest.raises(errors.InvalidDecode):
            decode_png(bytes(raw))


class TestJpegDecode:
    def _pillow(self, data, mode="RGB"):
        img = Image.open(io.BytesIO(data))
        img.load()
        return np.asarray(img.convert(mode)).astype(int)

    @pytest.mark.parametrize("size", [(64, 64), (61, 47), (8, 8), (1, 1)])
    def test_444_vs_pillow(self, size):
        w, h = size
        img = synth_gradient(h, w, 3)
        data = jpeg.encode(img, JpegOptions.fast(w, h, 85))
        r = decode_jpeg(data)
        assert (r.width, r.height) == (w, h)
        diff = np.abs(r.pixels.astype(int) - self._pillow(data))
        assert diff.max() <= 2  # color-convert rounding differences only

    def test_420_vs_pillow(self):
        img = synth_gradient(48, 40, 3)
        opts = JpegOptions(width=40, height=48, quality=88, subsampling=Subsampling.S420)
        data = jpeg.encode(img, opts)
        diff = np.abs(decode_jpeg(data).pixels.astype(int) - self._pillow(data))
        # Pillow uses fancy (triangle) chroma upsampling; we use nearest
        assert diff.mean() < 3 and diff.max() <= 40

    def test_gray_vs_pillow(self):
        img = synth_gradient(32, 32, 3)[..., 0].copy()
        opts = JpegOptions(width=32, height=32, quality=85, color_type=ColorType.GRAY)
        data = jpeg.encode(img, opts)
        r = decode_jpeg(data)
        assert r.color_type == ColorType.GRAY
        diff = np.abs(r.pixels.astype(int) - self._pillow(data, "L"))
        assert diff.max() <= 1

    def test_restart_interval(self):
        img = synth_noise(32, 32, 3)
        opts = JpegOptions(width=32, height=32, quality=85, restart_interval=2)
        data = jpeg.encode(img, opts)
        diff = np.abs(decode_jpeg(data).pixels.astype(int) - self._pillow(data))
        assert diff.max() <= 2

    def test_optimized_huffman(self):
        img = synth_checkerboard(40, 40)
        opts = JpegOptions(width=40, height=40, quality=85, optimize_huffman=True)
        data = jpeg.encode(img, opts)
        diff = np.abs(decode_jpeg(data).pixels.astype(int) - self._pillow(data))
        assert diff.max() <= 2

    def test_pillow_encoded_input(self):
        img = synth_gradient(56, 72, 3)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "JPEG", quality=92, subsampling=0)
        r = decode_jpeg(buf.getvalue())
        diff = np.abs(r.pixels.astype(int) - self._pillow(buf.getvalue()))
        assert diff.max() <= 2

    def test_rejects_garbage(self):
        with pytest.raises(errors.InvalidDecode):
            decode_jpeg(b"definitely not a jpeg")
        with pytest.raises(errors.InvalidDecode):
            decode_jpeg(b"")
        with pytest.raises(errors.InvalidDecode):
            decode_jpeg(bytes([0xFF, 0xD8]))


class TestKernelEquality:
    def test_idct_jnp_matches_numpy(self, rng):
        import jax.numpy as jnp

        from pixo_tpu.ops.jpeg_decode import idct8x8_int, idct8x8_int_np

        blocks = (
            rng.integers(-80, 80, (100, 8, 8)) * (rng.random((100, 8, 8)) < 0.4)
        ).astype(np.int32)
        blocks[:, 0, 0] = rng.integers(-1000, 1000, 100)
        dev = np.asarray(idct8x8_int(jnp.asarray(blocks)))
        np.testing.assert_array_equal(dev, idct8x8_int_np(blocks))

    def test_idct_close_to_float(self, rng):
        import jax.numpy as jnp

        from pixo_tpu.ops.dct import idct8x8
        from pixo_tpu.ops.jpeg_decode import idct8x8_int_np

        blocks = (
            rng.integers(-80, 80, (100, 8, 8)) * (rng.random((100, 8, 8)) < 0.4)
        ).astype(np.int32)
        a = idct8x8_int_np(blocks).astype(float)
        f = np.asarray(idct8x8(jnp.asarray(blocks.astype(np.float32))))
        fpix = np.clip(np.round(f) + 128, 0, 255)
        assert np.abs(a - fpix).max() <= 1

    def test_ycbcr_inverse_consistency(self, rng):
        from pixo_tpu.color import rgb_to_ycbcr_np
        from pixo_tpu.ops.jpeg_decode import ycbcr_to_rgb_int_np

        rgb = rng.integers(0, 256, (500, 3), dtype=np.uint8)
        ycc = rgb_to_ycbcr_np(rgb).astype(np.int64)
        back = ycbcr_to_rgb_int_np(ycc[:, 0], ycc[:, 1] - 128, ycc[:, 2] - 128)
        assert np.abs(back.astype(int) - rgb.astype(int)).max() <= 3


class TestExtendedFormats:
    def test_jpeg_422_from_pillow(self):
        """4:2:2 subsampling (generic h/v sampling path)."""
        import io
        from PIL import Image

        img = synth_gradient(40, 48, 3)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "JPEG", quality=90, subsampling=1)
        r = decode_jpeg(buf.getvalue())
        pil = np.asarray(Image.open(buf).convert("RGB")).astype(int)
        diff = np.abs(r.pixels.astype(int) - pil)
        assert diff.mean() < 4

    def test_jpeg_420_odd_dims_from_pillow(self):
        import io
        from PIL import Image

        img = synth_gradient(33, 41, 3)
        buf = io.BytesIO()
        Image.fromarray(img, "RGB").save(buf, "JPEG", quality=90, subsampling=2)
        r = decode_jpeg(buf.getvalue())
        assert (r.width, r.height) == (41, 33)

    def test_png_16bit_from_pillow(self):
        import io
        from PIL import Image

        arr16 = (np.arange(30 * 20, dtype=np.uint16).reshape(20, 30) * 89) % 65535
        buf = io.BytesIO()
        Image.fromarray(arr16.astype(np.uint16)).save(buf, "PNG")
        r = decode_png(buf.getvalue())
        # 16 -> 8 keeps the high byte
        np.testing.assert_array_equal(r.pixels, (arr16 >> 8).astype(np.uint8))

    def test_png_low_depth_gray_from_pillow(self):
        import io
        from PIL import Image

        bw = ((np.indices((16, 16)).sum(0) % 2) * 255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(bw, "L").convert("1").save(buf, "PNG")
        r = decode_png(buf.getvalue())
        np.testing.assert_array_equal(r.pixels, bw)


class TestFancyUpsampling:
    def test_fancy_close_to_libjpeg(self):
        """Triangle chroma upsampling tracks Pillow/libjpeg closely on 420
        (beyond-parity option; default nearest matches the reference)."""
        import io
        from PIL import Image

        img = synth_gradient(48, 40, 3)
        opts = JpegOptions(width=40, height=48, quality=88, subsampling=Subsampling.S420)
        d = jpeg.encode(img, opts)
        pil = np.asarray(Image.open(io.BytesIO(d)).convert("RGB")).astype(int)
        fancy = decode_jpeg(d, fancy_upsampling=True).pixels.astype(int)
        near = decode_jpeg(d).pixels.astype(int)
        assert np.abs(fancy - pil).max() <= 2
        assert np.abs(fancy - pil).mean() <= np.abs(near - pil).mean()

    def test_fancy_equals_nearest_for_444(self):
        img = synth_gradient(32, 32, 3)
        d = jpeg.encode(img, JpegOptions(width=32, height=32, quality=90))
        np.testing.assert_array_equal(
            decode_jpeg(d).pixels, decode_jpeg(d, fancy_upsampling=True).pixels
        )


class TestTriangleUpsampleKernel:
    def test_h2v2_matches_scalar(self, rng):
        """Device triangle upsample vs a scalar 9-3-3-1 reference."""
        import jax.numpy as jnp

        from pixo_tpu.ops.jpeg_decode import upsample_triangle

        p = rng.integers(0, 256, (6, 7)).astype(np.int32)
        out = np.asarray(upsample_triangle(jnp.asarray(p), 2, 2))
        h, w = p.shape
        pad = np.pad(p, 1, mode="edge")
        ref = np.zeros((2 * h, 2 * w), np.int32)
        for y in range(h):
            for x in range(w):
                c = pad[y + 1, x + 1]
                for dy, oy in ((-1, 0), (1, 1)):
                    for dx, ox in ((-1, 0), (1, 1)):
                        near_v = pad[y + 1 + dy, x + 1]
                        near_h = pad[y + 1, x + 1 + dx]
                        diag = pad[y + 1 + dy, x + 1 + dx]
                        bias = 8 if ox == 0 else 7
                        ref[2 * y + oy, 2 * x + ox] = (
                            9 * c + 3 * near_v + 3 * near_h + diag + bias
                        ) >> 4
        np.testing.assert_array_equal(out, ref)

    def test_h2v1_matches_scalar(self, rng):
        import jax.numpy as jnp

        from pixo_tpu.ops.jpeg_decode import upsample_triangle

        p = rng.integers(0, 256, (5, 9)).astype(np.int32)
        out = np.asarray(upsample_triangle(jnp.asarray(p), 2, 1))
        h, w = p.shape
        pad = np.pad(p, ((0, 0), (1, 1)), mode="edge")
        ref = np.zeros((h, 2 * w), np.int32)
        for y in range(h):
            for x in range(w):
                c = pad[y, x + 1]
                ref[y, 2 * x] = (3 * c + pad[y, x] + 2) >> 2
                ref[y, 2 * x + 1] = (3 * c + pad[y, x + 2] + 1) >> 2
        np.testing.assert_array_equal(out, ref)


def _build_adam7_png(img: np.ndarray) -> bytes:
    """Hand-construct a valid Adam7-interlaced RGB(A) PNG (filter None)."""
    import struct
    import zlib as z

    h, w, c = img.shape
    ct = {3: 2, 4: 6}[c]
    passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
    raw = bytearray()
    for (x0, y0, dx, dy) in passes:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw.append(0)  # filter None
            raw += row.tobytes()
    out = bytearray(bytes([0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A]))

    def chunk(tag, data):
        out.extend(struct.pack(">I", len(data)))
        out.extend(tag)
        out.extend(data)
        out.extend(struct.pack(">I", z.crc32(tag + data) & 0xFFFFFFFF))

    chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 1))
    chunk(b"IDAT", z.compress(bytes(raw), 6))
    chunk(b"IEND", b"")
    return bytes(out)


class TestAdam7Decode:
    """Beyond-parity: the reference rejects interlaced PNGs; we decode them."""

    @pytest.mark.parametrize("size", [(16, 16), (17, 13), (7, 5), (1, 1), (9, 2)])
    def test_interlaced_matches_pillow(self, size):
        w, h = size
        img = synth_gradient(h, w, 3)
        data = _build_adam7_png(img)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        np.testing.assert_array_equal(pil, img)  # our construction is valid
        ours = decode_png(data)
        np.testing.assert_array_equal(ours.pixels, img)

    def test_interlaced_rgba(self):
        img = synth_gradient(21, 19, 4)
        img[3:9, 2:7, 3] = 77
        data = _build_adam7_png(img)
        ours = decode_png(data)
        np.testing.assert_array_equal(ours.pixels, img)


class TestProgressiveJpegDecode:
    """Beyond parity: the reference rejects SOF2 — its own max-preset
    output cannot be re-read. Ours round-trips exactly: a progressive
    stream of the same coefficients must decode identically to the
    baseline stream (both carry the same quantized DCT data)."""

    def _noisy(self, h, w, seed=3):
        rng = np.random.default_rng(seed)
        img = synth_gradient(h, w, 3).astype(np.int16)
        img += rng.integers(-9, 10, img.shape)
        return img.clip(0, 255).astype(np.uint8)

    @pytest.mark.parametrize("sub", [Subsampling.S444, Subsampling.S420])
    @pytest.mark.parametrize("opt", [False, True])
    def test_own_progressive_equals_baseline_decode(self, sub, opt):
        img = self._noisy(48, 72)
        common = dict(width=72, height=48, quality=85, subsampling=sub)
        prog = jpeg.encode(
            img, JpegOptions(progressive=True, optimize_huffman=opt, **common)
        )
        base = jpeg.encode(img, JpegOptions(**common))
        np.testing.assert_array_equal(
            decode_jpeg(prog).pixels, decode_jpeg(base).pixels
        )

    def test_own_progressive_gray(self):
        img = self._noisy(40, 40)[..., 0].copy()
        opts = JpegOptions(
            width=40, height=40, quality=80, color_type=ColorType.GRAY,
            progressive=True,
        )
        prog = jpeg.encode(img.reshape(40, 40, 1), opts)
        base = jpeg.encode(
            img.reshape(40, 40, 1),
            JpegOptions(width=40, height=40, quality=80, color_type=ColorType.GRAY),
        )
        np.testing.assert_array_equal(
            decode_jpeg(prog).pixels, decode_jpeg(base).pixels
        )

    def test_max_preset_roundtrip(self):
        """The full max preset (progressive + trellis + optimized tables)
        must decode through our own decoder."""
        img = self._noisy(33, 49)
        data = jpeg.encode(img, JpegOptions.from_preset(49, 33, 85, 2))
        r = decode_jpeg(data)
        assert (r.width, r.height) == (49, 33)
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(int)
        # 420 chroma: Pillow uses fancy upsampling, our default is nearest
        assert np.abs(decode_jpeg(data, fancy_upsampling=True).pixels.astype(int)
                      - pil).mean() < 1.5

    @pytest.mark.parametrize("sub", [0, 2])
    @pytest.mark.parametrize("quality", [30, 85, 95])
    def test_pillow_progressive_files(self, sub, quality):
        """Pillow/libjpeg emits a different scan script WITH successive
        approximation (Ah/Al refinement passes) — the decoder must handle
        the full T.81 G.1.2 scan set, not just our own script."""
        rng = np.random.default_rng(7)
        img = (rng.integers(0, 256, (56, 72, 3), dtype=np.uint8) // 8 * 8)
        buf = io.BytesIO()
        Image.fromarray(img).save(
            buf, "JPEG", quality=quality, progressive=True, subsampling=sub
        )
        data = buf.getvalue()
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(int)
        fancy = sub == 2  # match Pillow's chroma interpolation for 420
        ours = decode_jpeg(data, fancy_upsampling=fancy).pixels.astype(int)
        diff = np.abs(ours - pil)
        # 420 max bound is loose: our triangle kernel and libjpeg's differ
        # slightly at block edges on high-frequency content; the mean bound
        # is the real entropy-decode correctness check
        max_tol = 32 if sub == 2 else 4
        assert diff.max() <= max_tol and diff.mean() < 1.0, (sub, quality, diff.max())

    def test_pillow_progressive_gray(self):
        img = synth_gradient(31, 45, 3)[..., 0].copy()
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=75, progressive=True)
        ours = decode_jpeg(buf.getvalue()).pixels.astype(int)
        pil = np.asarray(Image.open(buf).convert("L")).astype(int)
        assert np.abs(ours - pil).max() <= 1

    @pytest.mark.parametrize("sub", [0, 2])
    def test_pillow_progressive_with_restarts(self, sub):
        """Restart markers reset DC predictors and EOB runs per segment in
        every progressive scan type (the native fast path keeps the run
        state in/out per entropy segment)."""
        rng = np.random.default_rng(11)
        img = (rng.integers(0, 256, (48, 80, 3), dtype=np.uint8) // 16 * 16)
        buf = io.BytesIO()
        Image.fromarray(img).save(
            buf, "JPEG", quality=85, progressive=True, subsampling=sub,
            restart_marker_rows=1,
        )
        data = buf.getvalue()
        assert b"\xff\xdd" in data  # DRI actually emitted
        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB")).astype(int)
        fancy = sub == 2
        ours = decode_jpeg(data, fancy_upsampling=fancy).pixels.astype(int)
        diff = np.abs(ours - pil)
        max_tol = 32 if sub == 2 else 4
        assert diff.max() <= max_tol and diff.mean() < 1.0, (sub, diff.max())

    def test_progressive_native_matches_python(self, monkeypatch):
        """The native per-segment scan decoders must write coefficient
        planes identical to the pure-Python T.81 loops (restarts incl.)."""
        rng = np.random.default_rng(13)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        files = []
        for kwargs in (
            dict(quality=85, progressive=True, subsampling=0),
            dict(quality=60, progressive=True, subsampling=2,
                 restart_marker_rows=1),
        ):
            buf = io.BytesIO()
            Image.fromarray(img).save(buf, "JPEG", **kwargs)
            files.append(buf.getvalue())
        files.append(jpeg.encode(
            img, JpegOptions(width=56, height=40, quality=85,
                             progressive=True)))
        for data in files:
            with_native = decode_jpeg(data).pixels
            monkeypatch.setenv("PIXO_TPU_DISABLE_NATIVE", "1")
            pure = decode_jpeg(data).pixels
            monkeypatch.delenv("PIXO_TPU_DISABLE_NATIVE")
            np.testing.assert_array_equal(with_native, pure)

    def test_truncated_progressive_rejected(self):
        img = self._noisy(32, 32)
        data = jpeg.encode(
            img, JpegOptions(width=32, height=32, quality=85, progressive=True)
        )
        with pytest.raises(errors.InvalidDecode):
            decode_jpeg(data[: len(data) // 2])


class TestBatchDecode:
    """Threaded batch decode surfaces (order-preserving, equal to the
    single-file decoders)."""

    def test_png_batch_matches_single(self):
        import numpy as np

        from pixo_tpu import ColorType, PngOptions, png
        from pixo_tpu.decode import decode_png, decode_png_batch

        rng = np.random.default_rng(0)
        files = []
        for i in range(6):
            h, w = int(rng.integers(4, 40)), int(rng.integers(4, 40))
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            files.append(png.encode(img, PngOptions(
                width=w, height=h, color_type=ColorType.RGB)))
        batch = decode_png_batch(files, workers=4)
        for f, b in zip(files, batch):
            s = decode_png(f)
            assert np.array_equal(b.pixels, s.pixels)
            assert (b.width, b.height) == (s.width, s.height)

    def test_jpeg_batch_matches_single(self):
        import numpy as np

        from pixo_tpu import JpegOptions, jpeg
        from pixo_tpu.decode import decode_jpeg, decode_jpeg_batch

        rng = np.random.default_rng(1)
        files = []
        for i in range(4):
            img = rng.integers(0, 256, (24, 32, 3), dtype=np.uint8)
            files.append(jpeg.encode(img, JpegOptions.fast(32, 24, 85)))
        batch = decode_jpeg_batch(files, workers=4)
        for f, b in zip(files, batch):
            s = decode_jpeg(f)
            assert np.array_equal(b.pixels, s.pixels)

    def test_png_batch_keep_bit_depth(self):
        import numpy as np

        from pixo_tpu import ColorType, PngOptions, png
        from pixo_tpu.decode import decode_png_batch

        rng = np.random.default_rng(2)
        img = rng.integers(0, 65536, (10, 12, 3), dtype=np.uint16)
        f = png.encode(img, PngOptions(width=12, height=10,
                                       color_type=ColorType.RGB,
                                       bit_depth=16))
        out = decode_png_batch([f, f], keep_bit_depth=True)
        assert all(np.array_equal(o.pixels, img) for o in out)
