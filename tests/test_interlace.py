"""Adam7 interlaced PNG *encode* (beyond parity: the reference has no
interlace support on either side — its decoder rejects interlace=1 and
its encoder always writes interlace=0; ``src/decode/png.rs`` /
``src/png/mod.rs:592-617``).

Oracles: Pillow decodes the interlaced output; our own decoder
(which gained Adam7 in round 1) round-trips it; pixel equality against
the non-interlaced encode of the same input closes the loop.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import png
from pixo_tpu.decode import decode_png
from pixo_tpu.options import (
    ColorType,
    PngOptions,
    QuantizationMode,
    QuantizationOptions,
)


def _rt_check(img: np.ndarray, opts: PngOptions) -> bytes:
    """Encode interlaced; decode via Pillow AND our decoder; both must
    equal the Pillow decode of the equivalent non-interlaced encode."""
    out = png.encode(img, opts)
    # IHDR interlace byte set
    assert out[8 + 8 + 12] == 1  # sig + len/type of IHDR + 12 data bytes
    pil = np.asarray(Image.open(io.BytesIO(out)).convert("RGBA"))
    plain = png.encode(img, opts.replace(interlace=False))
    ref = np.asarray(Image.open(io.BytesIO(plain)).convert("RGBA"))
    assert np.array_equal(pil, ref)
    own = decode_png(out)
    own_plain = decode_png(plain)
    assert np.array_equal(own.pixels, own_plain.pixels)
    return out


class TestInterlacedEncode:
    @pytest.mark.parametrize("h,w", [(1, 1), (2, 3), (7, 13), (9, 10),
                                     (16, 16), (33, 47)])
    def test_rgb_shapes(self, h, w):
        rng = np.random.default_rng(h * 100 + w)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        _rt_check(img, PngOptions(width=w, height=h,
                                  color_type=ColorType.RGB, interlace=True))

    def test_rgba(self):
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (20, 30, 4), dtype=np.uint8)
        _rt_check(img, PngOptions(width=30, height=20,
                                  color_type=ColorType.RGBA, interlace=True))

    def test_gray(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, (18, 25, 1), dtype=np.uint8)
        _rt_check(img, PngOptions(width=25, height=18,
                                  color_type=ColorType.GRAY, interlace=True))

    def test_balanced_reductions_low_bit_depth(self):
        # 1-bit gray content through the balanced preset: the reduced
        # image re-packs rows per pass at the pass width
        rng = np.random.default_rng(3)
        g = (rng.integers(0, 2, (24, 21)) * 255).astype(np.uint8)
        img = np.repeat(g[..., None], 3, axis=-1)
        out = _rt_check(img, PngOptions.balanced(21, 24).replace(
            color_type=ColorType.RGB, interlace=True))
        assert out[8 + 8 + 8] == 1  # IHDR bit depth reduced to 1

    def test_lossy_indexed(self):
        rng = np.random.default_rng(4)
        x = np.linspace(0, 255, 40)
        img = (np.add.outer(x, x)[..., None] / 2
               + rng.normal(0, 10, (40, 40, 3))).clip(0, 255).astype(np.uint8)
        opts = PngOptions.balanced(40, 40).replace(
            color_type=ColorType.RGB, interlace=True,
            quantization=QuantizationOptions(
                mode=QuantizationMode.FORCE, max_colors=64, dithering=True))
        out = png.encode(img, opts)
        assert out[8 + 8 + 12] == 1
        # lossy: compare interlaced vs plain encode of the same input —
        # identical quantization decisions, so identical pixels
        pil = np.asarray(Image.open(io.BytesIO(out)).convert("RGBA"))
        plain = png.encode(img, opts.replace(interlace=False))
        ref = np.asarray(Image.open(io.BytesIO(plain)).convert("RGBA"))
        assert np.array_equal(pil, ref)

    def test_cli_flag(self, tmp_path):
        from pixo_tpu.cli import main

        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        src = tmp_path / "in.png"
        dst = tmp_path / "out.png"
        Image.fromarray(img).save(src)
        assert main([str(src), "-o", str(dst), "--interlace", "--quiet"]) == 0
        data = dst.read_bytes()
        assert data[8 + 8 + 12] == 1
        back = np.asarray(Image.open(dst).convert("RGB"))
        assert np.array_equal(back, img)


class TestInterlacedSharded:
    def test_batch_sharded_matches_per_image(self):
        from pixo_tpu.parallel import encode_png_batch_sharded

        rng = np.random.default_rng(6)
        imgs = rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8)
        opts = PngOptions.balanced(16, 16).replace(
            color_type=ColorType.RGB, interlace=True)
        outs = encode_png_batch_sharded(imgs, opts)
        for i in range(4):
            assert outs[i] == png.encode(imgs[i], opts)
            assert outs[i][8 + 8 + 12] == 1

    def test_row_sharded_routes_to_plain_path(self):
        from pixo_tpu.parallel import encode_png_row_sharded

        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
        opts = PngOptions(width=16, height=16, color_type=ColorType.RGB,
                          interlace=True)
        assert encode_png_row_sharded(img, opts) == png.encode(img, opts)
