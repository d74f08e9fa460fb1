"""Resize tests: identity, structure preservation, Pillow cross-check."""

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import ColorType, ResizeFilter, ResizeOptions, errors
from pixo_tpu.resize import resize
from tests.conftest import synth_checkerboard, synth_gradient


def opts(sw, sh, dw, dh, f=ResizeFilter.LANCZOS3, ct=ColorType.RGBA):
    return ResizeOptions(
        src_width=sw, src_height=sh, dst_width=dw, dst_height=dh,
        color_type=ct, filter=f,
    )


class TestResize:
    def test_identity(self):
        img = synth_gradient(20, 30, 4)
        out = resize(img, opts(30, 20, 30, 20))
        np.testing.assert_array_equal(out, img)

    @pytest.mark.parametrize("f", list(ResizeFilter))
    def test_downscale_shapes(self, f):
        img = synth_gradient(64, 48, 4)
        out = resize(img, opts(48, 64, 24, 32, f))
        assert out.shape == (32, 24, 4)

    @pytest.mark.parametrize("f", list(ResizeFilter))
    def test_upscale_shapes(self, f):
        img = synth_gradient(16, 12, 3)
        out = resize(img, opts(12, 16, 24, 32, f, ColorType.RGB))
        assert out.shape == (32, 24, 3)

    def test_nearest_preserves_palette(self):
        img = synth_checkerboard(32, 32, 3, cell=8)
        out = resize(img, opts(32, 32, 16, 16, ResizeFilter.NEAREST, ColorType.RGB))
        assert set(np.unique(out)) <= {0, 255}

    def test_bilinear_solid_stays_solid(self):
        img = np.full((20, 20, 4), 137, np.uint8)
        out = resize(img, opts(20, 20, 13, 7, ResizeFilter.BILINEAR))
        assert (out == 137).all()

    def test_lanczos_solid_stays_solid(self):
        img = np.full((40, 40, 3), 201, np.uint8)
        out = resize(img, opts(40, 40, 17, 23, ResizeFilter.LANCZOS3, ColorType.RGB))
        assert (out == 201).all()

    def test_lanczos_downscale_close_to_pillow(self):
        img = synth_gradient(128, 128, 3)
        out = resize(img, opts(128, 128, 32, 32, ResizeFilter.LANCZOS3, ColorType.RGB))
        pil = np.asarray(
            Image.fromarray(img, "RGB").resize((32, 32), Image.LANCZOS)
        ).astype(int)
        diff = np.abs(out.astype(int) - pil)
        assert diff.mean() < 2 and diff.max() <= 18

    def test_gray_2d_input(self):
        img = synth_gradient(40, 40, 3)[..., 0].copy()
        out = resize(img, opts(40, 40, 20, 20, ResizeFilter.BILINEAR, ColorType.GRAY))
        assert out.shape == (20, 20)

    def test_flat_bytes_input(self):
        img = synth_gradient(10, 10, 4)
        out = resize(img.tobytes(), opts(10, 10, 5, 5))
        assert out.shape == (5, 5, 4)

    def test_validation(self):
        with pytest.raises(errors.InvalidDimensions):
            resize(b"", opts(0, 5, 5, 5))
        with pytest.raises(errors.InvalidDimensions):
            resize(b"", opts(5, 5, 0, 5))
        with pytest.raises(errors.InvalidDataLength):
            resize(b"\x00" * 10, opts(5, 5, 2, 2))

    def test_thumbnail_chain(self):
        """decode -> resize -> re-encode chain sanity (pipeline building block)."""
        from pixo_tpu import JpegOptions, jpeg
        from pixo_tpu.decode import decode_jpeg

        img = synth_gradient(64, 64, 3)
        encoded = jpeg.encode(img, JpegOptions.fast(64, 64, 90))
        decoded = decode_jpeg(encoded)
        thumb = resize(
            decoded.pixels,
            opts(64, 64, 16, 16, ResizeFilter.LANCZOS3, ColorType.RGB),
        )
        re_encoded = jpeg.encode(thumb, JpegOptions.fast(16, 16, 85))
        assert re_encoded[:2] == b"\xff\xd8"


class TestNativeLanczosTier:
    """Native AVX2 Lanczos (PIXO_TPU_RESIZE=host) vs the NumPy serial
    mirror — the authoritative order (the jit tier matches it on TPU;
    XLA:CPU FMA-contracts a ~1e-5 pixel fraction by one)."""

    @pytest.mark.parametrize("geom", [(48, 48, 96, 96), (37, 51, 100, 77),
                                      (100, 7, 13, 29), (16, 16, 3, 5),
                                      (128, 128, 32, 32)])
    @pytest.mark.parametrize("c", [1, 3, 4])
    def test_matches_serial_mirror(self, geom, c):
        from pixo_tpu.native import native_resize_lanczos3
        from pixo_tpu.ops.resize_kernels import (lanczos_taps,
                                                 resize_lanczos3_np)

        sh, sw, dh, dw = geom
        rng = np.random.default_rng(sh * 7 + c)
        img = rng.integers(0, 256, (sh, sw, c), dtype=np.uint8)
        sx, wx = lanczos_taps(sw, dw)
        sy, wy = lanczos_taps(sh, dh)
        nat = native_resize_lanczos3(img, sx, wx, sy, wy)
        if nat is None:
            pytest.skip("native resize unavailable")
        np.testing.assert_array_equal(
            nat, resize_lanczos3_np(img, dst_w=dw, dst_h=dh))

    def test_tier_dispatch(self, monkeypatch):
        from pixo_tpu import resize as rz
        from pixo_tpu.options import ColorType, ResizeOptions
        from pixo_tpu.ops.resize_kernels import resize_lanczos3_np

        rng = np.random.default_rng(0)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        opts = ResizeOptions(src_width=56, src_height=40, dst_width=21,
                             dst_height=15, color_type=ColorType.RGB)
        monkeypatch.setenv("PIXO_TPU_RESIZE", "host")
        out = rz.resize(img, opts)
        np.testing.assert_array_equal(
            out, resize_lanczos3_np(img, dst_w=21, dst_h=15))
