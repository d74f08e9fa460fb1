"""4:2:2 JPEG encode — beyond-parity coverage.

The reference decodes 4:2:2 (``src/decode/jpeg.rs``) but its encoder
offers S444/S420 only (``src/jpeg/mod.rs:96-300``); this framework
completes the matrix with a 16x8-MCU encode path (pattern Y,Y,Cb,Cr).
Tier contract mirrors the 420 suites: jnp blockify vs NumPy mirror
bit-equal, native coefficient/DCT/fused paths byte-identical to the
mirrors, all option combinations decodable by Pillow and by our own
decoder.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import jpeg
from pixo_tpu.color import ColorType
from pixo_tpu.decode import decode_jpeg
from pixo_tpu.options import JpegOptions, Subsampling
from pixo_tpu.utils.synthetic import synth_gradient

# (w, h) shapes covering every 16x8 MCU edge case: exact fit, odd both
# dims, width % 16 == 8 (the padded right Y column split_components must
# crop), height % 8 != 0, tiny.
SHAPES = [(96, 72), (89, 71), (88, 72), (96, 64), (24, 8), (17, 9)]


def _img(w, h, noisy=False):
    base = synth_gradient(h, w, 3)
    if noisy:
        rng = np.random.default_rng(11)
        base = np.clip(
            base.astype(np.int16) + rng.integers(-16, 17, base.shape), 0, 255
        ).astype(np.uint8)
    return np.ascontiguousarray(base)


def _opts(w, h, **kw):
    return JpegOptions(
        width=w, height=h, quality=kw.pop("quality", 85),
        subsampling=Subsampling.S422, **kw,
    )


class TestBlockify422:
    def test_jnp_matches_numpy_mirror(self):
        from pixo_tpu.ops.blockify import blocks_422, blocks_422_np

        for (w, h) in SHAPES:
            img = _img(w, h, noisy=True)
            dev = np.asarray(blocks_422(img))
            ref = blocks_422_np(img)
            assert dev.shape == ref.shape
            np.testing.assert_array_equal(dev, ref, err_msg=f"{w}x{h}")

    def test_scan_layout(self):
        from pixo_tpu.ops.blockify import scan_layout

        n, bpm, pat = scan_layout(89, 71, "rgb", "422")
        assert bpm == 4 and pat == (0, 0, 1, 2)
        assert n == (96 // 16) * (72 // 8)

    def test_block_count_and_chroma_average(self):
        from pixo_tpu.ops.blockify import blocks_422_np

        img = _img(32, 8)
        blocks = blocks_422_np(img)
        assert blocks.shape == (2 * 4, 8, 8)  # 2 MCUs x (2Y + Cb + Cr)
        # chroma block must equal the horizontal pair average of the
        # fixed-point converted chroma plane
        from pixo_tpu.color import rgb_to_ycbcr_np

        ycc = rgb_to_ycbcr_np(img)
        cb = ycc[..., 1].astype(np.float32)
        want = (cb[:, 0::2] + cb[:, 1::2]) * 0.5 - 128.0
        got = blocks.reshape(1, 2, 4, 8, 8)[0, 0, 2]
        np.testing.assert_array_equal(got, want[:8, :8])


class TestNativeParity422:
    def _native_or_skip(self):
        from pixo_tpu.native import native_available

        if not native_available():
            pytest.skip("native library unavailable")

    def test_native_coefficients_match_mirror(self):
        self._native_or_skip()
        from pixo_tpu.jpeg.tables import QuantizationTables
        from pixo_tpu.native import native_jpeg_coefficients
        from pixo_tpu.ops.blockify import blocks_422_np
        from pixo_tpu.ops.dct import dct8x8_aan_np
        from pixo_tpu.ops.quantize import quantize_blocks_np, zigzag_blocks_np

        quant = QuantizationTables(85)
        lum = quant.luminance_table.reshape(8, 8).astype(np.float32)
        chrom = quant.chrominance_table.reshape(8, 8).astype(np.float32)
        for (w, h) in SHAPES:
            img = _img(w, h, noisy=True)
            nat = native_jpeg_coefficients(img, "422", lum, chrom)
            if nat is None:
                pytest.skip("no AVX2 jpeg_coefficients")
            blocks = blocks_422_np(img)
            dct = dct8x8_aan_np(blocks)
            qmap = np.stack([lum] * 2 + [chrom] * 2)
            ref = zigzag_blocks_np(
                quantize_blocks_np(dct.reshape(-1, 4, 8, 8), qmap[None])
            ).reshape(-1, 64)
            np.testing.assert_array_equal(nat, ref, err_msg=f"{w}x{h}")

    def test_native_dct_zz_matches_mirror(self):
        self._native_or_skip()
        from pixo_tpu.native import native_jpeg_dct_zz
        from pixo_tpu.ops.blockify import blocks_422_np
        from pixo_tpu.ops.dct import dct8x8_aan_np
        from pixo_tpu.ops.quantize import zigzag_blocks_np

        img = _img(88, 72, noisy=True)
        nat = native_jpeg_dct_zz(img, "422")
        if nat is None:
            pytest.skip("no AVX2 jpeg_dct_zz")
        ref = zigzag_blocks_np(
            dct8x8_aan_np(blocks_422_np(img)).reshape(-1, 1, 8, 8)
        ).reshape(-1, 64)
        np.testing.assert_array_equal(nat, ref)

    def test_fused_scan_equals_two_stage(self, monkeypatch):
        self._native_or_skip()
        from pixo_tpu.native import native_has_fused_encode

        if not native_has_fused_encode():
            pytest.skip("no fused encode")
        monkeypatch.setenv("PIXO_TPU_COEFFS", "host")
        for restart in (None, 2):
            for (w, h) in [(96, 72), (89, 71), (88, 72)]:
                img = _img(w, h, noisy=True)
                opts = _opts(w, h, restart_interval=restart)
                fused = jpeg.encode(img, opts)
                # disabling the fused probe forces the two-stage path
                import pixo_tpu.jpeg.encoder as enc

                monkeypatch.setattr(enc, "_fused_ok", lambda o: False)
                two_stage = jpeg.encode(img, opts)
                monkeypatch.undo()
                monkeypatch.setenv("PIXO_TPU_COEFFS", "host")
                assert fused == two_stage, f"{w}x{h} restart={restart}"


class TestEncode422:
    def test_pillow_decodes_every_shape(self):
        for (w, h) in SHAPES:
            img = _img(w, h)
            out = jpeg.encode(img, _opts(w, h))
            back = Image.open(io.BytesIO(out))
            assert back.size == (w, h)
            dec = np.asarray(back.convert("RGB")).astype(np.int32)
            mse = ((dec - img.astype(np.int32)) ** 2).mean()
            assert mse < 60, f"{w}x{h}: MSE {mse}"

    def test_sof_sampling_factors(self):
        out = jpeg.encode(_img(32, 16), _opts(32, 16))
        i = out.find(b"\xff\xc0")
        assert i >= 0
        # SOF0: marker(2) len(2) prec(1) h(2) w(2) ncomp(1), then per
        # component (id, sampling, tq)
        comp0 = out[i + 10: i + 13]
        assert comp0[1] == 0x21  # Y h=2, v=1
        assert out[i + 13 + 1] == 0x11 and out[i + 16 + 1] == 0x11

    def test_own_decoder_round_trip(self):
        img = _img(88, 72)
        out = jpeg.encode(img, _opts(88, 72))
        got = decode_jpeg(out)
        assert (got.width, got.height) == (88, 72)
        pix = np.asarray(got.pixels).reshape(72, 88, 3).astype(np.int32)
        pil = np.asarray(
            Image.open(io.BytesIO(out)).convert("RGB")
        ).astype(np.int32)
        # same bitstream, two decoders: only chroma upsampling choices
        # differ (ours nearest, Pillow fancy)
        assert np.abs(pix - pil).max() <= 16
        assert ((pix - pil) ** 2).mean() < 4

    def test_optimize_huffman_and_restarts(self):
        img = _img(96, 72, noisy=True)
        plain = jpeg.encode(img, _opts(96, 72))
        opt = jpeg.encode(img, _opts(96, 72, optimize_huffman=True))
        assert len(opt) <= len(plain)
        rst = jpeg.encode(
            img, _opts(96, 72, optimize_huffman=True, restart_interval=2)
        )
        for out in (opt, rst):
            back = Image.open(io.BytesIO(out))
            back.load()
            assert back.size == (96, 72)
        assert b"\xff\xd0" in rst  # RST0 present

    def test_progressive_and_trellis(self):
        # width 88 (== 8 mod 16) exercises the split_components crop of
        # the padded right Y column in the non-interleaved scans
        img = _img(88, 72, noisy=True)
        for sa in (True, False):
            opts = _opts(
                88, 72, progressive=True, optimize_huffman=True,
                trellis_quant=True,
            )
            opts.progressive_sa = sa
            out = jpeg.encode(img, opts)
            back = Image.open(io.BytesIO(out))
            back.load()
            assert back.size == (88, 72)
            dec = np.asarray(back.convert("RGB")).astype(np.int32)
            mse = ((dec - img.astype(np.int32)) ** 2).mean()
            assert mse < 90, f"sa={sa}: MSE {mse}"

    def test_batch_equals_single(self):
        imgs = np.stack([_img(48, 24, noisy=True) for _ in range(3)])
        imgs[1] ^= 0x55
        opts = _opts(48, 24)
        batch = jpeg.encode_batch(imgs, opts)
        for i in range(3):
            single = jpeg.encode(np.ascontiguousarray(imgs[i]), opts)
            assert batch[i] == single

    def test_gray_ignores_subsampling(self):
        img = np.ascontiguousarray(_img(40, 24)[..., 0])
        opts = _opts(40, 24)
        opts.color_type = ColorType.GRAY
        out = jpeg.encode(img, opts)
        back = Image.open(io.BytesIO(out))
        assert back.size == (40, 24) and back.mode == "L"

    def test_size_between_444_and_420(self):
        # on smooth content 4:2:2 should land between 4:4:4 and 4:2:0
        img = _img(160, 120)
        s444 = len(jpeg.encode(img, JpegOptions(
            width=160, height=120, quality=85)))
        s422 = len(jpeg.encode(img, _opts(160, 120)))
        s420 = len(jpeg.encode(img, JpegOptions(
            width=160, height=120, quality=85,
            subsampling=Subsampling.S420)))
        assert s420 <= s422 <= s444


class TestCli422:
    def test_cli_flag(self, tmp_path):
        from pixo_tpu.cli import main

        src = tmp_path / "in.png"
        Image.fromarray(_img(64, 48)).save(src)
        dst = tmp_path / "out.jpg"
        rc = main([
            str(src), "-o", str(dst), "--subsampling", "s422", "-q", "85",
            "--quiet",
        ])
        assert rc == 0
        back = Image.open(dst)
        assert back.size == (64, 48)
        data = dst.read_bytes()
        i = data.find(b"\xff\xc0")
        assert i >= 0 and data[i + 11] == 0x21
