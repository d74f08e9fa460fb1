"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The contract (SURVEY §4 "multi-node without a cluster"): 1-chip and
N-chip execution produce byte-identical outputs.
"""

import numpy as np
import pytest

import jax

from pixo_tpu import JpegOptions, PngOptions
from pixo_tpu.parallel import (
    encode_jpeg_batch_sharded,
    encode_png_batch_sharded,
    jpeg_coeffs_sharded,
    make_mesh,
    thumbnail_pipeline,
)
from tests.conftest import synth_gradient, synth_noise


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    imgs = [synth_gradient(32, 32, 3), synth_noise(32, 32, 3)]
    imgs += [rng.integers(0, 256, (32, 32, 3), dtype=np.uint8) for _ in range(6)]
    return np.stack(imgs)


class TestSharding:
    def test_eight_devices_available(self):
        assert len(jax.devices()) >= 8

    def test_coeffs_match_single_device(self, batch):
        opts = JpegOptions.fast(32, 32, 85)
        mesh8 = make_mesh(8)
        mesh1 = make_mesh(1)
        z8 = np.asarray(jpeg_coeffs_sharded(batch, opts, mesh8))
        z1 = np.asarray(jpeg_coeffs_sharded(batch, opts, mesh1))
        np.testing.assert_array_equal(z8, z1)

    def test_jpeg_bytes_match_unsharded(self, batch):
        from pixo_tpu import jpeg

        opts = JpegOptions.fast(32, 32, 85)
        sharded = encode_jpeg_batch_sharded(batch, opts, make_mesh(8))
        single = [jpeg.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert sharded == single

    def test_jpeg_max_preset_bytes_match_unsharded(self, batch):
        # max preset = progressive+trellis: the batch paths skip the
        # plain-coefficient pass entirely (it is dead work there), so
        # this pins that the re-derived trellis coefficients produce
        # the exact single-image bytes through both batch entry points
        from pixo_tpu import jpeg

        opts = JpegOptions.max(32, 32, 85)
        single = [jpeg.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert jpeg.encode_batch(batch, opts) == single
        assert encode_jpeg_batch_sharded(batch, opts, make_mesh(8)) == single

    def test_png_bytes_match_unsharded(self, batch):
        from pixo_tpu import png

        opts = PngOptions.fast(32, 32).replace(color_type=__import__(
            "pixo_tpu").ColorType.RGB)
        sharded = encode_png_batch_sharded(batch, opts)
        single = [png.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert sharded == single

    def test_png_balanced_rgba_batch_matches_per_image(self):
        """Balanced preset (reductions + alpha opt on): the batched path
        must route each image exactly as the per-image encoder would and
        produce identical bytes across every route (VERDICT r1 item 7)."""
        from pixo_tpu import ColorType, png
        from pixo_tpu.parallel.pipeline import _png_route_batch

        rng = np.random.default_rng(7)
        w, h = 80, 64  # > 4096 px: exercises the adaptive strategy
        imgs = []
        # rgba-pass: noisy color + alpha variation incl. fully transparent px
        a = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        a[::7, ::3, 3] = 0
        imgs.append(a)
        # strip: all-opaque colorful -> reduces to RGB
        b = rng.integers(0, 256, (h, w, 4), dtype=np.uint8)
        b[..., 3] = 255
        imgs.append(b)
        # ga: gray channels + varying alpha -> GrayAlpha
        g = rng.integers(0, 256, (h, w, 1), dtype=np.uint8)
        ga = np.concatenate([g, g, g, rng.integers(0, 255, (h, w, 1), dtype=np.uint8)], axis=-1)
        imgs.append(ga)
        # per-image gray: all-opaque all-gray (sub-8-bit packing path)
        gg = np.concatenate([g, g, g, np.full((h, w, 1), 255, np.uint8)], axis=-1)
        imgs.append(gg)
        # per-image palette: few unique colors
        p = np.zeros((h, w, 4), np.uint8)
        p[..., 0] = (np.arange(w) % 7 * 30).astype(np.uint8)
        p[..., 3] = 255
        imgs.append(p)
        imgs += [rng.integers(0, 256, (h, w, 4), dtype=np.uint8) for _ in range(3)]
        batch = np.stack(imgs)

        opts = PngOptions.balanced(w, h)  # RGBA default color type
        groups, fallback = _png_route_batch(
            batch.reshape(len(imgs), -1, 4), opts
        )
        assert ("pass", ColorType.RGBA) in groups
        assert ("strip", ColorType.RGB) in groups
        assert ("ga", ColorType.GRAY_ALPHA) in groups
        assert 3 in fallback and 4 in fallback

        sharded = encode_png_batch_sharded(batch, opts)
        single = [png.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert sharded == single

    def test_graft_entry(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == args[0].shape[0]

    def test_dryrun_multichip(self):
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import __graft_entry__ as g

        g.dryrun_multichip(8)

    def test_thumbnail_pipeline(self, batch):
        from pixo_tpu import jpeg

        opts = JpegOptions.fast(32, 32, 90)
        encoded = [jpeg.encode(batch[i], opts) for i in range(3)]
        thumbs = thumbnail_pipeline(encoded, thumb_size=16, quality=85)
        assert len(thumbs) == 3
        for t in thumbs:
            assert t[:2] == b"\xff\xd8" and t[-2:] == b"\xff\xd9"

    def test_thumbnail_pipeline_matches_sequential(self, batch):
        """Chunked/overlapped pipeline with mixed input shapes must equal
        the naive per-image decode->resize->encode composition."""
        from pixo_tpu import ColorType, JpegOptions, jpeg
        from pixo_tpu.cli import load_image
        from pixo_tpu.options import ResizeFilter, ResizeOptions
        from pixo_tpu.resize import resize as do_resize

        rng = np.random.default_rng(3)
        encoded = []
        for w, h in [(32, 32), (48, 24), (32, 32), (48, 24), (40, 40)]:
            img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            encoded.append(jpeg.encode(img, JpegOptions.fast(w, h, 90)))

        stats = {}
        got = thumbnail_pipeline(
            encoded, thumb_size=16, quality=85, chunk_size=2, stats=stats
        )
        assert set(stats) == {"decode_wait_s", "device_s", "pack_s"}

        jopts = JpegOptions(width=16, height=16, quality=85, color_type=ColorType.RGB)
        want = []
        for data in encoded:
            px, w, h, _ct = load_image(data)
            ropts = ResizeOptions(
                src_width=w, src_height=h, dst_width=16, dst_height=16,
                color_type=ColorType.RGB, filter=ResizeFilter.LANCZOS3,
            )
            thumb = do_resize(np.ascontiguousarray(px[..., :3]), ropts)
            want.append(jpeg.encode(thumb, jopts))
        assert got == want

    def test_thumbnail_pipeline_fused_device_chunk(self, monkeypatch):
        """The fused resize->coeffs->compaction device dispatch (single-
        shape chunks, device tiers) must emit the same bytes as the
        host-tier path."""
        from pixo_tpu import jpeg

        rng = np.random.default_rng(7)
        imgs = rng.integers(0, 256, (5, 40, 48, 3), dtype=np.uint8)
        encoded = [
            jpeg.encode(imgs[i], JpegOptions.fast(48, 40, 90))
            for i in range(5)
        ]
        want = thumbnail_pipeline(encoded, thumb_size=16, quality=85,
                                  chunk_size=3)
        # pinning both tiers to "device" defeats the CPU-backend host
        # auto, which is what engages the fused path in this test env
        monkeypatch.setenv("PIXO_TPU_COEFFS", "device")
        monkeypatch.setenv("PIXO_TPU_RESIZE", "device")
        got = thumbnail_pipeline(encoded, thumb_size=16, quality=85,
                                 chunk_size=3)
        assert got == want

    def test_stream_pipeline_matches_batch(self, batch):
        from pixo_tpu import jpeg
        from pixo_tpu.parallel import encode_jpeg_stream

        opts = JpegOptions.fast(32, 32, 85)
        batches = [batch[:4], batch[4:]]
        streamed = []
        for out in encode_jpeg_stream(batches, opts, make_mesh(8)):
            streamed.extend(out)
        single = [jpeg.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert streamed == single

    def test_overlapped_stream_matches_per_image(self, batch):
        from pixo_tpu import jpeg
        from pixo_tpu.parallel import encode_jpeg_stream_overlapped

        opts = JpegOptions.fast(32, 32, 85)
        stats = {}
        streamed = []
        for out in encode_jpeg_stream_overlapped(
            [batch[:4], batch[4:], batch[:4], batch[4:]], opts,
            make_mesh(8), stats=stats,
        ):
            streamed.extend(out)
        single = [jpeg.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert streamed == single * 2
        # instrumentation contract: one dispatch stamp and one
        # (start, end) interval per stage per batch, monotonically ordered
        assert len(stats["dispatch_t"]) == 4
        assert len(stats["copy_iv"]) == 4
        assert len(stats["pack_iv"]) == 4
        for (c0, c1), (p0, p1), d in zip(
            stats["copy_iv"], stats["pack_iv"], stats["dispatch_t"]
        ):
            assert d <= c0 <= c1 <= p1 and c0 <= p0 <= p1

    def test_overlapped_stream_optimized_huffman_path(self, batch):
        # non-sparse route (optimize_huffman): dense-emit fetch + host
        # emit must still be byte-identical and ordered
        from pixo_tpu import jpeg
        from pixo_tpu.parallel import encode_jpeg_stream_overlapped

        opts = JpegOptions(width=32, height=32, quality=85,
                           optimize_huffman=True)
        streamed = []
        for out in encode_jpeg_stream_overlapped(
            [batch[:4], batch[4:]], opts, make_mesh(8)
        ):
            streamed.extend(out)
        single = [jpeg.encode(batch[i], opts) for i in range(batch.shape[0])]
        assert streamed == single


class TestRowSharding:
    """TP analog as a production API (VERDICT r1 partial): one image's
    filter rows sharded across the mesh, byte-equal to the unsharded
    single-image encoder across strategies, sizes, and reductions."""

    @pytest.mark.parametrize("strategy", ["adaptive", "adaptive_fast", "bigrams", "up"])
    def test_bytes_equal_unsharded(self, strategy):
        from pixo_tpu import ColorType, png
        from pixo_tpu.options import FilterStrategy
        from pixo_tpu.parallel import encode_png_row_sharded

        rng = np.random.default_rng(11)
        img = rng.integers(0, 256, (100, 64, 3), dtype=np.uint8)  # 100 rows: uneven over 8 devices
        opts = PngOptions.fast(64, 100).replace(
            color_type=ColorType.RGB,
            filter_strategy=FilterStrategy(strategy),
        )
        sharded = encode_png_row_sharded(img, opts, make_mesh(8))
        assert sharded == png.encode(img, opts)

    def test_balanced_with_reductions(self):
        from pixo_tpu import png
        from pixo_tpu.parallel import encode_png_row_sharded

        rng = np.random.default_rng(12)
        img = rng.integers(0, 256, (48, 32, 4), dtype=np.uint8)
        img[..., 3] = 255  # alpha-strip reduction applies before filtering
        opts = PngOptions.balanced(32, 48)
        sharded = encode_png_row_sharded(img, opts, make_mesh(8))
        assert sharded == png.encode(img, opts)


class TestBatchFallbackPolicy:
    """encode_batch degrades to host encode ONLY on backend-init failures
    (RuntimeError/OSError), with one RuntimeWarning; genuine bugs in the
    sharded path (any other exception) must surface (VERDICT r2 weak #3)."""

    def _run(self, monkeypatch, exc):
        from pixo_tpu.png import encoder as enc

        monkeypatch.setattr(enc, "_BATCH_FALLBACK_WARNED", False)
        # pretend accelerated via the policy seam — patching
        # jax.default_backend globally would also flip the Pallas filter
        # tier onto the CPU platform inside the fallback encode
        monkeypatch.setattr(enc, "_accelerated_backend", lambda: True)

        import pixo_tpu.parallel as par

        def boom(imgs, options):
            raise exc

        monkeypatch.setattr(par, "encode_png_batch_sharded", boom)
        imgs = np.stack([synth_gradient(8, 8, 4)] * 2)
        opts = PngOptions(width=8, height=8)
        return enc.encode_batch(imgs, opts)

    def test_backend_failure_degrades_with_warning(self, monkeypatch):
        with pytest.warns(RuntimeWarning, match="sharded device path failed"):
            out = self._run(monkeypatch, RuntimeError("backend init failed"))
        assert len(out) == 2 and out[0][:8] == b"\x89PNG\r\n\x1a\n"

    def test_bug_exceptions_surface(self, monkeypatch):
        with pytest.raises(TypeError):
            self._run(monkeypatch, TypeError("bug in batch path"))


class TestQuantizedBatch:
    """Lossy (quantized) batches route through the device quantization
    tier inside encode_png_batch_sharded; bytes must equal per-image
    png.encode for FORCE and AUTO modes (VERDICT r3 task 5)."""

    @pytest.mark.parametrize("qmode", ["force", "auto"])
    def test_bytes_equal_per_image(self, qmode):
        from pixo_tpu.options import QuantizationMode, QuantizationOptions
        from pixo_tpu.parallel import encode_png_batch_sharded
        from pixo_tpu.png import encoder as penc
        from pixo_tpu import ColorType

        rng = np.random.default_rng(4)
        h, w = 40, 56
        xx, yy = np.meshgrid(np.arange(w), np.arange(h))
        imgs = np.stack([
            np.clip(
                np.stack([xx * 255 // (w - 1), yy * 255 // (h - 1),
                          (xx + yy + s * 31) % 256], axis=-1)
                + rng.integers(-6, 7, (h, w, 3)),
                0, 255,
            ).astype(np.uint8)
            for s in range(4)
        ])
        mode = (QuantizationMode.FORCE if qmode == "force"
                else QuantizationMode.AUTO)
        opts = PngOptions(
            width=w, height=h, color_type=ColorType.RGB,
            quantization=QuantizationOptions(
                mode=mode, max_colors=128, dithering=True
            ),
        )
        batch = encode_png_batch_sharded(imgs, opts)
        per = [penc.encode(imgs[i], opts) for i in range(4)]
        assert all(bytes(a) == bytes(b) for a, b in zip(batch, per))


class TestAutoTrellisPolicy:
    """Batch entry points flip trellis to the device tier automatically
    past the measured block-count crossover (VERDICT r2 weak #6); bytes
    stay identical (the device trellis is bit-exact incl. tie-breaks)."""

    def test_policy_rules(self, monkeypatch):
        from pixo_tpu.parallel import pipeline as pl

        opts = JpegOptions.max(64, 64, 85)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert pl._auto_trellis_mode(opts, 20000) == "device"
        assert pl._auto_trellis_mode(opts, 100) is None  # below crossover
        monkeypatch.setenv("PIXO_TPU_TRELLIS", "host")
        assert pl._auto_trellis_mode(opts, 20000) is None  # explicit wins
        monkeypatch.delenv("PIXO_TPU_TRELLIS")
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert pl._auto_trellis_mode(opts, 20000) is None  # cpu backend
        base = JpegOptions(width=64, height=64, quality=85)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert pl._auto_trellis_mode(base, 20000) is None  # no trellis

    def test_batch_engages_device_trellis_same_bytes(self, monkeypatch):
        import pixo_tpu.ops.trellis_device as td
        from pixo_tpu.parallel import encode_jpeg_batch_sharded
        from pixo_tpu.parallel import pipeline as pl

        rng = np.random.default_rng(7)
        imgs = rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
        opts = JpegOptions.max(32, 32, 85)

        host_bytes = encode_jpeg_batch_sharded(imgs, opts)  # cpu -> host tier

        calls = []
        real = td.trellis_quantize_batch_device

        def spy(*a, **k):
            calls.append(1)
            return real(*a, **k)

        monkeypatch.setattr(td, "trellis_quantize_batch_device", spy)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(pl, "TRELLIS_DEVICE_CROSSOVER_BLOCKS", 1)
        dev_bytes = encode_jpeg_batch_sharded(imgs, opts)
        assert calls, "device trellis did not engage"
        assert all(bytes(a) == bytes(b) for a, b in zip(host_bytes, dev_bytes))
