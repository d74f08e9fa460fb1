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

    def test_png_bytes_match_unsharded(self, batch):
        from pixo_tpu import png

        opts = PngOptions.fast(32, 32).replace(color_type=__import__(
            "pixo_tpu").ColorType.RGB)
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
