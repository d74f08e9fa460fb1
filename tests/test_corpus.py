"""Corpus-based conformance (skip-if-offline, like the reference's
downloaded-suite tests). Also exercises the reference repo's local
checked-in fixtures when visible (read-only)."""

from pathlib import Path

import numpy as np
import pytest

from pixo_tpu import PngOptions, errors, png
from pixo_tpu.decode import decode_jpeg, decode_png
from tests.support import kodak_subset, pngsuite_files

REFERENCE_FIXTURES = Path("/root/reference/tests/fixtures")


def _fixture_files(pattern):
    if not REFERENCE_FIXTURES.is_dir():
        return []
    return sorted(REFERENCE_FIXTURES.glob(pattern))


class TestReferenceFixtures:
    """Decode the reference repo's checked-in fixtures with our decoders
    and re-encode them losslessly (PNG) — the decode_conformance analog."""

    @pytest.mark.parametrize(
        "path", _fixture_files("*.png"), ids=lambda p: p.name
    )
    def test_png_fixture_roundtrip(self, path):
        data = path.read_bytes()
        try:
            img = decode_png(data)
        except errors.UnsupportedDecode as exc:
            pytest.skip(f"unsupported feature: {exc}")
        from PIL import Image
        import io

        pil = Image.open(io.BytesIO(data))
        pil.load()
        assert (img.width, img.height) == pil.size
        mode = {1: "L", 2: "LA", 3: "RGB", 4: "RGBA"}[
            img.pixels.shape[2] if img.pixels.ndim == 3 else 1
        ]
        ref = np.asarray(pil.convert(mode))
        ours = img.pixels if img.pixels.ndim == 3 else img.pixels
        np.testing.assert_array_equal(ours.reshape(ref.shape), ref)

        # lossless re-encode through our encoder
        px = img.pixels if img.pixels.ndim == 3 else img.pixels[..., None]
        ct = {1: "GRAY", 2: "GRAY_ALPHA", 3: "RGB", 4: "RGBA"}[px.shape[2]]
        from pixo_tpu import ColorType

        opts = PngOptions(
            width=img.width, height=img.height, color_type=ColorType[ct]
        )
        out = png.encode(px if px.shape[2] > 1 else px[..., 0], opts)
        back = decode_png(out)
        got = back.pixels if back.pixels.ndim == 3 else back.pixels[..., None]
        np.testing.assert_array_equal(got.reshape(px.shape), px)

    @pytest.mark.parametrize(
        "path", _fixture_files("*.jpg"), ids=lambda p: p.name
    )
    def test_jpeg_fixture_decodes(self, path):
        data = path.read_bytes()
        from PIL import Image
        import io

        try:
            img = decode_jpeg(data)
        except errors.UnsupportedDecode as exc:
            pytest.skip(f"unsupported feature: {exc}")
        pil = Image.open(io.BytesIO(data))
        pil.load()
        assert (img.width, img.height) == pil.size
        ref = np.asarray(pil.convert("RGB" if img.pixels.ndim == 3 else "L")).astype(int)
        diff = np.abs(img.pixels.astype(int) - ref)
        assert diff.mean() < 4  # upsampling-method differences only


class TestDownloadedCorpora:
    def test_kodak_if_available(self):
        files = kodak_subset()
        if not files:
            pytest.skip("kodak corpus unavailable (offline)")
        for path in files:
            img = decode_png(path.read_bytes())
            assert img.width > 0

    def test_pngsuite_if_available(self):
        files = pngsuite_files()
        if not files:
            pytest.skip("pngsuite unavailable (offline)")
        decoded = 0
        for path in files:
            try:
                decode_png(path.read_bytes())
                decoded += 1
            except errors.PixoError:
                pass  # suite includes intentionally-corrupt files
        assert decoded > 0


class TestLocalPhotographicCorpus:
    """Checked-in deterministic 512x512 photographic corpus (derived from
    the reference repo's public fixtures) — BASELINE configs #2/#4 coverage
    that never skips offline, unlike the downloaded suites."""

    def _corpus(self):
        from tests.support import local_corpus

        files = local_corpus()
        assert len(files) >= 4, "checked-in corpus missing"
        return files

    def test_decode_conformance_vs_pillow(self):
        from PIL import Image
        import io

        for path in self._corpus():
            data = path.read_bytes()
            img = decode_png(data)
            pil = Image.open(io.BytesIO(data))
            pil.load()
            assert (img.width, img.height) == pil.size == (512, 512)
            ref = np.asarray(pil.convert("RGB"))
            np.testing.assert_array_equal(img.pixels, ref, err_msg=path.name)

    @pytest.mark.parametrize("preset", ["fast", "balanced"])
    def test_lossless_reencode_and_ratio(self, preset):
        """Re-encode each corpus image losslessly and track the size ratio
        vs Pillow's optimized PNG (zlib-9 + adaptive filtering) — the
        ratio-at-matched-content regression of BASELINE config #2."""
        from PIL import Image
        import io

        worst = 0.0
        for path in self._corpus():
            img = decode_png(path.read_bytes())
            px = img.pixels
            opts = getattr(PngOptions, preset)(img.width, img.height)
            from pixo_tpu import ColorType

            opts.color_type = ColorType.RGB
            out = png.encode(px, opts)
            back = decode_png(out)
            np.testing.assert_array_equal(back.pixels, px, err_msg=path.name)

            buf = io.BytesIO()
            Image.fromarray(px).save(buf, format="PNG", optimize=True)
            ratio = len(out) / buf.tell()
            worst = max(worst, ratio)
        # balanced must stay within 5% of Pillow-optimized (zlib 9);
        # fast trades ratio for speed but must stay in the same ballpark
        assert worst <= (1.05 if preset == "balanced" else 1.45), worst
