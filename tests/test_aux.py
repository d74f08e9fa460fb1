"""Auxiliary-surface tests: bindings, profiling utils, CLI stdin, corpus
cache mechanics, synthetic generators."""

import io
import sys

import numpy as np
import pytest
from PIL import Image

from tests.conftest import synth_gradient


class TestBindings:
    def test_bytes_per_pixel(self):
        from pixo_tpu.bindings import bytes_per_pixel

        assert [bytes_per_pixel(i) for i in range(4)] == [1, 2, 3, 4]

    def test_encode_png_flat(self):
        from pixo_tpu.bindings import encode_png

        img = synth_gradient(20, 30, 4)
        out = encode_png(img.tobytes(), 30, 20, color_type=3, preset=0)
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGBA"))
        np.testing.assert_array_equal(dec, img)

    def test_encode_jpeg_flat(self):
        from pixo_tpu.bindings import encode_jpeg

        img = synth_gradient(20, 30, 3)
        out = encode_jpeg(img.tobytes(), 30, 20, color_type=2, quality=90,
                          preset=0, subsample_420=True)
        pil = Image.open(io.BytesIO(out))
        pil.load()
        assert pil.size == (30, 20)

    def test_resize_image_flat(self):
        from pixo_tpu.bindings import resize_image

        img = synth_gradient(16, 16, 4)
        out = resize_image(img.tobytes(), 16, 16, 8, 8, color_type=3)
        assert len(out) == 8 * 8 * 4

    def test_encode_png_lossy(self):
        from pixo_tpu.bindings import encode_png

        img = synth_gradient(64, 64, 4)
        out = encode_png(img, 64, 64, color_type=3, preset=1, lossless=False)
        pil = Image.open(io.BytesIO(out))
        pil.load()
        assert pil.size == (64, 64)


class TestProfilingUtils:
    def test_stage_timer(self, capsys):
        import time

        from pixo_tpu.utils import stage_timer

        with stage_timer("work", megapixels=1.0) as t:
            time.sleep(0.01)
        assert t.elapsed >= 0.01
        err = capsys.readouterr().err
        assert "work:" in err and "MP/s" in err

    def test_profile_trace(self, tmp_path):
        import jax.numpy as jnp

        from pixo_tpu.utils import profile_trace

        with profile_trace(str(tmp_path / "trace")):
            (jnp.ones((8, 8)) * 2).block_until_ready()
        assert any((tmp_path / "trace").rglob("*")), "trace files written"


class TestSyntheticGenerators:
    def test_all_generators_shapes(self):
        from pixo_tpu.utils.synthetic import (
            synth_checkerboard,
            synth_gradient,
            synth_noise,
            synth_solid,
            synth_text_like,
        )

        for fn in (synth_solid, synth_gradient, synth_checkerboard,
                   synth_noise, synth_text_like):
            out = fn(17, 23, 3)
            assert out.shape == (17, 23, 3)
            assert out.dtype == np.uint8

    def test_determinism(self):
        from pixo_tpu.utils.synthetic import synth_noise, synth_text_like

        np.testing.assert_array_equal(synth_noise(10, 10), synth_noise(10, 10))
        np.testing.assert_array_equal(
            synth_text_like(20, 20), synth_text_like(20, 20)
        )


class TestCliStdin:
    def test_stdin_to_stdout(self, monkeypatch, capsysbinary):
        from pixo_tpu.cli import main

        img = synth_gradient(16, 16, 3)
        ppm = b"P6\n16 16\n255\n" + img.tobytes()
        monkeypatch.setattr(sys, "stdin", type(
            "S", (), {"buffer": io.BytesIO(ppm)})())
        rc = main(["-", "--format", "png", "--quiet"])
        assert rc == 0
        out = capsysbinary.readouterr().out
        dec = np.asarray(Image.open(io.BytesIO(out)).convert("RGB"))
        np.testing.assert_array_equal(dec, img)


class TestCorpusCache:
    def test_sha_mismatch_redownloads(self, tmp_path, monkeypatch):
        import tests.support.corpus as corpus

        monkeypatch.setattr(corpus, "CACHE_DIR", tmp_path)
        spec = corpus.CorpusFile("x.bin", "http://127.0.0.1:1/none",
                                 "deadbeef" * 8)
        # cached file with wrong digest + unreachable URL -> None (skip)
        (tmp_path / "x.bin").write_bytes(b"wrong")
        assert corpus.fetch_corpus_file(spec, timeout=0.2) is None
        assert not (tmp_path / "x.bin").exists()  # bad cache purged

    def test_unpinned_entry_uses_trust_on_first_use(self, tmp_path, monkeypatch):
        # An entry without a digest must NOT accept an unverifiable cached
        # file (the old zero-pad placeholder bypass); it records a pin at
        # download time and enforces it on later loads.
        import hashlib

        import tests.support.corpus as corpus

        monkeypatch.setattr(corpus, "CACHE_DIR", tmp_path)
        spec = corpus.CorpusFile("y.bin", "http://127.0.0.1:1/none")
        (tmp_path / "y.bin").write_bytes(b"poisoned")
        # no pin on disk and offline: the cached file must be rejected
        assert corpus.fetch_corpus_file(spec, timeout=0.2) is None
        assert not (tmp_path / "y.bin").exists()
        # a recorded pin is enforced: matching content passes ...
        (tmp_path / "y.bin").write_bytes(b"data")
        pin = hashlib.sha256(b"data").hexdigest()
        (tmp_path / "y.bin.sha256").write_text(pin + "\n")
        assert corpus.fetch_corpus_file(spec, timeout=0.2) == tmp_path / "y.bin"
        # ... and tampered content is purged
        (tmp_path / "y.bin").write_bytes(b"tampered")
        assert corpus.fetch_corpus_file(spec, timeout=0.2) is None
        assert not (tmp_path / "y.bin").exists()


from tests.support.service_tasks import crash_task as _crash_task
from tests.support.service_tasks import sleep_task as _sleep_task


class TestCompressService:
    """Worker-RPC operational contract (the compress-client.ts analog):
    request ids, per-request timeout, cancellation, crash recovery."""

    def test_png_round_trip(self):
        from pixo_tpu import ColorType, PngOptions
        from pixo_tpu.decode import decode_png
        from pixo_tpu.parallel import CompressService

        img = synth_gradient(24, 16, 3)
        opts = PngOptions.fast(24, 16).replace(color_type=ColorType.RGB)
        # 120 s: the reference client default (compress-client.ts:14);
        # worker cold boot (spawned interpreter importing the full stack)
        # can take >60 s on a loaded 1-vCPU host in fallback mode
        with CompressService(workers=1, timeout_s=120) as svc:
            reqs = [svc.submit_png(img, opts) for _ in range(3)]
            ids = [r.id for r in reqs]
            assert ids == sorted(ids) and len(set(ids)) == 3
            outs = [r.result() for r in reqs]
        assert outs[0] == outs[1] == outs[2]
        dec = decode_png(outs[0])
        np.testing.assert_array_equal(dec.pixels.reshape(img.shape), img)

    def test_timeout_rejects_request(self):
        from pixo_tpu.parallel import CompressService, RequestTimeout

        with CompressService(workers=1) as svc:
            req = svc.submit_raw(_sleep_task, 3.0, timeout=0.3)
            with pytest.raises(RequestTimeout):
                req.result()

    def test_cancel_pending(self):
        from pixo_tpu.parallel import (
            CompressService,
            RequestCancelled,
            RequestTimeout,
        )

        with CompressService(workers=1) as svc:
            blocker = svc.submit_raw(_sleep_task, 1.0)
            queued = svc.submit_raw(_sleep_task, 0.1)
            assert svc.cancel(queued)  # not started yet -> cancellable
            with pytest.raises((RequestCancelled, RequestTimeout)):
                queued.result(timeout=2.0)
            assert blocker.result(timeout=10.0) == "slept"

    def test_worker_crash_rejects_and_respawns(self):
        from pixo_tpu.parallel import (
            CompressService,
            RequestCancelled,
            WorkerCrashed,
        )

        # generous timeouts: worker cold boot (spawned interpreter) can
        # take tens of seconds on the loaded 1-vCPU CI host
        with CompressService(workers=1, timeout_s=120) as svc:
            doomed = svc.submit_raw(_crash_task)
            pending = svc.submit_raw(_sleep_task, 0.05)
            with pytest.raises(WorkerCrashed):
                doomed.result(timeout=90.0)
            # pending requests at crash time are rejected...
            with pytest.raises((WorkerCrashed, RequestCancelled)):
                pending.result(timeout=90.0)
            # ...and the respawned pool serves new requests
            again = svc.submit_raw(_sleep_task, 0.01)
            assert again.result(timeout=90.0) == "slept"

    def test_jpeg_and_resize_round_trip(self):
        import io

        from PIL import Image as PILImage

        from pixo_tpu import ColorType, JpegOptions
        from pixo_tpu.options import ResizeFilter, ResizeOptions
        from pixo_tpu.parallel import CompressService

        img = synth_gradient(32, 24, 3)
        jopts = JpegOptions.fast(24, 32, 90)
        ropts = ResizeOptions(src_width=24, src_height=32,
                              dst_width=12, dst_height=16,
                              color_type=ColorType.RGB,
                              filter=ResizeFilter.BILINEAR)
        with CompressService(workers=1, timeout_s=120) as svc:
            jreq = svc.submit_jpeg(img, jopts)
            rreq = svc.submit_resize(img, ropts)
            jout = jreq.result()
            rout = rreq.result()
        pil = PILImage.open(io.BytesIO(jout))
        assert pil.size == (24, 32)
        rarr = np.asarray(rout)
        assert rarr.shape == (16, 12, 3)


class TestPlayground:
    """The interactive web playground (examples/playground.py) — the
    reference web/ analog: page serves, jobs compress through the real
    pipeline per-options, bad input surfaces as 422."""

    @pytest.fixture()
    def server(self, monkeypatch):
        import http.client
        import importlib.util
        import threading
        from http.server import ThreadingHTTPServer
        from pathlib import Path

        # inline jobs: spawning the 2-process worker pool re-imports
        # jax per worker, which under full-suite load on the 1-vCPU
        # host can exceed any sane HTTP timeout (observed >120 s) —
        # this test pins the HTTP contract; the pool contract has its
        # own suite (TestCompressService, incl. crash respawn)
        monkeypatch.setenv("PIXO_TPU_PLAYGROUND_INLINE", "1")

        spec = importlib.util.spec_from_file_location(
            "playground",
            Path(__file__).resolve().parent.parent / "examples" /
            "playground.py",
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        srv = ThreadingHTTPServer(("127.0.0.1", 0), mod.make_handler())
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv.server_address[1]
        srv.shutdown()

    def _post(self, port, qs, body):
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", f"/compress?{qs}", body=body)
        resp = conn.getresponse()
        data = resp.read()
        headers = dict(resp.getheaders())
        conn.close()
        return resp.status, headers, data

    def test_page_and_jobs(self, server):
        import http.client
        import io
        import json

        import numpy as np
        from PIL import Image

        # generous: the shared 1-vCPU host wobbles badly under parallel
        # load (this test flaked twice at 30 s while benches ran)
        conn = http.client.HTTPConnection("127.0.0.1", server, timeout=120)
        conn.request("GET", "/")
        resp = conn.getresponse()
        page = resp.read().decode()
        assert resp.status == 200 and "pixo-tpu" in page
        conn.close()

        img = synth_gradient(48, 64, 3)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "PNG")
        src = buf.getvalue()

        for qs, fmt in [
            ("format=png&preset=1&lossless=true&name=t.png", "PNG"),
            ("format=jpeg&preset=1&quality=85&sub420=true&name=t.png",
             "JPEG"),
            ("format=auto&preset=0&quality=70&rw=32&rh=24&name=t.jpg",
             "JPEG"),
        ]:
            status, headers, out = self._post(server, qs, src)
            assert status == 200, out
            meta = json.loads(headers["X-Pixo-Result"])
            back = Image.open(io.BytesIO(out))
            assert back.format == fmt
            assert (back.size[0], back.size[1]) == (meta["width"],
                                                    meta["height"])

        status, _, err = self._post(server, "format=png&name=x.png",
                                    b"not an image")
        assert status == 422 and b"unrecognized" in err

    def test_multi_file_concurrent(self, server):
        """Multi-file analog of the reference's web/e2e multi-file spec:
        several distinct images in flight at once (ThreadingHTTPServer,
        one handler thread each) all complete with per-file results and
        no cross-talk between jobs."""
        import concurrent.futures
        import io
        import json

        from PIL import Image

        dims = [(40, 56), (48, 32), (64, 24), (24, 64)]
        srcs = []
        for h, w in dims:
            buf = io.BytesIO()
            Image.fromarray(synth_gradient(h, w, 3)).save(buf, "PNG")
            srcs.append(buf.getvalue())

        def one(i):
            return self._post(
                server,
                f"format=jpeg&preset=0&quality=80&sub420=true&name=f{i}.png",
                srcs[i],
            )

        with concurrent.futures.ThreadPoolExecutor(4) as ex:
            results = list(ex.map(one, range(len(dims))))
        for i, (status, headers, out) in enumerate(results):
            assert status == 200, out
            meta = json.loads(headers["X-Pixo-Result"])
            assert (meta["height"], meta["width"]) == dims[i]
            back = Image.open(io.BytesIO(out))
            assert back.format == "JPEG" and back.size == (
                dims[i][1], dims[i][0])

    def test_recompression_round_trip(self, server):
        """Recompression analog of the reference's web/e2e recompress
        spec: the playground's own output fed back through the endpoint
        stays decodable with dims preserved, in both directions
        (JPEG -> PNG -> JPEG)."""
        import io
        import json

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(synth_gradient(40, 52, 3)).save(buf, "PNG")

        status, headers, jpg = self._post(
            server, "format=jpeg&preset=1&quality=85&name=a.png",
            buf.getvalue())
        assert status == 200
        status, headers, png2 = self._post(
            server, "format=png&preset=1&lossless=true&name=a.jpg", jpg)
        assert status == 200
        meta = json.loads(headers["X-Pixo-Result"])
        assert (meta["width"], meta["height"]) == (52, 40)
        status, headers, jpg2 = self._post(
            server, "format=jpeg&preset=0&quality=70&name=a.png", png2)
        assert status == 200
        back = Image.open(io.BytesIO(jpg2))
        assert back.format == "JPEG" and back.size == (52, 40)

    def test_resize_exact_dims(self, server):
        """The rw/rh resize knobs produce exactly the requested output
        dimensions (reference playground resize control)."""
        import io
        import json

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(synth_gradient(60, 80, 3)).save(buf, "PNG")
        status, headers, out = self._post(
            server, "format=png&preset=0&lossless=true&rw=20&rh=15"
            "&name=r.png", buf.getvalue())
        assert status == 200
        meta = json.loads(headers["X-Pixo-Result"])
        assert (meta["width"], meta["height"]) == (20, 15)
        back = Image.open(io.BytesIO(out))
        assert back.size == (20, 15)

    def test_page_ui_affordances(self, server):
        """The page carries the reference e2e suite's interaction
        surface: multi-file input, drag-drop, clipboard paste handler,
        and a keyboard-operable drop zone."""
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1", server, timeout=120)
        conn.request("GET", "/")
        page = conn.getresponse().read().decode()
        conn.close()
        assert 'type="file"' in page and "multiple" in page
        assert 'addEventListener("drop"' in page
        assert 'addEventListener("paste"' in page
        assert 'addEventListener("keydown"' in page
        assert 'tabindex="0"' in page


class TestCompetitorProbe:
    """VERDICT r4 task 9: the comparison bench's external-competitor
    columns are measured same-host when a tool exists and documented
    as quoted otherwise (the reference spawns oxipng/mozjpeg/pngquant
    binaries, /root/reference/benches/comparison.rs external-binary
    harness; this environment is zero-egress with none baked in)."""

    def _mod(self):
        import importlib.util
        import os as _os
        spec = importlib.util.spec_from_file_location(
            "comparison_bench",
            _os.path.join(_os.path.dirname(__file__), "..", "benches",
                          "comparison.py"))
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return m

    def test_probe_returns_known_tools_only(self):
        m = self._mod()
        found = m.probe_competitors()
        assert isinstance(found, dict)
        assert set(found) <= set(m.COMPETITOR_SPECS)
        for how, where in found.values():
            assert how in ("module", "binary") and where

    def test_note_documents_skip_or_measured(self):
        m = self._mod()
        note = m.competitor_note({})
        assert "quoted" in note and "unavailable" in note
        for tool in m.COMPETITOR_SPECS:
            assert tool in note
        note2 = m.competitor_note(
            {t: ("binary", "/bin/true") for t in m.COMPETITOR_SPECS})
        assert "measured" in note2 and "quoted" not in note2

    def test_measured_helpers_none_or_bytes(self):
        m = self._mod()
        img = np.zeros((16, 16, 3), np.uint8)
        found = m.probe_competitors()
        moz = m.measured_mozjpeg(img, 85)
        assert (moz is None) == ("mozjpeg" not in found)
        if moz is not None:
            assert moz[:2] == b"\xff\xd8"
        pq = m.measured_pngquant(img)
        assert (pq is None) == ("pngquant" not in found)
        if pq is not None:
            assert pq[:4] == b"\x89PNG"
