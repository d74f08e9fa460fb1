"""Interactive web playground (the reference ``web/`` analog).

Serves a single-page drag-and-drop compressor on localhost backed by the
pixo_tpu library — the operational analog of the reference's Svelte
playground (``web/src/routes/+page.svelte`` + ``compress-client.ts``):
per-image jobs, quality/preset/subsampling/lossless controls, optional
resize, before/after sizes with savings and elapsed time, and a result
preview/download.  Heavy work runs on the worker-pool service
(``pixo_tpu.parallel.service``) when available, mirroring the
reference's web-worker split; otherwise inline.

Usage: python examples/playground.py [--port 8077] [--device cpu|default]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>pixo-tpu playground</title>
<style>
 body { font-family: system-ui, sans-serif; margin: 2rem auto; max-width: 880px;
        background: #101418; color: #e8e8e8; }
 h1 { font-size: 1.3rem; } h1 span { color: #7ac4ff; }
 #drop { border: 2px dashed #4a5562; border-radius: 12px; padding: 3rem;
         text-align: center; color: #9ab; cursor: pointer; }
 #drop.active { border-color: #7ac4ff; background: #16202a; }
 fieldset { border: 1px solid #2a3542; border-radius: 8px; margin: 1rem 0;
            display: flex; gap: 1.2rem; flex-wrap: wrap; align-items: center; }
 label { font-size: 0.85rem; }
 table { border-collapse: collapse; width: 100%; margin-top: 1rem; }
 td, th { padding: 0.4rem 0.6rem; border-bottom: 1px solid #2a3542;
          font-size: 0.85rem; text-align: left; }
 .savings-pos { color: #7dd87d; } .savings-neg { color: #ff9a7a; }
 img.thumb { max-height: 48px; border-radius: 4px; }
 a { color: #7ac4ff; }
</style></head><body>
<h1><span>pixo-tpu</span> playground — drop PNG/JPEG files to compress</h1>
<div id="drop" tabindex="0" role="button" aria-label="choose images">drop
 images here, click to choose, or paste from the clipboard<input id="file"
 type="file" accept="image/png,image/jpeg" multiple style="display:none"></div>
<fieldset>
 <label>format <select id="format"><option>auto</option><option>png</option>
   <option>jpeg</option></select></label>
 <label>preset <select id="preset"><option value="0">fast</option>
   <option value="1" selected>balanced</option><option value="2">max</option>
   </select></label>
 <label>quality <input id="quality" type="range" min="1" max="100" value="85">
   <span id="qv">85</span></label>
 <label><input id="sub420" type="checkbox" checked> 4:2:0</label>
 <label><input id="lossless" type="checkbox"> PNG lossless</label>
 <label>resize <input id="rw" type="number" placeholder="w" style="width:4.5em">
   x <input id="rh" type="number" placeholder="h" style="width:4.5em"></label>
</fieldset>
<table id="jobs"><thead><tr><th></th><th>name</th><th>dims</th><th>in</th>
 <th>out</th><th>savings</th><th>ms</th><th></th></tr></thead>
 <tbody></tbody></table>
<script>
const $ = id => document.getElementById(id);
$("quality").oninput = () => $("qv").textContent = $("quality").value;
const drop = $("drop");
drop.onclick = () => $("file").click();
$("file").onchange = e => [...e.target.files].forEach(submit);
for (const ev of ["dragover", "dragenter"])
  drop.addEventListener(ev, e => { e.preventDefault(); drop.classList.add("active"); });
for (const ev of ["dragleave", "drop"])
  drop.addEventListener(ev, e => { e.preventDefault(); drop.classList.remove("active"); });
drop.addEventListener("drop", e => [...e.dataTransfer.files].forEach(submit));
// keyboard: the drop zone is focusable; Enter/Space opens the chooser
// (reference web/e2e keyboard spec analog)
drop.addEventListener("keydown", e => {
  if (e.key === "Enter" || e.key === " ") { e.preventDefault(); $("file").click(); }
});
// clipboard: paste an image anywhere on the page to submit it
// (reference web/e2e clipboard spec analog)
document.addEventListener("paste", e => {
  const files = [...(e.clipboardData?.files || [])]
    .filter(f => f.type.startsWith("image/"));
  if (files.length) { e.preventDefault(); files.forEach(submit); }
});

function fmt(n) { return n >= 1048576 ? (n/1048576).toFixed(2)+" MB"
                       : (n/1024).toFixed(1)+" KB"; }

async function submit(file) {
  const tb = document.querySelector("#jobs tbody");
  const tr = document.createElement("tr");
  tr.innerHTML = `<td></td><td></td><td>…</td>` +
    `<td>${fmt(file.size)}</td><td>…</td><td>…</td><td>…</td><td></td>`;
  tr.cells[1].textContent = file.name;  // never innerHTML: names are untrusted
  tb.appendChild(tr);
  const qs = new URLSearchParams({
    format: $("format").value, preset: $("preset").value,
    quality: $("quality").value, sub420: $("sub420").checked,
    lossless: $("lossless").checked,
    rw: $("rw").value || "", rh: $("rh").value || "",
    name: file.name,
  });
  try {
    const resp = await fetch("/compress?" + qs, { method: "POST",
      body: await file.arrayBuffer() });
    if (!resp.ok) throw new Error(await resp.text());
    const meta = JSON.parse(resp.headers.get("X-Pixo-Result"));
    const blob = await resp.blob();
    const url = URL.createObjectURL(blob);
    const save = 100 * (1 - meta.out_size / file.size);
    tr.cells[0].innerHTML = `<img class="thumb" src="${url}">`;
    tr.cells[2].textContent = meta.width + "x" + meta.height;
    tr.cells[4].textContent = fmt(meta.out_size);
    tr.cells[5].innerHTML = `<span class="${save >= 0 ? "savings-pos" :
      "savings-neg"}">${save.toFixed(1)}%</span>`;
    tr.cells[6].textContent = meta.elapsed_ms.toFixed(0);
    const a = document.createElement("a");
    a.href = url; a.textContent = "save";
    a.download = meta.out_name;  // attribute assignment: no HTML parsing
    tr.cells[7].replaceChildren(a);
  } catch (err) { tr.cells[4].textContent = "error: " + err.message; }
}
</script></body></html>
"""


# The job function lives in the package (pixo_tpu.playground) so the
# worker-pool service can pickle it into spawned processes; re-exported
# here for direct use and tests.
from pixo_tpu.playground import compress_bytes  # noqa: E402


_SVC = None  # CompressService once spawned; False after a hard failure


def _service():
    """Lazy worker-pool service (the reference's web-worker split).

    Returns None when disabled (--inline) or after an unrecoverable
    spawn failure — jobs then run inline in the handler thread.
    """
    global _SVC
    if _SVC is False or os.environ.get("PIXO_TPU_PLAYGROUND_INLINE"):
        return None
    if _SVC is None:
        try:
            from pixo_tpu.parallel.service import CompressService

            _SVC = CompressService(workers=2)
        except Exception:  # noqa: BLE001 - no multiprocessing: inline
            _SVC = False
            return None
    return _SVC


def make_handler():
    from http.server import BaseHTTPRequestHandler
    from urllib.parse import parse_qsl, urlparse

    # One-shot latency profile (the CLI's policy, cli.py:169-180): on the
    # CPU backend pin the native host tiers so a drag-and-drop job never
    # pays a per-shape XLA first-compile. Explicit env settings win; the
    # shared policy (incl. the native-availability gate) lives in
    # jpeg.encoder.auto_host_tier.
    from pixo_tpu.jpeg.encoder import auto_host_tier

    if auto_host_tier("PIXO_TPU_COEFFS"):
        os.environ.setdefault("PIXO_TPU_COEFFS", "host")
    if auto_host_tier("PIXO_TPU_RESIZE"):
        os.environ.setdefault("PIXO_TPU_RESIZE", "host")

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def do_GET(self):
            if urlparse(self.path).path not in ("/", "/index.html"):
                self.send_error(404)
                return
            body = PAGE.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/compress":
                self.send_error(404)
                return
            params = dict(parse_qsl(url.query))
            n = int(self.headers.get("Content-Length", "0"))
            data = self.rfile.read(n)
            try:
                svc = _service()
                if svc is not None:
                    # worker-pool path: same ids/deadline/crash-recovery
                    # contract as the reference's web worker
                    out, meta = svc.submit_raw(
                        compress_bytes, data, params
                    ).result()
                else:
                    out, meta = compress_bytes(data, params)
            except Exception as e:  # noqa: BLE001 - surface to the page
                msg = f"{type(e).__name__}: {e}".encode()
                self.send_response(422)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            self.send_response(200)
            self.send_header("Content-Type", meta["mime"])
            self.send_header("Content-Length", str(len(out)))
            self.send_header("X-Pixo-Result", json.dumps(meta))
            self.end_headers()
            self.wfile.write(out)

    return Handler


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8077)
    ap.add_argument("--device", default="cpu", choices=["cpu", "default"])
    args = ap.parse_args()
    if args.device == "cpu":
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")
        # tier pinning happens in make_handler (one policy site)
    from pixo_tpu.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from http.server import ThreadingHTTPServer

    srv = ThreadingHTTPServer(("127.0.0.1", args.port), make_handler())
    print(f"pixo-tpu playground: http://127.0.0.1:{args.port}/", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass


if __name__ == "__main__":
    main()
