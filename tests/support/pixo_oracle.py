"""Byte-identity oracle: runs the reference's prebuilt scalar WASM encoder.

Executes ``/root/reference/web/src/lib/pixo-wasm/pixo_bg.wasm`` (the
wasm-bindgen build of ``src/wasm.rs:78-201``) on the pure-Python
interpreter in :mod:`wasmvm`, reproducing the JS glue's ABI
(``pixo.js``): malloc via ``__wbindgen_export``, retptr via
``__wbindgen_add_to_stack_pointer``, free via ``__wbindgen_export2``.

Interpretation is slow (~1 M instr/s), so every oracle call is cached on
disk under ``tests/golden/oracle/`` keyed by the SHA-256 of the call
signature + input bytes.  The cache files are committed; CI never needs
to run the interpreter unless a new fixture is added.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

import wasmvm

WASM_PATH = "/root/reference/web/src/lib/pixo-wasm/pixo_bg.wasm"
CACHE_DIR = Path(__file__).resolve().parent.parent / "golden" / "oracle"


class PixoError(RuntimeError):
    """The reference encoder returned an error."""


class PixoOracle:
    def __init__(self, wasm_path: str = WASM_PATH):
        self._last_error = None
        self._handle = 200  # fake JS heap handles (wasm never reads them)

        def host_error(ptr, length):
            self._last_error = self.inst.mem_read(ptr, length).decode("utf-8")
            self._handle += 1
            return [self._handle]

        self.inst = wasmvm.instantiate(
            wasm_path, {("wbg", "__wbg_Error_52673b7de5a0ca89"): host_error}
        )

    # -- wasm-bindgen ABI helpers ------------------------------------------

    def _pass_bytes(self, data: bytes) -> int:
        ptr = self.inst.call("__wbindgen_export", len(data), 1)
        self.inst.mem_write(ptr, data)
        return ptr

    def _retcall(self, name: str, *args) -> bytes:
        inst = self.inst
        retptr = inst.call("__wbindgen_add_to_stack_pointer", -16)
        try:
            self._last_error = None
            inst.call(name, retptr, *args)
            r0 = inst.read_i32(retptr)
            r1 = inst.read_i32(retptr + 4)
            r3 = inst.read_i32(retptr + 12)
            if r3:
                raise PixoError(self._last_error or "unknown pixo error")
            out = inst.mem_read(r0, r1)
            inst.call("__wbindgen_export2", r0, r1, 1)
            return out
        finally:
            inst.call("__wbindgen_add_to_stack_pointer", 16)

    # -- public surface (mirrors pixo.js) ----------------------------------

    def encode_png(
        self,
        data: bytes,
        width: int,
        height: int,
        color_type: int,
        preset: int,
        lossy: bool = False,
    ) -> bytes:
        ptr = self._pass_bytes(data)
        return self._retcall(
            "encodePng", ptr, len(data), width, height, color_type, preset,
            int(lossy),
        )

    def encode_jpeg(
        self,
        data: bytes,
        width: int,
        height: int,
        color_type: int,
        quality: int,
        preset: int,
        subsampling_420: bool,
    ) -> bytes:
        ptr = self._pass_bytes(data)
        return self._retcall(
            "encodeJpeg", ptr, len(data), width, height, color_type, quality,
            preset, int(subsampling_420),
        )

    def resize(
        self,
        data: bytes,
        src_w: int,
        src_h: int,
        dst_w: int,
        dst_h: int,
        color_type: int,
        algorithm: int,
    ) -> bytes:
        ptr = self._pass_bytes(data)
        return self._retcall(
            "resizeImage", ptr, len(data), src_w, src_h, dst_w, dst_h,
            color_type, algorithm,
        )


_shared: PixoOracle | None = None


def _oracle() -> PixoOracle:
    # A fresh instance per call keeps runs independent of allocator state;
    # the Rust encoders are deterministic regardless, and reusing one
    # instance is ~free because instantiation is lazy.  Reuse it.
    global _shared
    if _shared is None:
        _shared = PixoOracle()
    return _shared


def cached_call(kind: str, data: bytes, *params) -> bytes:
    """Oracle call memoized on disk.  ``kind`` in {png, jpeg, resize}."""
    key_src = repr((kind, params)).encode() + b"\x00" + data
    key = hashlib.sha256(key_src).hexdigest()[:32]
    path = CACHE_DIR / f"{kind}-{key}.bin"
    if path.exists():
        return path.read_bytes()
    if os.environ.get("PIXO_TPU_ORACLE_NO_RUN"):
        raise FileNotFoundError(
            f"oracle golden {path.name} missing and PIXO_TPU_ORACLE_NO_RUN set"
        )
    fn = {
        "png": lambda o: o.encode_png(data, *params),
        "jpeg": lambda o: o.encode_jpeg(data, *params),
        "resize": lambda o: o.resize(data, *params),
    }[kind]
    out = fn(_oracle())
    CACHE_DIR.mkdir(parents=True, exist_ok=True)
    path.write_bytes(out)
    return out
