"""Native (C++) host-stage bindings.

The sequential bit-oriented stages — JPEG entropy packing, DEFLATE/INFLATE,
JPEG entropy decode — are implemented in C++ (``core.cpp``) and loaded via
ctypes. This is the TPU build's analog of the reference's native tier: the
device does the data-parallel math, this library does the byte streams.

The library auto-builds on first import if a compiler is available; every
entry point has a pure-Python fallback (``pixo_tpu.jpeg.packer``,
``pixo_tpu.compress``) that must stay byte-identical (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "core.cpp")
_LIB_PATH = os.path.join(_HERE, "libpixo_core.so")

_lib = None
_lock = threading.Lock()
_build_failed = False


_BASE_FLAGS = [
    "-O3", "-std=c++17", "-shared", "-fPIC",
    "-march=native", "-fno-exceptions", "-fvisibility=hidden", "-pthread",
    # GCC contracts even explicit _mm256_mul_ps/_mm256_add_ps pairs
    # into FMA at -O3; the f32 tiers (AAN DCT) are only bit-exact
    # with the NumPy mirrors when contraction is off
    "-ffp-contract=off",
]


def _build(extra, timeout):
    cmd = ["g++", *_BASE_FLAGS, *extra, _SRC, "-o", _LIB_PATH]
    subprocess.run(cmd, check=True, capture_output=True, timeout=timeout)


def _try_build() -> Optional[str]:
    """(Re)build the native library when core.cpp is newer.

    Default build is profile-guided (measured +10-15% on the DEFLATE
    matcher and the other branchy hot loops): compile instrumented, run
    the deterministic training battery (_pgo_train.py) in a subprocess
    against the instrumented library, then recompile with -fprofile-use.
    PGO never changes output bytes — only code layout/inlining. Any
    failure in the PGO pipeline (missing gcc feature, training crash,
    timeout) falls back to the plain -O3 build; PIXO_TPU_NO_PGO=1 skips
    PGO outright (used by quick CI builds and the training subprocess
    itself so it cannot recurse).
    """
    if not os.path.exists(_SRC):
        return None
    if os.path.exists(_LIB_PATH) and os.path.getmtime(_LIB_PATH) >= os.path.getmtime(_SRC):
        return _LIB_PATH
    pgo_dir = os.path.join(_HERE, ".pgo")
    trainer = os.path.join(_HERE, "_pgo_train.py")
    want_pgo = not os.environ.get("PIXO_TPU_NO_PGO") and os.path.exists(trainer)
    if want_pgo:
        try:
            import sys as _sys

            _build([f"-fprofile-generate={pgo_dir}"], timeout=240)
            env = dict(os.environ)
            env["PIXO_TPU_NO_PGO"] = "1"  # the trainer must not re-enter
            subprocess.run(
                [_sys.executable, trainer], check=True, capture_output=True,
                timeout=240, env=env,
            )
            _build(
                [f"-fprofile-use={pgo_dir}", "-fprofile-correction",
                 "-Wno-missing-profile"],
                timeout=240,
            )
            return _LIB_PATH
        except (subprocess.CalledProcessError, OSError, subprocess.TimeoutExpired):
            pass  # fall through to the plain build
    try:
        _build([], timeout=240)
        return _LIB_PATH
    except (subprocess.CalledProcessError, OSError, subprocess.TimeoutExpired):
        return None


def _load():
    global _lib, _build_failed
    if os.environ.get("PIXO_TPU_DISABLE_NATIVE"):
        return None
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        path = _try_build()
        if path is None:
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(path)
        except OSError:
            _build_failed = True
            return None
        _configure(lib)
        _lib = lib
    return _lib


def _configure(lib) -> None:
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u16p = ctypes.POINTER(ctypes.c_uint16)

    lib.jpeg_pack_scan.restype = ctypes.c_int64
    lib.jpeg_pack_scan.argtypes = [
        i16p, ctypes.c_int64,            # zz coeffs, nblocks
        u8p, ctypes.c_int32,             # pattern, blocks per mcu
        u16p, u8p, u16p, u8p,            # dc lum codes/lens, dc chrom codes/lens
        u16p, u8p, u16p, u8p,            # ac lum codes/lens, ac chrom codes/lens
        ctypes.c_int32,                  # restart interval (0 = off)
        u8p, ctypes.c_int64,             # out buffer, capacity
    ]

    if hasattr(lib, "jpeg_encode_scan_fused"):
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.jpeg_encode_scan_fused.restype = ctypes.c_int64
        lib.jpeg_encode_scan_fused.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32,                  # img, h, w, c_in, mode
            f32p, f32p,                      # qlum, qchrom (natural [64])
            u8p, ctypes.c_int32,             # pattern, blocks per mcu
            u16p, u8p, u16p, u8p,            # dc lum/chrom codes+lens
            u16p, u8p, u16p, u8p,            # ac lum/chrom codes+lens
            ctypes.c_int32,                  # restart interval (0 = off)
            u8p, ctypes.c_int64,             # out buffer, capacity
        ]

    lib.jpeg_pack_scan_sparse.restype = ctypes.c_int64
    lib.jpeg_pack_scan_sparse.argtypes = [
        i16p, u8p, u8p, i16p,            # dc, counts, positions, values
        ctypes.c_int64,                  # nblocks
        u8p, ctypes.c_int32,             # pattern, blocks per mcu
        u16p, u8p, u16p, u8p,            # dc lum/chrom codes+lens
        u16p, u8p, u16p, u8p,            # ac lum/chrom codes+lens
        ctypes.c_int32,                  # restart interval (0 = off)
        u8p, ctypes.c_int64,             # out buffer, capacity
    ]

    lib.jpeg_pack_scan_padded.restype = ctypes.c_int64
    lib.jpeg_pack_scan_padded.argtypes = [
        i16p, u8p, u8p, i16p,            # dc, counts, positions, values
        ctypes.c_int64, ctypes.c_int32,  # nblocks, per-block row stride
        u8p, ctypes.c_int32,             # pattern, blocks per mcu
        u16p, u8p, u16p, u8p,            # dc lum/chrom codes+lens
        u16p, u8p, u16p, u8p,            # ac lum/chrom codes+lens
        ctypes.c_int32,                  # restart interval (0 = off)
        u8p, ctypes.c_int64,             # out buffer, capacity
    ]

    lib.jpeg_pack_scan_batch.restype = ctypes.c_int32
    lib.jpeg_pack_scan_batch.argtypes = [
        i16p, ctypes.c_int32, ctypes.c_int64,
        u8p, ctypes.c_int32,
        u16p, u8p, u16p, u8p,
        u16p, u8p, u16p, u8p,
        ctypes.c_int32,
        u8p, ctypes.c_int64,
        i64p,
        ctypes.c_int32,
    ]

    lib.jpeg_count_symbols.restype = ctypes.c_int32
    lib.jpeg_count_symbols.argtypes = [
        i16p, ctypes.c_int64,
        u8p, ctypes.c_int32,
        ctypes.c_int32,
        i64p, i64p, i64p, i64p,          # dc_lum[12], dc_chrom[12], ac_lum[256], ac_chrom[256]
    ]

    lib.jpeg_encode_progressive_scan.restype = ctypes.c_int64
    lib.jpeg_encode_progressive_scan.argtypes = [
        i16p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u16p, u8p, u16p, u8p,
        ctypes.c_int32,  # eobn_ok: -1 sniff lens[0x10], 0/1 explicit
        u8p, ctypes.c_int64,
    ]

    lib.jpeg_count_progressive_scan.restype = ctypes.c_int32
    lib.jpeg_count_progressive_scan.argtypes = [
        i16p, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i64p, i64p,
    ]

    i32p = ctypes.POINTER(ctypes.c_int32)

    if hasattr(lib, "jpeg_decode_scan"):
        lib.jpeg_decode_scan.restype = ctypes.c_int32
        lib.jpeg_decode_scan.argtypes = [
            u8p, i64p, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32,
            i32p, i32p,
            u8p, u8p, i32p,
            u8p, u8p, i32p,
            ctypes.POINTER(i16p),
            i32p,
        ]

    if hasattr(lib, "jpeg_coefficients"):
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.jpeg_coefficients.restype = ctypes.c_int64
        lib.jpeg_coefficients.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int32,
            f32p, f32p,
            i16p,
        ]

    lib.jpeg_prog_dc_segment.restype = ctypes.c_int32
    lib.jpeg_prog_dc_segment.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        i32p, i32p, i32p,
        u8p, u8p, i32p,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(i16p),
        i32p,
    ]

    lib.jpeg_prog_ac_segment.restype = ctypes.c_int32
    i64p_ = ctypes.POINTER(ctypes.c_int64)
    lib.jpeg_prog_ac_segment.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        u8p, u8p,
        i16p,
        i64p_,
    ]

    lib.png_unfilter.restype = ctypes.c_int32
    lib.png_unfilter.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32, u8p,
    ]

    lib.png_palette_expand.restype = None
    lib.png_palette_expand.argtypes = [
        u8p, ctypes.c_int64, u8p, ctypes.c_int32, u8p,
    ]

    lib.png_filter_apply.restype = ctypes.c_int32
    lib.png_filter_apply.argtypes = [
        u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, u8p,
    ]

    lib.jpeg_trellis_quantize.restype = ctypes.c_int32
    lib.jpeg_trellis_quantize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        u8p, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_float,
        i16p,
        ctypes.c_int32,
    ]

    lib.dither_fs.restype = ctypes.c_int32
    lib.dither_fs.argtypes = [
        u8p, ctypes.c_int32, ctypes.c_int32,
        u8p, ctypes.c_int32,
        u8p, u8p,
    ]

    lib.deflate_compress.restype = ctypes.c_int64
    lib.deflate_compress.argtypes = [
        u8p, ctypes.c_int64,             # input
        ctypes.c_int32,                  # level 1-9
        ctypes.c_int32,                  # zlib wrap (0/1)
        u8p, ctypes.c_int64,             # out, capacity
    ]

    lib.deflate_compress_optimal.restype = ctypes.c_int64
    lib.deflate_compress_optimal.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.c_int32,                  # iterations
        ctypes.c_int32,                  # zlib wrap
        u8p, ctypes.c_int64,
    ]

    lib.deflate_optimal_parity.restype = ctypes.c_int64
    lib.deflate_optimal_parity.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.c_int32,                  # iterations
        u8p, ctypes.c_int64,
    ]

    lib.deflate_compress_parity.restype = ctypes.c_int64
    lib.deflate_compress_parity.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.c_int32,                  # level 1-9
        ctypes.c_int32,                  # zlib wrap (0/1)
        ctypes.c_int32,                  # packed semantics (0/1)
        u8p, ctypes.c_int64,
    ]

    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.deflate_compress_optimal_assisted.restype = ctypes.c_int64
    lib.deflate_compress_optimal_assisted.argtypes = [
        u8p, ctypes.c_int64,
        ctypes.c_int32,                  # iterations
        ctypes.c_int32,                  # zlib wrap
        i32p, i32p, ctypes.c_int32,      # cand [N,K], clen [N,K], K
        u8p, ctypes.c_int64,
    ]

    lib.inflate_decompress.restype = ctypes.c_int64
    lib.inflate_decompress.argtypes = [
        u8p, ctypes.c_int64,             # input
        ctypes.c_int32,                  # zlib wrap (0/1)
        u8p, ctypes.c_int64,             # out, capacity (exact expected size ok)
    ]

    lib.nearest_palette_batch.restype = ctypes.c_int32
    lib.nearest_palette_batch.argtypes = [
        u8p, ctypes.c_int64,             # colors [n, 4]
        u8p, ctypes.c_int64,             # palette [k, 4]
        u8p,                             # out [n]
    ]

    lib.palette_lut_build.restype = ctypes.c_int32
    lib.palette_lut_build.argtypes = [
        u8p, ctypes.c_int64,             # palette [k, 4]
        u8p,                             # lut [64^3]
    ]

    lib.crc32.restype = ctypes.c_uint32
    lib.crc32.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]

    lib.adler32.restype = ctypes.c_uint32
    lib.adler32.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint32]


def native_available() -> bool:
    return _load() is not None


def _u8(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def native_pack_scan(
    zz: np.ndarray,
    pattern: Sequence[int],
    tables,
    restart_interval: Optional[int],
) -> bytes:
    lib = _load()
    zz = np.ascontiguousarray(zz, dtype=np.int16)
    pat = np.asarray(pattern, dtype=np.uint8)
    nblocks = zz.shape[0]
    # Worst case ~ 16 bits/symbol * 64 symbols/block + stuffing margin.
    cap = nblocks * 64 * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)

    def u16(a):
        return np.ascontiguousarray(a, dtype=np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    def u8a(a):
        return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))

    n = lib.jpeg_pack_scan(
        zz.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), nblocks,
        _u8(pat), len(pattern),
        u16(tables.dc_lum_codes), u8a(tables.dc_lum_lengths),
        u16(tables.dc_chrom_codes), u8a(tables.dc_chrom_lengths),
        u16(tables.ac_lum_codes), u8a(tables.ac_lum_lengths),
        u16(tables.ac_chrom_codes), u8a(tables.ac_chrom_lengths),
        restart_interval or 0,
        _u8(out), cap,
    )
    if n < 0:
        raise RuntimeError("native jpeg_pack_scan failed")
    return out[:n].tobytes()


def native_pack_scan_sparse(
    dc: np.ndarray,
    counts: np.ndarray,
    poss: np.ndarray,
    vals: np.ndarray,
    pattern: Sequence[int],
    tables,
    restart_interval: Optional[int],
) -> bytes:
    """Pack one scan from device-compacted streams (ops/sparse_pack.py).

    Byte-identical to ``native_pack_scan`` on the dense blocks the
    streams were compacted from; the host touches ~3 B per nonzero AC
    instead of 128 B per block.
    """
    lib = _load()
    dc = np.ascontiguousarray(dc, dtype=np.int16)
    counts = np.ascontiguousarray(counts, dtype=np.uint8)
    poss = np.ascontiguousarray(poss, dtype=np.uint8)
    vals = np.ascontiguousarray(vals, dtype=np.int16)
    pat = np.asarray(pattern, dtype=np.uint8)
    nblocks = dc.shape[0]
    cap = nblocks * 64 * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)

    def u16(a):
        return np.ascontiguousarray(a, dtype=np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    def u8a(a):
        return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))

    def i16(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))

    n = lib.jpeg_pack_scan_sparse(
        i16(dc), _u8(counts), _u8(poss), i16(vals), nblocks,
        _u8(pat), len(pattern),
        u16(tables.dc_lum_codes), u8a(tables.dc_lum_lengths),
        u16(tables.dc_chrom_codes), u8a(tables.dc_chrom_lengths),
        u16(tables.ac_lum_codes), u8a(tables.ac_lum_lengths),
        u16(tables.ac_chrom_codes), u8a(tables.ac_chrom_lengths),
        restart_interval or 0,
        _u8(out), cap,
    )
    if n < 0:
        raise RuntimeError("native jpeg_pack_scan_sparse failed")
    return out[:n].tobytes()


def native_pack_scan_padded(
    dc: np.ndarray,
    counts: np.ndarray,
    poss: np.ndarray,
    vals: np.ndarray,
    pattern: Sequence[int],
    tables,
    restart_interval: Optional[int],
) -> bytes:
    """Pack one scan straight from the device's padded per-block top-k
    layout (``ops/sparse_pack.sparsify_blocks_padded``): ``poss``/``vals``
    are [nblocks, cap] rows, block i's ``counts[i]`` live entries at the
    head of row i. No host-side flatten pass — the packer strides the
    rows directly. Byte-identical to ``native_pack_scan`` on the dense
    blocks the streams were compacted from.
    """
    lib = _load()
    dc = np.ascontiguousarray(dc, dtype=np.int16)
    counts = np.ascontiguousarray(counts, dtype=np.uint8)
    poss = np.ascontiguousarray(poss, dtype=np.uint8)
    vals = np.ascontiguousarray(vals, dtype=np.int16)
    pat = np.asarray(pattern, dtype=np.uint8)
    nblocks = dc.shape[0]
    row_cap = poss.shape[1]
    cap = nblocks * 64 * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)

    def u16(a):
        return np.ascontiguousarray(a, dtype=np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    def u8a(a):
        return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))

    def i16(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))

    n = lib.jpeg_pack_scan_padded(
        i16(dc), _u8(counts), _u8(poss), i16(vals), nblocks, row_cap,
        _u8(pat), len(pattern),
        u16(tables.dc_lum_codes), u8a(tables.dc_lum_lengths),
        u16(tables.dc_chrom_codes), u8a(tables.dc_chrom_lengths),
        u16(tables.ac_lum_codes), u8a(tables.ac_lum_lengths),
        u16(tables.ac_chrom_codes), u8a(tables.ac_chrom_lengths),
        restart_interval or 0,
        _u8(out), cap,
    )
    if n < 0:
        raise RuntimeError("native jpeg_pack_scan_padded failed")
    return out[:n].tobytes()


def native_pack_scan_batch(
    zz_batch: np.ndarray,
    pattern: Sequence[int],
    tables,
    restart_interval: Optional[int],
    nthreads: int = 0,
) -> Optional[list]:
    """Pack [B, nblocks, 64] coefficient streams concurrently in C++.

    Returns a list of per-image scan byte strings, or None if unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_pack_scan_batch"):
        return None
    zz_batch = np.ascontiguousarray(zz_batch, dtype=np.int16)
    b, nblocks = zz_batch.shape[0], zz_batch.shape[1]
    pat = np.asarray(pattern, dtype=np.uint8)
    cap = nblocks * 64 * 4 + 4096
    out = np.empty(b * cap, dtype=np.uint8)
    lens = np.zeros(b, dtype=np.int64)
    if nthreads <= 0:
        nthreads = min(os.cpu_count() or 1, 16)

    def u16(a):
        return np.ascontiguousarray(a, dtype=np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    def u8a(a):
        return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))

    rc = lib.jpeg_pack_scan_batch(
        zz_batch.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), b, nblocks,
        _u8(pat), len(pattern),
        u16(tables.dc_lum_codes), u8a(tables.dc_lum_lengths),
        u16(tables.dc_chrom_codes), u8a(tables.dc_chrom_lengths),
        u16(tables.ac_lum_codes), u8a(tables.ac_lum_lengths),
        u16(tables.ac_chrom_codes), u8a(tables.ac_chrom_lengths),
        restart_interval or 0,
        _u8(out), cap,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        nthreads,
    )
    if rc != 0:
        return None
    return [out[i * cap : i * cap + int(lens[i])].tobytes() for i in range(b)]


def native_count_symbols(
    zz: np.ndarray,
    pattern: Sequence[int],
    restart_interval: Optional[int],
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    lib = _load()
    zz = np.ascontiguousarray(zz, dtype=np.int16)
    pat = np.asarray(pattern, dtype=np.uint8)
    dc_lum = np.zeros(12, dtype=np.int64)
    dc_chrom = np.zeros(12, dtype=np.int64)
    ac_lum = np.zeros(256, dtype=np.int64)
    ac_chrom = np.zeros(256, dtype=np.int64)

    def i64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    rc = lib.jpeg_count_symbols(
        zz.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), zz.shape[0],
        _u8(pat), len(pattern), restart_interval or 0,
        i64(dc_lum), i64(dc_chrom), i64(ac_lum), i64(ac_chrom),
    )
    if rc != 0:
        raise RuntimeError("native jpeg_count_symbols failed")
    return dc_lum, dc_chrom, ac_lum, ac_chrom


def native_jpeg_decode_pixels(
    comp_coeffs, qtables_zz, comp_h, comp_v,
    mcu_cols: int, mcu_rows: int, max_h: int, max_v: int,
    width: int, height: int, fancy: bool = False,
):
    """Host pixel tail: dezigzag+dequant+jidctint+assemble+upsample+color.

    comp_coeffs: list of [nb, 64] int16 zigzag arrays (one per component);
    qtables_zz: list of [64] uint16 zigzag dequant tables.
    Returns [H, W, 3] (or [H, W] gray) uint8, or None if unavailable.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_decode_pixels"):
        return None
    if not hasattr(lib.jpeg_decode_pixels, "_configured"):
        i16p = ctypes.POINTER(ctypes.c_int16)
        i64p = ctypes.POINTER(ctypes.c_int64)
        u16p = ctypes.POINTER(ctypes.c_uint16)
        i32p = ctypes.POINTER(ctypes.c_int32)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.jpeg_decode_pixels.restype = ctypes.c_int64
        lib.jpeg_decode_pixels.argtypes = [
            i16p, i64p, u16p, i32p, i32p,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32, u8p,
        ]
        lib.jpeg_decode_pixels._configured = True
    ncomp = len(comp_coeffs)
    coeffs = np.ascontiguousarray(
        np.concatenate([np.asarray(c, np.int16) for c in comp_coeffs])
    )
    offs = np.zeros(ncomp + 1, np.int64)
    for i, c in enumerate(comp_coeffs):
        offs[i + 1] = offs[i] + len(c)
    qt = np.ascontiguousarray(
        np.stack([np.asarray(q, np.uint16) for q in qtables_zz])
    )
    ch = np.asarray(comp_h, np.int32)
    cv = np.asarray(comp_v, np.int32)
    out = np.empty((height, width, 3) if ncomp == 3 else (height, width),
                   np.uint8)
    rc = lib.jpeg_decode_pixels(
        coeffs.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        qt.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        ch.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cv.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ncomp, mcu_cols, mcu_rows, max_h, max_v, width, height,
        1 if fancy else 0, _u8(out),
    )
    if rc != 0:
        return None
    return out


def native_deflate(
    data: bytes, level: int, zlib_wrap: bool, parity: bool = False,
    packed: bool = False,
) -> Optional[bytes]:
    """``packed=True`` (parity mode only) mirrors the reference's
    deflate_zlib_packed/compress_packed_zlib path — the one every PNG
    encode takes: no block splitting, literal-only >= 8 KiB stored."""
    lib = _load()
    if lib is None:
        return None
    if parity and not hasattr(lib, "deflate_compress_parity"):
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    cap = len(data) + (len(data) >> 3) + 4096
    out = np.empty(cap, dtype=np.uint8)
    if parity:
        n = lib.deflate_compress_parity(
            _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)),
            len(src), level, 1 if zlib_wrap else 0, 1 if packed else 0,
            _u8(out), cap,
        )
    else:
        n = lib.deflate_compress(
            _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)),
            len(src), level, 1 if zlib_wrap else 0, _u8(out), cap,
        )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_deflate_optimal_parity(
    data: bytes, iterations: int = 5
) -> Optional[bytes]:
    """Mirror of the reference's deflate_optimal_zlib(data, iterations) —
    the DEFLATE its PNG max preset uses (png/mod.rs:571-573)."""
    lib = _load()
    if lib is None or not hasattr(lib, "deflate_optimal_parity"):
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    cap = len(data) + (len(data) >> 3) + 4096
    out = np.empty(cap, dtype=np.uint8)
    n = lib.deflate_optimal_parity(
        _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)),
        len(src), iterations, _u8(out), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_deflate_optimal(data: bytes, iterations: int, zlib_wrap: bool) -> Optional[bytes]:
    lib = _load()
    if lib is None or not hasattr(lib, "deflate_compress_optimal"):
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    cap = len(data) + (len(data) >> 3) + 4096
    out = np.empty(cap, dtype=np.uint8)
    n = lib.deflate_compress_optimal(
        _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)),
        len(src), iterations, 1 if zlib_wrap else 0, _u8(out), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_deflate_optimal_assisted(
    data: bytes, iterations: int, zlib_wrap: bool,
    cand: "np.ndarray", clen: "np.ndarray",
) -> Optional[bytes]:
    """Optimal parse consuming device-precomputed chain candidates
    (ops/lz77_assist.chain_candidates). Byte-identical to the plain entry."""
    lib = _load()
    if lib is None or not hasattr(lib, "deflate_compress_optimal_assisted"):
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    cand = np.ascontiguousarray(cand, dtype=np.int32)
    clen = np.ascontiguousarray(clen, dtype=np.int32)
    if cand.shape != clen.shape or cand.shape[0] != len(src):
        return None
    k = cand.shape[1]
    cap = len(data) + (len(data) >> 3) + 4096
    out = np.empty(cap, dtype=np.uint8)
    i32 = ctypes.POINTER(ctypes.c_int32)
    n = lib.deflate_compress_optimal_assisted(
        _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)),
        len(src), iterations, 1 if zlib_wrap else 0,
        cand.ctypes.data_as(i32), clen.ctypes.data_as(i32), k,
        _u8(out), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_inflate(data: bytes, expected_size: int, zlib_wrap: bool) -> Optional[bytes]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    out = np.empty(max(expected_size, 1), dtype=np.uint8)
    n = lib.inflate_decompress(
        _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)),
        len(src), 1 if zlib_wrap else 0, _u8(out), expected_size,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_encode_progressive_scan(
    blocks: np.ndarray, ss: int, se: int, ah: int, al: int,
    dc_codes, dc_lens, ac_codes, ac_lens, eobn_ok: Optional[bool] = None,
) -> Optional[bytes]:
    """Entropy bytes for one single-component progressive scan, or None.

    ``eobn_ok``: True/False forces the EOBn-vs-single-EOB flush mode
    (per-scan counted tables, progressive.py); None keeps the
    single-table sniff (lens[0x10] != 0)."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_encode_progressive_scan"):
        return None
    blocks = np.ascontiguousarray(blocks, dtype=np.int16)
    cap = blocks.shape[0] * 64 * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)

    def u16(a):
        return np.ascontiguousarray(a, dtype=np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    def u8a(a):
        return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))

    n = lib.jpeg_encode_progressive_scan(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), blocks.shape[0],
        ss, se, ah, al,
        u16(dc_codes), u8a(dc_lens), u16(ac_codes), u8a(ac_lens),
        -1 if eobn_ok is None else int(bool(eobn_ok)),
        _u8(out), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_count_progressive_scan(
    blocks: np.ndarray, ss: int, se: int, ah: int, al: int,
    dc_counts: np.ndarray, ac_counts: np.ndarray,
) -> bool:
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_count_progressive_scan"):
        return False
    blocks = np.ascontiguousarray(blocks, dtype=np.int16)

    def i64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))

    rc = lib.jpeg_count_progressive_scan(
        blocks.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), blocks.shape[0],
        ss, se, ah, al, i64(dc_counts), i64(ac_counts),
    )
    return rc == 0


def native_jpeg_coefficients(
    img: np.ndarray,       # [h, w] uint8 (gray) or [h, w, 3|4] uint8
    mode: str,             # "gray" | "444" | "420" | "422"
    qlum: np.ndarray,      # natural-order [64] float32
    qchrom: np.ndarray,
) -> Optional[np.ndarray]:
    """AVX2 coefficient pipeline (clamp-pad -> YCbCr -> blockify -> AAN
    DCT -> quantize -> zigzag), bit-exact with the NumPy mirror tier.
    Returns [nblocks, 64] int16 or None (library/ISA unavailable)."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_coefficients"):
        return None
    m = {"gray": 0, "444": 1, "420": 2, "422": 3}[mode]
    h, w = img.shape[:2]
    c_in = 1 if img.ndim == 2 else img.shape[2]
    if m == 0:
        nblocks = ((h + 7) // 8) * ((w + 7) // 8)
    elif m == 1:
        nblocks = ((h + 7) // 8) * ((w + 7) // 8) * 3
    elif m == 3:
        nblocks = ((h + 7) // 8) * ((w + 15) // 16) * 4
    else:
        nblocks = ((h + 15) // 16) * ((w + 15) // 16) * 6
    img = np.ascontiguousarray(img)
    ql = np.ascontiguousarray(qlum.reshape(-1).astype(np.float32))
    qc = np.ascontiguousarray(qchrom.reshape(-1).astype(np.float32))
    out = np.empty((nblocks, 64), np.int16)
    f32p = ctypes.POINTER(ctypes.c_float)
    i16p = ctypes.POINTER(ctypes.c_int16)
    rc = lib.jpeg_coefficients(
        _u8(img.reshape(-1)), h, w, c_in, m,
        ql.ctypes.data_as(f32p), qc.ctypes.data_as(f32p),
        out.ctypes.data_as(i16p),
    )
    if rc != nblocks:
        return None
    return out


def native_has_fused_encode() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "jpeg_encode_scan_fused")


def native_jpeg_encode_scan(
    img: np.ndarray,       # [h, w] uint8 (gray) or [h, w, 3|4] uint8
    mode: str,             # "gray" | "444" | "420" | "422"
    qlum: np.ndarray,      # natural-order [64] float32
    qchrom: np.ndarray,
    pattern: Sequence[int],
    tables,
    restart_interval: Optional[int],
) -> Optional[bytes]:
    """Fused coefficients+pack in one native call: the entropy-coded scan
    payload for the baseline path without materializing the [nblocks, 64]
    int16 array or crossing ctypes twice. Byte-identical to
    native_jpeg_coefficients -> native_pack_scan (same quantizer, same
    per-block packer, same block order). Returns scan bytes or None
    (library/ISA unavailable)."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_encode_scan_fused"):
        return None
    m = {"gray": 0, "444": 1, "420": 2, "422": 3}[mode]
    h, w = img.shape[:2]
    c_in = 1 if img.ndim == 2 else img.shape[2]
    if m == 0:
        nblocks = ((h + 7) // 8) * ((w + 7) // 8)
    elif m == 1:
        nblocks = ((h + 7) // 8) * ((w + 7) // 8) * 3
    elif m == 3:
        nblocks = ((h + 7) // 8) * ((w + 15) // 16) * 4
    else:
        nblocks = ((h + 15) // 16) * ((w + 15) // 16) * 6
    img = np.ascontiguousarray(img)
    ql = np.ascontiguousarray(qlum.reshape(-1).astype(np.float32))
    qc = np.ascontiguousarray(qchrom.reshape(-1).astype(np.float32))
    pat = np.asarray(pattern, dtype=np.uint8)
    cap = nblocks * 64 * 4 + 4096
    out = np.empty(cap, dtype=np.uint8)
    f32p = ctypes.POINTER(ctypes.c_float)

    def u16(a):
        return np.ascontiguousarray(a, dtype=np.uint16).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint16))

    def u8a(a):
        return np.ascontiguousarray(a, dtype=np.uint8).ctypes.data_as(
            ctypes.POINTER(ctypes.c_uint8))

    n = lib.jpeg_encode_scan_fused(
        _u8(img.reshape(-1)), h, w, c_in, m,
        ql.ctypes.data_as(f32p), qc.ctypes.data_as(f32p),
        _u8(pat), len(pattern),
        u16(tables.dc_lum_codes), u8a(tables.dc_lum_lengths),
        u16(tables.dc_chrom_codes), u8a(tables.dc_chrom_lengths),
        u16(tables.ac_lum_codes), u8a(tables.ac_lum_lengths),
        u16(tables.ac_chrom_codes), u8a(tables.ac_chrom_lengths),
        restart_interval or 0,
        _u8(out), cap,
    )
    if n < 0:
        return None
    return out[:n].tobytes()


def native_jpeg_dct_zz(
    img: np.ndarray,       # [h, w] uint8 (gray) or [h, w, 3|4] uint8
    mode: str,             # "gray" | "444" | "420" | "422"
) -> Optional[np.ndarray]:
    """Raw zigzagged f32 DCT (pre-quantization) through the same AVX2
    clamp-pad -> YCbCr -> blockify -> AAN pipeline as
    native_jpeg_coefficients — the trellis front-end; bit-exact with
    the NumPy mirror / TPU device tier (same op order, contract-off).
    Returns [nblocks, 64] float32 or None (library/ISA unavailable)."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_dct_zz"):
        return None
    m = {"gray": 0, "444": 1, "420": 2, "422": 3}[mode]
    h, w = img.shape[:2]
    c_in = 1 if img.ndim == 2 else img.shape[2]
    if m == 0:
        nblocks = ((h + 7) // 8) * ((w + 7) // 8)
    elif m == 1:
        nblocks = ((h + 7) // 8) * ((w + 7) // 8) * 3
    elif m == 3:
        nblocks = ((h + 7) // 8) * ((w + 15) // 16) * 4
    else:
        nblocks = ((h + 15) // 16) * ((w + 15) // 16) * 6
    img = np.ascontiguousarray(img)
    out = np.empty((nblocks, 64), np.float32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.jpeg_dct_zz(
        _u8(img.reshape(-1)), h, w, c_in, m, out.ctypes.data_as(f32p)
    )
    if rc != nblocks:
        return None
    return out


def native_build_code_lengths(freqs, max_len: int):
    """Length-limited optimal Huffman lengths (counting-form
    package-merge, C++). Tie-for-tie identical to
    compress.huffman.build_code_lengths; returns None when the library
    is unavailable so the Python implementation stays the fallback."""
    lib = _load()
    if lib is None or not hasattr(lib, "huffman_build_lengths"):
        return None
    f = np.ascontiguousarray(np.asarray(freqs, dtype=np.uint64).reshape(-1))
    out = np.zeros(len(f), np.uint8)
    rc = lib.huffman_build_lengths(
        f.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        len(f), int(max_len),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        return None
    return out


def native_resize_lanczos3(
    arr: np.ndarray,          # [h, w, c] uint8
    sx: np.ndarray, wx: np.ndarray,   # taps from lanczos_taps(w, dst_w)
    sy: np.ndarray, wy: np.ndarray,   # taps from lanczos_taps(h, dst_h)
) -> Optional[np.ndarray]:
    """AVX2 separable Lanczos3, bit-identical to ops/resize_kernels
    resize_lanczos3 (serial f32 accumulation per output element,
    intermediate u8 round/clamp). None if unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "resize_lanczos3_host"):
        return None
    if not hasattr(lib.resize_lanczos3_host, "_configured"):
        u8p = ctypes.POINTER(ctypes.c_uint8)
        i32p = ctypes.POINTER(ctypes.c_int32)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.resize_lanczos3_host.restype = ctypes.c_int32
        lib.resize_lanczos3_host.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
            i32p, f32p, ctypes.c_int32, ctypes.c_int32,
            i32p, f32p, ctypes.c_int32, ctypes.c_int32,
            u8p,
        ]
        lib.resize_lanczos3_host._configured = True
    h, w, c = arr.shape
    dst_w, kx = wx.shape
    dst_h, ky = wy.shape
    arr = np.ascontiguousarray(arr)
    sxc = np.ascontiguousarray(sx.astype(np.int32))
    syc = np.ascontiguousarray(sy.astype(np.int32))
    wxc = np.ascontiguousarray(wx.astype(np.float32))
    wyc = np.ascontiguousarray(wy.astype(np.float32))
    out = np.empty((dst_h, dst_w, c), np.uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    f32p = ctypes.POINTER(ctypes.c_float)
    rc = lib.resize_lanczos3_host(
        _u8(arr.reshape(-1)), h, w, c,
        sxc.ctypes.data_as(i32p), wxc.ctypes.data_as(f32p), kx, dst_w,
        syc.ctypes.data_as(i32p), wyc.ctypes.data_as(f32p), ky, dst_h,
        _u8(out.reshape(-1)),
    )
    if rc != 0:
        return None
    return out


def native_jpeg_decode_scan(
    segments,        # list of bytes (pre-split, unstuffed restart segments)
    restart_interval: int,
    total_mcus: int,
    mcu_cols: int,
    comp_h,
    comp_v,
    dc_specs,   # list of (bits16, vals) per component
    ac_specs,
    coeff_planes,  # list of np.int16 [nblocks, 64] arrays (written in place)
    prev_dc: np.ndarray,  # int32 [ncomp], in/out scratch
) -> bool:
    """Decode every restart segment of a baseline scan in one native
    call (the per-segment ctypes crossing costs ~35 us; a DRI=1 stream
    has thousands of segments)."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_decode_scan"):
        return False
    ncomp = len(comp_h)
    joined = b"".join(segments)
    seg_arr = np.frombuffer(joined, np.uint8) if joined else np.zeros(1, np.uint8)
    seg_off = np.zeros(len(segments) + 1, np.int64)
    np.cumsum([len(s) for s in segments], out=seg_off[1:])
    ch = np.asarray(comp_h, dtype=np.int32)
    cv = np.asarray(comp_v, dtype=np.int32)
    dc_bits = np.concatenate([np.frombuffer(b, np.uint8) for b, _ in dc_specs])
    ac_bits = np.concatenate([np.frombuffer(b, np.uint8) for b, _ in ac_specs])
    dc_vals = np.concatenate(
        [np.frombuffer(v, np.uint8) if v else np.zeros(1, np.uint8) for _, v in dc_specs]
    )
    ac_vals = np.concatenate(
        [np.frombuffer(v, np.uint8) if v else np.zeros(1, np.uint8) for _, v in ac_specs]
    )
    dc_off = np.zeros(ncomp, np.int32)
    ac_off = np.zeros(ncomp, np.int32)
    o = 0
    for i, (_, v) in enumerate(dc_specs):
        dc_off[i] = o
        o += max(len(v), 1)
    o = 0
    for i, (_, v) in enumerate(ac_specs):
        ac_off[i] = o
        o += max(len(v), 1)

    i16p = ctypes.POINTER(ctypes.c_int16)
    planes_arr = (i16p * ncomp)(
        *[p.ctypes.data_as(i16p) for p in coeff_planes]
    )
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    rc = lib.jpeg_decode_scan(
        _u8(seg_arr), seg_off.ctypes.data_as(i64p), len(segments),
        restart_interval, total_mcus, mcu_cols, ncomp,
        ch.ctypes.data_as(i32p), cv.ctypes.data_as(i32p),
        _u8(dc_bits), _u8(dc_vals), dc_off.ctypes.data_as(i32p),
        _u8(ac_bits), _u8(ac_vals), ac_off.ctypes.data_as(i32p),
        planes_arr,
        prev_dc.ctypes.data_as(i32p),
    )
    return rc == 0


def native_jpeg_decode_baseline(
    segments,        # list of bytes (pre-split, unstuffed restart segments)
    restart_interval: int,
    total_mcus: int,
    mcu_cols: int,
    mcu_rows: int,
    comp_h,
    comp_v,
    max_h: int,
    max_v: int,
    width: int,
    height: int,
    dc_specs,        # list of (bits16, vals) per component
    ac_specs,
    qtables_zz,      # list of [64] uint16 zigzag dequant tables
    fancy: bool = False,
):
    """Whole-image fused baseline decode: entropy + IDCT + upsample +
    color in one native call — the decode-side analog of
    jpeg_encode_scan_fused (no [nblocks, 64] int16 coefficient
    round-trip, one ctypes crossing instead of two).

    Returns [H, W, 3] (or [H, W] gray) uint8, or None when the library
    is missing, the geometry declines (caller falls back to the
    two-stage native path, then the Python tiers), or the stream is
    corrupt (the fallback re-decode surfaces the proper error)."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_decode_baseline"):
        return None
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    if not hasattr(lib.jpeg_decode_baseline, "_configured"):
        lib.jpeg_decode_baseline.restype = ctypes.c_int32
        lib.jpeg_decode_baseline.argtypes = [
            u8p, i64p, ctypes.c_int32,                      # segs
            ctypes.c_int64, ctypes.c_int64,                 # ri, total_mcus
            ctypes.c_int32, ctypes.c_int32,                 # mcu_cols/rows
            ctypes.c_int32, i32p, i32p,                     # ncomp, comp_h/v
            ctypes.c_int32, ctypes.c_int32,                 # max_h/v
            ctypes.c_int32, ctypes.c_int32,                 # width, height
            u8p, u8p, i32p,                                 # dc tables
            u8p, u8p, i32p,                                 # ac tables
            u16p, ctypes.c_int32, u8p,                      # qt, fancy, out
        ]
        lib.jpeg_decode_baseline._configured = True
    ncomp = len(comp_h)
    joined = b"".join(segments)
    seg_arr = np.frombuffer(joined, np.uint8) if joined else np.zeros(1, np.uint8)
    seg_off = np.zeros(len(segments) + 1, np.int64)
    np.cumsum([len(s) for s in segments], out=seg_off[1:])
    ch = np.asarray(comp_h, dtype=np.int32)
    cv = np.asarray(comp_v, dtype=np.int32)
    dc_bits = np.concatenate([np.frombuffer(b, np.uint8) for b, _ in dc_specs])
    ac_bits = np.concatenate([np.frombuffer(b, np.uint8) for b, _ in ac_specs])
    dc_vals = np.concatenate(
        [np.frombuffer(v, np.uint8) if v else np.zeros(1, np.uint8) for _, v in dc_specs]
    )
    ac_vals = np.concatenate(
        [np.frombuffer(v, np.uint8) if v else np.zeros(1, np.uint8) for _, v in ac_specs]
    )
    dc_off = np.zeros(ncomp, np.int32)
    ac_off = np.zeros(ncomp, np.int32)
    o = 0
    for i, (_, v) in enumerate(dc_specs):
        dc_off[i] = o
        o += max(len(v), 1)
    o = 0
    for i, (_, v) in enumerate(ac_specs):
        ac_off[i] = o
        o += max(len(v), 1)
    qt = np.ascontiguousarray(
        np.stack([np.asarray(q, np.uint16) for q in qtables_zz])
    )
    out = np.empty((height, width, 3) if ncomp == 3 else (height, width),
                   np.uint8)
    rc = lib.jpeg_decode_baseline(
        _u8(seg_arr), seg_off.ctypes.data_as(i64p), len(segments),
        restart_interval, total_mcus, mcu_cols, mcu_rows, ncomp,
        ch.ctypes.data_as(i32p), cv.ctypes.data_as(i32p),
        max_h, max_v, width, height,
        _u8(dc_bits), _u8(dc_vals), dc_off.ctypes.data_as(i32p),
        _u8(ac_bits), _u8(ac_vals), ac_off.ctypes.data_as(i32p),
        qt.ctypes.data_as(u16p), 1 if fancy else 0, _u8(out),
    )
    if rc != 0:
        return None
    return out


def native_jpeg_prog_dc_segment(
    seg: bytes,
    unit_start: int,
    unit_end: int,
    mcu_cols: int,
    interleaved: bool,
    comp_h,
    comp_v,
    blk_w,
    dc_specs,   # list of (bits16, vals) per scan component, or None if ah>0
    ah: int,
    al: int,
    coeff_planes,  # list of np.int16 [nblocks, 64] arrays (written in place)
    prev_dc: np.ndarray,  # int32 [ns], in/out
) -> bool:
    """Decode one progressive DC entropy segment in place; False if the
    native library is unavailable. Raises nothing — a -1 return (malformed
    stream) surfaces as False from the caller's perspective via
    ``native_error``: the caller treats rc!=0 as InvalidDecode."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_prog_dc_segment"):
        return False
    ns = len(comp_h)
    seg_arr = np.frombuffer(seg, dtype=np.uint8) if seg else np.zeros(1, np.uint8)
    ch = np.asarray(comp_h, dtype=np.int32)
    cv = np.asarray(comp_v, dtype=np.int32)
    bw = np.asarray(blk_w, dtype=np.int32)
    if dc_specs is not None:
        dc_bits = np.concatenate([np.frombuffer(b, np.uint8) for b, _ in dc_specs])
        dc_vals = np.concatenate(
            [np.frombuffer(v, np.uint8) if v else np.zeros(1, np.uint8)
             for _, v in dc_specs])
        dc_off = np.zeros(ns, np.int32)
        o = 0
        for i, (_, v) in enumerate(dc_specs):
            dc_off[i] = o
            o += max(len(v), 1)
    else:  # refinement pass: tables unused
        dc_bits = np.zeros(16 * ns, np.uint8)
        dc_vals = np.zeros(1, np.uint8)
        dc_off = np.zeros(ns, np.int32)

    i16p = ctypes.POINTER(ctypes.c_int16)
    i32p = ctypes.POINTER(ctypes.c_int32)
    planes_arr = (i16p * ns)(*[p.ctypes.data_as(i16p) for p in coeff_planes])
    rc = lib.jpeg_prog_dc_segment(
        _u8(seg_arr), len(seg),
        unit_start, unit_end,
        mcu_cols, 1 if interleaved else 0, ns,
        ch.ctypes.data_as(i32p), cv.ctypes.data_as(i32p), bw.ctypes.data_as(i32p),
        _u8(dc_bits), _u8(dc_vals), dc_off.ctypes.data_as(i32p),
        ah, al,
        planes_arr,
        prev_dc.ctypes.data_as(i32p),
    )
    if rc != 0:
        raise NativeDecodeError("progressive DC segment")
    return True


def native_jpeg_prog_ac_segment(
    seg: bytes,
    unit_start: int,
    unit_end: int,
    stride: int,
    blk_w: int,
    ss: int,
    se: int,
    ah: int,
    al: int,
    ac_spec,  # (bits16, vals)
    plane: np.ndarray,     # int16 [nblocks, 64], written in place
    eobrun: np.ndarray,    # int64 [1], in/out
) -> bool:
    """Decode one progressive AC entropy segment in place; False if the
    native library is unavailable."""
    lib = _load()
    if lib is None or not hasattr(lib, "jpeg_prog_ac_segment"):
        return False
    seg_arr = np.frombuffer(seg, dtype=np.uint8) if seg else np.zeros(1, np.uint8)
    bits, vals = ac_spec
    bits_arr = np.frombuffer(bits, np.uint8)
    vals_arr = np.frombuffer(vals, np.uint8) if vals else np.zeros(1, np.uint8)
    i16p = ctypes.POINTER(ctypes.c_int16)
    rc = lib.jpeg_prog_ac_segment(
        _u8(seg_arr), len(seg),
        unit_start, unit_end,
        stride, blk_w,
        ss, se, ah, al,
        _u8(bits_arr), _u8(vals_arr),
        plane.ctypes.data_as(i16p),
        eobrun.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        raise NativeDecodeError("progressive AC segment")
    return True


class NativeDecodeError(Exception):
    """Malformed entropy stream detected by a native decode segment."""


def native_png_filter(rows, bpp: int, mode: int, sticky: bool):
    """Forward filter [H, RB] uint8 rows -> [H, RB+1] rows with the filter
    id as the leading byte, or None if the native tier is unavailable.

    mode: 0-4 fixed id; 5 adaptive/min-sum; 6 adaptive-fast; 7 bigrams.
    Bit-identical to the device filter bank (tests/test_filter_parity.py).
    """
    lib = _load()
    if lib is None or not hasattr(lib, "png_filter_apply"):
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    height, rb = rows.shape
    out = np.empty((height, rb + 1), dtype=np.uint8)
    rc = lib.png_filter_apply(
        _u8(rows), height, rb, bpp, mode, 1 if sticky else 0, _u8(out)
    )
    if rc != 0:
        return None
    return out


def native_png_unfilter(rows, bpp: int):
    """[H, RB+1] uint8 filtered rows -> [H, RB] reconstructed, or None."""
    lib = _load()
    if lib is None or not hasattr(lib, "png_unfilter"):
        return None
    rows = np.ascontiguousarray(rows, dtype=np.uint8)
    height, rb1 = rows.shape
    out = np.empty((height, rb1 - 1), dtype=np.uint8)
    rc = lib.png_unfilter(_u8(rows), height, rb1 - 1, bpp, _u8(out))
    if rc != 0:
        return None
    return out


def native_palette_expand(samples, lut_rgba, channels: int):
    """Gather a padded 256x4 RGBA LUT over uint8 samples -> [N, channels].

    ``lut_rgba`` must be a [256, 4] uint8 array (3-channel output reads
    the rgb prefix of each row). Returns None when the library is absent.
    """
    lib = _load()
    if lib is None or not hasattr(lib, "png_palette_expand"):
        return None
    samples = np.ascontiguousarray(samples, dtype=np.uint8)
    lut = np.ascontiguousarray(lut_rgba, dtype=np.uint8)
    n = samples.size
    out = np.empty(n * channels, dtype=np.uint8)
    lib.png_palette_expand(_u8(samples), n, _u8(lut), channels, _u8(out))
    return out.reshape(samples.shape + (channels,))


def native_trellis_quantize(
    dct_zz, pattern, lum_q_zz, chrom_q_zz, lambda_=1.0, nthreads=None
):
    """Batched trellis quantization over zigzag DCT blocks; None if no lib.

    Blocks are independent (each writes its own 64-coeff slice), so the
    native side splits them over ``nthreads`` std::threads (GIL released
    during the call) with output identical to the serial path.
    """
    lib = _load()
    if lib is None:
        return None
    dct_zz = np.ascontiguousarray(dct_zz, dtype=np.float32)
    pat = np.asarray(pattern, dtype=np.uint8)
    lum = np.ascontiguousarray(lum_q_zz, dtype=np.float32)
    chrom = np.ascontiguousarray(chrom_q_zz, dtype=np.float32)
    out = np.empty((dct_zz.shape[0], 64), dtype=np.int16)
    if nthreads is None:
        nthreads = min(8, os.cpu_count() or 1)
        # small batches don't amortize thread spawn
        if dct_zz.shape[0] < 2048:
            nthreads = 1

    def f32(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))

    rc = lib.jpeg_trellis_quantize(
        f32(dct_zz), dct_zz.shape[0], _u8(pat), len(pat),
        f32(lum), f32(chrom), ctypes.c_float(lambda_),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        int(nthreads),
    )
    if rc != 0:
        return None
    return out


def native_nearest_palette(colors, palette) -> Optional["np.ndarray"]:
    """[n,4] x [k,4] uint8 -> [n] uint8 argmin redmean index (AVX2)."""
    lib = _load()
    if lib is None or not hasattr(lib, "nearest_palette_batch"):
        return None
    colors = np.ascontiguousarray(colors, np.uint8)
    palette = np.ascontiguousarray(palette, np.uint8)
    out = np.empty(len(colors), np.uint8)
    rc = lib.nearest_palette_batch(
        _u8(colors), len(colors), _u8(palette), len(palette), _u8(out)
    )
    return out if rc == 0 else None


def native_palette_lut(palette) -> Optional["np.ndarray"]:
    """[k,4] uint8 -> 64^3 uint8 opaque 6-6-6 LUT."""
    lib = _load()
    if lib is None or not hasattr(lib, "palette_lut_build"):
        return None
    palette = np.ascontiguousarray(palette, np.uint8)
    out = np.empty(64 * 64 * 64, np.uint8)
    rc = lib.palette_lut_build(_u8(palette), len(palette), _u8(out))
    return out if rc == 0 else None


def native_dither_fs(rgba, width, height, palette, opaque_lut):
    """Floyd-Steinberg dithering in C++ (returns None if lib lacks it)."""
    lib = _load()
    if lib is None or not hasattr(lib, "dither_fs"):
        return None
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    palette = np.ascontiguousarray(palette, dtype=np.uint8)
    opaque_lut = np.ascontiguousarray(opaque_lut, dtype=np.uint8)
    out = np.empty(width * height, dtype=np.uint8)
    rc = lib.dither_fs(
        _u8(rgba), width, height,
        _u8(palette), len(palette),
        _u8(opaque_lut), _u8(out),
    )
    if rc != 0:
        return None
    return out


def native_crc32(data: bytes, crc: int = 0) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    return int(lib.crc32(
        _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)), len(src), crc))


def native_adler32(data: bytes, adler: int = 1) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(data, dtype=np.uint8)
    return int(lib.adler32(
        _u8(src) if len(src) else _u8(np.zeros(1, dtype=np.uint8)), len(src), adler))
