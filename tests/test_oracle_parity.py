"""Byte-identity tests against the REAL pixo encoder (WASM oracle).

The oracle is the reference's prebuilt scalar wasm module
(``web/src/lib/pixo-wasm/pixo_bg.wasm``, built from ``src/wasm.rs``)
executed by the pure-Python interpreter in ``tests/support/wasmvm.py``.
Oracle outputs are cached as committed golden files under
``tests/golden/oracle/`` so CI never runs the interpreter; delete a
golden file to force regeneration (the reference checkout must then be
present at /root/reference).

These tests turn the BASELINE "output bytes identical to pixo"
acceptance bar into an executable fact:

  * JPEG presets 0 (fast) and 1 (balanced = optimize_huffman) are
    byte-identical across 444/420, gray/RGB, odd sizes, noise.
  * PNG parity mode (PIXO_TPU_DEFLATE_PARITY=1) is byte-identical on
    the greedy-ladder presets (0/1) across color types, palette images
    (mZeng order), flat and noise content.
  * resize nearest/bilinear are byte-identical; Lanczos3 is within +-1
    (open divergence, tracked in NOTES.md).
  * JPEG preset 2 and PNG preset 2 divergences are DOCUMENTED choices
    (progressive EOBn bug-fix; optimal-DEFLATE beats zopfli) — the
    structural invariants (equal filtered stream / decodable stream)
    are asserted instead.
"""

import sys
import zlib
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent / "support"))

from pixo_oracle import CACHE_DIR, cached_call  # noqa: E402

from pixo_tpu.native import native_available  # noqa: E402

# PNG byte-identity to the reference runs through the native parity
# DEFLATE mirror (deflate_zlib(parity=True) lives in core.cpp); the
# pure-Python tier falls back to stdlib zlib, which is valid but not
# byte-identical. JPEG identity has a full Python mirror and stays on.
needs_native_deflate = pytest.mark.skipif(
    not native_available(),
    reason="PNG byte-parity requires the native parity DEFLATE",
)

from pixo_tpu import jpeg, png  # noqa: E402
from pixo_tpu.color import ColorType  # noqa: E402
from pixo_tpu.options import (  # noqa: E402
    JpegOptions,
    PngOptions,
    ResizeFilter,
    ResizeOptions,
    Subsampling,
)
from pixo_tpu.resize import resize  # noqa: E402


def _grad(h, w, c=3):
    img = np.zeros((h, w, c), np.uint8)
    img[..., 0] = (np.arange(w)[None, :] * 255 // max(w - 1, 1)).astype(np.uint8)
    if c > 1:
        img[..., 1] = (np.arange(h)[:, None] * 255 // max(h - 1, 1)).astype(
            np.uint8
        )
    if c > 2:
        img[..., 2] = 30
    if c > 3:
        img[..., 3] = 200
    return img


def _noise(h, w, c=3, seed=0):
    return np.random.default_rng(seed).integers(0, 256, (h, w, c), dtype=np.uint8)


def _pal4(h, w, seed=7):
    rng = np.random.default_rng(seed)
    return (
        rng.integers(0, 4, (h, w, 1)) * np.array([[[60, 10, 200]]])
    ).astype(np.uint8)


_PNG_CT = {0: ColorType.GRAY, 1: ColorType.GRAY_ALPHA, 2: ColorType.RGB,
           3: ColorType.RGBA}


# ---------------------------------------------------------------------------
# JPEG byte identity (presets 0/1)
# ---------------------------------------------------------------------------

JPEG_CASES = [
    # (name, image, wasm color code, quality, preset, subsampling_420)
    ("grad16-444-q85-p1", _grad(16, 16), 2, 85, 1, False),
    ("grad16-420-q85-p1", _grad(16, 16), 2, 85, 1, True),
    ("grad16-444-q85-p0", _grad(16, 16), 2, 85, 0, False),
    ("noise17x13-420-q75-p1", _noise(13, 17, seed=42), 2, 75, 1, True),
    ("gray16-q85-p1", _grad(16, 16, 1), 0, 85, 1, False),
    ("noise16-444-q95-p1", _noise(16, 16, seed=3), 2, 95, 1, False),
    ("noise24x8-420-q85-p0", _noise(8, 24, seed=9), 2, 85, 0, True),
]


@pytest.mark.parametrize(
    "name,img,ct,q,preset,sub420", JPEG_CASES, ids=[c[0] for c in JPEG_CASES]
)
def test_jpeg_bytes_identical_to_pixo(name, img, ct, q, preset, sub420):
    h, w = img.shape[:2]
    ref = cached_call("jpeg", img.tobytes(), w, h, ct, q, preset, sub420)
    opts = JpegOptions.from_preset(w, h, q, preset)
    if ct == 0:
        opts.color_type = ColorType.GRAY
    opts.subsampling = Subsampling.S420 if sub420 else Subsampling.S444
    ours = jpeg.encode(img, opts)
    assert bytes(ours) == bytes(ref)


def _bug_split_420(zz, pattern, width, height):
    """The reference's 420 progressive block feed (third emulated bug):
    Y blocks stay in MCU order and keep the MCU padding
    (src/jpeg/mod.rs:1137-1230) instead of the spec's raster-cropped
    non-interleaved order; chroma is unaffected (its grid equals the MCU
    grid)."""
    grouped = zz.reshape(-1, len(pattern), 64)
    return [
        np.ascontiguousarray(grouped[:, :4, :]).reshape(-1, 64),
        np.ascontiguousarray(grouped[:, 4, :]).reshape(-1, 64),
        np.ascontiguousarray(grouped[:, 5, :]).reshape(-1, 64),
    ]


def _encode_preset2_bug_compatible(img, q=85, sub420=False, monkeypatch=None):
    """Re-encode preset 2 exactly as the REFERENCE does, emulating its two
    non-parity behaviors so the output can be byte-compared to the oracle:

      1. tables counted from the BASELINE symbols of the plain-quantized
         (non-trellis) blocks (src/jpeg/mod.rs:684-860 quantize_block with
         no trellis), so EOBn symbols are absent from the DHT;
      2. any symbol missing from a table encodes as code 0, length 4 —
         the reference's get_code_from_table fallback
         (src/jpeg/progressive.rs:378-380).

    Byte equality then PROVES the rest of the preset-2 pipeline is in
    exact parity: the trellis DP (candidates, cost model, tie-breaks),
    the 7-scan script, EOB-run accumulation/flush, refine bit order,
    the depth+1 optimized-table quirk, and the progressive markers."""
    from pixo_tpu.jpeg import markers as mk
    from pixo_tpu.jpeg import progressive
    from pixo_tpu.jpeg.encoder import (
        _count,
        _trellis_coefficients,
        compute_coefficients,
    )
    from pixo_tpu.jpeg.tables import HuffmanTables, QuantizationTables
    from pixo_tpu.ops.blockify import scan_layout

    h, w = img.shape[:2]
    is_gray = img.ndim == 2 or img.shape[2] == 1
    if is_gray and img.ndim == 3:
        img = img[..., 0]
    opts = JpegOptions.from_preset(w, h, q, 2)
    # the reference's script is the 7-scan spectral-selection one; our
    # shipping default is the SA script (beyond-parity, round 4)
    opts = opts.replace(progressive_sa=False)
    if not sub420:
        opts = opts.replace(subsampling=Subsampling.S444)
    if is_gray:
        opts = opts.replace(color_type=ColorType.GRAY)
    quant = QuantizationTables(q)
    color = "gray" if is_gray else "rgb"
    _, _, pattern = scan_layout(w, h, color, "420" if sub420 else "444")
    if sub420:
        # third emulated bug: MCU-ordered, MCU-padded Y block feed
        monkeypatch.setattr(progressive, "split_components",
                            _bug_split_420)
    if is_gray:
        # fourth emulated bug: the reference runs the 3-component scan
        # script on grayscale, emitting SOS headers for components 2/3
        # that the SOF never declared (spec violation; empty scan data).
        # Our gray script drops them.
        monkeypatch.setattr(
            progressive, "get_script",
            lambda o: progressive.simple_progressive_script(),
        )

    plain = compute_coefficients(
        img, opts.replace(trellis_quant=False, progressive=False), quant
    )
    dc_l, dc_c, ac_l, ac_c = _count(plain, pattern, None)
    tables = HuffmanTables.optimized_from_counts(
        dc_l, None if is_gray else dc_c, ac_l, None if is_gray else ac_c,
        optimal=False,
    )
    assert tables is not None

    out = bytearray()
    mk.write_soi(out)
    mk.write_app0(out)
    mk.write_dqt(out, quant)
    mk.write_sof(out, mk.SOF2, w, h, opts.color_type, opts.subsampling)
    mk.write_dht(out, tables)  # spec lists: the true (EOBn-less) tables

    # patch the symbol->code lookups AFTER the DHT: missing -> (0, 4)
    for pre in ("dc_lum", "dc_chrom", "ac_lum", "ac_chrom"):
        codes = getattr(tables, f"{pre}_codes")
        lengths = getattr(tables, f"{pre}_lengths")
        miss = lengths == 0
        codes[miss] = 0
        lengths[miss] = 4

    zz_scan = _trellis_coefficients(img, opts, quant, pattern)
    progressive.encode_progressive(out, zz_scan, pattern, opts, tables)
    mk.write_eoi(out)
    return bytes(out)


@pytest.mark.parametrize("name,img,sub420", [
    ("grad16-444", _grad(16, 16), False),
    ("grad32-444", _grad(32, 32), False),
    ("sparse24x16-444", (_grad(16, 24) // 8) * 8, False),
    ("grad32-420", _grad(32, 32), True),
    ("noise24x24-420", _noise(24, 24, seed=5), True),
    ("gray24", _grad(24, 24, 1), False),
])
def test_jpeg_preset2_bytes_identical_modulo_emulated_bug(
    name, img, sub420, monkeypatch
):
    """Full preset-2 byte identity against the real pixo encoder with its
    progressive bugs EMULATED (EOBn table fallback; 420 MCU-order block
    feed) — positive proof that our trellis DP and progressive scan
    machinery match the reference decision-for-decision (the only
    divergences in shipping output are the deliberate bug fixes)."""
    h, w = img.shape[:2]
    is_gray = img.ndim == 2 or img.shape[2] == 1
    ref = bytes(cached_call("jpeg", img.tobytes(), w, h,
                            0 if is_gray else 2, 85, 2, sub420))
    ours = _encode_preset2_bug_compatible(
        img, sub420=sub420, monkeypatch=monkeypatch
    )
    assert ours == ref


def test_jpeg_preset2_divergence_is_the_reference_eobn_bug():
    """Preset 2 (progressive) bytes differ by design — and this test
    PROVES the reference bug our encoder fixes (progressive.py:11-21):
    the oracle's own preset-2 output emits EOBn codes missing from its
    tables, so (a) a spec-strict decoder rejects it, and (b) lenient
    libjpeg/Pillow reconstructs it with visibly higher error than ours
    on the same source image.  Our stream decodes cleanly everywhere."""
    import io

    from PIL import Image

    from pixo_tpu.decode import decode_jpeg
    from pixo_tpu.errors import PixoError

    img = _grad(16, 16)
    ref = bytes(cached_call("jpeg", img.tobytes(), 16, 16, 2, 85, 2, False))
    opts = JpegOptions.from_preset(16, 16, 85, 2)
    opts.subsampling = Subsampling.S444
    ours = bytes(jpeg.encode(img, opts))

    # our stream: decodable by us and by Pillow, with quantization-level err
    # (+-1 between the two decoders' IDCT implementations is expected)
    our_px = np.asarray(decode_jpeg(ours).pixels).reshape(16, 16, 3)
    pil_ours = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB"))
    assert int(np.abs(our_px.astype(int) - pil_ours.astype(int)).max()) <= 1
    our_err = np.abs(pil_ours.astype(int) - img.astype(int)).mean()

    # reference stream: strict decode rejects; Pillow's lenient decode is
    # measurably worse than ours on the same image
    with pytest.raises(PixoError):
        decode_jpeg(ref)
    pil_ref = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB"))
    ref_err = np.abs(pil_ref.astype(int) - img.astype(int)).mean()
    assert ref_err > our_err


# ---------------------------------------------------------------------------
# PNG byte identity (parity mode, presets 0/1)
# ---------------------------------------------------------------------------

def _mix48():
    rng = np.random.default_rng(123)
    return (
        np.clip(np.arange(48)[None, :, None] * 2 + rng.normal(0, 30, (48, 48, 3)),
                0, 255)
    ).astype(np.uint8)


def _stripes48():
    return np.tile(
        np.random.default_rng(2).integers(0, 256, (1, 48, 3), dtype=np.uint8),
        (48, 1, 1),
    )


def _text48():
    raw = (b"the quick brown fox jumps over the lazy dog. " * 160)[: 48 * 48 * 3]
    return np.frombuffer(raw, np.uint8).reshape(48, 48, 3).copy()


def _geo40():
    rng = np.random.default_rng(5)
    return np.minimum(rng.geometric(0.22, (40, 40, 3)) - 1, 255).astype(np.uint8)


def _tex40():
    rng = np.random.default_rng(5)
    _ = rng.geometric(0.22, (40, 40, 3))  # keep stream position of _geo40 era
    _ = rng.pareto(0.4, (40, 40, 3))
    return (
        np.tile(rng.integers(0, 256, (8, 8, 3)), (5, 5, 1))
        + rng.integers(0, 3, (40, 40, 3))
    ).astype(np.uint8)


PNG_CASES = [
    ("grad16-rgb-p0", _grad(16, 16), 2, 0),
    ("grad16-rgb-p1", _grad(16, 16), 2, 1),
    ("grad16-rgba-p1", _grad(16, 16, 4), 3, 1),
    ("gray16-p1", _grad(16, 16, 1), 0, 1),
    ("ga16-p1", _grad(16, 16, 2), 1, 1),
    ("noise12x9-p0", _noise(9, 12, seed=11), 2, 0),
    ("flat8-p0", np.full((8, 8, 3), 77, np.uint8), 2, 0),
    ("pal16-p1", _pal4(16, 16), 2, 1),
    ("noise20x5-p1", _noise(5, 20, seed=8), 2, 1),
    # stress: dense/skewed histograms, literal-only streams, fixed-vs-
    # dynamic edges, HCLEN framing, the no-split packed path
    ("mix48-p1", _mix48(), 2, 1),
    ("mix48-p0", _mix48(), 2, 0),
    ("noise48-p1", _noise(48, 48, seed=123), 2, 1),
    ("stripes48-p1", _stripes48(), 2, 1),
    ("text48-p1", _text48(), 2, 1),
    ("geo40-p1", _geo40(), 2, 1),
    ("geo40-p0", _geo40(), 2, 0),
    ("tex40-p1", _tex40(), 2, 1),
]


@pytest.mark.parametrize(
    "name,img,ct,preset", PNG_CASES, ids=[c[0] for c in PNG_CASES]
)
@needs_native_deflate
def test_png_bytes_identical_to_pixo(name, img, ct, preset, monkeypatch):
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    h, w = img.shape[:2]
    ref = cached_call("png", img.tobytes(), w, h, ct, preset, False)
    opts = PngOptions.from_preset(w, h, preset)
    opts.color_type = _PNG_CT[ct]
    ours = png.encode(img, opts)
    assert bytes(ours) == bytes(ref)


def _idat(b):
    out, k = b"", 8
    while k < len(b):
        ln = int.from_bytes(b[k : k + 4], "big")
        if b[k + 4 : k + 8] == b"IDAT":
            out += b[k + 8 : k + 8 + ln]
        k += 12 + ln
    return out


def _mix24():
    rng = np.random.default_rng(123)
    return (
        np.clip(np.arange(24)[None, :, None] * 4 + rng.normal(0, 30, (24, 24, 3)),
                0, 255)
    ).astype(np.uint8)


def _text24():
    raw = (b"the quick brown fox jumps over the lazy dog. " * 60)[: 24 * 24 * 3]
    return np.frombuffer(raw, np.uint8).reshape(24, 24, 3).copy()


@pytest.mark.parametrize("name,img,code", [
    ("grad12", _grad(12, 12), 2),
    ("grad20", _grad(20, 20), 2),          # block-split territory
    ("pal16", _pal4(16, 16), 2),           # palette reduction upstream
    ("text24", _text24(), 2),              # match-heavy
    ("mix24", _mix24(), 2),                # mixed entropy, real cost model
    ("noise24", _noise(24, 24, seed=2), 2),  # stored-fallback trigger
    ("noise16", _noise(16, 16, seed=1), 2),
    ("rgba20", _grad(20, 20, 4), 3),       # RGBA path
    ("gray20", _grad(20, 20, 1), 0),       # gray path
    ("noisy_rgba20", _noise(20, 20, 4, seed=6), 3),
])
@needs_native_deflate
def test_png_max_preset_bytes_identical_to_pixo(name, img, code, monkeypatch):
    """FULL preset-2 byte identity (round-3 third block): parity mode now
    mirrors the reference's zopfli-style optimal DEFLATE exactly —
    log2f entropy cost model, cached sublen squeeze DP, statistics
    blending + f32 convergence, coarse-to-fine block splits, stored
    fallback (deflate.rs:270-900, lz77.rs:886-1210) — so the whole PNG
    max output is byte-identical to the reference, closing the last
    open parity divergence. (The default perf path keeps our stronger
    optimal parse, which is never larger.)"""
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    h, w = img.shape[:2]
    ref = bytes(cached_call("png", img.tobytes(), w, h, code, 2, False))
    opts = PngOptions.from_preset(w, h, 2)
    opts.color_type = _PNG_CT[code]
    ours = bytes(png.encode(img, opts))
    assert ours == ref


def test_png_max_preset_perf_path_never_larger(monkeypatch):
    """The default (non-parity) optimal DEFLATE must never lose to the
    reference's on the same filtered stream."""
    monkeypatch.delenv("PIXO_TPU_DEFLATE_PARITY", raising=False)
    img = _grad(12, 12)
    ref = bytes(cached_call("png", img.tobytes(), 12, 12, 2, 2, False))
    opts = PngOptions.from_preset(12, 12, 2)
    opts.color_type = ColorType.RGB
    ours = bytes(png.encode(img, opts))
    assert zlib.decompress(_idat(ref)) == zlib.decompress(_idat(ours))
    assert len(ours) <= len(ref)


# ---------------------------------------------------------------------------
# Resize
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "alg,filt",
    [(0, ResizeFilter.NEAREST), (1, ResizeFilter.BILINEAR)],
    ids=["nearest", "bilinear"],
)
def test_resize_bytes_identical_to_pixo(alg, filt):
    img = _grad(16, 16)
    ref = cached_call("resize", img.tobytes(), 16, 16, 7, 5, 2, alg)
    ours = resize(
        img,
        ResizeOptions(
            src_width=16, src_height=16, dst_width=7, dst_height=5,
            color_type=ColorType.RGB, filter=filt,
        ),
    )
    assert np.asarray(ours).tobytes() == bytes(ref)


@pytest.mark.parametrize(
    "src_dims,dst",
    [
        ((16, 16), (7, 5)),
        ((16, 16), (23, 9)),
        ((48, 32), (12, 8)),   # 4x downscale, wide windows
        ((20, 30), (40, 45)),  # upscale, non-uniform
    ],
    ids=["down", "up", "down4x", "upmix"],
)
def test_resize_lanczos_bytes_identical_to_pixo(src_dims, dst):
    """Lanczos3 byte-identity: the tap scan rounds the f32 accumulator
    in the reference\'s serial order (round-3 fix; previously +-1)."""
    sh, sw = src_dims
    dw, dh = dst
    img = _grad(sh, sw)
    ref = cached_call("resize", img.tobytes(), sw, sh, dw, dh, 2, 2)
    ours = np.asarray(
        resize(
            img,
            ResizeOptions(
                src_width=sw, src_height=sh, dst_width=dw, dst_height=dh,
                color_type=ColorType.RGB, filter=ResizeFilter.LANCZOS3,
            ),
        )
    )
    assert ours.tobytes() == bytes(ref)


def test_goldens_committed():
    """Every oracle golden referenced above must exist on disk so CI
    never needs the interpreter."""
    assert CACHE_DIR.is_dir() and any(CACHE_DIR.iterdir())


@needs_native_deflate
def test_png_lossy_noisy_bytes_identical_to_pixo(monkeypatch):
    """Lossy parity on noisy photographic-class content (dithering does
    real work here: every pixel carries diffused error)."""
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    h = w = 32
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    smooth = np.stack(
        [xx * 255 // 31, yy * 255 // 31, ((xx + yy) * 255 // 62)], axis=-1
    ).astype(np.uint8)
    rng = np.random.default_rng(21)
    noisy = np.clip(
        smooth.astype(int) + rng.integers(-9, 10, (h, w, 3)), 0, 255
    ).astype(np.uint8)
    ref = cached_call("png", noisy.tobytes(), w, h, 2, 1, True)
    opts = PngOptions.from_preset_with_lossless(w, h, 1, lossless=False)
    opts.color_type = ColorType.RGB
    ours = png.encode(noisy, opts)
    assert bytes(ours) == bytes(ref)


@needs_native_deflate
def test_png_lossy_rgba_alpha_bytes_identical_to_pixo(monkeypatch):
    """Alpha-carrying lossy: non-opaque pixels take the direct-redmean
    dither fallback (not the 6-6-6 LUT) and alpha feeds the histogram,
    median-cut 4th channel, and tRNS trim — all byte-identical."""
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    h = w = 32
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    rgba = np.stack(
        [xx * 255 // 31, yy * 255 // 31, ((xx + yy) * 255 // 62),
         np.minimum(255, 60 + xx * 6)], axis=-1
    ).astype(np.uint8)
    ref = cached_call("png", rgba.tobytes(), w, h, 3, 1, True)
    opts = PngOptions.from_preset_with_lossless(w, h, 1, lossless=False)
    opts.color_type = ColorType.RGBA
    ours = png.encode(rgba, opts)
    assert bytes(ours) == bytes(ref)


@needs_native_deflate
def test_png_lossy_bytes_identical_to_pixo(monkeypatch):
    """The WHOLE lossy stack — sampled histogram, median-cut (Rust
    last-max box ties), k-means, 6-6-6 LUT, FS dithering, mZeng reorder,
    indexed encode, parity DEFLATE — byte-identical to the reference.
    (The oracle run for this golden takes ~40 min in the interpreter —
    LUT build is ~1G instructions — so the golden is precious; never
    delete it casually.)"""
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    h = w = 32
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    smooth = np.stack(
        [xx * 255 // 31, yy * 255 // 31, ((xx + yy) * 255 // 62)], axis=-1
    ).astype(np.uint8)
    ref = cached_call("png", smooth.tobytes(), w, h, 2, 1, True)
    opts = PngOptions.from_preset_with_lossless(w, h, 1, lossless=False)
    opts.color_type = ColorType.RGB
    ours = png.encode(smooth, opts)
    assert bytes(ours) == bytes(ref)


def test_jpeg_preset2_reference_corruption_grows_with_scale():
    """At 128x128 the reference's max-preset stream is corrupt in bulk:
    equal size to ours (the wrong EOBn codes are SHORT), strict decode
    fails, and lenient Pillow reconstructs it at >3x our error.  This is
    why the reference's published max sizes cannot be read as a size
    advantage (benches/BENCHMARKS.md round-3 notes)."""
    import io

    from PIL import Image

    from pixo_tpu.decode import decode_jpeg
    from pixo_tpu.errors import PixoError

    rng = np.random.default_rng(13)
    h = w = 128
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.clip(
        np.stack([xx * 2, yy * 2, xx + yy], axis=-1)
        + rng.integers(-12, 13, (h, w, 3)),
        0, 255,
    ).astype(np.uint8)
    ref = bytes(cached_call("jpeg", img.tobytes(), w, h, 2, 85, 2, True))
    ours = bytes(jpeg.encode(img, JpegOptions.from_preset(w, h, 85, 2)))
    assert len(ours) <= len(ref) * 1.01  # size parity
    with pytest.raises(PixoError):
        decode_jpeg(ref)
    pr = np.asarray(Image.open(io.BytesIO(ref)).convert("RGB")).astype(int)
    po = np.asarray(Image.open(io.BytesIO(ours)).convert("RGB")).astype(int)
    assert np.abs(po - img.astype(int)).mean() * 2 < np.abs(
        pr - img.astype(int)
    ).mean()


@pytest.mark.parametrize(
    "name",
    [
        # 1024x540 UI screenshot: palette screen + indexed + mZeng path
        "reference/squoosh_example_palette.png",
        # 740x740 RGBA avatar: truecolor path, alpha opt, full-scale LZ77
        "avatar-color.png",
        # 1376x768 RGB photo: photographic truecolor, adaptive filters
        "rocket.png",
    ],
)
@needs_native_deflate
def test_real_fixture_png_bytes_identical_to_pixo(name, monkeypatch):
    """Flagship byte-parity proofs on the reference's own checked-in
    fixtures at FULL size, balanced preset: every stage exact
    (squoosh_palette 157,293 B; avatar-color 541,043 B)."""
    from pathlib import Path

    fixture = Path("/root/reference/tests/fixtures") / name
    if not fixture.exists():
        pytest.skip("reference fixtures not present")
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    from pixo_tpu.decode import decode_png

    r = decode_png(fixture.read_bytes())
    px = np.asarray(r.pixels).reshape(r.height, r.width, -1)
    code = {1: 0, 2: 1, 3: 2, 4: 3}[px.shape[2]]
    ref = cached_call("png", px.tobytes(), r.width, r.height, code, 1, False)
    opts = PngOptions.from_preset(r.width, r.height, 1)
    opts.color_type = _PNG_CT[code]
    ours = png.encode(px, opts)
    assert bytes(ours) == bytes(ref)


def test_real_fixture_jpeg_bytes_identical_to_pixo():
    """Full-size JPEG proof: browser.jpg (2300x1342) re-encoded q85
    4:2:0 balanced is byte-identical to the real pixo encoder — color
    conversion, 420 MCU averaging, AAN f32 DCT over ~48k blocks,
    quantization, optimized Huffman, and entropy coding all exact at
    3-megapixel scale (334,631 bytes)."""
    from pathlib import Path

    fixture = Path("/root/reference/tests/fixtures/browser.jpg")
    if not fixture.exists():
        pytest.skip("reference fixtures not present")
    from pixo_tpu.decode import decode_jpeg

    r = decode_jpeg(fixture.read_bytes())
    px = np.asarray(r.pixels).reshape(r.height, r.width, 3)
    ref = cached_call(
        "jpeg", px.tobytes(), r.width, r.height, 2, 85, 1, True
    )
    opts = JpegOptions.from_preset(r.width, r.height, 85, 1)
    opts.subsampling = Subsampling.S420
    ours = jpeg.encode(px, opts)
    assert bytes(ours) == bytes(ref)


def _stride_path_image():
    """400x280 RGB (112k px): sampled-histogram stride=2, auto-sample
    stride=5, 3,071 unique colors — auto-quantize fires, the 8192-color
    cap does NOT (its survivor set depends on Rust's unstable-sort tie
    order; see the avatar test below)."""
    h, w = 280, 400
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = np.stack(
        [((xx // 8) * 4) % 256, ((yy // 8) * 6) % 256,
         (((xx + yy) // 16) * 10) % 256], -1,
    ).astype(np.uint8)
    rng = np.random.default_rng(7)
    mask = (xx % 16 == 3) & (yy % 16 == 5)
    img[mask] = np.clip(
        img[mask].astype(int) + rng.integers(-4, 5, (mask.sum(), 3)) * 3,
        0, 255,
    ).astype(np.uint8)
    return img


@needs_native_deflate
def test_png_lossy_stride_path_bytes_identical_to_pixo(monkeypatch):
    """Full-scale lossy byte identity through the >=50k-pixel SAMPLED
    histogram path (VERDICT r3 next #3): 400x280, histogram stride 2,
    auto-heuristic sample stride 5. Proves the stride sampling, count
    scaling, median-cut, k-means, LUT, FS dithering, mZeng and parity
    DEFLATE are exact at scale (reference semantics
    src/png/mod.rs:1505-1560; 37,134 bytes identical)."""
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    img = _stride_path_image()
    h, w = img.shape[:2]
    ref = cached_call("png", img.tobytes(), w, h, 2, 1, True)
    opts = PngOptions.from_preset_with_lossless(w, h, 1, lossless=False)
    opts.color_type = ColorType.RGB
    ours = png.encode(img, opts)
    assert bytes(ours) == bytes(ref)


@needs_native_deflate
def test_png_lossy_avatar_fullsize_divergence_is_cap_tie_order(monkeypatch):
    """avatar-color.png 740x740 lossy (Auto + dither, balanced): the one
    DOCUMENTED lossy divergence at full scale, with its root cause
    pinned by this test.

    The 50k-sample histogram sees 17,854 unique colors, so the
    8192-color cap fires (src/png/mod.rs:1577-1581) — and at the cut
    boundary 14,606 colors tie at count 1 for 4,944 slots. The survivor
    set is decided by Rust 1.88's `sort_unstable_by` (ipnsort) internal
    tie order, which has no stable specification to mirror. Everything
    around it is oracle-exact (the stride-path test above; the 32x32
    lossy tests where the cap cannot fire; lossless avatar at this very
    size). The result is a different-but-equivalent palette: structure
    identical, size within 2.5%, decoded error statistically equal."""
    import zlib as _zlib

    from pathlib import Path

    fixture = Path("/root/reference/tests/fixtures/avatar-color.png")
    if not fixture.exists():
        pytest.skip("reference fixtures not present")
    monkeypatch.setenv("PIXO_TPU_DEFLATE_PARITY", "1")
    from pixo_tpu.decode import decode_png
    from pixo_tpu.png.quantize import _keys_rgba

    r = decode_png(fixture.read_bytes())
    px = np.asarray(r.pixels).reshape(740, 740, 4)

    # pin the root-cause precondition: the cap fires with a huge tie set
    sampled = px.reshape(-1, 4)[:: 547_600 // 50_000]
    uniq, counts = np.unique(_keys_rgba(sampled), return_counts=True)
    assert len(uniq) > 8192
    order = np.sort(counts)[::-1]
    assert order[8191] == order[-1]  # the cut lands inside the tie band

    ref = bytes(cached_call("png", px.tobytes(), 740, 740, 3, 1, True))
    opts = PngOptions.from_preset_with_lossless(740, 740, 1, lossless=False)
    opts.color_type = ColorType.RGBA
    ours = bytes(png.encode(px, opts))

    # same structure: 256-color indexed, identical raw stream length
    def parse(blob):
        pos, chunks = 8, {}
        while pos < len(blob):
            ln = int.from_bytes(blob[pos:pos + 4], "big")
            typ = blob[pos + 4:pos + 8].decode()
            chunks.setdefault(typ, b"")
            chunks[typ] += blob[pos + 8:pos + 8 + ln]
            pos += 12 + ln
        return chunks

    cr, co = parse(ref), parse(ours)
    assert cr["IHDR"] == co["IHDR"]  # same dims / bit depth / color type 3
    assert len(cr["PLTE"]) == len(co["PLTE"]) == 768
    raw_r = _zlib.decompress(cr["IDAT"])
    raw_o = _zlib.decompress(co["IDAT"])
    assert len(raw_r) == len(raw_o)
    assert len(ours) <= len(ref) * 1.025  # 226,061 vs 222,752 (+1.5%)

    # equivalent quality: decode both, compare MSE against the source
    def mse(blob):
        d = decode_png(blob)
        q = np.asarray(d.pixels).reshape(740, 740, -1)[..., :3].astype(float)
        return float(((q - px[..., :3].astype(float)) ** 2).mean())

    assert mse(ours) <= mse(ref) * 1.10


def test_png_lossy_avatar_quoted_settings_vs_oracle_palette():
    """The quoted-settings group-5 column, made executable (VERDICT r4
    task 3): the published comparison row ran BALANCED + Force 256 +
    dithering=false (comparison.rs:1687-1712), a configuration the wasm
    surface cannot express (wasm.rs:78-110 maps lossy=true to
    Auto+dithering). But the reference builds the palette BEFORE
    dithering (median_cut_palette at mod.rs:1616, dithering branch at
    :1621), so the full-size Auto+dither oracle output's PLTE *is* the
    palette its Force-no-dither encode would use. This test extracts
    that palette from the committed oracle golden, remaps no-dither
    through the parity LUT, encodes balanced, and pins our perf-path
    Force-256-no-dither output against it: size within +2%, decoded MSE
    at least as good.

    Measured (this rig): oracle-palette 148,243 B / MSE 7.59; ours
    150,985 B / MSE 6.87. The published 128.5 KiB row is NOT
    reproducible from the reference's own palette through a byte-parity
    balanced encode (-13% below it), so it is recorded as
    stale/unverifiable in benches/BENCHMARKS.md §5."""
    from pixo_tpu import ColorType, PngOptions, png
    from pixo_tpu.decode import decode_png
    from pixo_tpu.options import QuantizationMode, QuantizationOptions
    from pixo_tpu.png import encoder as penc
    from pixo_tpu.png import reduce as _reduce
    from pixo_tpu.png.quantize import PaletteLut

    fixture = Path("/root/reference/tests/fixtures/avatar-color.png")
    if not fixture.exists():
        pytest.skip("reference fixtures not present")
    r = decode_png(fixture.read_bytes())
    px = np.asarray(r.pixels).reshape(740, 740, 4)
    ref = bytes(cached_call("png", px.tobytes(), 740, 740, 3, 1, True))

    pos, plte = 8, None
    while pos < len(ref):
        ln = int.from_bytes(ref[pos:pos + 4], "big")
        if ref[pos + 4:pos + 8] == b"PLTE":
            plte = np.frombuffer(ref[pos + 8:pos + 8 + ln], np.uint8)
            plte = plte.reshape(-1, 3)
        pos += 12 + ln
    assert plte is not None and len(plte) == 256

    pal = np.concatenate([plte, np.full((256, 1), 255, np.uint8)], 1)
    idx = PaletteLut(pal).lookup_many(px.reshape(-1, 4))
    opts = PngOptions.balanced(740, 740)
    opts.color_type = ColorType.RGBA
    alpha = _reduce.maybe_trim_transparency(pal[:, 3])
    oracle_pal_png = penc.encode_indexed(idx, 740, 740, plte, alpha, opts)

    opts2 = PngOptions.balanced(740, 740)
    opts2.color_type = ColorType.RGBA
    opts2.quantization = QuantizationOptions(
        mode=QuantizationMode.FORCE, max_colors=256, dithering=False
    )
    ours = png.encode(px, opts2)

    def mse(blob):
        d = decode_png(bytes(blob))
        q = np.asarray(d.pixels).reshape(740, 740, -1)[..., :3].astype(float)
        return float(((q - px[..., :3].astype(float)) ** 2).mean())

    assert len(ours) <= len(oracle_pal_png) * 1.02
    assert mse(ours) <= mse(oracle_pal_png)
