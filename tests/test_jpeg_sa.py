"""Successive-approximation progressive JPEG encode conformance.

The max preset emits the reference's fuller SA scan script (dormant
machinery at src/jpeg/progressive.rs:68-96; Ah/Al refinement :141-345)
with libjpeg-correct point-transform semantics. These tests pin the SA
path directly (the small-image goldens can legally fall back to the
7-scan script when it is smaller, so they alone do not exercise SA):

- lossless coefficient transport: an SA stream and the spectral-
  selection 7-scan stream of the SAME quantized coefficients decode to
  identical pixels in our strict decoder;
- independent oracle: Pillow (libjpeg) decodes the SA stream to the
  same pixels as our decoder;
- the SA stream really is successive-approximation (SOS headers carry
  nonzero Al / Ah on the AC scans);
- coverage across 444 / 420 / grayscale and q50 / q85.
"""

import io

import numpy as np
import pytest
from PIL import Image

from pixo_tpu import ColorType, JpegOptions, Subsampling, jpeg
from pixo_tpu.decode import decode_jpeg
from tests.conftest import synth_gradient, synth_noise


def _sos_approx_fields(data: bytes):
    """Yield (ss, se, ah, al) from every SOS header in the stream."""
    i = 2
    out = []
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker == 0xDA:  # SOS
            ln = (data[i + 2] << 8) | data[i + 3]
            ns = data[i + 4]
            p = i + 5 + 2 * ns
            ss, se = data[p], data[p + 1]
            ah, al = data[p + 2] >> 4, data[p + 2] & 0xF
            out.append((ss, se, ah, al))
            i += 2 + ln
        elif marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
        elif marker == 0xD9:
            break
        elif 0xC0 <= marker <= 0xFE:
            ln = (data[i + 2] << 8) | data[i + 3]
            i += 2 + ln
        else:
            i += 1
    return out


def _pillow(data: bytes, mode: str) -> np.ndarray:
    img = Image.open(io.BytesIO(data))
    img.load()
    return np.asarray(img.convert(mode))


# big enough that the <=2048-block small-image fallback cannot replace
# the SA stream (420: 24x24 MCUs = 3456 blocks; 444: 2304x3 = 6912)
W = H = 384


def _content(kind: str, gray: bool):
    if kind == "gradient":
        img = synth_gradient(H, W, 3)
    else:
        img = synth_noise(H, W, 3)
    return img[..., 0].copy() if gray else img


@pytest.mark.parametrize("kind", ["gradient", "noise"])
@pytest.mark.parametrize(
    "sub,gray",
    [(Subsampling.S444, False), (Subsampling.S420, False),
     (Subsampling.S444, True)],
)
@pytest.mark.parametrize("quality", [50, 85])
def test_sa_stream_decodes_like_spectral_stream(kind, sub, gray, quality):
    img = _content(kind, gray)
    base = JpegOptions(
        width=W, height=H, quality=quality, progressive=True,
        optimize_huffman=True, subsampling=sub,
        color_type=ColorType.GRAY if gray else ColorType.RGB,
    )
    sa_stream = jpeg.encode(img, base.replace(progressive_sa=True))
    ss_stream = jpeg.encode(img, base.replace(progressive_sa=False))

    # the SA stream must genuinely refine: some AC scan with Al > 0 and
    # some refinement scan with Ah > 0
    fields = _sos_approx_fields(sa_stream)
    assert any(al > 0 for (ss, se, ah, al) in fields if ss > 0), fields
    assert any(ah > 0 for (ss, se, ah, al) in fields), fields
    # while the spectral-selection script never refines
    assert all(ah == 0 and al == 0 for (_, _, ah, al)
               in _sos_approx_fields(ss_stream))

    ours_sa = decode_jpeg(sa_stream).pixels
    ours_ss = decode_jpeg(ss_stream).pixels
    np.testing.assert_array_equal(ours_sa, ours_ss)

    # Pillow oracle: IDCT implementations legitimately differ by +-1;
    # for 4:2:0 compare with triangle upsampling on our side (Pillow has
    # no nearest mode; our default is nearest for reference parity)
    fancy = sub == Subsampling.S420
    ours_cmp = decode_jpeg(sa_stream, fancy_upsampling=fancy).pixels
    mode = "L" if gray else "RGB"
    pil_sa = _pillow(sa_stream, mode)
    if gray:
        pil_sa = pil_sa.reshape(ours_cmp.shape)
    assert np.abs(ours_cmp.astype(int) - pil_sa.astype(int)).max() <= 1


def test_max_preset_emits_sa_above_small_image_cutoff():
    img = synth_gradient(H, W, 3)
    out = jpeg.encode(img, JpegOptions.max(W, H, 85))
    fields = _sos_approx_fields(out)
    assert any(al > 0 for (ss, se, ah, al) in fields if ss > 0), (
        "max preset above 2048 blocks must ship the SA script"
    )
    # spec-valid: strict decode + Pillow agree (max preset is 4:2:0;
    # compare with matching triangle upsampling, +-1 IDCT tolerance)
    ours = decode_jpeg(out, fancy_upsampling=True).pixels.astype(int)
    assert np.abs(ours - _pillow(out, "RGB").astype(int)).max() <= 1


def test_sa_disabled_keeps_parity_script():
    img = synth_gradient(H, W, 3)
    opts = JpegOptions.max(W, H, 85).replace(progressive_sa=False)
    out = jpeg.encode(img, opts)
    assert all(ah == 0 and al == 0 for (_, _, ah, al)
               in _sos_approx_fields(out))
    ours = decode_jpeg(out, fancy_upsampling=True).pixels.astype(int)
    assert np.abs(ours - _pillow(out, "RGB").astype(int)).max() <= 1
