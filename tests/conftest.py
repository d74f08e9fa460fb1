"""Test harness config: force a virtual 8-device CPU mesh before JAX loads.

Mirrors the multi-chip testing discipline from SURVEY §4: sharding behavior
is validated on a forced-host-device CPU mesh; the real chip only runs the
benchmark path.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The environment's axon TPU plugin injects itself into jax_platforms even
# when JAX_PLATFORMS=cpu is exported; force the CPU backend so tests never
# touch (or block on) the single-chip TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


def synth_gradient(h, w, channels=3):
    """Deterministic gradient fixture (tests/support/synthetic.rs analog)."""
    yy, xx = np.mgrid[0:h, 0:w]
    chans = [
        (xx * 255 // max(w - 1, 1)),
        (yy * 255 // max(h - 1, 1)),
        ((xx + yy) * 255 // max(w + h - 2, 1)),
        np.full((h, w), 255),
    ]
    return np.stack(chans[:channels], axis=-1).astype(np.uint8)


def synth_noise(h, w, channels=3, seed=7):
    r = np.random.default_rng(seed)
    return r.integers(0, 256, (h, w, channels), dtype=np.uint8)


def synth_checkerboard(h, w, channels=3, cell=8):
    yy, xx = np.mgrid[0:h, 0:w]
    base = (((yy // cell) + (xx // cell)) % 2 * 255).astype(np.uint8)
    return np.repeat(base[..., None], channels, axis=-1)


@pytest.fixture
def gradient_rgb():
    return synth_gradient(64, 64, 3)


@pytest.fixture
def gradient_rgba():
    return synth_gradient(64, 64, 4)
