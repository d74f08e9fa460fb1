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

# Coverage gate (make ci): start the sys.monitoring collector BEFORE any
# pixo_tpu import so module-level lines are credited. pytest-cov is not
# installable here (zero-egress); see tests/support/coverage_lite.py.
_cov = None
if os.environ.get("PIXO_TPU_COV") == "1":
    from tests.support import coverage_lite as _coverage_lite

    _cov = _coverage_lite.install()

import jax  # noqa: E402

# The environment's axon TPU plugin injects itself into jax_platforms even
# when JAX_PLATFORMS=cpu is exported; force the CPU backend so tests never
# touch (or block on) the single-chip TPU tunnel.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Single source of truth for fixtures (tests/support/synthetic.rs analog)
from pixo_tpu.utils.synthetic import (  # noqa: E402,F401
    synth_checkerboard,
    synth_gradient,
    synth_noise,
)


@pytest.fixture
def rng():
    return np.random.default_rng(12345)


@pytest.fixture
def gradient_rgb():
    return synth_gradient(64, 64, 3)


@pytest.fixture
def gradient_rgba():
    return synth_gradient(64, 64, 4)


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "tpu: on-chip validation against the real TPU (opt-in: pytest -m tpu; "
        "skips when no healthy chip is reachable)",
    )


def pytest_sessionfinish(session, exitstatus):
    if _cov is not None:
        from tests.support import coverage_lite

        rep = _cov.write_report()
        print("\n" + coverage_lite.summarize(rep))
