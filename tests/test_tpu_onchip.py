"""Real-chip validation behind the opt-in ``tpu`` marker (VERDICT r2 #10).

Run with ``python -m pytest -m tpu tests/test_tpu_onchip.py``.  The test
process itself is pinned to the CPU backend (conftest), so the on-chip
checks run in a SUBPROCESS with the default platform; tolerant of skip
when no TPU is reachable or the tunnel wedges (timeout).

Checks on-chip bit-equality of: the Pallas PNG filter bank, the device
trellis scan, and the device quantization kernels (LUT + wavefront FS
dither) — see tests/support/onchip_checks.py.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

_PAYLOAD = Path(__file__).resolve().parent / "support" / "onchip_checks.py"


@pytest.mark.tpu
def test_onchip_kernel_equality():
    env = dict(os.environ)
    # let the subprocess see the default platform (the axon TPU plugin)
    env.pop("JAX_PLATFORMS", None)
    xla = env.get("XLA_FLAGS", "").replace(
        "--xla_force_host_platform_device_count=8", ""
    ).strip()
    if xla:
        env["XLA_FLAGS"] = xla
    else:
        env.pop("XLA_FLAGS", None)
    try:
        proc = subprocess.run(
            [sys.executable, str(_PAYLOAD)],
            capture_output=True, text=True, timeout=420, env=env,
        )
    except subprocess.TimeoutExpired:
        pytest.skip("TPU tunnel unresponsive (on-chip payload timed out)")
    out = proc.stdout + proc.stderr
    if proc.returncode == 3:
        pytest.skip(f"no TPU device available: {out.strip().splitlines()[-1]}")
    assert proc.returncode == 0, f"on-chip checks failed:\n{out}"
    for name in (
        "pallas-filter", "trellis", "quantize", "pallas-dct", "jpeg-pipeline",
    ):
        assert f"OK {name}" in out, f"missing OK for {name}:\n{out}"
