"""Multi-process (DCN-analog) batch sharding — VERDICT r3 next #6.

The reference's only comm backend is rayon within one process; SURVEY
§2.8 maps the TPU equivalent to ICI collectives within a host plus DCN
for multi-host batch sharding. Single-process mesh coverage lives in
tests/test_parallel.py; this suite covers the MULTI-PROCESS half on one
machine: two OS processes x four forced-host CPU devices form one
8-device global mesh via ``jax.distributed`` (the same code path a real
multi-host TPU pod uses over DCN), shard a batch, run the device JPEG
coefficient pipeline under one pjit, and prove the sharded output is
byte-identical to single-process encoding — plus one replicated
collective that must cross the process boundary.

Spawns subprocesses (tests/support/dcn_payload.py); skips if the
distributed runtime cannot come up in this environment.
"""

import socket
import subprocess
import sys
from pathlib import Path

import pytest

_PAYLOAD = Path(__file__).resolve().parent / "support" / "dcn_payload.py"


@pytest.mark.dcn
def test_two_process_batch_sharding_byte_identical():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = [
        subprocess.Popen(
            [sys.executable, str(_PAYLOAD), str(i), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.skip("jax.distributed runtime did not come up in time")
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"DCN-OK {i}" in out, f"process {i} missing OK:\n{out}"
