"""Multi-host (multi-controller) decode: 2 processes x 4 virtual CPU
devices, global 8-device mesh, host-local ingest/drain, cluster-wide
stats reduction (BASELINE config 5 in miniature)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

HERE = Path(__file__).parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_decode():
    port = _free_port()
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(HERE / "multihost_worker.py"),
             str(rank), f"127.0.0.1:{port}"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, cwd=str(HERE.parent))
        for rank in range(2)
    ]
    outs = []
    for rank, p in enumerate(procs):
        out, _ = p.communicate(timeout=220)
        outs.append(out)
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-2000:]}"
    assert "RANK0_OK" in outs[0] and "total=16" in outs[0]
    assert "RANK1_OK" in outs[1] and "total=16" in outs[1]
