"""2-process multi-host execution test (VERDICT r2 task 5).

Round 2's multi-host code paths — ``initialize_distributed`` and the
loader's ``make_array_from_process_local_data`` branch — were guarded by
``process_count() > 1`` and never executed anywhere. This test launches two
REAL processes that handshake over ``jax.distributed`` on localhost (4
virtual CPU devices each), assemble a global batch across processes, and
run one global-mesh train step on a tiny real model.
"""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[1]
WORKER = Path(__file__).parent / "multihost_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_train_step():
    port = _free_port()
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        # Belt and braces alongside the worker's jax_num_cpu_devices config.
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(WORKER), str(pid), "2", str(port)],
            env=env,
            cwd=REPO_ROOT,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multi-host workers timed out\n" + "\n".join(outputs))

    for pid, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"MULTIHOST_OK process={pid}" in out, out
