"""Localhost multi-process distributed test (no hardware needed).

Mirrors the reference's two-fake-nodes-on-one-machine methodology
(README.md:68-72 for SLURM, tpu.sh:61-77 for TPU env vars), using JAX's
explicit coordinator bootstrap on CPU: 2 processes × 2 virtual devices form a
4-chip learner mesh; a PPO update psum-reduces gradients across the process
boundary and both processes must land on identical parameters.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_learner_mesh():
    port = _free_port()
    coordinator = f"localhost:{port}"
    env = {k: v for k, v in os.environ.items() if k != "PALLAS_AXON_POOL_IPS"}
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coordinator, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, err = p.communicate()
            pytest.fail(f"distributed worker timed out; stderr tail: {err[-2000:]}")
        assert p.returncode == 0, f"worker failed: {err[-3000:]}"
        outs.append(out)

    checksums, anakin_checksums = {}, {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("CHECKSUM"):
                _, pid, val = line.split()
                checksums[int(pid)] = float(val)
            if line.startswith("ANAKIN_CHECKSUM"):
                _, pid, val = line.split()
                anakin_checksums[int(pid)] = float(val)
    assert set(checksums) == {0, 1}, f"missing checksums: {outs}"
    assert set(anakin_checksums) == {0, 1}, f"missing anakin checksums: {outs}"
    assert anakin_checksums[0] == anakin_checksums[1], (
        "anakin params diverged across processes"
    )
    assert checksums[0] == pytest.approx(checksums[1], rel=1e-6), checksums
