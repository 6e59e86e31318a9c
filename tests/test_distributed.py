"""2-process jax.distributed test of the multi-host column-sharding path.

The reference is single-process (SURVEY.md section 2.9); the TPU framework
claims multi-host scaling via jax.distributed + shard_columns. This test
actually runs two coordinated CPU processes (4 virtual devices each) and
checks the make_array_from_process_local_data branch end-to-end — see
distributed_worker.py for what each process asserts.
"""
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "distributed_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed():
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)            # worker sets its own device count
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(pid), "2", str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("distributed workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"process {pid}: OK" in out, f"process {pid} output:\n{out}"
