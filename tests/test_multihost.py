"""Multi-host mesh: REAL 2-process jax.distributed CPU simulation.

Drives the ``create_hybrid_device_mesh`` branch of ``make_multihost_mesh``
(parallel/mesh.py) — the ("dcn", "ici") stacking a multi-host v5e pod would
use — by launching two coordinated worker processes, each with 4 forced CPU
devices, and running a cross-host reduction plus one sharded train step
(scripts/multihost_worker.py).  VERDICT round-1 item 6.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "..", "scripts", "multihost_worker.py")


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_hybrid_mesh_train_step():
    coord = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
    # Both processes computed the same global loss.
    losses = sorted(
        line.split("loss=")[1] for out in outs for line in out.splitlines()
        if "MULTIHOST_OK" in line
    )
    assert losses[0] == losses[-1], losses
