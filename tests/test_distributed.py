"""Multi-process (DCN-path) test: two JAX processes, one global 8-device
mesh, sharded mapping with cross-process ESDF halo exchange.

This is the multi-host machinery (jax.distributed + a global Mesh) running
on CPU devices — on real hardware the identical code spans TPU hosts with
the halo ppermute riding DCN at host boundaries (SURVEY.md §5.8)."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_sharded_mapping():
    port = _free_port()
    coordinator = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["PYTHONPATH"] = str(REPO) + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("JAX_PLATFORMS", None)  # worker forces cpu via jax.config
    workers = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tools" / "distributed_worker.py"),
             coordinator, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for pid in range(2)
    ]
    outs = []
    try:
        for w in workers:
            out, _ = w.communicate(timeout=800)
            outs.append(out)
    finally:
        for w in workers:
            if w.poll() is None:
                w.kill()
    for pid, (w, out) in enumerate(zip(workers, outs)):
        assert w.returncode == 0, f"worker {pid} failed:\n{out[-4000:]}"
        assert f"WORKER{pid} OK" in out
    # Both processes computed identical global scalars (replicated outputs):
    # the sharded-ESDF checksum and the gathered-submap fused-map checksum.
    for key in ("resolved=", "fused="):
        line0 = [l for l in outs[0].splitlines() if key in l][0]
        line1 = [l for l in outs[1].splitlines() if key in l][0]
        assert line0.split(key)[1] == line1.split(key)[1], key
