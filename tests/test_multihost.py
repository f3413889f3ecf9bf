"""Multi-host (2-process) sharded round trip over jax.distributed + Gloo.

Spawns two CPU processes with 4 virtual devices each, forms one global
8-device ('data', 'space') mesh across them, and runs the full sharded
embed->extract->psum'd-BER step with each process feeding only its own
frame slice (the DCN input-sharding contract). SURVEY §2.5 ICI/DCN row;
VERDICT-r2 item 8.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _spawn(pid: int, nproc: int, port: int, space: int):
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PYTHONPATH=str(REPO),
    )
    return subprocess.Popen(
        [sys.executable, "-m", "stegotpu.parallel.distributed",
         "--process-id", str(pid), "--num-processes", str(nproc),
         "--port", str(port), "--space", str(space)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )


@pytest.mark.parametrize("space", [1, 2])
def test_two_process_roundtrip(space):
    port = _free_port()
    procs = [_spawn(pid, 2, port, space) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0 and (
            "UNIMPLEMENTED" in out or "does not support" in out
        ):  # pragma: no cover - environment dependent
            pytest.skip(f"distributed CPU collectives unsupported here: "
                        f"{out.splitlines()[-1]}")
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert "MULTIHOST_OK" in out, out
        assert "errors=0" in out
