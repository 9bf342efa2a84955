"""Real multi-process SPMD test: 2 JAX processes, 2 CPU devices each.

The reference's multi-node path is torchrun + NCCL (torch_utils/distributed.py
:42-74) and is only ever "tested" in production. Here the same topology runs
as an actual test: two OS processes rendezvous through
jax.distributed.initialize (gloo CPU collectives), shard one global batch
between them, and must agree bit-exactly on the train-step losses.
"""

import os
import socket
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_agrees():
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORMS"] = "cpu"
        flags = [f for f in env.get("XLA_FLAGS", "").split()
                 if "xla_force_host_platform_device_count" not in f]
        flags.append("--xla_force_host_platform_device_count=2")
        env["XLA_FLAGS"] = " ".join(flags)
        env["LVG_COORDINATOR"] = f"127.0.0.1:{port}"
        env["LVG_NUM_PROCESSES"] = "2"
        env["LVG_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env, cwd=os.path.dirname(HERE),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))

    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=850)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}"

    checksums = {}
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("CHECKSUM")]
        assert len(lines) == 1, out
        _, pid, *vals = lines[0].split()
        checksums[pid] = tuple(vals)
    assert len(checksums) == 2
    assert checksums["0"] == checksums["1"], checksums
