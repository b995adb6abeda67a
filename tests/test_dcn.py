"""Multi-host (DCN tier) smoke test: two OS processes, one global mesh.

Validates the claim in quiver_tpu/parallel/sharded.py:14-15 that multi-host
scale-out is the same SPMD program under ``jax.distributed.initialize`` —
the reference has no multi-process anything (SURVEY.md §2.11/§5.8), so this
is the rebuild's analogue of its concurrency stress tests, at the process
boundary instead of the goroutine boundary.

Two subprocesses each own 4 virtual CPU devices and join an 8-device global
mesh; the sharded exact scan's all_gather top-k merge then crosses the
process boundary (gloo collectives on CPU, DCN on real TPU pods). Each
worker checks the merged result against an f32 oracle (tests/dcn_worker.py).
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dcn_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_mesh_scan():
    coordinator = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own 4-device flag
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # bypass the axon TPU plugin
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, coordinator, str(pid), "2"],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("DCN workers timed out:\n" + "\n".join(outs))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed (rc={p.returncode}):\n{out}"
