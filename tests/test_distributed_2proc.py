"""Two-process jax.distributed DP training test (CPU backend).

The reference has no distributed training at all (SURVEY.md §2.3); the
north star asks >=80% scaling at >=2 hosts.  This test proves the
multi-PROCESS path end-to-end on one box: two OS processes, each with 2
fake CPU devices, glued by jax.distributed.initialize into a 4-device
global data mesh; the jitted DP step's gradient psum crosses the
process boundary (the DCN analog).  tools/scaling_bench.py reuses the
same worker to measure steps/s vs process count on real pods.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
WORKER = os.path.join(HERE, "distributed_worker.py")
CODEC_WORKER = os.path.join(HERE, "distributed_codec_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.timeout(600)
def test_two_process_dp_step(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(rank), "2", coord, str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = []
    for rank in (0, 1):
        with open(tmp_path / f"rank{rank}.json") as f:
            results.append(json.load(f))
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 4 for r in results)
    # SPMD: both processes observe the identical (replicated) loss
    np.testing.assert_allclose(results[0]["losses"], results[1]["losses"],
                               rtol=1e-6)
    assert all(np.isfinite(l) for l in results[0]["losses"])


@pytest.mark.timeout(600)
def test_two_process_sharded_codec_roundtrip(tmp_path):
    """The sharded CODEC across a process boundary (VERDICT r4 task #6):
    4 fake devices over 2 OS processes form one sp mesh; per-shard rANS
    streams and the GSPMD halo exchanges cross the boundary.  Both
    processes must see a lossless round-trip, byte-identical containers,
    and a tight two-sided coder closure."""
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, CODEC_WORKER, str(rank), "2", coord,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=540)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    results = []
    for rank in (0, 1):
        with open(tmp_path / f"codec_rank{rank}.json") as f:
            results.append(json.load(f))
    assert all(r["process_count"] == 2 for r in results)
    assert all(r["global_devices"] == 4 for r in results)
    assert all(r["shard_blobs"] == 4 for r in results)
    assert all(r["lossless"] for r in results)
    # every process assembled the same container bytes
    assert results[0]["container_sha256"] == results[1]["container_sha256"]
    assert all(abs(r["closure_pct"]) < 5.0 for r in results)
    assert results[0]["ideal_bits"] > 0
