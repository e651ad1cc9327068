"""Tests for the multi-host wrapper (mst_tpu.parallel.multihost).

Real pods aren't reachable here, but jax.distributed itself is: the
2-process test below spawns two REAL processes on the CPU backend, joins
them through initialize_multihost, and proves a cross-process psum and the
un-mocked corpus partition. The remaining tests pin the deterministic
per-host partition math and the env-var plumbing single-process.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

from mst_tpu.parallel.multihost import (
    initialize_multihost, shard_files_for_host)


def test_two_process_cluster_psum_and_sharding():
    """REAL multi-process run (no mocks): 2 subprocesses form a
    jax.distributed cluster over a local coordinator, each sees
    process_count==2 and 4 global devices, a psum reduces ACROSS processes,
    and shard_files_for_host partitions the corpus disjointly."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    coordinator = f"localhost:{port}"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=2",
               PYTHONPATH=os.pathsep.join(
                   [repo_root, os.environ.get("PYTHONPATH", "")]))
    procs = [subprocess.Popen(
        [sys.executable, worker, coordinator, str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, err[-2000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    for rec in outs:
        assert rec["process_count"] == 2
        assert rec["n_local_devices"] == 2
        assert rec["n_global_devices"] == 4
        # psum across ALL 4 global devices: (0+1) + (100+101)
        assert rec["psum"] == 202.0
    # un-mocked per-host corpus partition: disjoint and exhaustive
    shard0, shard1 = outs[0]["shard"], outs[1]["shard"]
    assert not set(shard0) & set(shard1)
    assert sorted(shard0 + shard1) == [f"song{i}.mid" for i in range(7)]


def test_shard_files_partition_is_exact_and_disjoint():
    files = [f"song{i}.mid" for i in range(13)]
    shards = [shard_files_for_host(files, process_index=i, process_count=4)
              for i in range(4)]
    # every file lands on exactly one host
    combined = sorted(f for s in shards for f in s)
    assert combined == sorted(files)
    # balanced to within one file
    sizes = [len(s) for s in shards]
    assert max(sizes) - min(sizes) <= 1
    # deterministic: same inputs, same shard
    assert shards[2] == shard_files_for_host(files, process_index=2,
                                             process_count=4)


def test_shard_files_defaults_to_this_process():
    files = ["a.mid", "b.mid"]
    # single-process jax: process_index 0 of 1 sees everything, in order
    assert shard_files_for_host(files) == files


def test_initialize_multihost_noop_without_coordinator(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    assert initialize_multihost() is False


def test_initialize_multihost_forwards_args(monkeypatch):
    calls = {}

    def fake_initialize(coordinator_address=None, num_processes=None,
                        process_id=None):
        calls.update(coordinator_address=coordinator_address,
                     num_processes=num_processes, process_id=process_id)

    import jax
    monkeypatch.setattr(jax.distributed, "initialize", fake_initialize)
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    # single-process runtime: process_count stays 1, so the wrapper reports
    # multi-host inactive — but it must have forwarded the coordinator
    assert initialize_multihost(num_processes=2, process_id=1) is False
    assert calls == dict(coordinator_address="10.0.0.1:1234",
                         num_processes=2, process_id=1)
