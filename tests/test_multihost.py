"""Single-process tests for the multi-host wrapper (mst_tpu.parallel.multihost).

Real pods aren't reachable here; these pin the deterministic per-host corpus
partition and the no-op/env-var plumbing of initialize_multihost.
"""

import os

import pytest

from mst_tpu.parallel.multihost import (
    initialize_multihost, shard_files_for_host)


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
