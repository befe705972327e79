"""Multi-host / multi-chip work distribution.

The reference's only parallelism is single-process DataParallel
(SURVEY.md §2.3).  Here:

- training: batch sharded over the mesh `data` axis (parallel/mesh.py);
  for multi-host, each process feeds its `host_shard` of the global batch
  and jax.make_array_from_process_local_data assembles the global array.
- evaluation / batch inference: image ids sharded per process
  (`host_shard`), and per host the batched decode path
  (ops.decode.decode_poses_batch) spreads a batch across local chips via
  the same mesh.
"""

from __future__ import annotations

from typing import List, Sequence, TypeVar

import jax

T = TypeVar("T")


def host_shard(items: Sequence[T], process_index: int = None,
               process_count: int = None) -> List[T]:
    """Deterministic contiguous split of a work list across hosts."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    n = len(items)
    per = -(-n // pc)
    return list(items[pi * per:(pi + 1) * per])


def global_batch_from_local(mesh, local_batch):
    """Assemble a global data-sharded array from per-process local data."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    sharding = NamedSharding(mesh, P("data"))
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(sharding, x),
        local_batch)


def merge_result_files(paths: Sequence[str]) -> list:
    """Merge per-host eval results-json files (each host writes
    results.rank{i}.json for its host_shard; host 0 merges and scores)."""
    import json
    merged: list = []
    for p in paths:
        with open(p) as f:
            merged.extend(json.load(f))
    return merged


def sync_hosts(name: str = "barrier") -> None:
    """Cross-host barrier (no-op single-process)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)
