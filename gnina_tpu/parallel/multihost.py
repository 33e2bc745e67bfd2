"""Multi-host (multi-process) scale-out for virtual screens.

The reference is single-node (SURVEY.md "Parallelism": worker threads over
a ligand queue).  The TPU-pod equivalent maps hosts to slices of the
ligand stream (DCN-free: docking needs no cross-ligand communication) and
uses `jax.distributed` only for initialization, barriers, and end-of-run
statistics aggregation:

  - every process calls :func:`init` (coordinator rendezvous; no-op for a
    single process), then builds the SAME global mesh over
    ``jax.devices()`` — each host drives its local chips, XLA rides ICI
    inside a slice and DCN across slices only if a sharding demands it
    (docking shardings never do);
  - the ligand stream is partitioned round-robin per host
    (:func:`host_shard`), preserving per-ligand seeds so a multi-host
    screen scores identically to a single-host screen of the same file;
  - each host writes ``{out}.part{pid}`` and process 0 merges them after
    a barrier (:func:`merge_part_outputs`) — shared-filesystem layout,
    the standard pod setup;
  - pose-count/energy statistics aggregate with
    ``multihost_utils.process_allgather`` (the only collective).

Env contract (set by the launcher, e.g. one process per host):
  GNINA_TPU_COORDINATOR=host0:8476  GNINA_TPU_NPROCS=4  GNINA_TPU_PROCID=0
"""

from __future__ import annotations

import os
from typing import Iterable, Iterator, List, Optional, Tuple, TypeVar

T = TypeVar("T")

_initialized = False


def env_config() -> Tuple[Optional[str], int, int]:
    """(coordinator, num_processes, process_id) from the environment."""
    coord = os.environ.get("GNINA_TPU_COORDINATOR")
    nprocs = int(os.environ.get("GNINA_TPU_NPROCS", "1"))
    pid = int(os.environ.get("GNINA_TPU_PROCID", "0"))
    return coord, nprocs, pid


def init(coordinator: Optional[str] = None, num_processes: int = 1,
         process_id: int = 0) -> bool:
    """jax.distributed.initialize rendezvous; returns True if a multi-host
    runtime was actually initialized (single process -> no-op False)."""
    global _initialized
    if num_processes <= 1:
        return False
    if _initialized:
        return True
    import jax

    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def host_shard(items: Iterable[T], process_id: int,
               num_processes: int) -> Iterator[Tuple[int, T]]:
    """Round-robin slice of an (index, item) stream for this host.

    Yields (global_index, item) so per-ligand seeds and output ordering
    stay identical to a single-host run of the same file.
    """
    for i, it in enumerate(items):
        if i % num_processes == process_id:
            yield i, it


def barrier(name: str = "gnina_tpu") -> None:
    if not _initialized:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def allgather_scalars(values: List[float]) -> List[float]:
    """Gather a per-host list of floats across hosts (process 0 ordering);
    single-process: identity."""
    if not _initialized:
        return list(values)
    import numpy as np
    from jax.experimental import multihost_utils

    arr = np.asarray(values, np.float32)
    out = multihost_utils.process_allgather(arr)
    return [float(v) for v in np.asarray(out).reshape(-1)]


def part_path(out: str, process_id: int) -> str:
    return f"{out}.part{process_id}"


def merge_part_outputs(out: str, num_processes: int,
                       block_index_prefix: str = "#GNINA_TPU_IDX ") -> int:
    """Merge per-host ``{out}.part{pid}`` files into ``out`` in global
    ligand order.  Each part file holds blocks introduced by an index
    header line (the screen checkpoint format).  Returns #blocks merged.

    Call from process 0 after :func:`barrier`; shared filesystem assumed
    (document per-host local disks as unsupported).
    """
    blocks = {}
    for pid in range(num_processes):
        path = part_path(out, pid)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            idx = None
            buf: List[str] = []
            for line in f:
                if line.startswith(block_index_prefix):
                    if idx is not None:
                        blocks[idx] = "".join(buf)
                    idx = int(line[len(block_index_prefix):].split()[0])
                    buf = []
                else:
                    buf.append(line)
            if idx is not None:
                blocks[idx] = "".join(buf)
    with open(out, "w") as f:
        for idx in sorted(blocks):
            f.write(blocks[idx])
    return len(blocks)
