"""Device-mesh construction and multi-host bootstrap.

The framework's parallel axes (new design — the reference is single-device,
SURVEY.md §2.4):

- ``graph``: node/edge partition of the background graph (the TP/SP analogue
  for whole-graph message passing); collectives ride ICI within a slice.
- ``data``: subgraph-batch data parallelism (replicated trunk, psum grads).

On a multi-host pod slice, call :func:`initialize_distributed` first (standard
``jax.distributed.initialize``), then build the mesh over all devices.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    cpu_collectives: Optional[str] = None,
    local_cpu_devices: Optional[int] = None,
    **kwargs,
) -> None:
    """Multi-host bootstrap (no-op if already initialized).

    Must run before any computation touches a backend. On a TPU pod slice the
    three coordinator args can all be None (jax autodetects from the TPU
    runtime environment). Off-TPU, ``cpu_collectives`` ("gloo") selects the
    CPU cross-process collectives implementation and pins the cpu platform,
    and ``local_cpu_devices`` sets this process's device count — together they
    form a real multi-process jax cluster on CPUs, which is how
    tests/test_parallel.py exercises this path (2 processes x 2 devices; the
    reference has no multi-host story at all — its whole device handling is
    a CUDA index, GLASSTest.py/impl/config.py).
    """
    if cpu_collectives is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    if local_cpu_devices is not None:
        jax.config.update("jax_num_cpu_devices", local_cpu_devices)
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
            **kwargs,
        )
    except RuntimeError:
        pass  # already initialized


def make_mesh(
    graph_shards: int = 1,
    data_shards: Optional[int] = None,
    devices=None,
) -> Mesh:
    """Builds a ('data', 'graph') mesh.

    Args:
      graph_shards: size of the graph-partition axis.
      data_shards: size of the data axis; default = n_devices // graph_shards.
      devices: explicit device list (default: all).
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if data_shards is None:
        if n % graph_shards:
            raise ValueError(f"{n} devices not divisible by graph_shards={graph_shards}")
        data_shards = n // graph_shards
    if data_shards * graph_shards != n:
        raise ValueError(
            f"data_shards*graph_shards = {data_shards * graph_shards} != {n} devices"
        )
    return Mesh(devices.reshape(data_shards, graph_shards), ("data", "graph"))
