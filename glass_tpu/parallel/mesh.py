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


def initialize_distributed(**kwargs) -> None:
    """Multi-host bootstrap (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
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
