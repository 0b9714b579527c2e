"""Host-side graph partitioning for the 'graph' mesh axis.

Nodes are split into K contiguous blocks of size ceil(N/K); block k owns
global nodes [k*nb, (k+1)*nb) (the last block is padded). Each shard receives
every directed edge whose *destination* lies in its block, with the row index
localized and the column kept global (columns index the all-gathered feature
matrix — see ops.spmm.gather_global). Per-shard edge lists are padded to a
common bucket so the stacked arrays are rectangular for shard_map.

This is a 1-D row partition — the simplest layout whose halo exchange is a
single tiled all-gather per layer. Locality-aware orderings (RCM etc.) can be
applied upstream by relabeling nodes before building the partition.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np
import jax.numpy as jnp

from glass_tpu.ops.graph import Graph, normalized_edge_weight


@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Stacked per-shard arrays, leading dim = K shards (shard_map operand)."""

    row: np.ndarray  # (K, E_shard) local destination rows
    col: np.ndarray  # (K, E_shard) global source columns
    weight: np.ndarray  # (K, E_shard)
    dense: Optional[np.ndarray]  # (K, nb, K*nb) row-blocks of dense adjacency
    n_shards: int
    block: int  # nodes per shard (padded)
    n_node: int  # real global node count
    n_edge: int  # real global directed edge count
    aggr: str

    def local_graph(self, row, col, weight, dense, axis: str) -> Graph:
        """Builds the shard-local Graph *inside* shard_map from this shard's
        slices (each arrives with a leading dim of 1)."""
        return Graph(
            row=row.reshape(-1),
            col=col.reshape(-1),
            weight=weight.reshape(-1),
            dense=None if dense is None else dense.reshape(self.block, -1),
            n_node=self.block,
            n_edge=self.n_edge,
            aggr=self.aggr,
            axis=axis,
            n_node_global=self.n_node,
        )

    def pad_nodes(self, x: np.ndarray) -> np.ndarray:
        """Pads a (N, ...) per-node array to (K*block, ...) for sharding."""
        pad = self.n_shards * self.block - x.shape[0]
        if pad == 0:
            return x
        widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
        return np.pad(x, widths)


def partition_graph(
    edge_index: np.ndarray,
    edge_weight: Optional[np.ndarray],
    n_node: int,
    aggr: str,
    n_shards: int,
    *,
    materialize_dense: bool = False,
    edge_bucket: int = 256,
) -> PartitionedGraph:
    """Partitions a COO edge list into K destination-row blocks.

    Normalization (degree computation) happens *globally* before the split so
    each shard's weights are identical to the unsharded graph's.
    """
    edge_index = np.asarray(edge_index)
    n_edge = edge_index.shape[1]
    if edge_weight is None:
        edge_weight = np.ones(n_edge, dtype=np.float32)
    w = normalized_edge_weight(edge_index, edge_weight, n_node, aggr)

    row = edge_index[0].astype(np.int64)
    col = edge_index[1].astype(np.int64)
    order = np.lexsort((col, row))
    row, col, w = row[order], col[order], w[order]

    nb = -(-n_node // n_shards)  # block size
    shard_of = row // nb
    counts = np.bincount(shard_of, minlength=n_shards)
    e_shard = max(edge_bucket, int(-(-counts.max() // edge_bucket) * edge_bucket))

    rows = np.zeros((n_shards, e_shard), dtype=np.int32)
    cols = np.zeros((n_shards, e_shard), dtype=np.int32)
    ws = np.zeros((n_shards, e_shard), dtype=np.float32)
    for k in range(n_shards):
        sel = shard_of == k
        c = int(counts[k])
        rows[k, :c] = (row[sel] - k * nb).astype(np.int32)
        cols[k, :c] = col[sel].astype(np.int32)
        ws[k, :c] = w[sel]
        # padding edges: local row nb-1, col 0, weight 0 (inert, sorted-safe)
        rows[k, c:] = nb - 1
        cols[k, c:] = 0

    dense = None
    if materialize_dense:
        n_pad = n_shards * nb
        dense = np.zeros((n_shards, nb, n_pad), dtype=np.float32)
        for k in range(n_shards):
            sel = shard_of == k
            np.add.at(dense[k], (row[sel] - k * nb, col[sel]), w[sel])

    return PartitionedGraph(
        row=rows, col=cols, weight=ws, dense=dense,
        n_shards=n_shards, block=nb, n_node=n_node, n_edge=n_edge, aggr=aggr,
    )
