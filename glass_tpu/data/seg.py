"""Segregated-subgraph data preparation for the GNN-seg baseline.

The reference extracts each subgraph as its own small graph
(k_hop_subgraph(hop=0) = the induced subgraph, GNNSeg.py:213-249), batches
them with PyG collation into one merged sparse graph, and pools with an
on-the-fly sparse membership matrix (GNNSeg.py:133-158).

TPU-native formulation: subgraphs are padded to a common width L and batched
as dense per-subgraph adjacencies (S, L, L) plus dense features (S, L, F) and
node-validity masks — message passing is then one batched MXU matmul
(einsum), with zero collation, zero sparse ops and static shapes.

Feature parity (GNNSeg.py:235-241): real-world datasets use one-hot global
degree (datasets.py:30-37 addDegreeFeature), synthetics use all-ones
(datasets.py:39-43 addOneFeature); feature rows are gathered from the *full*
graph features for the subgraph's nodes.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.ops.graph import degrees


@dataclasses.dataclass
class SegData:
    """feats: (S, L, F); adj_norm: (S, L, L) GCN-normalized; adj_sum:
    (S, L, L) unnormalized; mask: (S, L) valid nodes; y: labels."""

    feats: np.ndarray
    adj_norm: np.ndarray
    adj_sum: np.ndarray
    mask: np.ndarray
    y: np.ndarray


def global_features(base: BaseGraphData, kind: str) -> np.ndarray:
    """(N, F) dense features on the full graph."""
    n = base.n_node
    if kind == "one":
        return np.ones((n, 1), dtype=np.float32)
    if kind == "deg":
        deg = degrees(base.edge_index, base.edge_weight, n).astype(np.int64)
        f = np.zeros((n, deg.max() + 1), dtype=np.float32)
        f[np.arange(n), deg] = 1.0
        return f
    raise NotImplementedError(kind)


def segregate(base: BaseGraphData, feature_kind: str) -> dict:
    """Builds SegData for each split. L is the max subgraph size over the
    whole dataset so all splits share one compiled shape."""
    feats_full = global_features(base, feature_kind)
    # adjacency set for induced-edge lookup
    n = base.n_node
    ekeys = set(base.edge_index[0].astype(np.int64) * n + base.edge_index[1].astype(np.int64))

    L = int((base.pos >= 0).sum(axis=1).max())
    out = {}
    for split in ("train", "valid", "test"):
        pos, y = base.get_split(split)
        S = pos.shape[0]
        F = feats_full.shape[1]
        feats = np.zeros((S, L, F), dtype=np.float32)
        adj_n = np.zeros((S, L, L), dtype=np.float32)
        adj_s = np.zeros((S, L, L), dtype=np.float32)
        mask = np.zeros((S, L), dtype=bool)
        for i in range(S):
            nodes = pos[i][pos[i] >= 0]
            k = len(nodes)
            mask[i, :k] = True
            feats[i, :k] = feats_full[nodes]
            # induced edges, relabeled
            local = {int(v): j for j, v in enumerate(nodes)}
            rows, cols = [], []
            for j, v in enumerate(nodes):
                for jj, w in enumerate(nodes):
                    if int(v) * n + int(w) in ekeys:
                        rows.append(j)
                        cols.append(jj)
            if rows:
                adj_s[i, rows, cols] = 1.0
                # PyG gcn_norm without self-loops: D^-1/2 A D^-1/2,
                # 0-degree rows -> 0 (GNNSeg.py:267-268 add_self_loops=False)
                deg = adj_s[i].sum(axis=1)
                dis = np.where(deg > 0, deg, 1.0) ** -0.5
                dis = np.where(deg > 0, dis, 0.0)
                adj_n[i] = dis[:, None] * adj_s[i] * dis[None, :]
        out[split] = SegData(feats=feats, adj_norm=adj_n, adj_sum=adj_s,
                             mask=mask, y=y)
    return out
