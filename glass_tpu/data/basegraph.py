"""Host-side dataset container (numpy) and feature initializers.

Counterpart of the reference's BaseGraph (datasets.py:11-100), but pure numpy
on the host: all tensor-library work at data-prep time is plain array code,
and nothing touches the device until a :class:`~glass_tpu.ops.graph.Graph` is
built from it.

Conventions kept from the reference:
- ``pos`` is the padded subgraph-node matrix, pad = -1 (datasets.py:18).
- ``mask[i]`` in {0,1,2} = train/valid/test (datasets.py:20).
- The graph is stored undirected: both edge directions present exactly once
  (datasets.py:68-71 via PyG to_undirected, which coalesces duplicates).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

from glass_tpu.ops.graph import degrees


def undirect(edge_index: np.ndarray) -> np.ndarray:
    """Symmetrize + coalesce an edge list (dedup, sorted) — semantics of PyG
    ``to_undirected`` used at datasets.py:68-71."""
    both = np.concatenate([edge_index, edge_index[::-1]], axis=1)
    pairs = np.unique(both.T, axis=0)
    return pairs.T.copy()


def is_undirected(edge_index: np.ndarray) -> bool:
    fwd = set(map(tuple, edge_index.T.tolist()))
    return all((c, r) in fwd for r, c in edge_index.T.tolist())




def relabel_pos(pos: np.ndarray, perm: np.ndarray, n_node: int) -> np.ndarray:
    """Maps a padded subgraph matrix (pad=-1) into the relabeled node space
    of ``relabel_nodes`` (perm[i] = old id at new position i). Shared with
    the inference CLI so serving and dataset paths cannot diverge."""
    inv = np.empty(n_node, dtype=np.int64)
    inv[perm] = np.arange(n_node)
    return np.where(pos >= 0, inv[np.clip(pos, 0, n_node - 1)], -1)


@dataclasses.dataclass
class BaseGraphData:
    """x: (N, C) int node features (C=1); edge_index: (2, E) undirected;
    edge_weight: (E,); pos: (S, L) padded; y: (S,) or (S, K); mask: (S,)."""

    x: np.ndarray
    edge_index: np.ndarray
    edge_weight: np.ndarray
    pos: np.ndarray
    y: np.ndarray
    mask: np.ndarray

    def __post_init__(self):
        if not is_undirected(self.edge_index):
            self.edge_index = undirect(self.edge_index)
            self.edge_weight = np.ones(self.edge_index.shape[1], dtype=np.float32)

    @property
    def n_node(self) -> int:
        return self.x.shape[0]

    @property
    def binary(self) -> bool:
        """True when the task is binary/multilabel (BCE path) — reference
        picks the loss by label arity (GLASSTest.py:55-71)."""
        return np.unique(self.y).shape[0] == 2

    @property
    def output_channels(self) -> int:
        if self.binary:
            return self.y.shape[1] if self.y.ndim > 1 else 1
        return int(np.unique(self.y).shape[0])

    @property
    def max_deg(self) -> int:
        return int(self.x.max())

    # ------------------------------------------------- feature initializers

    def set_one_feature(self):
        """Homogeneous integer feature (reference: datasets.py:54-56)."""
        self.x = np.ones((self.n_node, 1), dtype=np.int64)

    def set_degree_feature(self, mod: int = 1):
        """Bucketized node degree (reference: datasets.py:45-52): floor-divide
        by mod then re-index by unique value rank."""
        deg = degrees(self.edge_index, self.edge_weight, self.n_node).astype(np.int64)
        deg = deg // mod
        _, inv = np.unique(deg, return_inverse=True)
        self.x = inv.reshape(self.n_node, 1).astype(np.int64)

    def set_node_id_feature(self):
        """Node index as feature — row of a (pretrained) embedding table
        (reference: datasets.py:58-61)."""
        self.x = np.arange(self.n_node, dtype=np.int64).reshape(self.n_node, 1)

    def relabel_nodes(self, perm: np.ndarray) -> None:
        """Applies a node relabeling (perm[i] = old id at new position i) to
        edges, subgraph node sets, and per-node features. Used with the RCM
        ordering (native.rcm_ordering) to concentrate edges near the diagonal
        for the block-sparse SpMM path; predictions are invariant under
        relabeling."""
        n = self.n_node
        inv = np.empty(n, dtype=np.int64)
        inv[perm] = np.arange(n)
        self.edge_index = inv[self.edge_index]
        self.pos = relabel_pos(self.pos, perm, n)
        self.x = self.x[perm]

    # -------------------------------------------------------------- splits

    def get_split(self, split: str) -> Tuple[np.ndarray, np.ndarray]:
        tar = {"train": 0, "valid": 1, "test": 2}[split]
        sel = self.mask == tar
        return self.pos[sel], self.y[sel]

    # ------------------------------------------------------ LP pretraining

    def get_lp_dataset(self, rng: np.random.Generator, use_loop: bool = False):
        """Link-prediction dataset: positive edges + an equal number of
        sampled non-edges, as 2-node "subgraphs" with 0/1 labels
        (reference: datasets.py:73-91 via PyG negative_sampling). With
        ``use_loop``, every node's self-loop pair is appended with label =
        whether that self-loop exists (datasets.py:82-90)."""
        ei = self.edge_index
        n, e = self.n_node, ei.shape[1]

        # native sampler when built (native/glass_host.cpp); numpy fallback
        from glass_tpu import native

        seed = int(rng.integers(0, 2**63 - 1))
        neg_native = None
        try:
            neg_native = native.negative_sample(ei, n, e, seed)
        except RuntimeError:
            neg_native = None  # graph too dense for e non-edges: fall back
        if neg_native is not None:
            pos = np.concatenate([ei, neg_native], axis=1).T
            y = np.concatenate(
                [np.ones(e, dtype=np.float32), np.zeros(e, dtype=np.float32)]
            )
            if use_loop:
                loops = np.stack([np.arange(n)] * 2, axis=1)
                has_loop = np.zeros(n, dtype=np.float32)
                has_loop[ei[0][ei[0] == ei[1]]] = 1.0
                pos = np.concatenate([pos, loops])
                y = np.concatenate([y, has_loop])
            return pos.astype(np.int64), y

        existing = np.unique(ei[0].astype(np.int64) * n + ei[1].astype(np.int64))
        chunks, got, rounds = [], 0, 0
        # vectorized rejection sampling, chunked; dense graphs may not have
        # e non-edges at all (PyG returns fewer in that case too), so cap the
        # rounds and truncate
        while got < e and rounds < 64:
            rounds += 1
            cand = rng.integers(0, n, size=(2, 2 * (e - got)))
            keys = cand[0].astype(np.int64) * n + cand[1].astype(np.int64)
            ok = ~np.isin(keys, existing) & (cand[0] != cand[1])
            keep = cand[:, ok]
            keys = keys[ok]
            # drop duplicate negatives within and across chunks
            _, first = np.unique(keys, return_index=True)
            keep = keep[:, np.sort(first)]
            existing = np.union1d(existing, keys)
            chunks.append(keep)
            got += keep.shape[1]
        neg_edge = np.concatenate(chunks, axis=1)[:, :e]
        n_neg = neg_edge.shape[1]
        pos = np.concatenate([ei, neg_edge], axis=1).T  # (E + n_neg, 2)
        y = np.concatenate([np.ones(e, dtype=np.float32), np.zeros(n_neg, dtype=np.float32)])
        if use_loop:
            loops = np.stack([np.arange(n)] * 2, axis=1)
            has_loop = np.zeros(n, dtype=np.float32)
            has_loop[ei[0][ei[0] == ei[1]]] = 1.0
            pos = np.concatenate([pos, loops])
            y = np.concatenate([y, has_loop])
        return pos.astype(np.int64), y
