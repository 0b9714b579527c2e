"""The zero-one labeling trick and padded-matrix <-> batch-vector utilities.

``max_zero_one`` is GLASS's core data transform (reference: impl/utils.py:32-45
MaxZOZ): given the padded node-set matrix of the subgraphs in the current
batch, every node that appears in *any* of them gets label z=1, all other
nodes z=0 ("max" because membership in >=1 queried subgraph wins for the whole
batch). It runs *inside jit* each step as a scatter-max — O(B*L) with B*L a
few hundred — so labels never cross the host boundary.

``pad2batch``/``batch2pad`` are host-side numpy conveniences kept for API
parity (reference: impl/utils.py:5-29); the on-device compute path never needs
them because pooling consumes the padded matrix directly (ops.segment).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def max_zero_one(pos: jnp.ndarray, n_node: int) -> jnp.ndarray:
    """Zero-one node labels for one subgraph batch.

    Args:
      pos: (B, L) padded subgraph node matrix, pad = -1.
      n_node: number of nodes in the background graph.

    Returns:
      (n_node,) int32 vector with 1 on nodes covered by the batch.
    """
    mask = pos >= 0
    safe = jnp.where(mask, pos, 0).ravel()
    vals = mask.astype(jnp.int32).ravel()
    # scatter-max: padding entries write max(z[0], 0) which is a no-op.
    return jnp.zeros(n_node, dtype=jnp.int32).at[safe].max(vals)


def max_zero_one_local(pos: jnp.ndarray, n_local: int, offset) -> jnp.ndarray:
    """Zero-one labels restricted to a node block [offset, offset + n_local).

    The sharded counterpart of :func:`max_zero_one` for node-partitioned
    training: each shard labels only the nodes it owns. Taking the pmax over a
    data-parallel axis afterwards reproduces the reference's whole-batch
    "max" semantics across device sub-batches.
    """
    idx = pos - offset
    valid = (pos >= 0) & (idx >= 0) & (idx < n_local)
    safe = jnp.where(valid, idx, 0).ravel()
    vals = valid.astype(jnp.int32).ravel()
    return jnp.zeros(n_local, dtype=jnp.int32).at[safe].max(vals)


def pad2batch(pad: np.ndarray):
    """[[0,2,3],[1,4,5],[6,7,-1]] -> batch [0,0,0,1,1,1,2,2], pos [0,2,3,...]."""
    pad = np.asarray(pad)
    batch = np.repeat(np.arange(pad.shape[0]), pad.shape[1])
    pos = pad.ravel()
    idx = pos >= 0
    return batch[idx], pos[idx]


def batch2pad(batch: np.ndarray) -> np.ndarray:
    """batch [0,1,0,0,1,1,2,2] -> pad [[0,2,3],[1,4,5],[6,7,-1]]."""
    batch = np.asarray(batch)
    uni = np.unique(batch)
    uni = uni[uni >= 0]
    idx = np.arange(batch.shape[0])
    groups = [idx[batch == u] for u in uni]
    width = max((len(g) for g in groups), default=0)
    out = np.full((len(groups), width), -1, dtype=np.int64)
    for i, g in enumerate(groups):
        out[i, : len(g)] = g
    return out
