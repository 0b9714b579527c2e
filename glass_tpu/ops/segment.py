"""Subgraph pooling as dense masked gather-reduce.

The reference pools node embeddings into subgraph embeddings by converting the
padded subgraph matrix into (batch, pos) index vectors with dynamic boolean
indexing and then scatter-reducing (reference: impl/utils.py:18-29 pad2batch,
impl/models.py:275-319 pools). Dynamic shapes and scatters are both hostile to
XLA on TPU, so we instead keep the padded (B, L) matrix and do a *dense*
gather into (B, L, F) followed by a masked reduction over L. For GLASS-scale
subgraphs (L <= 150) this is a handful of VPU ops with zero scatter traffic
and fully static shapes.

Padding rows that are entirely -1 (used to right-pad eval batches) pool to 0
and are sliced off on the host.

Pool semantics (parity with reference impl/models.py:295-319):
  sum  : sum_i x_i
  mean : sum_i x_i / |S|
  max  : max_i x_i
  size : sum_i x_i / sqrt(|S|)   (GraphSizeNorm then add-pool)
"""

from __future__ import annotations

import jax.numpy as jnp

POOL_KINDS = ("sum", "mean", "max", "size")


def pool_subgraphs(emb: jnp.ndarray, pos: jnp.ndarray, kind: str) -> jnp.ndarray:
    """Pools node embeddings over padded subgraph node sets.

    Args:
      emb: (N, F) node embeddings.
      pos: (B, L) int array of node indices, padded with -1.
      kind: one of POOL_KINDS.

    Returns:
      (B, F) subgraph embeddings.
    """
    mask = pos >= 0  # (B, L)
    safe = jnp.where(mask, pos, 0)
    g = emb[safe]  # (B, L, F) dense gather
    m = mask[..., None].astype(emb.dtype)
    if kind == "sum":
        return (g * m).sum(axis=1)
    if kind == "mean":
        cnt = m.sum(axis=1)
        return (g * m).sum(axis=1) / jnp.maximum(cnt, 1.0)
    if kind == "max":
        neg = jnp.where(mask[..., None], g, -jnp.inf)
        out = neg.max(axis=1)
        # all-padding rows (eval batch padding) -> 0 instead of -inf
        any_valid = mask.any(axis=1, keepdims=True)
        return jnp.where(any_valid, out, 0.0)
    if kind == "size":
        cnt = m.sum(axis=1)
        return (g * m).sum(axis=1) / jnp.sqrt(jnp.maximum(cnt, 1.0))
    raise ValueError(f"unknown pool kind {kind!r}")


def mean_over_nodes(emb: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """Plain mean over a fixed-width (unpadded) node index matrix.

    Used by the link-prediction pretraining head, which averages the two edge
    endpoint embeddings (reference: impl/models.py:501-504).
    """
    return emb[pos].mean(axis=1)
