"""SDDMM — sampled dense-dense matrix multiplication.

Computes per-edge scores ``out[e] = <x[row[e]], y[col[e]]>`` — the companion
kernel to SpMM in any GNN framework (edge attention / gated message passing;
named alongside SpMM in this repo's north star). GLASS itself never scores
edges, so this exists as framework capability, with the same two TPU
strategies as SpMM:

- ``gather``: two row gathers + a lane reduction (general, CPU-friendly);
- ``dense``: compute ``X @ Y^T`` on the MXU and gather the edge entries —
  wins at GLASS scale for the same reason dense SpMM does (TPU gathers are
  slow, MXU is not), as long as N^2 scores fit.

Also provides ``segment_softmax`` over destination rows, the normalization an
attention conv needs.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from glass_tpu.ops.graph import Graph


def sddmm_gather(graph: Graph, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(E_pad,) edge scores via row gathers."""
    return (x[graph.row] * y[graph.col]).sum(axis=-1)


def sddmm_dense(graph: Graph, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """(E_pad,) edge scores via a full MXU X @ Y^T followed by edge gather."""
    scores = jnp.dot(
        x, y.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return scores[graph.row, graph.col]


def sddmm(graph: Graph, x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
          mode: Optional[str] = None) -> jnp.ndarray:
    """Edge scores for the graph's (padded) edge list; padding edges get a
    score too — mask with ``graph.weight != 0`` if needed.

    Args:
      graph: the graph (row/col define which pairs are sampled).
      x: (N, F) destination-side features.
      y: (N, F) source-side features (default: x).
      mode: "dense" | "gather" | None (auto: dense when N is small).
    """
    if y is None:
        y = x
    if mode is None:
        mode = "dense" if graph.n_node <= 4096 else "gather"
    if mode == "dense":
        return sddmm_dense(graph, x, y)
    if mode == "gather":
        return sddmm_gather(graph, x, y)
    raise ValueError(f"unknown sddmm mode {mode!r}")


def segment_softmax(graph: Graph, scores: jnp.ndarray) -> jnp.ndarray:
    """Softmax of edge scores over each destination row (attention weights).

    Padding edges (weight == 0) are excluded and receive weight 0.
    """
    valid = graph.weight != 0
    neg_inf = jnp.finfo(scores.dtype).min
    masked = jnp.where(valid, scores, neg_inf)
    row_max = jax.ops.segment_max(
        masked, graph.row, num_segments=graph.n_node, indices_are_sorted=True
    )
    ex = jnp.where(valid, jnp.exp(masked - row_max[graph.row]), 0.0)
    denom = jax.ops.segment_sum(
        ex, graph.row, num_segments=graph.n_node, indices_are_sorted=True
    )
    return ex / jnp.maximum(denom[graph.row], 1e-16)
