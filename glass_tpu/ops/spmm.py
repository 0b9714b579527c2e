"""Sparse matrix x dense matrix product (message passing aggregation).

This is the hot loop of every GNN layer (reference: impl/models.py:164
``adj @ x``). Three TPU execution strategies, selected per-graph:

- ``dense``   : ``A @ X`` on the MXU. For the GLASS-scale graphs (<=17k nodes,
                hidden <= 64) a dense matmul at ~200 TFLOP/s beats any sparse
                formulation; the adjacency is built once and lives in HBM.
- ``segment`` : gather sources + ``segment_sum`` into sorted destination rows.
                Scales to graphs whose dense adjacency does not fit; also the
                CPU/testing reference path.
- ``pallas``  : blocked CSR kernel (see glass_tpu/ops/pallas_spmm.py) that
                tiles rows onto the VPU/MXU; used when the dense adjacency is
                too large but edges/s matters.

All strategies produce identical results up to float addition order.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from glass_tpu.ops.graph import Graph


def gather_global(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """Returns globally-indexed node features.

    Unsharded: identity. Sharded (inside shard_map over ``graph.axis``): a
    tiled all-gather over the node-partition axis — the halo exchange. Because
    node blocks are contiguous and only the last is padded, the gathered array
    is directly indexable by global node id.
    """
    if graph.axis is None:
        return x
    return jax.lax.all_gather(x, graph.axis, axis=0, tiled=True)


def spmm_segment(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """out[row_local] += weight * x_global[col] via gather + sorted
    segment-sum.

    Sharded graphs with a halo-overlap split (graph.loc_*) compute the
    own-block contribution from x_local independently of the all-gather, so
    XLA can overlap the collective with the local segment-sum
    (SURVEY.md §2.4 boundary-exchange overlap)."""
    local = None
    if graph.loc_row is not None:
        gathered_l = x[graph.loc_col] * graph.loc_weight[:, None]
        local = jax.ops.segment_sum(
            gathered_l,
            graph.loc_row,
            num_segments=graph.n_node,
            indices_are_sorted=True,
        )
    xg = gather_global(graph, x)
    gathered = xg[graph.col] * graph.weight[:, None]
    out = jax.ops.segment_sum(
        gathered,
        graph.row,
        num_segments=graph.n_node,
        indices_are_sorted=True,
    )
    return out if local is None else out + local


def spmm_ring(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """Sharded SpMM via a ppermute ring instead of an all-gather.

    Remote node blocks stream around the ring one per step; each step's
    ppermute (for block s+1) is issued before the segment-sum over block s,
    so XLA overlaps the ICI transfer with compute. Peak activation memory is
    O(block) per shard versus the all-gather's O(N_global) — the regime that
    matters when K or N grows. Total ICI volume matches the all-gather
    ((K-1)/K x N x H traverses each link either way).

    Requires ring buckets (partition_graph(ring=True)) and the own-block
    split; results are identical to the all-gather path up to float addition
    order."""
    assert graph.ring_row is not None and graph.loc_row is not None
    k = graph.ring_row.shape[0] + 1
    axis = graph.axis
    # own-block contribution: no communication
    local = jax.ops.segment_sum(
        x[graph.loc_col] * graph.loc_weight[:, None],
        graph.loc_row,
        num_segments=graph.n_node,
        indices_are_sorted=True,
    )
    if k == 1:
        return local
    perm = [(j, (j - 1) % k) for j in range(k)]

    def step(buf, bucket):
        r, c, w = bucket
        # issue the NEXT block's transfer before computing on the current one
        nxt = jax.lax.ppermute(buf, axis, perm)
        contrib = jax.ops.segment_sum(
            buf[c] * w[:, None],
            r,
            num_segments=graph.n_node,
            indices_are_sorted=True,
        )
        return nxt, contrib

    # prime: after one permute this shard holds block (shard+1) % K = bucket 0.
    # The last bucket is computed outside the scan so no permute is issued
    # for a buffer nobody reads: K-1 ppermutes total, not K (collectives in
    # the scan body can't be dead-code-eliminated per-step).
    buf = jax.lax.ppermute(x, axis, perm)
    buckets = (graph.ring_row, graph.ring_col, graph.ring_weight)
    buf, contribs = jax.lax.scan(step, buf, tuple(b[:-1] for b in buckets))
    r_l, c_l, w_l = (b[-1] for b in buckets)
    last = jax.ops.segment_sum(
        buf[c_l] * w_l[:, None],
        r_l,
        num_segments=graph.n_node,
        indices_are_sorted=True,
    )
    return local + contribs.sum(axis=0) + last


def spmm_dense(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """out = A @ x on the MXU using the materialized dense adjacency
    (this shard's row block when sharded).

    HIGHEST precision = full-f32 accumulation on the MXU (3/6-pass bf16);
    required for activation parity with the f32 reference, and still far
    faster than any scatter path at these sizes. ``dense_dtype='int8'``
    graphs carry a row-quantized Pallas layout instead of a dense matrix
    (ops/pallas_dense.py) — half bf16's HBM bytes, ~0.3% tolerance.
    """
    if graph.dense is None and graph.dense_q is not None:
        from glass_tpu.ops.pallas_dense import dense_q_spmm

        xg = gather_global(graph, x)
        return dense_q_spmm(graph.dense_q, graph.dense_q_t, xg,
                            jax.default_backend() != "tpu")
    assert graph.dense is not None, "graph was built without a dense adjacency"
    xg = gather_global(graph, x)
    if graph.dense.dtype == jnp.bfloat16:
        # fast mode: one-pass bf16 MXU with f32 accumulation
        return jnp.dot(
            graph.dense,
            xg.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(
        graph.dense,
        xg,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def spmm(graph: Graph, x: jnp.ndarray, mode: Optional[str] = None) -> jnp.ndarray:
    """Computes ``A @ x`` with the normalized adjacency held by ``graph``.

    Args:
      graph: a :class:`Graph`.
      x: (n_node, F) node features.
      mode: "dense" | "segment" | "pallas" | "band" | None (auto: dense if
        available). "pallas" dispatches to whichever block-sparse layout the
        graph materialized: banded slabs (ops/pallas_band.py) when the band
        gate accepted the graph, chunked BCSR otherwise.
    """
    if mode is None:
        has_dense = graph.dense is not None or graph.dense_q is not None
        mode = "dense" if has_dense else "segment"
    if mode == "segment" and graph.ring_row is not None:
        mode = "ring"
    if mode == "dense":
        return spmm_dense(graph, x)
    if mode == "segment":
        return spmm_segment(graph, x)
    if mode == "ring":
        return spmm_ring(graph, x)
    if mode in ("pallas", "band") and graph.axis is not None:
        # sharded: each shard runs the kernel over its local (rows-local,
        # cols-global) block-sparse layout on the gathered features; AD of
        # the all_gather reduce-scatters dx back to the shards. Banded slabs
        # when the partition planner chose them, chunked BCSR otherwise —
        # or BOTH (the hybrid split: A_local = A_band + A_residue, two
        # kernels on one gathered feature matrix).
        if graph.band is not None and graph.bcsr is not None:
            from glass_tpu.ops.pallas_band import spmm_band
            from glass_tpu.ops.pallas_spmm import spmm_pallas

            xg = gather_global(graph, x)
            return spmm_band(graph, xg) + spmm_pallas(graph, xg)
        if graph.band is not None:
            from glass_tpu.ops.pallas_band import spmm_band

            return spmm_band(graph, gather_global(graph, x))
        if mode == "band" or graph.bcsr is None:
            # band was requested but no stacked band layout exists, or no
            # layout at all: the host-side layout cache cannot run on
            # shard_map tracers — fail with the fix, not a
            # TracerArrayConversionError (or a silently-local band product)
            raise ValueError(
                f"sharded --spmm {mode} needs per-shard block-sparse "
                "layouts: build with partition_graph(..., "
                "materialize_bcsr=True"
                + (", sparse_layout='band')" if mode == "band" else ")")
            )
        from glass_tpu.ops.pallas_spmm import spmm_pallas

        return spmm_pallas(graph, gather_global(graph, x))
    if mode == "pallas" and graph.band is not None and graph.bcsr is not None:
        mode = "hybrid"
    elif mode == "pallas" and graph.band is not None:
        mode = "band"
    elif mode == "pallas" and graph.bcsr is None:
        # the auto planner can decline every block-sparse layout (near-dense
        # block patterns route to the dense MXU path; oversized scattered
        # graphs to the segment path) — honor its choice here
        mode = ("dense" if graph.dense is not None
                or graph.dense_q is not None else "segment")
        if mode == "segment":
            return spmm_segment(graph, x)
        return spmm_dense(graph, x)
    if mode == "hybrid":
        # A = A_band + A_outlier (build_graph's hybrid split): two Pallas
        # kernels summed; each part's custom VJP uses its own transposed
        # layout, so dx = A_band^T g + A_outlier^T g = A^T g by linearity.
        from glass_tpu.ops.pallas_band import spmm_band
        from glass_tpu.ops.pallas_spmm import spmm_pallas

        return spmm_band(graph, x) + spmm_pallas(graph, x)
    if mode == "pallas":
        from glass_tpu.ops.pallas_spmm import spmm_pallas

        return spmm_pallas(graph, x)
    if mode == "band":
        from glass_tpu.ops.pallas_band import spmm_band

        return spmm_band(graph, x)
    raise ValueError(f"unknown spmm mode {mode!r}")
