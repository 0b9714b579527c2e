"""Static-shape graph container and normalized-adjacency construction.

TPU-first design notes
----------------------
XLA traces and compiles once per shape, so the graph is held in *static*
shapes: the edge list is padded up to a bucket size with zero-weight edges
(harmless under segment-sum and dense SpMM alike). Edges are stored as
sorted-COO (sorted by destination row) so ``jax.ops.segment_sum`` can use the
``indices_are_sorted`` fast path, and so a CSR ``row_ptr`` can be derived for
blocked Pallas kernels.

For graphs that fit, we additionally materialize the *dense* normalized
adjacency once at build time: on TPU a dense ``A @ X`` runs on the 128x128 MXU
systolic array and for the graph sizes in the GLASS benchmark suite
(5k-17k nodes) it beats any gather/scatter formulation by a wide margin.
This mirrors the reference's build-once-cache-forever adjacency
(reference: impl/models.py:83-111 buildAdj, impl/models.py:154-156 caching),
but the normalization itself is computed host-side in numpy at dataset-prep
time — it is data preparation, not model compute.

Normalization semantics (parity with reference impl/models.py:83-111):
  deg[i]   = sum_j w[i, j]           (row sums of the weighted adjacency)
  deg[deg < 0.5] += 1                (isolated-node guard)
  mean     : w'_ij = w_ij / deg[i]
  sum      : w'_ij = w_ij
  gcn      : w'_ij = deg[i]^-1/2 * w_ij * deg[j]^-1/2
and the matvec convention is out[row] += w' * x[col] (i.e. ``A @ x`` with
edge_index[0] the row).
"""

from __future__ import annotations

from typing import Optional

import functools

import numpy as np
import jax.numpy as jnp
from flax import struct

# Edge padding bucket. Rounding the edge count up to a multiple of this keeps
# the number of distinct compiled programs small when graphs change.
EDGE_BUCKET = 1024

# Default max node count for which the dense MXU SpMM path is materialized
# (n^2 float32 <= ~256 MiB at 8192).
DENSE_NODE_LIMIT = 8192

# 128x128 block edge shared by the Pallas layouts (the single definition
# lives in ops/_pallas_common.py; pallas_band/pallas_spmm import it too).
from glass_tpu.ops._pallas_common import BLOCK as BCSR_BLOCK


@struct.dataclass
class Graph:
    """An immutable, static-shape graph ready for on-device message passing.

    Attributes:
      row:    (E_pad,) int32, destination node of each directed edge, ascending.
              When sharded (``axis`` set), these are *local* row indices in
              [0, n_node) of this shard's node block.
      col:    (E_pad,) int32, source node of each directed edge. Always
              *global* node ids (they index the all-gathered features when
              sharded).
      weight: (E_pad,) float32, normalized edge weight; 0.0 on padding edges.
      dense:  optional (n_node, n_node_global) float32 dense normalized
              adjacency (dense[row, col] = weight) for the MXU SpMM path;
              when sharded this is the shard's row-block of the global matrix.
      n_node: static (local) node count. Unsharded graphs are not padded —
              GraphNorm statistics are taken over all nodes of the big graph,
              so padding nodes would poison them; XLA handles
              non-multiple-of-128 dims internally. Sharded graphs pad the
              *last* block (see parallel/partition.py) and mask it out of
              statistics via ``node_mask``.
      n_edge: static real (unpadded) directed edge count (this shard's).
      aggr:   which normalization was applied ("mean" | "sum" | "gcn").
      axis:   mesh axis name this graph is node-partitioned over, or None.
      n_node_global: static global node count (== n_node when unsharded).

    Sharding model (the "tensor parallelism" of this domain — SURVEY.md §2.4):
    nodes are partitioned into contiguous equal blocks of size n_node =
    ceil(N / K) (only the last block carries padding, so global ids are
    preserved); each shard owns its block's rows and all edges *into* them.
    Per layer, features are all-gathered over ``axis`` (halo exchange) and the
    local segment-sum/dense SpMM produces the owned rows.
    """

    row: jnp.ndarray
    col: jnp.ndarray
    weight: jnp.ndarray
    dense: Optional[jnp.ndarray]
    n_node: int = struct.field(pytree_node=False)
    n_edge: int = struct.field(pytree_node=False)
    aggr: str = struct.field(pytree_node=False, default="sum")
    axis: Optional[str] = struct.field(pytree_node=False, default=None)
    n_node_global: int = struct.field(pytree_node=False, default=0)
    # Optional block-sparse layouts for the Pallas BCSR kernel (built
    # host-side in build_graph; see ops/pallas_spmm.py). ``bcsr`` is the
    # forward A layout; ``bcsr_t`` the transposed layout for the backward
    # pass dx = A^T @ g — the SAME array objects when A is symmetric
    # (undirected 'sum'/'gcn'), so sharing costs no memory.
    bcsr: Optional[object] = None  # ops.pallas_spmm.BCSR
    bcsr_t: Optional[object] = None  # ops.pallas_spmm.BCSR
    # Optional banded-slab layouts (ops/pallas_band.py) — materialized instead
    # of BCSR when the graph's diagonal band is dense enough (RCM-ordered
    # real-world graphs); ``band_t`` is the transposed layout for backward.
    band: Optional[object] = None  # ops.pallas_band.BandedAdj
    band_t: Optional[object] = None  # ops.pallas_band.BandedAdj
    # Optional int8 row-quantized dense adjacency (ops/pallas_dense.py) —
    # replaces ``dense`` when dense_dtype == "int8" and the graph sits in
    # the dense-MXU regime (the real-world datasets' home); ``dense_q_t``
    # is the transposed layout for backward, the SAME object when A is
    # symmetric.
    dense_q: Optional[object] = None  # ops.pallas_dense.DenseQ
    dense_q_t: Optional[object] = None  # ops.pallas_dense.DenseQ
    # Optional halo-overlap split (sharded graphs): edges whose source lies in
    # this shard's own block, with *local* column ids. When present, the
    # sharded SpMM computes this part from x_local while the all-gather of
    # remote features is in flight (XLA overlaps the independent collective),
    # and row/col/weight hold only the off-block edges.
    loc_row: Optional[jnp.ndarray] = None
    loc_col: Optional[jnp.ndarray] = None
    loc_weight: Optional[jnp.ndarray] = None
    # Optional ppermute-ring halo buckets (sharded graphs): bucket s holds
    # this shard's edges whose source lies in node block (shard + s + 1) % K,
    # with column ids local to that source block. When present, the sharded
    # SpMM streams remote blocks around the ring (one ppermute per step,
    # overlapped with the previous step's segment-sum) instead of
    # materializing the full all-gathered feature matrix — O(block) rather
    # than O(N_global) activation memory per shard.
    ring_row: Optional[jnp.ndarray] = None  # (K-1, E_ring)
    ring_col: Optional[jnp.ndarray] = None  # (K-1, E_ring)
    ring_weight: Optional[jnp.ndarray] = None  # (K-1, E_ring)

    @property
    def n_global(self) -> int:
        """Global node count (valid for sharded and unsharded graphs)."""
        return self.n_node_global if self.axis is not None else self.n_node

    def node_offset(self) -> jnp.ndarray:
        """This shard's first global node id (traced; 0 when unsharded)."""
        if self.axis is None:
            return jnp.int32(0)
        import jax

        return jax.lax.axis_index(self.axis).astype(jnp.int32) * self.n_node

    def node_mask(self) -> Optional[jnp.ndarray]:
        """(n_node,) bool marking real (non-padding) rows; None if all real."""
        if self.axis is None:
            return None
        ids = self.node_offset() + jnp.arange(self.n_node, dtype=jnp.int32)
        return ids < self.n_node_global


def normalized_edge_weight(
    edge_index: np.ndarray,
    edge_weight: np.ndarray,
    n_node: int,
    aggr: str,
) -> np.ndarray:
    """Host-side computation of the normalized edge weights (see module doc)."""
    row, col = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    w = np.asarray(edge_weight, dtype=np.float64)
    deg = np.bincount(row, weights=w, minlength=n_node)
    deg[deg < 0.5] += 1.0
    if aggr == "mean":
        return (w / deg[row]).astype(np.float32)
    if aggr == "sum":
        return w.astype(np.float32)
    if aggr == "gcn":
        dinv = deg**-0.5
        return (dinv[row] * w * dinv[col]).astype(np.float32)
    raise NotImplementedError(f"unknown aggr {aggr!r}")


def build_graph(
    edge_index: np.ndarray,
    edge_weight: Optional[np.ndarray],
    n_node: int,
    aggr: str = "sum",
    *,
    materialize_dense: Optional[bool] = None,
    edge_bucket: int = EDGE_BUCKET,
    dense_dtype: str = "f32",
    materialize_bcsr: bool = False,
    add_self_loops: bool = False,
    sparse_layout: str = "auto",
    band_rps: Optional[int] = None,
) -> Graph:
    """Builds a :class:`Graph` from a host-side COO edge list.

    Args:
      edge_index: (2, E) integer array; edge_index[0] = destination rows.
      edge_weight: (E,) weights or None for all-ones.
      n_node: number of nodes.
      aggr: normalization ("mean" | "sum" | "gcn").
      materialize_dense: force/forbid the dense adjacency; default: auto
        (n_node <= DENSE_NODE_LIMIT).
      edge_bucket: pad E up to a multiple of this.
      dense_dtype: "f32" (exact, parity mode) or "bf16" (half the HBM traffic
        on the MXU SpMM; adjacency weights rounded to ~0.4% relative).
      materialize_bcsr: build a block-sparse layout for the Pallas SpMM
        kernels; with sparse_layout="auto" the banded-slab layout
        (ops/pallas_band.py) is chosen when the graph's diagonal band is
        dense enough, chunked BCSR otherwise.
      sparse_layout: "auto" | "bcsr" | "band" | "hybrid" — which block-sparse
        layout to materialize (only with materialize_bcsr=True). "hybrid"
        splits A = A_band + A_outlier: banded slabs over per-group best
        windows plus chunked BCSR for the out-of-window residue (requires a
        pattern-symmetric adjacency); "auto" scores all three with the
        measured cost model.
      band_rps: rows-per-step for the banded layout (None = auto per the
        VMEM/inflation gate).
    """
    edge_index = np.asarray(edge_index)
    if add_self_loops:
        # PyG-GCNConv-default semantics: append weight-1 self loops before
        # normalizing (the reference's pretraining default conv,
        # impl/models.py:416 / GNNEmb.py:84-94 substrate).
        loops = np.stack([np.arange(n_node)] * 2)
        edge_index = np.concatenate([edge_index, loops], axis=1)
        if edge_weight is not None:
            edge_weight = np.concatenate(
                [np.asarray(edge_weight), np.ones(n_node, dtype=np.float32)]
            )
    n_edge = edge_index.shape[1]

    # Native fast path: sort + normalize in C++ (native/glass_host.cpp),
    # numerically identical to the numpy code below.
    from glass_tpu import native

    csr = native.build_csr(edge_index, edge_weight, n_node, aggr)
    if csr is not None:
        row = csr[0].astype(np.int64)
        col = csr[1].astype(np.int64)
        w = csr[2]
    else:
        if edge_weight is None:
            edge_weight = np.ones(n_edge, dtype=np.float32)
        w = normalized_edge_weight(edge_index, edge_weight, n_node, aggr)
        # Sort by (row, col) for the segment-sum fast path and CSR derivation.
        row, col = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
        order = np.lexsort((col, row))
        row, col, w = row[order], col[order], w[order]

    # Pad with zero-weight self-referential edges on the last node: they are
    # sorted-order-preserving and contribute exactly 0 to every aggregation.
    e_pad = max(edge_bucket, -(-n_edge // edge_bucket) * edge_bucket)
    pad = e_pad - n_edge
    if pad:
        row = np.concatenate([row, np.full(pad, n_node - 1, dtype=np.int64)])
        col = np.concatenate([col, np.full(pad, n_node - 1, dtype=np.int64)])
        w = np.concatenate([w, np.zeros(pad, dtype=np.float32)])

    if materialize_dense is None:
        materialize_dense = n_node <= DENSE_NODE_LIMIT
    dense = dense_q = dense_q_t = None

    def _dense_layout():
        """(dense, dense_q, dense_q_t) for the MXU path at the requested
        dtype. int8 builds the row-quantized Pallas layout
        (ops/pallas_dense.py) instead of a dense jnp matrix — half the HBM
        bytes of bf16 in the regime the real-world datasets occupy."""
        d = np.zeros((n_node, n_node), dtype=np.float32)
        # duplicate (row, col) pairs accumulate, matching sparse-COO semantics
        np.add.at(d, (row[:n_edge], col[:n_edge]), w[:n_edge])
        if dense_dtype == "int8":
            from glass_tpu.ops.pallas_dense import build_dense_q, dense_q_vmem_ok
            from glass_tpu.ops.pallas_spmm import coo_is_symmetric

            if dense_q_vmem_ok(n_node, n_node):
                dq = build_dense_q(d)
                sym = coo_is_symmetric(
                    np.asarray(row[:n_edge]), np.asarray(col[:n_edge]),
                    np.asarray(w[:n_edge]))
                return None, dq, (dq if sym else build_dense_q(d.T))
        dj = jnp.asarray(d)
        if dense_dtype in ("bf16", "int8"):  # int8 infeasible -> bf16
            dj = dj.astype(jnp.bfloat16)
        return dj, None, None

    if materialize_dense:
        dense, dense_q, dense_q_t = _dense_layout()

    bcsr = bcsr_t = band = band_t = None
    if materialize_bcsr:
        from glass_tpu.ops.pallas_spmm import build_bcsr, coo_is_symmetric
        from glass_tpu.ops import pallas_band

        # "int8" applies only to affine band slabs (per-row dequant scales,
        # ops/pallas_band.py); every other layout quietly runs bf16 — the
        # next-fastest mode — so one flag serves mixed-layout graphs.
        bdtype = {"f32": "float32", "int8": "bfloat16"}.get(
            dense_dtype, "bfloat16")
        want_int8 = dense_dtype == "int8"
        r_, c_, w_ = row[:n_edge], col[:n_edge], w[:n_edge]
        r_np, c_np, w_np = np.asarray(r_), np.asarray(c_), np.asarray(w_)
        symmetric = coo_is_symmetric(r_np, c_np, w_np)
        pat_sym = symmetric or coo_is_symmetric(
            r_np, c_np, (w_np != 0).astype(np.float32)
        )
        kind, rps, wb, _costs = _plan_block_sparse(
            r_np, c_np, w_np, n_node, dense_dtype, band_rps, sparse_layout,
            pat_sym, with_costs=True,
        )
        if sparse_layout == "auto" and band_rps is None:
            # score the dense-MXU and segment paths against the chosen
            # block-sparse layout: near-dense block patterns (real-world
            # hpo/ppi-scale graphs) degenerate BCSR into a bloated dense
            # matrix, and very large scattered graphs can exceed memory in
            # any materialized layout — in which case the segment path is
            # the honest answer.
            itemsize_d = 4 if dense_dtype == "f32" else 2
            _, _, stream_bps = _cost_constants()
            sparse_best = min(_costs.values()) if _costs else float("inf")
            # int8 halves the dense path's streamed/stored bytes again (the
            # row-quantized Pallas layout, ops/pallas_dense.py)
            dense_bytes = n_node * n_node * (
                1 if dense_dtype == "int8" else itemsize_d)
            dense_cost = (
                dense_bytes / stream_bps
                + 2.0 * n_node * n_node * 128 / _MXU_FLOPS[
                    "f32" if dense_dtype == "f32" else "bf16"]
            )
            seg_cost = n_edge * 2 * (16 + 128 * 4) / _GATHER_BPS
            # HBM cap: a chosen layout whose stored blocks exceed the cap is
            # disqualified regardless of modeled time (the cost model values
            # time, not memory — a 1%-dense 40k-node graph "wins" on time
            # with a >6 GiB layout that starves activations)
            stored_bytes = 0
            if kind == "bcsr":
                bid = (r_np // BCSR_BLOCK) * (-(-n_node // BCSR_BLOCK)) \
                    + c_np // BCSR_BLOCK
                n_blk = np.unique(bid[w_np != 0]).size
                stored_bytes = n_blk * BCSR_BLOCK * BCSR_BLOCK * (
                    1 if dense_dtype == "int8" else itemsize_d)
            elif kind == "band":
                keep_m = w_np != 0
                wb_full, _, nbytes_b, _ = pallas_band.band_stats(
                    r_np[keep_m], c_np[keep_m], np.ones(int(keep_m.sum())),
                    n_node, rps,
                )
                # TRUE stored bytes (1 for int8): the cap guards MEMORY —
                # unlike the ranking model, which deliberately prices int8
                # streams at bf16 bytes (round-4 time-model decision)
                stored_bytes = nbytes_b * (
                    (1 if dense_dtype == "int8" else itemsize_d) / 4)
            elif kind == "hybrid":
                # band-part slabs + outlier BCSR blocks, so a hybrid winner
                # is held to the same HBM cap as the single layouts
                itemsize_h = 1 if dense_dtype == "int8" else itemsize_d
                n_cb_h = -(-n_node // BCSR_BLOCK)
                n_g_h = -(-n_cb_h // rps)
                band_bytes = (
                    n_g_h * rps * BCSR_BLOCK * wb * BCSR_BLOCK * itemsize_h
                )
                keep_m = w_np != 0
                _, in_b = pallas_band.plan_windows(
                    r_np[keep_m], c_np[keep_m], w_np[keep_m], n_node, rps, wb
                )
                ro = r_np[keep_m][~in_b]
                co = c_np[keep_m][~in_b]
                n_blk_o = np.unique(
                    (ro // BCSR_BLOCK) * n_cb_h + co // BCSR_BLOCK
                ).size
                stored_bytes = band_bytes + (
                    n_blk_o * BCSR_BLOCK * BCSR_BLOCK * itemsize_h
                )
            if stored_bytes > _layout_bytes_cap():
                sparse_best = float("inf")
            if dense_bytes > _DENSE_MXU_BYTES_CAP:
                dense_cost = float("inf")
            if dense_cost < min(sparse_best, seg_cost):
                kind = "dense"
            elif seg_cost < min(sparse_best, dense_cost):
                kind = "segment"
        if kind == "dense" and not materialize_dense:
            dense, dense_q, dense_q_t = _dense_layout()
        if kind == "band" and not symmetric:
            # The band VJP needs a banded A^T, so the transposed layout must
            # fit VMEM too — else BCSR both ways. Plan the transpose with
            # "auto" (not forced "band", which always returns band and made
            # this fallback dead): an auto plan only returns band when a
            # VMEM-feasible window exists and wins the cost model.
            kind_t, rps_t, _ = _plan_block_sparse(
                c_np, r_np, w_np, n_node, dense_dtype, band_rps,
                "auto" if sparse_layout == "auto" else "band",
                pat_sym,
            )
            if kind_t != "band":
                kind = "bcsr"
        if kind == "band":
            itemsize_b = 4 if dense_dtype == "f32" else 2

            def _maybe_affine(rr, cc, ww, rps_, span):
                """Affine (block-DIA) law when its byte inflation over the
                per-group windows stays under 1.5x: the static affine kernel
                runs 2 DMAs per multi-group step instead of 1+ per group,
                which the measured per-DMA fixed cost (~1.3 us; see
                RESULTS.md round 3) makes worth up to ~1.5x extra bytes.
                ``span``: one precomputed rowblock_spans pass serves both
                the fit and the per-group width below (36M-edge builds
                spent ~24 s in this function's two edge passes)."""
                fit = pallas_band.affine_fit(rr, cc, ww, n_node, rps_,
                                             rb_span=span)
                if fit is None:
                    return None
                _, _, w_aff = fit
                wb_pg, _, _, _ = pallas_band.band_stats(
                    rr, cc, np.ones_like(rr), n_node, rps_, rb_span=span
                )
                if w_aff <= max(wb_pg + 1, int(1.5 * wb_pg)) and \
                        pallas_band.band_vmem_ok(rps_, w_aff, 128, itemsize_b):
                    return fit
                return None

            keep_b = w_np != 0
            span_f = pallas_band.rowblock_spans(
                r_np[keep_b], c_np[keep_b], n_node)
            aff = _maybe_affine(r_, c_, w_, rps, span_f)
            # int8 is layout-independent since round 4 (affine kernels
            # dequant in-VMEM; per-group kernels dequant the output rows)
            bdt = "int8" if want_int8 else bdtype
            band = pallas_band.build_band(r_, c_, w_, n_node, rps,
                                          dtype=bdt, affine=aff)
            if symmetric:
                band_t = band
            else:
                span_t = pallas_band.rowblock_spans(
                    c_np[keep_b], r_np[keep_b], n_node)
                aff_t = _maybe_affine(c_, r_, w_, rps_t, span_t)
                band_t = pallas_band.build_band(
                    c_, r_, w_, n_node, rps_t, dtype=bdt, affine=aff_t
                )
        elif kind == "hybrid":
            # split A = A_band + A_outlier; the split is symmetrized (an edge
            # is in-band only if its mirror is too), so the same clo window
            # table serves the transposed layouts and — when the weights are
            # symmetric — the transposed layouts ARE the forward ones.
            clo, in_band = pallas_band.plan_windows(
                r_np, c_np, w_np, n_node, rps, wb
            )
            o1 = np.lexsort((c_np, r_np))
            o2 = np.lexsort((r_np, c_np))
            sym = in_band.copy()
            sym[o1] &= in_band[o2]  # (r,c) mirrored at same rank (pat_sym)
            out = (w_np != 0) & ~sym
            # both hybrid parts honor int8 since round 4 (per-group band
            # kernels dequant the output rows; the add composes)
            hyb_dt = "int8" if want_int8 else bdtype
            band = pallas_band.build_band(
                r_np[sym], c_np[sym], w_np[sym], n_node, rps, dtype=hyb_dt,
                window=(wb, clo),
            )
            band_t = band if symmetric else pallas_band.build_band(
                c_np[sym], r_np[sym], w_np[sym], n_node, rps, dtype=hyb_dt,
                window=(wb, clo),
            )
            bcsr = build_bcsr(r_np[out], c_np[out], w_np[out], n_node,
                              dtype=hyb_dt)
            bcsr_t = bcsr if symmetric else build_bcsr(
                c_np[out], r_np[out], w_np[out], n_node, dtype=hyb_dt
            )
        elif kind == "bcsr":
            # int8 BCSR: per-row dequant scales inside the layout (the
            # transposed layout quantizes per ITS rows = A's columns, so
            # forward and backward each carry their own exact scales)
            bcsr_dt = "int8" if want_int8 else bdtype
            bcsr = build_bcsr(r_, c_, w_, n_node, dtype=bcsr_dt)
            bcsr_t = bcsr if symmetric else build_bcsr(
                c_, r_, w_, n_node, dtype=bcsr_dt
            )
        # else kind in ("dense", "segment"): no block-sparse layout —
        # spmm() dispatches to the dense MXU matmul / gather-segment path

    return Graph(
        row=jnp.asarray(row, dtype=jnp.int32),
        col=jnp.asarray(col, dtype=jnp.int32),
        weight=jnp.asarray(w),
        dense=dense,
        n_node=int(n_node),
        n_edge=int(n_edge),
        aggr=aggr,
        bcsr=bcsr,
        bcsr_t=bcsr_t,
        band=band,
        band_t=band_t,
        dense_q=dense_q,
        dense_q_t=dense_q_t,
    )


# Block-sparse layout planner constants (see _plan_block_sparse). The cost
# model constants are fitted to TPU v5e measurements of the kernels at
# em_user scale (9M edges, windows 3-10 blocks): band per-grid-step fixed
# cost ~1.5 us, chunked-BCSR per-step ~4 us (one CHUNK of 8 blocks per
# step), effective DMA stream ~150 GB/s — they rank layout choices;
# absolute values need not be exact. For other TPU generations, fit them on
# the actual chip with tools/autotune.py and point GLASS_TPU_AUTOTUNE at
# the produced JSON (explicit opt-in so planning stays deterministic).
_BAND_STEP_COST_S = 1.5e-6
_BCSR_STEP_COST_S = 4.0e-6
_BAND_STREAM_BPS = 150e9

# Dense-MXU planner candidate (mid-scale unstructured graphs): when the
# block-sparse layouts degenerate — e.g. a ~1.5%-dense 14.6k-node graph
# whose 128x128 BCSR blocks are nearly all occupied, so "BCSR" stores ~a
# full dense matrix plus bookkeeping — a plain dense matmul on the MXU is
# both smaller and faster. Modeled as stream time + MXU time; capped so a
# planner mistake can never eat the HBM (v5e: 16 GiB).
_DENSE_MXU_BYTES_CAP = 2 << 30  # 2 GiB adjacency
_LAYOUT_BYTES_CAP = 4 << 30  # max stored block-sparse layout (one direction)


def _layout_bytes_cap() -> int:
    """GLASS_TPU_LAYOUT_BYTES_CAP_GIB overrides the 4 GiB default — the
    round-5 max-scale ladder hits this cap (planner falls to the segment
    path) well before the chip's HBM does; raising it is safe while
    2 x cap + 6·n·hidden·4 stays under the chip's free HBM (KERNELS.md
    budget formula; both the forward and transposed layouts are stored)."""
    import os

    gib = os.environ.get("GLASS_TPU_LAYOUT_BYTES_CAP_GIB")
    return int(float(gib) * (1 << 30)) if gib else _LAYOUT_BYTES_CAP
_MXU_FLOPS = {"bf16": 180e12, "f32": 45e12}  # v5e ~197T bf16; f32 ~1/4

# Segment-path fallback model: XLA row gather/scatter streams ~16 GB/s
# effective on v5e (RESULTS.md round 1) over ~(16+h*itemsize)*2 bytes/edge.
_GATHER_BPS = 16e9


def _cost_constants() -> tuple:
    """(band_step_s, bcsr_step_s, stream_bps), overridden by the calibration
    file named in GLASS_TPU_AUTOTUNE (written by tools/autotune.py). The env
    var is read per call (cheap) and the file parse is cached per path, so
    setting/changing the variable mid-process takes effect on the next
    plan."""
    import os

    path = os.environ.get("GLASS_TPU_AUTOTUNE")
    if path:
        return _load_cost_file(path)
    return _BAND_STEP_COST_S, _BCSR_STEP_COST_S, _BAND_STREAM_BPS


@functools.lru_cache(maxsize=8)
def _load_cost_file(path: str) -> tuple:
    import json

    try:
        with open(path) as f:
            d = json.load(f)
        return (
            float(d["band_step_cost_s"]),
            float(d["bcsr_step_cost_s"]),
            float(d["stream_bps"]),
        )
    except (OSError, KeyError, ValueError, TypeError) as e:
        raise ValueError(
            f"GLASS_TPU_AUTOTUNE={path} is not a valid autotune file "
            f"(expected keys band_step_cost_s/bcsr_step_cost_s/"
            f"stream_bps): {e}"
        ) from e
# A hybrid split must beat the best single layout by this factor to justify
# running two kernels (two output buffers + an add).
_HYBRID_MARGIN = 0.9


def _bcsr_cost_model(row, col, n_node: int, itemsize: int,
                     n_col: Optional[int] = None) -> float:
    """Modeled chunked-BCSR kernel time for the given (nonzero) COO pattern:
    per-chunk fixed cost + slab stream time, including per-row CHUNK padding
    and the one placeholder chunk every empty row-block still costs.
    ``n_col``: column count for rectangular (per-shard) patterns — defaults
    to square."""
    from glass_tpu.ops.pallas_spmm import BLOCK as B, CHUNK

    _, bcsr_step_s, stream_bps = _cost_constants()
    n_rb = -(-n_node // B)
    n_cb = -(-(n_col if n_col is not None else n_node) // B)
    if row.size == 0:
        return n_rb * bcsr_step_s
    bid = (row // B) * n_cb + col // B
    urows = np.unique(bid) // n_cb
    cnt = np.bincount(urows.astype(np.int64), minlength=n_rb)
    chunks = int(np.maximum(-(-cnt // CHUNK), 1).sum())
    stored = int((-(-cnt // CHUNK) * CHUNK).sum())
    return chunks * bcsr_step_s + stored * B * B * itemsize / stream_bps


def _plan_block_sparse(
    row,
    col,
    w,
    n_node: int,
    dense_dtype: str,
    band_rps: Optional[int],
    sparse_layout: str,
    pat_sym: bool,
    with_costs: bool = False,
):
    """Chooses the block-sparse layout for the Pallas SpMM path.

    Returns ``(kind, rps, w_blocks)`` with kind one of:
      - "bcsr":   chunked BCSR (ops/pallas_spmm.py) — irregular graphs;
      - "band":   banded slabs (ops/pallas_band.py) — the whole profile fits
                  a uniform window;
      - "hybrid": banded slabs over per-group best windows of width
                  ``w_blocks`` + chunked BCSR over the out-of-window residue
                  (graphs whose RCM profile is narrow except for a few wide
                  rows, e.g. component).

    Each candidate is scored with the measured per-kernel cost model
    (n_steps x step_cost + streamed_bytes / stream_bps) and the cheapest
    wins; a hybrid additionally must beat the best single layout by
    ``_HYBRID_MARGIN`` and requires a pattern-symmetric adjacency (the
    split is symmetrized so one window table serves A and A^T).

    ``with_costs=True`` additionally returns the modeled cost (seconds) of
    every scored candidate family as a 4th element — the stability test
    (tests/test_planner.py) and the autotuner read it to check that layout
    flips under cost-constant drift only happen between near-tied choices."""
    from glass_tpu.ops import pallas_band

    def _ret(kind, rps, wb, costs=None):
        if with_costs:
            return kind, rps, wb, (costs or {})
        return kind, rps, wb

    if sparse_layout == "bcsr":
        return _ret("bcsr", None, None)
    if band_rps is not None and sparse_layout != "hybrid":
        return _ret("band", int(band_rps), None)
    row = np.asarray(row)
    col = np.asarray(col)
    keep = np.asarray(w) != 0
    r_, c_ = row[keep], col[keep]
    itemsize = 4 if dense_dtype == "f32" else 2
    # int8 is honored unconditionally by every block-sparse layout since
    # round 4 (per-row dequant scales), but the TIME model keeps the bf16
    # byte figures on purpose — both flips were measured wrong on-chip:
    # (a) band: pricing streams at 1 byte let the per-group fixed term
    # dominate and moved the 9M-edge bench layout from rps=2/w=4 (29 MB,
    # 66 us measured) to rps=4/w=6 (44 MB, 89 us); (b) chunked BCSR is
    # step/dot-bound, not DMA-bound, at GLASS block densities (int8
    # measured 0.99x of bf16, bench_logs/r4/bcsr8_scale.log) — int8's
    # BCSR win is the HALVED STORAGE, which the HBM cap below does model
    # at the true byte count.
    itemsize_bcsr = itemsize
    itemsize_stream = itemsize
    h_pad = 128  # the common GLASS hidden sizes (<=128) pad to one lane tile
    if r_.size == 0:
        return _ret("bcsr", None, None)
    # Sort by row ONCE: the per-rps group keys (row // BLOCK) // rps are all
    # monotone in row, so every band_stats/_group_minmax call below hits the
    # already-sorted fast path instead of argsorting 2E edges per rps (the
    # transposed-direction call otherwise pays ~1 s per rps at 9M edges).
    if np.any(np.diff(r_) < 0):
        order = np.argsort(r_, kind="stable")
        r_, c_ = r_[order], c_[order]
    ones = np.ones_like(r_)
    band_step_s, _, stream_bps = _cost_constants()

    bcsr_cost = _bcsr_cost_model(r_, c_, n_node, itemsize_bcsr)
    best = ("bcsr", None, None)
    best_cost = bcsr_cost

    # one O(E) pass serves every rps candidate's window statistics
    rb_span = pallas_band.rowblock_spans(r_, c_, n_node)
    band_candidates = []  # (cost, rps, full_w)
    for rps in (1, 2, 4, 8, 16):
        wb, _, nbytes, n_g = pallas_band.band_stats(r_, c_, ones, n_node, rps,
                                                    rb_span=rb_span)
        if not pallas_band.band_vmem_ok(rps, wb, h_pad, itemsize):
            continue
        cost = n_g * band_step_s + nbytes * (itemsize_stream / 4) / stream_bps
        band_candidates.append((cost, rps, wb))
        if cost < best_cost:
            best, best_cost = ("band", rps, None), cost
    if sparse_layout == "band":
        if band_candidates:
            return _ret("band", min(band_candidates)[1], None)
        return _ret("band", 8, None)  # forced; VMEM gate bypassed at caller's risk

    hybrid_best = None  # (cost, rps, w)
    if pat_sym:
        n_cb = -(-n_node // BCSR_BLOCK)
        # one O(E) block histogram serves every rps candidate below
        counts_rb = pallas_band.block_histogram(
            r_, c_, np.ones_like(r_, dtype=bool), n_node
        )
        for rps in (1, 2, 4, 8):
            n_g = -(-n_cb // rps)
            g = (r_ // BCSR_BLOCK) // rps
            cb = c_ // BCSR_BLOCK
            lo, hi = pallas_band._group_minmax(g, cb, n_g, n_cb)
            widths = np.maximum(hi - lo, 1)[hi > 0]  # nonempty groups only
            if widths.size == 0:
                continue
            full_w = int(widths.max())
            # candidate widths: per-group span quantiles (graphs whose few
            # wide rows stretch only their own groups) plus small fixed
            # windows (block-structured outliers widen every group's SPAN
            # while a narrow window still covers the banded mass)
            cands = sorted(
                {
                    int(np.quantile(widths, q))
                    for q in (0.5, 0.75, 0.9)
                }
                | {2, 4, 8, 16}
            )
            cands = [wb for wb in cands if 1 <= wb < full_w
                     and pallas_band.band_vmem_ok(rps, wb, h_pad, itemsize)]
            if not cands:
                continue
            # each width is scored from the aggregated cumsum in
            # O(n_g * n_cb) (the exact residue's BCSR cost needs the split
            # mask, so approximate it by scaling the whole-graph BCSR cost
            # with the out-of-window edge fraction)
            cs = pallas_band.window_histogram_from_blocks(counts_rb, rps)
            n_keep = r_.size
            for wb in cands:
                _, covered = pallas_band.best_windows(cs, wb)
                out_frac = 1.0 - covered / max(n_keep, 1)
                if out_frac > 0.5:
                    continue  # band no longer carries the bulk: not a hybrid
                cost = (
                    n_g * band_step_s
                    + n_g * rps * BCSR_BLOCK * wb * BCSR_BLOCK
                    * itemsize_stream / stream_bps
                    + out_frac * bcsr_cost
                )
                if hybrid_best is None or cost < hybrid_best[0]:
                    hybrid_best = (cost, rps, wb)
    if hybrid_best is not None:
        # exact rescoring of the approximate winner: the residue's true BCSR
        # cost (scattered outliers pack fewer edges per block than the
        # whole-graph average, so the scaled estimate above is optimistic)
        _, rps_h, wb_h = hybrid_best
        _, in_band = pallas_band.plan_windows(r_, c_, ones, n_node, rps_h, wb_h)
        n_g_h = -(-(-(-n_node // BCSR_BLOCK)) // rps_h)
        exact = (
            n_g_h * band_step_s
            + n_g_h * rps_h * BCSR_BLOCK * wb_h * BCSR_BLOCK * itemsize_stream
            / stream_bps
            + _bcsr_cost_model(r_[~in_band], c_[~in_band], n_node,
                               itemsize_bcsr)
        )
        hybrid_best = (exact, rps_h, wb_h)
    costs = {"bcsr": bcsr_cost}
    if band_candidates:
        costs["band"] = min(band_candidates)[0]
    if hybrid_best is not None:
        costs["hybrid"] = hybrid_best[0]
    if sparse_layout == "hybrid":
        if hybrid_best is None:
            raise ValueError(
                "sparse_layout='hybrid' requires a pattern-symmetric "
                "adjacency with a feasible band window"
            )
        return _ret("hybrid", hybrid_best[1], hybrid_best[2], costs)
    if hybrid_best is not None and hybrid_best[0] < _HYBRID_MARGIN * best_cost:
        return _ret("hybrid", hybrid_best[1], hybrid_best[2], costs)
    return _ret(best[0], best[1], best[2], costs)


def degrees(edge_index: np.ndarray, edge_weight: Optional[np.ndarray], n_node: int) -> np.ndarray:
    """Weighted row-degree vector, host-side (reference: datasets.py:45-52)."""
    row = np.asarray(edge_index[0])
    if edge_weight is None:
        edge_weight = np.ones(row.shape[0], dtype=np.float64)
    return np.bincount(row, weights=np.asarray(edge_weight, dtype=np.float64),
                       minlength=n_node)
