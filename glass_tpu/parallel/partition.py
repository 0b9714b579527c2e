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

from glass_tpu.ops._pallas_common import BLOCK
from glass_tpu.ops.graph import Graph, normalized_edge_weight


@dataclasses.dataclass(frozen=True)
class StackedBCSR:
    """K per-shard BCSR layouts stacked on a leading shard axis, padded to
    one static shape (ops.pallas_spmm.pad_bcsr_arrays) so they can be
    shard_map operands. Forward layouts are rectangular: local rows x global
    columns (the kernel consumes the all-gathered features); transposed
    layouts are the mirror (global rows x local columns) for the backward
    pass dx = A_local^T @ g."""

    blocks: np.ndarray  # (K, n_store, BLOCK, CHUNK*BLOCK)
    block_col: np.ndarray  # (K, nnz_b)
    chunk_start: np.ndarray  # (K, n_chunks)
    chunk_len: np.ndarray
    chunk_row: np.ndarray
    chunk_first: np.ndarray
    chunk_last: np.ndarray
    n_rb: int
    n_cb: int
    n_node: int  # real output rows of each local layout
    # int8 layouts: per-shard per-row dequant scales (K, n_rb*BLOCK) f32
    # (each shard quantizes per ITS rows, so per-shard dequant before the
    # cross-shard psum is exact); None for f32/bf16
    row_scale: Optional[np.ndarray] = None

    @property
    def n_ops(self) -> int:
        """shard_map operand count (tree()/specs()/local() arity)."""
        return 8 if self.row_scale is not None else 7

    def _arrays(self):
        base = (self.blocks, self.block_col, self.chunk_start, self.chunk_len,
                self.chunk_row, self.chunk_first, self.chunk_last)
        return base + ((self.row_scale,) if self.row_scale is not None else ())

    def tree(self):
        """Device operands for shard_map, leading dim K."""
        import jax.numpy as jnp

        return tuple(jnp.asarray(a) for a in self._arrays())

    def specs(self, axis: str):
        from jax.sharding import PartitionSpec as P

        return tuple(
            P(axis, *([None] * (a.ndim - 1))) for a in self._arrays()
        )

    def local(self, t):
        """Rebuilds this shard's BCSR inside shard_map from the sliced
        operands (each with a leading dim of 1). block_row_ptr is kernel
        metadata the sharded path never reads — a zero placeholder keeps the
        BCSR pytree structure uniform."""
        import jax.numpy as jnp
        from glass_tpu.ops.pallas_spmm import BCSR

        blocks, bcol, cs, cl, cr, cf, cla = t[:7]
        return BCSR(
            blocks=blocks.reshape(blocks.shape[1:]),
            block_col=bcol.reshape(-1),
            block_row_ptr=jnp.zeros(self.n_rb + 1, jnp.int32),
            chunk_start=cs.reshape(-1),
            chunk_len=cl.reshape(-1),
            chunk_row=cr.reshape(-1),
            chunk_first=cf.reshape(-1),
            chunk_last=cla.reshape(-1),
            n_rb=self.n_rb,
            n_cb=self.n_cb,
            n_node=self.n_node,
            row_scale=(t[7].reshape(-1) if len(t) > 7 else None),
        )


@dataclasses.dataclass(frozen=True)
class StackedBand:
    """K per-shard banded-slab layouts (ops.pallas_band.BandedAdj) stacked on
    a leading shard axis with one shared window width, so they can be
    shard_map operands. Forward layouts are rectangular (local rows x global
    columns); transposed layouts (global rows x local columns) are row-range
    trimmed — only the groups around this shard's column band are stored, and
    the traced per-shard ``g_lo`` scatters the computed rows back (the other
    groups of A_local^T are structurally zero)."""

    slabs: np.ndarray  # (K, n_g, rps*BLOCK, W*BLOCK)
    clo: np.ndarray  # (K, n_g) int32 window starts
    g_lo: np.ndarray  # (K,) int32 first stored group (zeros when untrimmed)
    n_rb: int
    n_cb: int
    n_node: int  # real output rows of each local layout
    rps: int
    w_blocks: int
    n_g_total: int
    trimmed: bool  # whether local layouts carry the traced g_lo offset
    # int8 layouts: per-shard per-output-row dequant scales
    # (K, n_g, rps*BLOCK, BLOCK); None for f32/bf16 — see StackedBCSR
    row_scale: Optional[np.ndarray] = None

    @property
    def n_ops(self) -> int:
        """shard_map operand count (tree()/specs()/local() arity)."""
        return 4 if self.row_scale is not None else 3

    def _arrays(self):
        base = (self.slabs, self.clo, self.g_lo)
        return base + ((self.row_scale,) if self.row_scale is not None else ())

    def tree(self):
        import jax.numpy as jnp

        return tuple(jnp.asarray(a) for a in self._arrays())

    def specs(self, axis: str):
        from jax.sharding import PartitionSpec as P

        return tuple(
            P(axis, *([None] * (a.ndim - 1))) for a in self._arrays()
        )

    def local(self, t):
        """Rebuilds this shard's BandedAdj inside shard_map from the sliced
        operands (each with a leading dim of 1)."""
        from glass_tpu.ops.pallas_band import BandedAdj

        slabs, clo, g_lo = t[:3]
        return BandedAdj(
            slabs=slabs.reshape(slabs.shape[1:]),
            clo=clo.reshape(-1),
            n_rb=self.n_rb,
            n_cb=self.n_cb,
            n_node=self.n_node,
            rps=self.rps,
            w_blocks=self.w_blocks,
            g_lo=g_lo.reshape(()) if self.trimmed else None,
            n_g_total=self.n_g_total,
            row_scale=(t[3].reshape(t[3].shape[1:]) if len(t) > 3 else None),
        )


@dataclasses.dataclass(frozen=True)
class PartitionedGraph:
    """Stacked per-shard arrays, leading dim = K shards (shard_map operand).

    When built with ``overlap=True``, edges whose source lies in the owning
    shard's own node block are split out into loc_* with *local* column ids —
    their contribution needs no communication, so the sharded SpMM overlaps it
    with the all-gather of remote features."""

    row: np.ndarray  # (K, E_shard) local destination rows (off-block edges)
    col: np.ndarray  # (K, E_shard) global source columns
    weight: np.ndarray  # (K, E_shard)
    dense: Optional[np.ndarray]  # (K, nb, K*nb) row-blocks of dense adjacency
    n_shards: int
    block: int  # nodes per shard (padded)
    n_node: int  # real global node count
    n_edge: int  # real global directed edge count
    aggr: str
    loc_row: Optional[np.ndarray] = None  # (K, E_loc) own-block edges
    loc_col: Optional[np.ndarray] = None  # (K, E_loc) local column ids
    loc_weight: Optional[np.ndarray] = None
    # ppermute-ring halo buckets (see ops.graph.Graph.ring_*): bucket
    # [k, s] = edges of shard k sourced from block (k+s+1) % K.
    ring_row: Optional[np.ndarray] = None  # (K, K-1, E_ring)
    ring_col: Optional[np.ndarray] = None  # (K, K-1, E_ring)
    ring_weight: Optional[np.ndarray] = None
    # per-shard Pallas BCSR layouts (partition_graph(materialize_bcsr=True)):
    # the fast-kernel path for sharded large graphs
    bcsr: Optional[StackedBCSR] = None
    bcsr_t: Optional[StackedBCSR] = None
    # per-shard banded-slab layouts — chosen instead of BCSR when the cost
    # model says the shards' profiles are band-structured (RCM-ordered graphs)
    band: Optional[StackedBand] = None
    band_t: Optional[StackedBand] = None

    def local_graph(self, row, col, weight, dense, axis: str,
                    loc_row=None, loc_col=None, loc_weight=None,
                    ring_row=None, ring_col=None, ring_weight=None) -> Graph:
        """Builds the shard-local Graph *inside* shard_map from this shard's
        slices (each arrives with a leading dim of 1)."""
        k1 = self.n_shards - 1

        def _ring(a):
            return None if a is None else a.reshape(k1, -1)

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
            loc_row=None if loc_row is None else loc_row.reshape(-1),
            loc_col=None if loc_col is None else loc_col.reshape(-1),
            loc_weight=None if loc_weight is None else loc_weight.reshape(-1),
            ring_row=_ring(ring_row),
            ring_col=_ring(ring_col),
            ring_weight=_ring(ring_weight),
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
    materialize_bcsr: bool = False,
    dense_dtype: str = "f32",
    edge_bucket: int = 256,
    overlap: bool = True,
    ring: bool = False,
    sparse_layout: str = "auto",
) -> PartitionedGraph:
    """Partitions a COO edge list into K destination-row blocks.

    Normalization (degree computation) happens *globally* before the split so
    each shard's weights are identical to the unsharded graph's. With
    ``overlap=True`` (default), own-block edges are split into the loc_*
    arrays for collective/compute overlap. With ``ring=True`` (requires
    overlap), off-block edges are additionally bucketed by source block for
    the ppermute-ring halo exchange (ops.spmm.spmm_ring).

    ``sparse_layout`` ("auto" | "bcsr" | "band", with materialize_bcsr=True):
    which per-shard Pallas layout to build — "auto" scores stacked banded
    slabs against stacked chunked BCSR with the measured cost model and
    keeps the cheaper one (mirroring build_graph's unsharded planner).
    """
    if ring and not overlap:
        raise ValueError("ring=True requires overlap=True (own-block split)")
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
    is_local = overlap & (col // nb == shard_of)

    def bucketize(sel_mask, local_cols: bool):
        counts = np.bincount(shard_of[sel_mask], minlength=n_shards)
        e_shard = max(edge_bucket, int(-(-max(counts.max(), 1) // edge_bucket) * edge_bucket))
        rows_ = np.full((n_shards, e_shard), nb - 1, dtype=np.int32)
        cols_ = np.zeros((n_shards, e_shard), dtype=np.int32)
        ws_ = np.zeros((n_shards, e_shard), dtype=np.float32)
        for k in range(n_shards):
            sel = sel_mask & (shard_of == k)
            c = int(sel.sum())
            rows_[k, :c] = (row[sel] - k * nb).astype(np.int32)
            csel = col[sel]
            if local_cols:
                csel = csel - k * nb
            cols_[k, :c] = csel.astype(np.int32)
            ws_[k, :c] = w[sel]
        return rows_, cols_, ws_

    if overlap:
        rows, cols, ws = bucketize(~is_local, local_cols=False)
        lrows, lcols, lws = bucketize(is_local, local_cols=True)
    else:
        rows, cols, ws = bucketize(np.ones_like(shard_of, dtype=bool), local_cols=False)
        lrows = lcols = lws = None

    ring_rows = ring_cols = ring_ws = None
    if ring and n_shards > 1:
        src_of = col // nb
        counts = np.zeros((n_shards, n_shards - 1), dtype=np.int64)
        for k in range(n_shards):
            for s in range(1, n_shards):
                j = (k + s) % n_shards
                counts[k, s - 1] = int(((shard_of == k) & (src_of == j)).sum())
        e_ring = max(edge_bucket,
                     int(-(-max(int(counts.max()), 1) // edge_bucket) * edge_bucket))
        ring_rows = np.full((n_shards, n_shards - 1, e_ring), nb - 1, np.int32)
        ring_cols = np.zeros((n_shards, n_shards - 1, e_ring), np.int32)
        ring_ws = np.zeros((n_shards, n_shards - 1, e_ring), np.float32)
        for k in range(n_shards):
            for s in range(1, n_shards):
                j = (k + s) % n_shards
                sel = (shard_of == k) & (src_of == j)
                c = int(sel.sum())
                ring_rows[k, s - 1, :c] = (row[sel] - k * nb).astype(np.int32)
                ring_cols[k, s - 1, :c] = (col[sel] - j * nb).astype(np.int32)
                ring_ws[k, s - 1, :c] = w[sel]

    dense = None
    if materialize_dense:
        n_pad = n_shards * nb
        dense = np.zeros((n_shards, nb, n_pad), dtype=np.float32)
        for k in range(n_shards):
            sel = shard_of == k
            np.add.at(dense[k], (row[sel] - k * nb, col[sel]), w[sel])

    bcsr = bcsr_t = band = band_t = None
    if materialize_bcsr:
        plan = None
        if sparse_layout in ("auto", "band", "hybrid"):
            shards = _shard_split(row, col, w, shard_of, n_shards, nb)
            plan = _plan_stacked_layout(
                shards, n_shards, nb, dense_dtype, sparse_layout
            )
        elif sparse_layout != "bcsr":
            raise ValueError(
                f"unknown sparse_layout {sparse_layout!r} for partitioned "
                "graphs (use 'auto', 'bcsr', 'band', or 'hybrid')"
            )
        if plan is not None and plan[0] == "band":
            band, band_t = _build_stacked_band(
                shards, n_shards, nb, dense_dtype, *plan[1:]
            )
        elif plan is not None:
            band, band_t, bcsr, bcsr_t = _build_stacked_hybrid(
                shards, n_shards, nb, dense_dtype, *plan[1:]
            )
        else:
            bcsr, bcsr_t = _build_stacked_bcsr(
                row, col, w, shard_of, n_shards, nb, dense_dtype
            )

    return PartitionedGraph(
        row=rows, col=cols, weight=ws, dense=dense,
        n_shards=n_shards, block=nb, n_node=n_node, n_edge=n_edge, aggr=aggr,
        loc_row=lrows, loc_col=lcols, loc_weight=lws,
        ring_row=ring_rows, ring_col=ring_cols, ring_weight=ring_ws,
        bcsr=bcsr, bcsr_t=bcsr_t, band=band, band_t=band_t,
    )


def _shard_split(row, col, w, shard_of, n_shards, nb):
    """Per-shard nonzero edges with BOTH sort orders precomputed once:
    row-sorted ``(r, c, w)`` (the input is globally row-sorted, so per-shard
    slices already are) and column-sorted ``(c_s, r_s, w_s)`` for the
    transposed direction. band_stats/_group_minmax hit their sorted fast
    path instead of argsorting the shard's edges on every (rps, direction)
    probe — the same pre-sort the unsharded planner does
    (ops/graph.py::_plan_block_sparse)."""
    keep = np.asarray(w) != 0
    shards = []
    for k in range(n_shards):
        sel = keep & (shard_of == k)
        r, c, wk = row[sel] - k * nb, col[sel], w[sel]
        cs = np.argsort(c, kind="stable")
        shards.append(dict(r=r, c=c, w=wk, c_s=c[cs], r_s=r[cs], w_s=wk[cs]))
    return shards


def _hybrid_masks(s, rps, w_f, w_t, nb, n_glob):
    """Per-shard hybrid split at forced widths: per-group best windows in
    both directions (fwd: local rows x global cols; bwd: the mirror), and
    the in-band mask = inside BOTH windows — A_band must be the same matrix
    in the forward and transposed layouts. Returns (in_band on the
    row-sorted arrays, in_band on the column-sorted arrays, clo_f, clo_t,
    effective widths)."""
    from glass_tpu.ops import pallas_band

    n_cb_glob = -(-n_glob // BLOCK)
    n_rb_loc = -(-nb // BLOCK)
    w_f = min(w_f, n_cb_glob)
    w_t = min(w_t, n_rb_loc)
    keep = np.ones(s["r"].size, dtype=bool)
    cs_f = pallas_band.window_histogram_from_blocks(
        pallas_band.block_histogram(s["r"], s["c"], keep, nb, n_col=n_glob),
        rps,
    )
    cs_t = pallas_band.window_histogram_from_blocks(
        pallas_band.block_histogram(s["c_s"], s["r_s"], keep, n_glob,
                                    n_col=nb),
        rps,
    )
    clo_f, _ = pallas_band.best_windows(cs_f, w_f)
    clo_t, _ = pallas_band.best_windows(cs_t, w_t)

    def mask(r, c):
        g_f = (r // BLOCK) // rps
        g_t = (c // BLOCK) // rps
        cb, rb = c // BLOCK, r // BLOCK
        return (
            (cb >= clo_f[g_f]) & (cb < clo_f[g_f] + w_f)
            & (rb >= clo_t[g_t]) & (rb < clo_t[g_t] + w_t)
        )

    return mask(s["r"], s["c"]), mask(s["r_s"], s["c_s"]), clo_f, clo_t, w_f, w_t


def _plan_stacked_layout(shards, n_shards, nb, dense_dtype,
                         sparse_layout: str):
    """Chooses the stacked block-sparse layout for a partitioned graph.

    Returns None (use stacked BCSR), ``("band", rps, w_fwd, w_bwd)``, or
    ``("hybrid", rps, w_fwd, w_bwd)`` — banded slabs over per-group best
    windows plus a stacked-BCSR residue, for profiles that are narrow except
    for a few wide rows (without the split, one long-range row blows the
    common window width for every shard). Candidates are scored with the
    measured cost model (ops.graph._cost_constants); shards execute in
    lockstep under shard_map, so per-shard costs are maxed. The transposed
    layouts are row-range trimmed, so their cost uses the stored group
    count, not the full global row range."""
    from glass_tpu.ops import pallas_band
    from glass_tpu.ops.graph import (
        _HYBRID_MARGIN,
        _bcsr_cost_model,
        _cost_constants,
    )

    forced = sparse_layout in ("band", "hybrid")
    band_step_s, _, stream_bps = _cost_constants()
    itemsize = 2 if dense_dtype == "bf16" else 4
    n_glob = n_shards * nb
    n_cb_glob = -(-n_glob // BLOCK)
    n_rb_loc = -(-nb // BLOCK)
    slab_cost = lambda n_steps, w: n_steps * (
        band_step_s + w * BLOCK * BLOCK * itemsize / stream_bps
    )

    bcsr_total = max(
        _bcsr_cost_model(s["r"], s["c"], nb, itemsize, n_col=n_glob)
        + _bcsr_cost_model(s["c_s"], s["r_s"], n_glob, itemsize, n_col=nb)
        for s in shards
    ) if sparse_layout == "auto" else np.inf

    n_edges = sum(s["r"].size for s in shards)
    best_band = None  # (cost, rps, w_fwd, w_bwd)
    best_hybrid = None
    for rps in (1, 2, 4, 8, 16):
        n_g_f = -(-n_rb_loc // rps)
        n_g_total_t = -(-n_cb_glob // rps)
        w_f = w_t = 1
        store_t = 1
        spans_f, spans_t = [], []
        for s in shards:
            lo, hi = pallas_band._group_minmax(
                (s["r"] // BLOCK) // rps, s["c"] // BLOCK, n_g_f, n_cb_glob
            )
            sp = (hi - lo)[hi > 0]
            spans_f.append(sp)
            w_f = max(w_f, int(sp.max()) if sp.size else 1)
            lo, hi = pallas_band._group_minmax(
                (s["c_s"] // BLOCK) // rps, s["r_s"] // BLOCK, n_g_total_t,
                n_rb_loc,
            )
            sp = (hi - lo)[hi > 0]
            spans_t.append(sp)
            w_t = max(w_t, int(sp.max()) if sp.size else 1)
            if s["c"].size:
                g = (s["c"] // BLOCK) // rps
                store_t = max(store_t, int(g.max() - g.min() + 1))
        w_f, w_t = min(w_f, n_cb_glob), min(w_t, n_rb_loc)
        store_t = min(store_t, n_g_total_t)
        if (sparse_layout != "hybrid"
                and pallas_band.band_vmem_ok(rps, w_f, 128, itemsize)
                and pallas_band.band_vmem_ok(rps, w_t, 128, itemsize)):
            cost = slab_cost(n_g_f, w_f) + slab_cost(store_t, w_t)
            if best_band is None or cost < best_band[0]:
                best_band = (cost, rps, w_f, w_t)
        # hybrid candidates: per-direction span quantiles + small fixed
        # widths, scored with the EXACT split (cheap relative to the build)
        if sparse_layout == "band" or rps > 8:
            continue
        sf = np.concatenate(spans_f) if spans_f else np.zeros(0, np.int64)
        st = np.concatenate(spans_t) if spans_t else np.zeros(0, np.int64)
        if sf.size == 0 or st.size == 0:
            continue
        cands = {
            (int(np.quantile(sf, q)), int(np.quantile(st, q)))
            for q in (0.5, 0.9)
        } | {(4, 4), (8, 8)}
        for wfh, wth in sorted(cands):
            wfh, wth = min(max(wfh, 1), n_cb_glob), min(max(wth, 1), n_rb_loc)
            if (wfh, wth) == (w_f, w_t):
                continue  # that is the full band, scored above
            if not (pallas_band.band_vmem_ok(rps, wfh, 128, itemsize)
                    and pallas_band.band_vmem_ok(rps, wth, 128, itemsize)):
                continue
            covered = 0
            store_h = 1
            res_cost = 0.0
            for s in shards:
                in_rc, in_cs, _, _, _, _ = _hybrid_masks(
                    s, rps, wfh, wth, nb, n_glob
                )
                covered += int(in_rc.sum())
                if in_cs.any():
                    g = (s["c_s"][in_cs] // BLOCK) // rps
                    store_h = max(store_h, int(g.max() - g.min() + 1))
                out_r, out_c = s["r"][~in_rc], s["c"][~in_rc]
                res_cost = max(
                    res_cost,
                    _bcsr_cost_model(out_r, out_c, nb, itemsize,
                                     n_col=n_glob)
                    + _bcsr_cost_model(out_c, out_r, n_glob, itemsize,
                                       n_col=nb),
                )
            if n_edges and covered / n_edges < 0.5:
                continue  # the band no longer carries the bulk
            cost = (slab_cost(n_g_f, wfh) + slab_cost(store_h, wth)
                    + res_cost)
            if best_hybrid is None or cost < best_hybrid[0]:
                best_hybrid = (cost, rps, wfh, wth)

    if sparse_layout == "band":
        if best_band is None:
            raise ValueError(
                "sparse_layout='band': no per-shard band window fits VMEM "
                "for any rps — the partitioned profiles are too wide"
            )
        return ("band",) + best_band[1:]
    if sparse_layout == "hybrid":
        if best_hybrid is None:
            raise ValueError(
                "sparse_layout='hybrid': no feasible per-shard hybrid "
                "window (VMEM gate or empty shards)"
            )
        return ("hybrid",) + best_hybrid[1:]
    # auto: cheapest of band / hybrid / bcsr; a hybrid must additionally
    # beat the best single layout by the margin (two kernels + an add)
    choices = []
    if best_band is not None:
        choices.append((best_band[0], ("band",) + best_band[1:]))
    if best_hybrid is not None and best_hybrid[0] < _HYBRID_MARGIN * min(
        [bcsr_total] + ([best_band[0]] if best_band else [])
    ):
        choices.append((best_hybrid[0], ("hybrid",) + best_hybrid[1:]))
    choices = [c for c in choices if c[0] < bcsr_total]
    if not choices:
        return None
    return min(choices)[1]


def _build_stacked_band(shards, n_shards, nb, dense_dtype, rps, w_fwd, w_bwd):
    """Builds the per-shard banded-slab layouts (see StackedBand): forward
    local-rows x global-cols at common width ``w_fwd``; transposed
    global-rows x local-cols at common width ``w_bwd``, row-range trimmed to
    a common stored-group count. ``shards`` comes from _shard_split."""
    from glass_tpu.ops import pallas_band

    bdtype = {"f32": "float32", "int8": "int8"}.get(dense_dtype, "bfloat16")
    n_glob = n_shards * nb
    n_rb_loc = -(-nb // BLOCK)
    n_cb_glob = -(-n_glob // BLOCK)
    n_g_total_t = -(-n_cb_glob // rps)

    # common trimmed-group count for the transposed layouts
    spans = [1]
    for s in shards:
        if s["c"].size:
            g = (s["c"] // BLOCK) // rps
            spans.append(int(g.max() - g.min() + 1))
    n_g_store = min(max(spans), n_g_total_t)

    fwd_parts, bwd_parts = [], []
    for s in shards:
        r, c, wk = s["r"], s["c"], s["w"]
        clo_f = pallas_band.window_starts(r, c, nb, rps, w_fwd, n_col=n_glob)
        fwd_parts.append(pallas_band.build_band_arrays(
            r, c, wk, nb, rps, bdtype, window=(w_fwd, clo_f), n_col=n_glob,
        ))
        # column-sorted views: window_starts hits the sorted fast path
        clo_t = pallas_band.window_starts(s["c_s"], s["r_s"], n_glob, rps,
                                          w_bwd, n_col=nb)
        g_lo = 0
        if c.size:
            g_lo = int(((c // BLOCK) // rps).min())
        g_lo = min(g_lo, n_g_total_t - n_g_store)
        bwd_parts.append(pallas_band.build_band_arrays(
            s["c_s"], s["r_s"], s["w_s"], n_glob, rps, bdtype,
            window=(w_bwd, clo_t), n_col=nb,
            trim_groups=(g_lo, n_g_store),
        ))

    fwd = _stack_band_parts(fwd_parts, n_rb_loc, n_cb_glob, nb, rps, w_fwd,
                            -(-n_rb_loc // rps), trimmed=False)
    bwd = _stack_band_parts(bwd_parts, n_cb_glob, n_rb_loc, n_glob, rps,
                            w_bwd, n_g_total_t, trimmed=True)
    return fwd, bwd


def _stack_band_parts(parts, n_rb, n_cb, n_node, rps, wb, n_g_total, trimmed):
    return StackedBand(
        slabs=np.stack([p["slabs"] for p in parts]),
        clo=np.stack([p["clo"] for p in parts]),
        g_lo=np.asarray([p["g_lo"] for p in parts], dtype=np.int32),
        n_rb=n_rb, n_cb=n_cb, n_node=n_node, rps=rps, w_blocks=wb,
        n_g_total=n_g_total, trimmed=trimmed,
        row_scale=(np.stack([p["row_scale"] for p in parts])
                   if parts and parts[0]["row_scale"] is not None else None),
    )


def _build_stacked_hybrid(shards, n_shards, nb, dense_dtype, rps, w_f, w_t):
    """Builds the per-shard hybrid split (see _plan_stacked_layout): banded
    slabs over per-group best windows of forced widths ``(w_f, w_t)`` for
    the in-band edges (in-band = inside BOTH directions' windows, so the
    forward and transposed band layouts hold the same matrix), plus stacked
    chunked BCSR over the residue. Returns (band, band_t, bcsr, bcsr_t)."""
    from glass_tpu.ops import pallas_band

    bdtype = {"f32": "float32", "int8": "int8"}.get(dense_dtype, "bfloat16")
    n_glob = n_shards * nb
    n_rb_loc = -(-nb // BLOCK)
    n_cb_glob = -(-n_glob // BLOCK)
    n_g_total_t = -(-n_cb_glob // rps)

    splits = [_hybrid_masks(s, rps, w_f, w_t, nb, n_glob) for s in shards]
    w_f = splits[0][4] if splits else w_f  # clamped widths
    w_t = splits[0][5] if splits else w_t

    # common trimmed-group count for the transposed band layouts, over the
    # in-band edges only
    n_g_store = 1
    for s, (_, in_cs, _, _, _, _) in zip(shards, splits):
        if in_cs.any():
            g = (s["c_s"][in_cs] // BLOCK) // rps
            n_g_store = max(n_g_store, int(g.max() - g.min() + 1))
    n_g_store = min(n_g_store, n_g_total_t)

    fwd_parts, bwd_parts = [], []
    res_r, res_c, res_w = [], [], []
    for k, (s, (in_rc, in_cs, clo_f, clo_t, _, _)) in enumerate(
        zip(shards, splits)
    ):
        fwd_parts.append(pallas_band.build_band_arrays(
            s["r"][in_rc], s["c"][in_rc], s["w"][in_rc], nb, rps, bdtype,
            window=(w_f, clo_f), n_col=n_glob,
        ))
        g_lo = 0
        if in_cs.any():
            g_lo = int(((s["c_s"][in_cs] // BLOCK) // rps).min())
        g_lo = min(g_lo, n_g_total_t - n_g_store)
        bwd_parts.append(pallas_band.build_band_arrays(
            s["c_s"][in_cs], s["r_s"][in_cs], s["w_s"][in_cs], n_glob, rps,
            bdtype, window=(w_t, clo_t), n_col=nb,
            trim_groups=(g_lo, n_g_store),
        ))
        out = ~in_rc
        res_r.append(s["r"][out] + k * nb)  # back to global rows
        res_c.append(s["c"][out])
        res_w.append(s["w"][out])

    band = _stack_band_parts(fwd_parts, n_rb_loc, n_cb_glob, nb, rps, w_f,
                             -(-n_rb_loc // rps), trimmed=False)
    band_t = _stack_band_parts(bwd_parts, n_cb_glob, n_rb_loc, n_glob, rps,
                               w_t, n_g_total_t, trimmed=True)
    rr = np.concatenate(res_r) if res_r else np.zeros(0, np.int64)
    rc = np.concatenate(res_c) if res_c else np.zeros(0, np.int64)
    rw = np.concatenate(res_w) if res_w else np.zeros(0, np.float32)
    bcsr, bcsr_t = _build_stacked_bcsr(
        rr, rc, rw, rr // nb, n_shards, nb, dense_dtype
    )
    return band, band_t, bcsr, bcsr_t


def _build_stacked_bcsr(row, col, w, shard_of, n_shards, nb, dense_dtype):
    """Per-shard rectangular BCSR layouts (forward: local rows x global
    columns; transposed: global rows x local columns), padded to one static
    shape across shards. Each layout gets one appended zero row block
    (pad_row_blocks=1) as the target of cross-shard chunk padding."""
    from glass_tpu.ops.pallas_spmm import build_bcsr_arrays, pad_bcsr_arrays

    # int8 is honored per shard (each rectangular layout carries per-row
    # dequant scales; dequant happens inside each shard's kernel call, so
    # the cross-shard psum composes exactly)
    bdtype = {"f32": "float32", "int8": "int8"}.get(dense_dtype, "bfloat16")
    n_glob = n_shards * nb
    fwd, bwd = [], []
    for k in range(n_shards):
        sel = shard_of == k
        r_l = (row[sel] - k * nb).astype(np.int64)
        c_g = col[sel].astype(np.int64)
        w_k = w[sel]
        fwd.append(build_bcsr_arrays(r_l, c_g, w_k, nb, bdtype,
                                     n_col=n_glob, pad_row_blocks=1))
        bwd.append(build_bcsr_arrays(c_g, r_l, w_k, n_glob, bdtype,
                                     n_col=nb, pad_row_blocks=1))

    def stack(parts, n_node):
        n_store = max(p["blocks"].shape[0] for p in parts)
        nnz_b = max(p["block_col"].shape[0] for p in parts)
        n_chunks = max(p["chunk_start"].shape[0] for p in parts)
        parts = [pad_bcsr_arrays(p, n_store, nnz_b, n_chunks) for p in parts]
        return StackedBCSR(
            blocks=np.stack([p["blocks"] for p in parts]),
            block_col=np.stack([p["block_col"] for p in parts]),
            chunk_start=np.stack([p["chunk_start"] for p in parts]),
            chunk_len=np.stack([p["chunk_len"] for p in parts]),
            chunk_row=np.stack([p["chunk_row"] for p in parts]),
            chunk_first=np.stack([p["chunk_first"] for p in parts]),
            chunk_last=np.stack([p["chunk_last"] for p in parts]),
            n_rb=parts[0]["n_rb"],
            n_cb=parts[0]["n_cb"],
            n_node=n_node,
            row_scale=(np.stack([p["row_scale"] for p in parts])
                       if parts[0]["row_scale"] is not None else None),
        )

    return stack(fwd, nb), stack(bwd, n_glob)
