"""Banded-dense SpMM Pallas kernel for locality-reordered graphs.

Motivation (measured on TPU v5e, em_user-scale community graph): the BCSR
chunk kernel (ops/pallas_spmm.py) is bound by per-grid-step cost, not HBM
bandwidth — ~4 us/step over ~450 steps regardless of block dtype (bf16
moved 4x less data than f32 in the same wall time). Real-world graphs after
a reverse Cuthill-McKee pass (native/glass_host.cpp glass_rcm) concentrate
nonzeros in a narrow diagonal band, which admits a far more regular
formulation:

    out[g] = S[g] @ x[clo[g]*128 : clo[g]*128 + W*128]

where S[g] is a dense (RPS*128, W*128) "slab" covering ALL nonzero columns
of row-block group g (RPS consecutive 128-row blocks, W = max group window
width in 128-column blocks). One grid step = one slab DMA (auto-pipelined
by Pallas: the slab operand has a regular index map) + one contiguous
x-window DMA (manual, double-buffered — its start offset is the
scalar-prefetched ``clo``) + ONE large MXU matmul + one regular output
write. Per-step cost is amortized over RPS row-blocks, and every transfer
is a single long contiguous DMA.

The trade: zero blocks inside the band are stored and multiplied (band
fill < 100%). Host-side stats (``band_stats``) gate the choice: the graph
builder only picks this layout when the slab bytes are within a constant
factor of the BCSR blocks it replaces and the per-step working set fits
VMEM; irregular graphs stay on the chunked BCSR kernel.

Backward dx = A^T @ g runs the same kernel over the transposed band layout
(shared arrays when A is symmetric — undirected 'sum'/'gcn' graphs).

Reference parity: this computes the exact hot loop of GLASS message
passing (reference impl/models.py:164, torch COO spmm) for any adjacency;
the banded layout is a performance specialization, not a semantic change.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glass_tpu.ops.graph import Graph

from glass_tpu.ops._pallas_common import (
    BLOCK,
    precision_for as _precision_for,
    zero_cotangent as _zero_cotangent,
)
NBUF = 2  # x-window double buffering

# Per-step VMEM budget (slab double-buffer + x windows + out block) — v5e's
# scoped VMEM limit is 16 MiB; all accounting here uses LANE-PADDED widths
# (a (N, 64) buffer physically occupies (N, 128)), so the budget can sit
# close to the hardware limit. The whole-x bf16 path at em_user scale needs
# 15.46 MiB and compiles; 18 MiB OOMs (both observed on the live chip).
# Calibratable: a compile-time VMEM OOM on another chip/compiler version is
# recoverable with GLASS_TPU_VMEM_BUDGET_MIB=<smaller> (no code change) —
# the same knob also re-gates the xvmem/striped choices and the planner's
# band_vmem_ok.
_VMEM_BUDGET = int(
    float(os.environ.get("GLASS_TPU_VMEM_BUDGET_MIB", "15.5")) * 1024 * 1024
)


@struct.dataclass
class BandedAdj:
    """Host-built banded-dense adjacency (see module docstring).

    slabs[g] is the dense (rps*128, w_blocks*128) slab of row-block group g;
    clo[g] the first column block of g's window (clamped so the window always
    lies in bounds).

    The layout may be rectangular (``n_cb`` column blocks independent of the
    ``n_rb`` row blocks — per-shard layouts are local-rows x global-cols) and
    row-range trimmed: when ``g_lo`` is set, the stored slabs cover only row
    groups [g_lo, g_lo + n_groups) of the ``n_g_total`` total and the SpMM
    scatters the computed rows back into a zero output. ``g_lo`` is a traced
    scalar (not static) so per-shard layouts with different trim offsets share
    one compiled program under shard_map."""

    slabs: jnp.ndarray  # (n_g, rps*BLOCK, w_blocks*BLOCK)
    clo: jnp.ndarray  # (n_g,) int32, window start in column-block units
    n_rb: int = struct.field(pytree_node=False)
    n_cb: int = struct.field(pytree_node=False)
    n_node: int = struct.field(pytree_node=False)  # real output rows
    rps: int = struct.field(pytree_node=False)  # row-blocks per grid step
    w_blocks: int = struct.field(pytree_node=False)  # window width (blocks)
    # row-range trim: first stored group (traced scalar) + total group count
    g_lo: Optional[jnp.ndarray] = None
    n_g_total: int = struct.field(pytree_node=False, default=0)
    # affine (block-DIA) window law: clo[g] == g*affine_stride + affine_off
    # exactly (may be negative at the top edge — the SpMM pads x). Static, so
    # the affine kernel needs NO scalar prefetch and one contiguous x-panel
    # DMA covers a whole multi-group step. None = per-group windows.
    affine_stride: Optional[int] = struct.field(pytree_node=False, default=None)
    affine_off: Optional[int] = struct.field(pytree_node=False, default=None)
    # int8 slabs: per-OUTPUT-ROW dequantization scales, lane-broadcast to
    # (n_g, rps*BLOCK, BLOCK) bf16 so the pipelined block DMA stays
    # lane-tile-aligned (bf16: the scales are the kernel's second DMA
    # stream — half their bytes is a direct throughput win). Slab values
    # are int8 with A[r, c] = row_scale[r] * slabs[r, c]; the kernel
    # converts int8->bf16 (no multiply), dots, then scales the output
    # rows. None = f32/bf16 slabs.
    row_scale: Optional[jnp.ndarray] = None

    @property
    def n_groups(self) -> int:
        return int(self.slabs.shape[0])

    @property
    def total_groups(self) -> int:
        return self.n_g_total if self.n_g_total else self.n_groups


def _group_minmax(g, v, n_g: int, v_default_lo: int):
    """Per-group (min, max+1) of ``v`` grouped by ``g`` — the vectorized
    replacement for np.minimum.at/np.maximum.at, which run a Python-level
    loop (~1.4 s per call at 9M edges). Exploits that ``g`` derived from
    row-sorted COO is already non-decreasing; sorts only if it is not.
    Absent groups get (v_default_lo, 0)."""
    lo = np.full(n_g, v_default_lo, dtype=np.int64)
    hi = np.zeros(n_g, dtype=np.int64)
    if g.size == 0:
        return lo, hi
    if np.any(np.diff(g) < 0):
        order = np.argsort(g, kind="stable")
        g, v = g[order], v[order]
    first = np.flatnonzero(np.r_[True, g[1:] != g[:-1]])
    present = g[first]
    lo[present] = np.minimum.reduceat(v, first)
    hi[present] = np.maximum.reduceat(v, first) + 1
    return lo, hi


def rowblock_spans(row, col, n_node: int, n_col=None):
    """Per-ROW-BLOCK column-block (lo, hi+1) spans in ONE edge pass.

    The planner scores several ``rps`` candidates; each band_stats call
    otherwise re-reduces all edges (45 s of a 36M-edge build was exactly
    this). Group spans for ANY rps are min/max reductions of these n_rb
    per-block spans — an O(n_rb) reduceat instead of an O(E) pass. Pass the
    result as ``rb_span=`` to :func:`band_stats`."""
    row = np.asarray(row)
    col = np.asarray(col)
    n_rb = -(-n_node // BLOCK)
    n_cb = -(-(n_col if n_col is not None else n_node) // BLOCK)
    return _group_minmax(row // BLOCK, col // BLOCK, n_rb, n_cb)


def band_stats(row, col, weight, n_node: int, rps: int, n_col=None,
               rb_span=None):
    """Host-side window statistics for the banded layout (cheap: no slab
    materialization). Returns (w_blocks, clo, slab_bytes_f32, n_groups).
    ``n_col``: column count for rectangular layouts (default: square).
    ``rb_span``: optional precomputed :func:`rowblock_spans` (skips the
    O(E) pass; ``row``/``col``/``weight`` are then ignored)."""
    n_rb = -(-n_node // BLOCK)
    n_cb = -(-(n_col if n_col is not None else n_node) // BLOCK)
    n_g = -(-n_rb // rps)
    if rb_span is not None:
        lo_rb, hi_rb = rb_span
        first = np.arange(0, n_rb, rps)
        lo = np.minimum.reduceat(lo_rb, first)
        hi = np.maximum.reduceat(hi_rb, first)
    else:
        row = np.asarray(row)
        col = np.asarray(col)
        keep = np.asarray(weight) != 0
        row, col = row[keep], col[keep]
        g = (row // BLOCK) // rps
        cb = col // BLOCK
        lo, hi = _group_minmax(g, cb, n_g, n_cb)
    width = np.maximum(hi - lo, 1)
    w = int(width.max()) if width.size else 1
    w = min(w, n_cb)
    clo = np.clip(np.minimum(lo, n_cb - w), 0, None).astype(np.int32)
    slab_bytes = n_g * rps * BLOCK * w * BLOCK * 4
    return w, clo, slab_bytes, n_g


def window_starts(row, col, n_node: int, rps: int, w: int, n_col=None):
    """Clamped per-group window starts for a FORCED width ``w`` (the stacked
    per-shard layouts share one width so shard_map operands are rectangular).
    Raises if any group's column span exceeds ``w``."""
    row = np.asarray(row)
    col = np.asarray(col)
    n_rb = -(-n_node // BLOCK)
    n_cb = -(-(n_col if n_col is not None else n_node) // BLOCK)
    n_g = -(-n_rb // rps)
    lo, hi = _group_minmax((row // BLOCK) // rps, col // BLOCK, n_g, n_cb)
    if np.any(hi - lo > w):
        raise ValueError(
            f"group span {int((hi - lo).max())} blocks exceeds the forced "
            f"window width {w}"
        )
    return np.clip(np.minimum(lo, n_cb - w), 0, None).astype(np.int32)


def plan_windows(row, col, weight, n_node: int, rps: int, w: int):
    """Per-group best window of FIXED width ``w`` blocks (host-side).

    For each row-block group, slides a ``w``-wide window over the group's
    column-block edge histogram and picks the start that covers the most
    edges. Returns ``(clo, in_band)`` where ``clo`` is the (n_g,) int32
    window-start table and ``in_band`` the boolean edge mask of edges whose
    column block falls inside their group's window. Zero-weight padding
    edges are always masked out.

    This is the hybrid band+outlier splitter: graphs whose RCM profile is
    narrow except for a few wide rows (e.g. the component dataset: median
    window ~8 blocks, max ~78) keep the banded-MXU kernel for the in-band
    mass and route the residue to the chunked BCSR kernel."""
    row = np.asarray(row)
    col = np.asarray(col)
    keep = np.asarray(weight) != 0
    cs = window_histogram(row, col, keep, n_node, rps)
    clo, _ = best_windows(cs, w)
    g = (row // BLOCK) // rps
    cb = col // BLOCK
    w = min(w, cs.shape[1] - 1)
    in_band = keep & (cb >= clo[g]) & (cb < clo[g] + w)
    return clo, in_band


def block_histogram(row, col, keep, n_node: int, n_col=None):
    """Raw per-(row-block, column-block) edge counts, (n_rb, n_cb+1) int64
    with column b counted at index b+1 (cumsum-ready). Computed ONCE with a
    flat bincount; coarser rps groupings aggregate it with
    ``window_histogram_from_blocks`` instead of re-binning all E edges.
    ``n_col``: column count for rectangular layouts (default: square)."""
    n_rb = -(-n_node // BLOCK)
    n_cb = -(-(n_col if n_col is not None else n_node) // BLOCK)
    flat = (row[keep] // BLOCK) * (n_cb + 1) + col[keep] // BLOCK + 1
    return np.bincount(flat, minlength=n_rb * (n_cb + 1)).reshape(
        n_rb, n_cb + 1
    )


def window_histogram_from_blocks(counts_rb: np.ndarray, rps: int):
    """Cumulative (n_g, n_cb+1) histogram for row-block groups of ``rps``,
    aggregated from ``block_histogram`` output in O(n_rb * n_cb)."""
    n_rb = counts_rb.shape[0]
    agg = np.add.reduceat(counts_rb, np.arange(0, n_rb, rps), axis=0)
    return np.cumsum(agg, axis=1)


def window_histogram(row, col, keep, n_node: int, rps: int):
    """Cumulative per-(group, column-block) edge histogram: (n_g, n_cb+1)
    int64 with ``cs[g, b+1] - cs[g, a]`` = edges of group g in column blocks
    [a, b]. Every candidate window width is then scored from it in
    O(n_g * n_cb) (the planner's inner loop)."""
    return window_histogram_from_blocks(
        block_histogram(row, col, keep, n_node), rps
    )


def best_windows(cs, w: int):
    """Best fixed-width-``w`` window per group from a window_histogram.
    Returns ``(clo, covered)``: window starts (n_g,) int32 and the total
    edge count covered across all groups."""
    n_cb = cs.shape[1] - 1
    w = min(w, n_cb)
    # window starting at s covers column blocks [s, s+w)
    n_start = n_cb - w + 1
    win = cs[:, w : w + n_start] - cs[:, :n_start]
    clo = np.argmax(win, axis=1).astype(np.int32)
    covered = int(win[np.arange(cs.shape[0]), clo].sum())
    return clo, covered


def affine_fit(row, col, weight, n_node: int, rps: int, n_col=None,
               rb_span=None):
    """Fits an affine window law clo[g] = g*stride + off over the row-block
    groups (the block-DIA view of an RCM-ordered graph). Returns
    ``(stride, off, w_blocks)`` such that every group's column span fits
    [g*stride + off, g*stride + off + w_blocks), or None for an empty graph.

    ``off`` may be negative (top edge) and windows may overhang n_cb at the
    bottom — the SpMM pads x instead of clamping, preserving the exact
    affine law the static kernel relies on.
    ``rb_span``: optional precomputed :func:`rowblock_spans` over the
    nonzero-weight edges (skips this function's own O(E) pass)."""
    n_rb = -(-n_node // BLOCK)
    n_cb = -(-(n_col if n_col is not None else n_node) // BLOCK)
    n_g = -(-n_rb // rps)
    if rb_span is not None:
        lo_rb, hi_rb = rb_span
        if not np.any(hi_rb > 0):
            return None
        first = np.arange(0, n_rb, rps)
        lo = np.minimum.reduceat(lo_rb, first)
        hi = np.maximum.reduceat(hi_rb, first)
    else:
        row = np.asarray(row)
        col = np.asarray(col)
        keep = np.asarray(weight) != 0
        row, col = row[keep], col[keep]
        if row.size == 0:
            return None
        lo, hi = _group_minmax((row // BLOCK) // rps, col // BLOCK, n_g, n_cb)
    present = hi > 0
    g = np.flatnonzero(present)
    if g.size == 1:
        stride = 0
    else:
        # least-squares slope over present groups, snapped to int
        gm = g - g.mean()
        stride = int(round(float((gm * (lo[g] - lo[g].mean())).sum()
                                 / max((gm * gm).sum(), 1e-9))))
        stride = max(stride, 0)
    r_lo = lo[g] - g * stride
    r_hi = hi[g] - g * stride
    off = int(r_lo.min())
    w = int(r_hi.max()) - off
    return stride, off, w


def affine_clo(n_g: int, stride: int, off: int) -> np.ndarray:
    return (np.arange(n_g, dtype=np.int64) * stride + off).astype(np.int32)


def band_vmem_ok(rps: int, w_blocks: int, h_pad: int, itemsize: int) -> bool:
    """True if the kernel's per-step working set fits the VMEM budget."""
    slab = 2 * rps * BLOCK * w_blocks * BLOCK * itemsize  # double-buffered
    xwin = NBUF * w_blocks * BLOCK * h_pad * itemsize
    out = 2 * rps * BLOCK * h_pad * 4
    return slab + xwin + out <= _VMEM_BUDGET


def build_band_arrays(row, col, weight, n_node: int, rps: int = 8, dtype="float32",
                      window=None, n_col=None, trim_groups=None):
    """Host-side banded-slab construction from normalized COO (numpy only —
    device readback through a remote-TPU tunnel is pathologically slow).
    Zero-weight padding edges are ignored.

    ``window``: optional (w_blocks, clo) forcing the layout's windows (the
    hybrid split path); every edge must fall inside its group's window.
    ``n_col``: column count for rectangular layouts (default: square).
    ``trim_groups``: optional (g_lo, n_g_store) storing only row groups
    [g_lo, g_lo + n_g_store) — the per-shard transposed layouts are mostly
    empty outside this shard's column band, and trimmed storage skips both
    the zero slabs and their MXU passes. Every nonzero edge must fall inside
    the trimmed range."""
    row = np.asarray(row)
    col = np.asarray(col)
    weight = np.asarray(weight)
    keep = weight != 0
    row, col, weight = row[keep], col[keep], weight[keep]
    n_rb = -(-n_node // BLOCK)
    n_g_total = -(-n_rb // rps)
    if window is not None:
        w, clo = window
        clo = np.asarray(clo, dtype=np.int32)
        cb = col // BLOCK
        g_chk = (row // BLOCK) // rps
        if cb.size and not (
            (cb >= clo[g_chk]) & (cb < clo[g_chk] + w)
        ).all():
            raise ValueError("edge outside its forced band window")
    else:
        w, clo, _, _ = band_stats(
            row, col, np.ones_like(row), n_node, rps, n_col=n_col
        )
    if clo.shape[0] != n_g_total:
        raise ValueError(
            f"window table has {clo.shape[0]} groups, expected {n_g_total}"
        )
    g_lo = 0
    n_g = n_g_total
    if trim_groups is not None:
        g_lo, n_g = trim_groups
        if not 0 <= g_lo <= n_g_total - n_g:
            raise ValueError(
                f"trim range [{g_lo}, {g_lo + n_g}) outside the "
                f"{n_g_total}-group layout"
            )
        g_all = (row // BLOCK) // rps
        if g_all.size and not ((g_all >= g_lo) & (g_all < g_lo + n_g)).all():
            raise ValueError("edge outside the trimmed group range")
        # shift rows so the fill sees groups [0, n_g)
        row = row - g_lo * (rps * BLOCK)
        clo = clo[g_lo : g_lo + n_g]
    from glass_tpu.native import band_fill

    slabs = band_fill(row, col, weight, rps, w, clo, n_g)
    if slabs is None:
        # numpy fallback: flat bincount (duplicate edges accumulate either
        # way — COO semantics; both paths accumulate in f64 then cast)
        g = (row // BLOCK) // rps
        lr = row - g * (rps * BLOCK)
        lc = col - clo[g].astype(np.int64) * BLOCK
        size = n_g * (rps * BLOCK) * (w * BLOCK)
        flat = (g * (rps * BLOCK) + lr) * (w * BLOCK) + lc
        slabs = np.bincount(flat, weights=weight, minlength=size).reshape(
            n_g, rps * BLOCK, w * BLOCK
        ).astype(np.float32)
    row_scale = None
    if dtype == "int8":
        # per-output-row symmetric quantization: relative error <= 1/254 of
        # each row's max |weight| (gcn rows share a 1/sqrt(deg_r) factor, so
        # within-row dynamic range is the neighbors' 1/sqrt(deg_c) spread)
        amax = np.abs(slabs).max(axis=2, keepdims=True)  # (n_g, rps*B, 1)
        scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
        slabs = np.rint(slabs / scale).astype(np.int8)
        # scales stream lane-broadcast next to the slabs; bf16 halves their
        # bytes (the int8 kernel is two-stream DMA-bound and the scales are
        # otherwise HALF its traffic) at <=0.4% extra multiplicative error —
        # inside the quantization's own tolerance
        row_scale = np.ascontiguousarray(
            np.broadcast_to(scale, scale.shape[:2] + (BLOCK,))
        ).astype(jnp.bfloat16)
    elif dtype in ("bfloat16", "bf16"):
        slabs = slabs.astype(jnp.bfloat16)
    n_cb = -(-(n_col if n_col is not None else n_node) // BLOCK)
    return dict(slabs=slabs, clo=clo, n_rb=n_rb, n_cb=n_cb, w_blocks=w,
                g_lo=g_lo, n_g_total=n_g_total, row_scale=row_scale)


def build_band(row, col, weight, n_node: int, rps: int = 8, dtype="float32",
               window=None, n_col=None, trim_groups=None,
               affine=None) -> BandedAdj:
    """Device-placed banded adjacency (see build_band_arrays).

    ``affine``: optional (stride, off, w_blocks) from :func:`affine_fit` —
    forces the affine window law (block-DIA layout) and marks the result so
    the SpMM takes the static multi-group kernel."""
    a_stride = a_off = None
    if affine is not None:
        if window is not None:
            raise ValueError("affine and window are mutually exclusive")
        a_stride, a_off, w_aff = affine
        n_rb = -(-n_node // BLOCK)
        window = (w_aff, affine_clo(-(-n_rb // rps), a_stride, a_off))
    # int8 works for every layout: the affine kernel streams the scales as
    # a second DMA and dequantizes in-VMEM; the per-group kernels convert
    # int8->bf16 at the dot and band_spmm dequantizes the output rows in
    # one XLA-fused multiply (round 4 — previously affine-only)
    a = build_band_arrays(row, col, weight, n_node, rps, dtype, window=window,
                          n_col=n_col, trim_groups=trim_groups)
    return BandedAdj(
        slabs=jnp.asarray(a["slabs"]),
        clo=jnp.asarray(a["clo"]),
        n_rb=a["n_rb"],
        n_cb=a["n_cb"],
        n_node=n_node,
        rps=rps,
        w_blocks=a["w_blocks"],
        g_lo=(None if trim_groups is None
              else jnp.asarray(a["g_lo"], dtype=jnp.int32)),
        n_g_total=a["n_g_total"],
        affine_stride=a_stride,
        affine_off=a_off,
        row_scale=(None if a["row_scale"] is None
                   else jnp.asarray(a["row_scale"])),
    )


def _band_kernel(
    clo_ref,  # scalar prefetch: (n_g,) window starts
    x_hbm,  # (n_cb*BLOCK [+pad], Hpad) HBM
    slab_ref,  # (rps*BLOCK, W*BLOCK) VMEM — auto-pipelined regular operand
    out_ref,  # (rps*BLOCK, Hpad) VMEM — auto-pipelined regular output
    xwin,  # (NBUF, W*BLOCK, Hpad) VMEM scratch
    sems,  # (NBUF,) DMA semaphores
    *,
    block_dtype,
    n_g,
    wb,
):
    i = pl.program_id(0)

    def xdma(c):
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(clo_ref[c] * BLOCK, BLOCK), wb * BLOCK), :],
            xwin.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        xdma(0).start()

    @pl.when(i + 1 < n_g)
    def _():
        xdma(i + 1).start()

    xdma(i).wait()
    cdt = jnp.bfloat16 if block_dtype == jnp.int8 else block_dtype
    out_ref[...] = jnp.dot(
        slab_ref[...].astype(cdt),
        xwin[jax.lax.rem(i, NBUF)].astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_precision_for(cdt),
    )


def _band_kernel_xvmem(
    clo_ref,  # scalar prefetch: (n_g,) window starts
    x_hbm,  # (n_cb*BLOCK, H) HBM — loaded into xfull ONCE at step 0
    slab_ref,  # (rps*BLOCK, W*BLOCK) VMEM — auto-pipelined regular operand
    out_ref,  # (rps*BLOCK, H) VMEM — auto-pipelined regular output
    xfull,  # (n_cb*BLOCK, H) VMEM — persists across all grid steps
    xsem,
    *,
    block_dtype,
    wb,
):
    """Whole-x-in-VMEM variant: no per-step x transfer at all — the matmul
    reads the window directly out of the persistent ``xfull`` scratch. This
    removes the per-step DMA-latency stall that floors the streamed variant
    (~3 us/step on v5e regardless of transfer size) and needs no feature-dim
    lane padding. Used when x fits the VMEM budget (bf16 features at GLASS
    hidden sizes reach ~80k nodes)."""
    i = pl.program_id(0)
    xdma = pltpu.make_async_copy(x_hbm, xfull, xsem)

    @pl.when(i == 0)
    def _():
        xdma.start()
        xdma.wait()

    cdt = jnp.bfloat16 if block_dtype == jnp.int8 else block_dtype
    out_ref[...] = jnp.dot(
        slab_ref[...].astype(cdt),
        # cast to the compute dtype in-registers (Mosaic rejects mixed-dtype
        # dots); x stays bf16 in VMEM when the activation stream is bf16
        xfull[
            pl.ds(pl.multiple_of(clo_ref[i] * BLOCK, BLOCK), wb * BLOCK), :
        ].astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_precision_for(cdt),
    )


def _band_kernel_xvmem_gps(
    clo_ref,  # scalar prefetch: (n_g,) window starts
    x_hbm,  # (n_cb*BLOCK, H) HBM — loaded into xfull ONCE at step 0
    slab_ref,  # (gps, rps*BLOCK, W*BLOCK) VMEM — auto-pipelined multi-group block
    out_ref,  # (gps*rps*BLOCK, H) VMEM — auto-pipelined regular output
    xfull,  # (n_cb*BLOCK, H) VMEM — persists across all grid steps
    xsem,
    *,
    block_dtype,
    wb,
    rps,
    gps,
):
    """Multi-group whole-x-in-VMEM variant (the roofline fix, RESULTS.md
    round 3): one grid step fetches ``gps`` consecutive groups' slabs as ONE
    auto-pipelined block — gps x larger DMA transfers — and runs gps MXU
    dots against their windows of the persistent x. Measured on v5e: a
    single DMA stream reaches ~675 GB/s once transfers are MB-scale
    (tools/hbm_probe.py), so per-step slab bytes, not stream count, set the
    kernel's bandwidth; the rps=2 layout's 256 KB steps were the round-2
    ~156 GB/s ceiling."""
    i = pl.program_id(0)
    xdma = pltpu.make_async_copy(x_hbm, xfull, xsem)

    @pl.when(i == 0)
    def _():
        xdma.start()
        xdma.wait()

    cdt = jnp.bfloat16 if block_dtype == jnp.int8 else block_dtype
    for j in range(gps):
        g = i * gps + j
        out_ref[j * rps * BLOCK:(j + 1) * rps * BLOCK, :] = jnp.dot(
            slab_ref[j].astype(cdt),
            xfull[
                pl.ds(pl.multiple_of(clo_ref[g] * BLOCK, BLOCK), wb * BLOCK), :
            ].astype(cdt),
            preferred_element_type=jnp.float32,
            precision=_precision_for(cdt),
        )


def _lane_pad(h: int) -> int:
    """VMEM (and tiled-HBM) arrays pad the minor dim to 128 lanes; all VMEM
    accounting must use the padded width (learned the hard way: a 57k x 64
    bf16 scratch is 14.7 MB, not 7.3)."""
    return -(-h // 128) * 128


def _pick_gps(n_g: int, per_group_bytes: int, fixed_bytes: int) -> int:
    """Largest divisor of n_g (<= 32) such that
    ``fixed_bytes + gps * per_group_bytes`` fits the VMEM budget. 1 = the
    single-group kernels (also the fallback when n_g has no small
    divisors)."""
    for gps in (32, 16, 8, 28, 14, 7, 4, 2):
        if n_g % gps:
            continue
        if fixed_bytes + gps * per_group_bytes <= _VMEM_BUDGET:
            return gps
    return 1


def _band_kernel_gps(
    clo_ref,  # scalar prefetch: (n_g,) window starts
    x_hbm,  # (n_cb*BLOCK [+pad], Hpad) HBM
    slab_ref,  # (gps, rps*BLOCK, W*BLOCK) VMEM — auto-pipelined multi-group
    out_ref,  # (gps*rps*BLOCK, Hpad) VMEM — auto-pipelined regular output
    xwin,  # (NBUF, gps, W*BLOCK, Hpad) VMEM scratch
    sems,  # (NBUF, gps) DMA semaphores
    *,
    block_dtype,
    n_sg,
    wb,
    rps,
    gps,
):
    """Streamed multi-group variant: one grid step = ONE gps-group slab
    block (auto-pipelined — a single MB-scale DMA, which tools/hbm_probe.py
    measured at ~670 GB/s vs ~156 effective for the 256 KB single-group
    steps) + gps small per-group x-window DMAs in flight together + gps MXU
    dots. Used when whole-x doesn't fit VMEM next to the multi-group
    buffers."""
    i = pl.program_id(0)

    def xdma(c, j):
        slot = jax.lax.rem(c, NBUF)
        g = c * gps + j
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(clo_ref[g] * BLOCK, BLOCK), wb * BLOCK), :],
            xwin.at[slot, j],
            sems.at[slot, j],
        )

    @pl.when(i == 0)
    def _():
        for j in range(gps):
            xdma(0, j).start()

    @pl.when(i + 1 < n_sg)
    def _():
        for j in range(gps):
            xdma(i + 1, j).start()

    slot = jax.lax.rem(i, NBUF)
    cdt = jnp.bfloat16 if block_dtype == jnp.int8 else block_dtype
    for j in range(gps):
        xdma(i, j).wait()
        out_ref[j * rps * BLOCK:(j + 1) * rps * BLOCK, :] = jnp.dot(
            slab_ref[j].astype(cdt),
            xwin[slot, j].astype(cdt),
            preferred_element_type=jnp.float32,
            precision=_precision_for(cdt),
        )


def _band_kernel_affine(
    x_hbm,  # (rows_pad, Hpad) HBM — pre-shifted by pad_lo blocks
    slabs_ref,  # (gps, rps*BLOCK, W*BLOCK) VMEM — auto-pipelined multi-group
    out_ref,  # (gps*rps*BLOCK, Hpad) VMEM — auto-pipelined regular output
    xpan,  # (NBUF, panel_rows, Hpad) VMEM scratch
    sems,  # (NBUF,) DMA semaphores
    *,
    block_dtype,
    n_sg,
    wb,
    rps,
    gps,
    stride,
    base,  # static first-panel column block (off + pad_lo)
):
    """Affine (block-DIA) multi-group kernel — the round-3 roofline fix.

    With the window law clo[g] = g*stride + off, EVERYTHING is static: one
    grid step moves one gps-group slab block (a single MB-scale DMA — the
    regime tools/hbm_probe.py measured at ~670 GB/s) plus ONE contiguous
    x panel of ((gps-1)*stride + wb) blocks that covers all gps windows, and
    each dot slices its window at the static offset j*stride inside the
    panel. Two DMAs per step instead of 1-per-group: per-DMA fixed cost
    (~1.3 us, the round-2 kernel's real ceiling) amortizes over gps groups."""
    i = pl.program_id(0)
    panel_rows = ((gps - 1) * stride + wb) * BLOCK

    def pdma(c):
        slot = jax.lax.rem(c, NBUF)
        start = (c * gps * stride + base) * BLOCK
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(start, BLOCK), panel_rows), :],
            xpan.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        pdma(0).start()

    @pl.when(i + 1 < n_sg)
    def _():
        pdma(i + 1).start()

    pdma(i).wait()
    slot = jax.lax.rem(i, NBUF)
    for j in range(gps):
        out_ref[j * rps * BLOCK:(j + 1) * rps * BLOCK, :] = jnp.dot(
            slabs_ref[j],
            xpan[slot, j * stride * BLOCK: j * stride * BLOCK + wb * BLOCK, :]
            .astype(block_dtype),
            preferred_element_type=jnp.float32,
            precision=_precision_for(block_dtype),
        )


def _band_kernel_affine_q(
    x_hbm,
    slabs_ref,  # (gps, rps*BLOCK, W*BLOCK) VMEM int8
    scale_ref,  # (gps, rps*BLOCK, BLOCK) VMEM f32 per-output-row scales
    out_ref,
    xpan,
    sems,
    *,
    n_sg,
    wb,
    rps,
    gps,
    stride,
    base,
):
    """int8 variant of _band_kernel_affine: slabs are int8 (HALF the bf16
    stream bytes — the kernel is DMA-bound, so ~2x), converted to bf16 with
    no multiply; the per-output-row dequantization scale multiplies the dot
    result (out rows), which costs one VPU pass over the (rps*128, H) block."""
    i = pl.program_id(0)
    panel_rows = ((gps - 1) * stride + wb) * BLOCK

    def pdma(c):
        slot = jax.lax.rem(c, NBUF)
        start = (c * gps * stride + base) * BLOCK
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(start, BLOCK), panel_rows), :],
            xpan.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        pdma(0).start()

    @pl.when(i + 1 < n_sg)
    def _():
        pdma(i + 1).start()

    pdma(i).wait()
    slot = jax.lax.rem(i, NBUF)
    for j in range(gps):
        acc = jnp.dot(
            slabs_ref[j].astype(jnp.bfloat16),
            xpan[slot, j * stride * BLOCK: j * stride * BLOCK + wb * BLOCK, :],
            preferred_element_type=jnp.float32,
        )
        out_ref[j * rps * BLOCK:(j + 1) * rps * BLOCK, :] = (
            acc * scale_ref[j][:, :1]
        )


def _pick_gps_affine(n_g: int, stride: int, wb: int, rps: int, hp: int,
                     slab_isz: int, x_isz: int, scale_isz: int = 0) -> int:
    """Largest divisor of n_g whose slab block + x panel + out blocks (+
    dequant scale blocks when int8) fit.

    Raises when even gps=1 exceeds the VMEM budget: the affine path has no
    alternate kernel, so a direct ``build_band(affine=...)`` caller that
    bypasses ``build_graph``'s band_vmem_ok gate would otherwise hit an
    opaque Mosaic VMEM overflow at compile time. Rebuild with a per-group
    window layout (``affine=None``) or a smaller rps/width instead."""
    for gps in (32, 16, 8, 28, 14, 7, 4, 2, 1):
        if n_g % gps:
            continue
        slab = 2 * gps * rps * BLOCK * wb * BLOCK * slab_isz
        out = 2 * gps * rps * BLOCK * hp * 4
        pan = NBUF * ((gps - 1) * stride + wb) * BLOCK * hp * x_isz
        sc = 2 * gps * rps * BLOCK * BLOCK * scale_isz
        if slab + out + pan + sc <= _VMEM_BUDGET:
            return gps
    raise ValueError(
        f"affine band working set exceeds the VMEM budget even at gps=1 "
        f"(rps={rps}, w_blocks={wb}, hp={hp}, budget={_VMEM_BUDGET}): "
        "rebuild the layout with a per-group window (affine=None) or a "
        "smaller rps/window width"
    )


def _band_kernel_striped(
    clo_ref,  # scalar prefetch: (n_g,) window starts
    x_hbm,  # (n_cb*BLOCK, Hpad) HBM
    slabs_hbm,  # (n_g, rps*BLOCK, W*BLOCK) HBM
    out_ref,  # (rps*BLOCK, Hpad) VMEM — auto-pipelined regular output
    sblk,  # (NBUF, rps*BLOCK, W*BLOCK) VMEM slab buffers
    xwin,  # (NBUF, W*BLOCK, Hpad) VMEM x-window buffers
    ssems,  # (NBUF, S) slab-stripe DMA semaphores
    xsems,  # (NBUF,) x-window DMA semaphores
    *,
    block_dtype,
    n_g,
    wb,
    stripes,
    rows,  # rows per stripe (rps*BLOCK // stripes)
):
    """Striped variant: the slab transfer is split into ``stripes`` parallel
    DMAs on separate semaphores. A single DMA stream measured ~150 GB/s
    effective on v5e (both this kernel's auto-pipelined operand and the
    chunked BCSR kernel hit the same ceiling); parallel stripes engage
    multiple DMA channels to push toward the ~800 GB/s HBM roofline."""
    i = pl.program_id(0)

    def sdma(c, s):
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            slabs_hbm.at[c, pl.ds(s * rows, rows)],
            sblk.at[slot, pl.ds(s * rows, rows)],
            ssems.at[slot, s],
        )

    def xdma(c):
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(clo_ref[c] * BLOCK, BLOCK), wb * BLOCK), :],
            xwin.at[slot],
            xsems.at[slot],
        )

    def start(c):
        for s in range(stripes):
            sdma(c, s).start()
        xdma(c).start()

    @pl.when(i == 0)
    def _():
        start(0)

    @pl.when(i + 1 < n_g)
    def _():
        start(i + 1)

    for s in range(stripes):
        sdma(i, s).wait()
    xdma(i).wait()
    slot = jax.lax.rem(i, NBUF)
    cdt = jnp.bfloat16 if block_dtype == jnp.int8 else block_dtype
    out_ref[...] = jnp.dot(
        sblk[slot].astype(cdt),
        xwin[slot].astype(cdt),
        preferred_element_type=jnp.float32,
        precision=_precision_for(cdt),
    )


@functools.partial(jax.jit, static_argnames=("interpret", "stripes"))
def band_spmm(
    band: BandedAdj,
    x: jnp.ndarray,
    interpret: bool = False,
    stripes: int = 1,
) -> jnp.ndarray:
    """out = A @ x with A in banded-slab form. x: (n_node, H); returns
    (n_node, H) f32. stripes > 1 splits the slab transfer into parallel
    DMA channels (see _band_kernel_striped)."""
    h_in = x.shape[1]
    block_dtype = band.slabs.dtype
    x_dtype = (jnp.bfloat16
               if block_dtype in (jnp.bfloat16, jnp.int8) else x.dtype)
    wb = band.w_blocks
    rps = band.rps
    n_g = band.n_groups
    itemsize = jnp.dtype(x_dtype).itemsize
    n_pad = band.n_cb * BLOCK
    if x.shape[0] > n_pad:
        raise ValueError(
            f"x has {x.shape[0]} rows but the band layout covers only "
            f"{n_pad} columns (n_cb={band.n_cb})"
        )
    # VMEM accounting uses LANE-PADDED widths (a (N, 64) scratch occupies
    # (N, 128) physically — this is what round 3's first gps attempt OOMed on)
    hp = _lane_pad(h_in)
    slab_isz = jnp.dtype(block_dtype).itemsize
    slab_unit = rps * BLOCK * wb * BLOCK * slab_isz  # one group's slab
    out_unit = rps * BLOCK * hp * 4
    xwin_unit = wb * BLOCK * hp * itemsize
    x_full_bytes = n_pad * hp * itemsize
    # Affine layouts go through the affine kernel unconditionally: their
    # window tables may be negative at the top edge or overhang n_cb at the
    # bottom (the exact affine law), which only that kernel's padding
    # handles. The other variants serve per-group-window layouts.
    if band.affine_stride is not None and band.g_lo is None:
        return _band_spmm_affine(band, x, interpret)
    # whole-x-in-VMEM when it fits alongside the pipelined slab/out blocks
    xvmem = x_full_bytes + 2 * slab_unit + 2 * out_unit <= _VMEM_BUDGET
    # streamed x windows must be lane-tile aligned; the VMEM-resident copy
    # needs no feature padding
    h = h_in if xvmem else hp
    # x rows must cover every window: windows are clamped into
    # [0, n_cb*BLOCK), so n_cb*BLOCK rows suffice.
    x_pad = (
        jnp.zeros((n_pad, h), dtype=x_dtype)
        .at[: x.shape[0], :h_in]
        .set(x.astype(x_dtype))
    )

    if xvmem:
        gps = _pick_gps(n_g, 2 * slab_unit + 2 * out_unit, x_full_bytes)
        if gps > 1:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_g // gps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # x: DMA'd once
                    pl.BlockSpec(
                        (gps, rps * BLOCK, wb * BLOCK),
                        lambda i, clo: (i, 0, 0),
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (gps * rps * BLOCK, h), lambda i, clo: (i, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((n_pad, h), x_dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )
            kernel = functools.partial(
                _band_kernel_xvmem_gps, block_dtype=block_dtype, wb=wb,
                rps=rps, gps=gps,
            )
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_g,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # x: DMA'd once
                    pl.BlockSpec(
                        (None, rps * BLOCK, wb * BLOCK), lambda i, clo: (i, 0, 0)
                    ),
                ],
                out_specs=pl.BlockSpec((rps * BLOCK, h), lambda i, clo: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((n_pad, h), x_dtype),
                    pltpu.SemaphoreType.DMA(()),
                ],
            )
            kernel = functools.partial(
                _band_kernel_xvmem, block_dtype=block_dtype, wb=wb
            )
    elif stripes > 1:
        rows = rps * BLOCK // stripes
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_g,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # slabs: manual striped DMA
            ],
            out_specs=pl.BlockSpec((rps * BLOCK, h), lambda i, clo: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((NBUF, rps * BLOCK, wb * BLOCK), block_dtype),
                pltpu.VMEM((NBUF, wb * BLOCK, h), x_dtype),
                pltpu.SemaphoreType.DMA((NBUF, stripes)),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        kernel = functools.partial(
            _band_kernel_striped, block_dtype=block_dtype, n_g=n_g, wb=wb,
            stripes=stripes, rows=rows,
        )
    else:
        gps = _pick_gps(n_g, 2 * slab_unit + NBUF * xwin_unit + 2 * out_unit, 0)
        if gps > 1:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_g // gps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                    pl.BlockSpec(
                        (gps, rps * BLOCK, wb * BLOCK),
                        lambda i, clo: (i, 0, 0),
                    ),
                ],
                out_specs=pl.BlockSpec(
                    (gps * rps * BLOCK, h), lambda i, clo: (i, 0)
                ),
                scratch_shapes=[
                    pltpu.VMEM((NBUF, gps, wb * BLOCK, h), x_dtype),
                    pltpu.SemaphoreType.DMA((NBUF, gps)),
                ],
            )
            kernel = functools.partial(
                _band_kernel_gps, block_dtype=block_dtype, n_sg=n_g // gps,
                wb=wb, rps=rps, gps=gps,
            )
        else:
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(n_g,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                    pl.BlockSpec(
                        (None, rps * BLOCK, wb * BLOCK), lambda i, clo: (i, 0, 0)
                    ),
                ],
                out_specs=pl.BlockSpec((rps * BLOCK, h), lambda i, clo: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((NBUF, wb * BLOCK, h), x_dtype),
                    pltpu.SemaphoreType.DMA((NBUF,)),
                ],
            )
            kernel = functools.partial(
                _band_kernel, block_dtype=block_dtype, n_g=n_g, wb=wb
            )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_g * rps * BLOCK, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(band.clo, x_pad, band.slabs)
    if band.row_scale is not None:
        # per-group int8 layouts dequantize OUTSIDE the kernel (one XLA-fused
        # per-row multiply over the stored groups' rows); the affine kernel
        # applies its scales in-VMEM and returned above
        out = out * band.row_scale[:, :, 0].reshape(-1, 1).astype(jnp.float32)
    if band.g_lo is not None:
        # row-range-trimmed layout: scatter the stored groups' rows back into
        # the full output (g_lo is traced — one program serves every shard)
        full = jnp.zeros((band.total_groups * rps * BLOCK, h), jnp.float32)
        out = jax.lax.dynamic_update_slice(
            full, out, (band.g_lo * (rps * BLOCK), 0)
        )
    return out[: band.n_node, :h_in]


def _band_spmm_affine(band: BandedAdj, x: jnp.ndarray, interpret: bool):
    """Affine-layout SpMM dispatch (see _band_kernel_affine).

    x is LANE-PADDED to 128: Mosaic rejects row-sliced DMA sources whose
    minor dim is not tile-aligned ("Slice shape along dimension 1 must be
    aligned to tiling (128)"), so the panel DMA needs a physically-128-wide
    source. The pad/unpad is one fused XLA pass (~tens of us at em_user
    scale — measured with dispatch-floor-corrected differential timing)."""
    h_in = x.shape[1]
    block_dtype = band.slabs.dtype
    quant = block_dtype == jnp.int8
    x_dtype = (jnp.bfloat16 if (block_dtype == jnp.bfloat16 or quant)
               else x.dtype)
    hp = _lane_pad(h_in)
    stride, off = band.affine_stride, band.affine_off
    wb, rps, n_g = band.w_blocks, band.rps, band.n_groups
    gps = _pick_gps_affine(
        n_g, stride, wb, rps, hp,
        jnp.dtype(block_dtype).itemsize, jnp.dtype(x_dtype).itemsize,
        scale_isz=2 if quant else 0,
    )
    n_sg = n_g // gps
    panel_rows = ((gps - 1) * stride + wb) * BLOCK
    pad_lo = max(0, -off)
    base = off + pad_lo  # >= 0, static
    rows_pad = max(
        (band.n_cb + pad_lo) * BLOCK,
        ((n_g - 1) * stride + base + wb) * BLOCK,
        pad_lo * BLOCK + x.shape[0],
    )
    x_pad = jnp.pad(
        x.astype(x_dtype),
        ((pad_lo * BLOCK, rows_pad - pad_lo * BLOCK - x.shape[0]),
         (0, hp - h_in)),
    )
    in_specs = [
        pl.BlockSpec(memory_space=pl.ANY),  # x: manual panel DMA
        pl.BlockSpec(
            (gps, rps * BLOCK, wb * BLOCK), lambda i: (i, 0, 0)
        ),
    ]
    operands = [x_pad, band.slabs]
    if quant:
        in_specs.append(
            pl.BlockSpec((gps, rps * BLOCK, BLOCK), lambda i: (i, 0, 0))
        )
        operands.append(band.row_scale)
        kernel = functools.partial(
            _band_kernel_affine_q, n_sg=n_sg, wb=wb,
            rps=rps, gps=gps, stride=stride, base=base,
        )
    else:
        kernel = functools.partial(
            _band_kernel_affine, block_dtype=block_dtype, n_sg=n_sg, wb=wb,
            rps=rps, gps=gps, stride=stride, base=base,
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_sg,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((gps * rps * BLOCK, hp), lambda i: (i, 0)),
        scratch_shapes=[
            pltpu.VMEM((NBUF, panel_rows, hp), x_dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_g * rps * BLOCK, hp), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*operands)
    return out[: band.n_node, :h_in]


def _band_tree(b: BandedAdj):
    return (b.slabs, b.clo, b.g_lo, b.row_scale)


def _band_untree(t, meta) -> BandedAdj:
    n_rb, n_cb, n_node, rps, wb, n_g_total, a_stride, a_off = meta
    return BandedAdj(
        slabs=t[0], clo=t[1], n_rb=n_rb, n_cb=n_cb, n_node=n_node,
        rps=rps, w_blocks=wb,
        g_lo=t[2], n_g_total=n_g_total,
        affine_stride=a_stride, affine_off=a_off,
        row_scale=t[3],
    )


@functools.lru_cache(maxsize=None)
def _make_diff_band_spmm(fwd_meta, bwd_meta, interpret: bool, stripes: int,
                         x_dtype: str = "float32"):
    """Differentiable banded SpMM, cached per static config. Backward
    dx = A^T @ g is the SAME kernel over the transposed band layout; the
    cotangent is cast back to the primal x dtype (bf16 activation streams)."""

    @jax.custom_vjp
    def f(fwd_t, bwd_t, x):
        return band_spmm(_band_untree(fwd_t, fwd_meta), x,
                         interpret=interpret, stripes=stripes)

    def fwd(fwd_t, bwd_t, x):
        return f(fwd_t, bwd_t, x), (fwd_t, bwd_t)

    def bwd(res, g):
        fwd_t, bwd_t = res
        dx = band_spmm(_band_untree(bwd_t, bwd_meta), g,
                       interpret=interpret, stripes=stripes)
        return (
            tuple(_zero_cotangent(a) for a in fwd_t),  # adjacency is data
            tuple(_zero_cotangent(a) for a in bwd_t),
            dx.astype(x_dtype),
        )

    f.defvjp(fwd, bwd)
    return f


def _band_meta(b: BandedAdj):
    return (b.n_rb, b.n_cb, b.n_node, b.rps, b.w_blocks, b.n_g_total,
            b.affine_stride, b.affine_off)


# Slab-transfer DMA channels used by the training path (see
# _band_kernel_striped; tuned on TPU v5e at em_user scale).
DEFAULT_STRIPES = 1


def spmm_band(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """SpMM via the banded-slab kernel, differentiable. Requires the layouts
    prebuilt on the Graph (build_graph materializes them when the band gate
    accepts the graph). Falls back to interpret mode off-TPU."""
    fwd = graph.band
    bwd = graph.band_t if graph.band_t is not None else graph.band
    if fwd is None:
        raise ValueError(
            "graph has no banded layout; build_graph(materialize_bcsr=True) "
            "materializes one when the band gate accepts the graph"
        )
    interpret = jax.default_backend() != "tpu"
    f = _make_diff_band_spmm(_band_meta(fwd), _band_meta(bwd), interpret,
                             DEFAULT_STRIPES, jnp.dtype(x.dtype).name)
    return f(_band_tree(fwd), _band_tree(bwd), x)
