"""int8 row-quantized dense-adjacency SpMM (ops/pallas_dense.py) — the
quantized MXU path for the regime the real-world datasets occupy
(mid-scale unstructured graphs the planner routes to 'dense')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.pallas_dense import (
    BLOCK,
    build_dense_q,
    dense_q_spmm,
    dense_q_vmem_ok,
)
from glass_tpu.ops.spmm import spmm


def unstructured(rng, n, e):
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    return np.concatenate([np.stack([src, dst]), np.stack([dst, src])], axis=1)


@pytest.mark.parametrize("aggr", ["gcn", "mean", "sum"])
def test_dense_q_matches_f32(rng, aggr):
    """Forward and custom-VJP gradient within quantization tolerance of the
    f32 dense path; symmetric adjacencies share the transposed layout."""
    n, e = 700, 9000
    ei = unstructured(rng, n, e)
    g32 = build_graph(ei, None, n, aggr, materialize_dense=True)
    g8 = build_graph(ei, None, n, aggr, materialize_dense=True,
                     dense_dtype="int8")
    assert g8.dense is None and g8.dense_q is not None
    if aggr == "mean":  # row normalization breaks weight symmetry
        assert g8.dense_q_t is not g8.dense_q
    else:
        assert g8.dense_q_t is g8.dense_q  # shared storage
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    o32 = np.asarray(spmm(g32, x, "dense"))
    o8 = np.asarray(spmm(g8, x, "dense"))
    assert np.abs(o8 - o32).max() / np.abs(o32).max() < 2e-2
    d8 = jax.grad(lambda v: (spmm(g8, v, "dense") ** 2).sum())(x)
    d32 = jax.grad(lambda v: (spmm(g32, v, "dense") ** 2).sum())(x)
    assert float(jnp.abs(d8 - d32).max() / jnp.abs(d32).max()) < 3e-2


def test_dense_q_wide_features_panel_loop(rng):
    """Feature widths beyond one VMEM panel (JK-concat regime) split into
    lane panels; results must agree with f32 across the seams."""
    n, e = 500, 6000
    ei = unstructured(rng, n, e)
    g32 = build_graph(ei, None, n, "gcn", materialize_dense=True)
    g8 = build_graph(ei, None, n, "gcn", materialize_dense=True,
                     dense_dtype="int8")
    x = jnp.asarray(rng.normal(size=(n, 3 * BLOCK + 40)).astype(np.float32))
    o32 = np.asarray(spmm(g32, x, "dense"))
    o8 = np.asarray(spmm(g8, x, "dense"))
    assert np.abs(o8 - o32).max() / np.abs(o32).max() < 2e-2


def test_dense_q_nonmultiple_shapes(rng):
    """Node counts off the 128 grid: padded rows/cols must stay inert."""
    n, e = 333, 3000
    ei = unstructured(rng, n, e)
    dense = np.zeros((n, n), np.float32)
    g = build_graph(ei, None, n, "sum", materialize_dense=False)
    r, c, w = (np.asarray(a) for a in (g.row, g.col, g.weight))
    np.add.at(dense, (r[: g.n_edge], c[: g.n_edge]), w[: g.n_edge])
    dq = build_dense_q(dense)
    x = jnp.asarray(rng.normal(size=(n, 48)).astype(np.float32))
    out = np.asarray(dense_q_spmm(dq, dq, x, True))
    assert out.shape == (n, 48)
    ref = dense @ np.asarray(x)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-2


def test_dense_q_vmem_gate():
    """Shapes whose resident x cannot fit must be refused at build time —
    build_graph then falls back to a bf16 dense matrix, not an error."""
    assert dense_q_vmem_ok(14587, 14587)  # the hpo regime (the target)
    assert not dense_q_vmem_ok(4_000_000, 4_000_000)


def test_planner_routes_int8_dense(rng):
    """The auto planner's dense candidate is costed at 1 byte/entry under
    int8, so the near-dense regime still routes to 'dense' and builds the
    quantized layout."""
    n, e = 1200, 60000  # ~8% dense: block-sparse layouts degenerate
    ei = unstructured(rng, n, e)
    g = build_graph(ei, None, n, "gcn", materialize_dense=False,
                    materialize_bcsr=True, sparse_layout="auto",
                    dense_dtype="int8")
    assert g.bcsr is None and g.band is None
    assert g.dense_q is not None and g.dense is None
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    gd = build_graph(ei, None, n, "gcn", materialize_dense=True)
    o = np.asarray(spmm(g, x))  # mode=None auto-dispatches to dense_q
    ref = np.asarray(spmm(gd, x, "dense"))
    assert np.abs(o - ref).max() / np.abs(ref).max() < 2e-2


def test_dense_q_grad_bf16_primal(rng):
    """The custom VJP must return a cotangent in the primal x's dtype: under
    --compute_dtype bf16 the activation stream is bf16 while the kernel
    accumulates f32, and a f32 dx makes JAX's transpose rules reject the
    whole training graph (caught wiring the hpo-scale e2e bench leg)."""
    n, e = 512, 5000
    ei = unstructured(rng, n, e)
    g8 = build_graph(ei, None, n, "gcn", materialize_dense=True,
                     dense_dtype="int8")
    g32 = build_graph(ei, None, n, "gcn", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    xb = x.astype(jnp.bfloat16)
    d8 = jax.grad(lambda v: (spmm(g8, v, "dense").astype(jnp.float32) ** 2)
                  .sum())(xb)
    assert d8.dtype == jnp.bfloat16
    d32 = jax.grad(lambda v: (spmm(g32, v, "dense") ** 2).sum())(x)
    rel = float(jnp.abs(d8.astype(jnp.float32) - d32).max()
                / jnp.abs(d32).max())
    assert rel < 5e-2  # int8 quantization + bf16 rounding
