"""SDDMM and segment-softmax tests against dense numpy references."""

import numpy as np
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.sddmm import sddmm, segment_softmax
from glass_tpu.ops.spmm import spmm


def rand_graph(rng, n=60, e=200):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])]), n


@pytest.mark.parametrize("mode", ["gather", "dense"])
def test_sddmm_matches_reference(rng, mode):
    ei, n = rand_graph(rng)
    g = build_graph(ei, None, n, "sum")
    x = rng.normal(size=(n, 16)).astype(np.float32)
    y = rng.normal(size=(n, 16)).astype(np.float32)
    out = np.asarray(sddmm(g, jnp.asarray(x), jnp.asarray(y), mode=mode))
    row, col = np.asarray(g.row), np.asarray(g.col)
    ref = (x[row] * y[col]).sum(-1)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_segment_softmax_rows_sum_to_one(rng):
    ei, n = rand_graph(rng)
    g = build_graph(ei, None, n, "sum")
    scores = jnp.asarray(rng.normal(size=g.row.shape[0]).astype(np.float32))
    w = np.asarray(segment_softmax(g, scores))
    valid = np.asarray(g.weight) != 0
    assert (w[~valid] == 0).all()  # padding edges excluded
    sums = np.zeros(n)
    np.add.at(sums, np.asarray(g.row)[valid], w[valid])
    rows_with_edges = np.unique(np.asarray(g.row)[valid])
    np.testing.assert_allclose(sums[rows_with_edges], 1.0, rtol=1e-5)


def test_attention_aggregation_composes(rng):
    """SDDMM -> segment_softmax -> SpMM with attention weights: the GAT-style
    composition the kernel pair exists for."""
    import flax  # noqa: F401  (env sanity)
    ei, n = rand_graph(rng, n=40, e=100)
    g = build_graph(ei, None, n, "sum")
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    att = segment_softmax(g, sddmm(g, x))
    g_att = g.replace(weight=att)
    out = np.asarray(spmm(g_att, x, "segment"))
    assert np.isfinite(out).all()
    # attention-weighted rows are convex combinations: bounded by neighbors
    row, col, w = np.asarray(g.row), np.asarray(g.col), np.asarray(att)
    xn = np.asarray(x)
    i = int(row[0])
    nb = col[row == i]
    assert out[i].max() <= xn[nb].max() + 1e-5


def test_attention_conv_forward(rng):
    import jax
    from glass_tpu.nn.modules import AttentionConv

    ei, n = rand_graph(rng, n=40, e=100)
    g = build_graph(ei, None, n, "sum")
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    m = AttentionConv(out_channels=16)
    params = m.init(jax.random.PRNGKey(0), g, x)
    out = m.apply(params, g, x)
    assert out.shape == (40, 16)
    assert np.isfinite(np.asarray(out)).all()
