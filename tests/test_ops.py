"""Unit tests for the ops layer against dense numpy references.

Mirrors the test pyramid level (1) of SURVEY.md §4: kernels vs dense
reference on the CPU backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph, normalized_edge_weight, degrees
from glass_tpu.ops.spmm import spmm
from glass_tpu.ops.segment import pool_subgraphs, mean_over_nodes
from glass_tpu.ops.norm import graph_norm
from glass_tpu.ops.labeling import max_zero_one, pad2batch, batch2pad


def random_graph(rng, n=50, e=300):
    # undirected: emit both directions, allow duplicates like the datasets do not,
    # but keep it general.
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return ei, n


def dense_adj(ei, w, n):
    d = np.zeros((n, n))
    np.add.at(d, (ei[0], ei[1]), w)
    return d


@pytest.mark.parametrize("aggr", ["sum", "mean", "gcn"])
@pytest.mark.parametrize("mode", ["segment", "dense"])
def test_spmm_matches_dense_reference(rng, aggr, mode):
    ei, n = random_graph(rng)
    w = np.ones(ei.shape[1], dtype=np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)

    # numpy reference with the reference's normalization semantics
    # (impl/models.py:83-111): row-degree, deg<0.5 -> +1.
    a = dense_adj(ei, w, n)
    deg = a.sum(1)
    deg[deg < 0.5] += 1.0
    if aggr == "mean":
        ref = (a / deg[:, None]) @ x
    elif aggr == "sum":
        ref = a @ x
    else:
        ds = deg**-0.5
        ref = (ds[:, None] * a * ds[None, :]) @ x

    g = build_graph(ei, w, n, aggr, materialize_dense=True)
    out = np.asarray(spmm(g, jnp.asarray(x), mode=mode))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_spmm_isolated_node_guard(rng):
    # node 3 has no edges: deg=0 -> guard bumps to 1; mean/gcn must not NaN.
    ei = np.array([[0, 1], [1, 0]])
    for aggr in ["mean", "gcn"]:
        g = build_graph(ei, None, 4, aggr, materialize_dense=True)
        x = jnp.ones((4, 2))
        out = np.asarray(spmm(g, x))
        assert np.isfinite(out).all()
        assert np.allclose(out[3], 0.0)  # no incoming edges


def test_edge_padding_is_inert(rng):
    ei, n = random_graph(rng, n=30, e=100)
    g_small = build_graph(ei, None, n, "sum", materialize_dense=False, edge_bucket=1)
    g_padded = build_graph(ei, None, n, "sum", materialize_dense=False, edge_bucket=4096)
    assert g_padded.row.shape[0] == 4096
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g_small, x, "segment")),
        np.asarray(spmm(g_padded, x, "segment")),
        rtol=1e-5,
        atol=1e-5,
    )


def test_dense_bf16_mode_close_to_f32(rng):
    ei, n = random_graph(rng)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    g32 = build_graph(ei, None, n, "gcn", materialize_dense=True)
    g16 = build_graph(ei, None, n, "gcn", materialize_dense=True, dense_dtype="bf16")
    y32 = np.asarray(spmm(g32, x, "dense"))
    y16 = np.asarray(spmm(g16, x, "dense"))
    scale = np.abs(y32).max()
    assert np.abs(y32 - y16).max() < 2e-2 * scale


def test_normalized_edge_weight_gcn_symmetric():
    ei = np.array([[0, 1, 1, 2], [1, 0, 2, 1]])
    w = normalized_edge_weight(ei, np.ones(4), 3, "gcn")
    # gcn weight for edge (0,1): deg0=1, deg1=2 -> 1/sqrt(2)
    np.testing.assert_allclose(w[0], 1 / np.sqrt(2), rtol=1e-6)


def test_degrees():
    ei = np.array([[0, 0, 1], [1, 2, 0]])
    d = degrees(ei, None, 3)
    np.testing.assert_allclose(d, [2, 1, 0])


@pytest.mark.parametrize("kind", ["sum", "mean", "max", "size"])
def test_pool_subgraphs(rng, kind):
    emb = rng.normal(size=(20, 6)).astype(np.float32)
    pos = np.array([[0, 2, 3], [1, 4, -1], [7, -1, -1], [-1, -1, -1]])
    out = np.asarray(pool_subgraphs(jnp.asarray(emb), jnp.asarray(pos), kind))
    for i, nodes in enumerate([[0, 2, 3], [1, 4], [7], []]):
        if not nodes:
            np.testing.assert_allclose(out[i], 0.0)
            continue
        sel = emb[nodes]
        if kind == "sum":
            ref = sel.sum(0)
        elif kind == "mean":
            ref = sel.mean(0)
        elif kind == "max":
            ref = sel.max(0)
        else:
            ref = sel.sum(0) / np.sqrt(len(nodes))
        np.testing.assert_allclose(out[i], ref, rtol=1e-5, atol=1e-6)


def test_mean_over_nodes(rng):
    emb = rng.normal(size=(10, 4)).astype(np.float32)
    pos = np.array([[0, 1], [2, 3]])
    out = np.asarray(mean_over_nodes(jnp.asarray(emb), jnp.asarray(pos)))
    np.testing.assert_allclose(out[0], emb[[0, 1]].mean(0), rtol=1e-6)


def test_graph_norm_matches_torch_formula(rng):
    """Golden check of GraphNorm against an independent torch implementation
    of the PyG 1.7.2 formula (batch=None whole-graph statistics)."""
    import torch

    x = rng.normal(size=(37, 5)).astype(np.float32)
    weight = rng.normal(size=5).astype(np.float32)
    bias = rng.normal(size=5).astype(np.float32)
    mean_scale = rng.normal(size=5).astype(np.float32)

    tx = torch.tensor(x)
    mean = tx.mean(dim=0, keepdim=True)
    out = tx - mean * torch.tensor(mean_scale)
    var = out.pow(2).mean(dim=0, keepdim=True)
    std = (var + 1e-5).sqrt()
    ref = torch.tensor(weight) * out / std + torch.tensor(bias)

    got = graph_norm(jnp.asarray(x), jnp.asarray(weight), jnp.asarray(bias), jnp.asarray(mean_scale))
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-5, atol=1e-5)


def test_max_zero_one():
    pos = jnp.asarray(np.array([[0, 2, -1], [5, -1, -1]]))
    z = np.asarray(max_zero_one(pos, 8))
    np.testing.assert_array_equal(z, [1, 0, 1, 0, 0, 1, 0, 0])
    # all-padding batch: no node labeled, and node 0 NOT falsely labeled
    z2 = np.asarray(max_zero_one(jnp.full((2, 3), -1), 4))
    np.testing.assert_array_equal(z2, [0, 0, 0, 0])


def test_pad2batch_batch2pad_roundtrip():
    pad = np.array([[0, 2, 3], [1, 4, 5], [6, 7, -1]])
    batch, pos = pad2batch(pad)
    np.testing.assert_array_equal(batch, [0, 0, 0, 1, 1, 1, 2, 2])
    np.testing.assert_array_equal(pos, [0, 2, 3, 1, 4, 5, 6, 7])
    back = batch2pad(np.array([0, 1, 0, 0, 1, 1, 2, 2]))
    np.testing.assert_array_equal(back, [[0, 2, 3], [1, 4, 5], [6, 7, -1]])


def test_planner_honors_autotune_file(tmp_path, monkeypatch):
    """GLASS_TPU_AUTOTUNE overrides the layout planner's cost constants
    (tools/autotune.py contract): constants that make band steps absurdly
    expensive must flip a banded graph's plan to BCSR, and a malformed file
    must fail loudly rather than silently fall back."""
    import json
    from glass_tpu.ops import graph as G

    rng = np.random.default_rng(0)
    # banded pattern: 32 row blocks, window 2 blocks
    rows, cols = [], []
    for b in range(32):
        rows.append(b * 128 + rng.integers(0, 128, size=500))
        c0 = max(0, min(b - 1, 30)) * 128
        cols.append(c0 + rng.integers(0, 2 * 128, size=500))
    r = np.concatenate(rows)
    c = np.concatenate(cols)
    w = np.ones(r.size, np.float32)
    n = 32 * 128

    monkeypatch.delenv("GLASS_TPU_AUTOTUNE", raising=False)
    kind0, _, _ = G._plan_block_sparse(r, c, w, n, "f32", None, "auto", True)
    assert kind0 == "band"

    p = tmp_path / "tune.json"
    p.write_text(json.dumps({
        "band_step_cost_s": 10.0,  # absurd: any band plan loses
        "bcsr_step_cost_s": 1e-9,
        "stream_bps": 1e15,
    }))
    # env read is live (no process-wide cache): setting the variable after
    # earlier plans must take effect on the next plan
    monkeypatch.setenv("GLASS_TPU_AUTOTUNE", str(p))
    kind1, _, _ = G._plan_block_sparse(r, c, w, n, "f32", None, "auto", True)
    assert kind1 == "bcsr"

    bad = tmp_path / "bad.json"
    bad.write_text("{}")
    monkeypatch.setenv("GLASS_TPU_AUTOTUNE", str(bad))
    with pytest.raises(ValueError, match="autotune"):
        G._plan_block_sparse(r, c, w, n, "f32", None, "auto", True)

    monkeypatch.delenv("GLASS_TPU_AUTOTUNE")


def test_ensure_autotune_reuse_and_fit(tmp_path, monkeypatch):
    """ensure_autotune (the CLI --autotune flag): an existing calibration
    is reused without probing; a missing one triggers exactly one fit and
    is saved; both set GLASS_TPU_AUTOTUNE so _cost_constants picks the
    fitted values up."""
    import json
    from glass_tpu.ops import autotune as at
    from glass_tpu.ops import graph as G

    import os

    monkeypatch.delenv("GLASS_TPU_AUTOTUNE", raising=False)
    fitted = {"band_step_cost_s": 5e-6, "bcsr_step_cost_s": 7e-6,
              "stream_bps": 123e9}
    calls = []
    monkeypatch.setattr(at, "fit_cost_constants",
                        lambda **kw: calls.append(1) or dict(fitted))

    # ensure_autotune sets GLASS_TPU_AUTOTUNE *directly* (its contract: arm
    # the whole process), outside monkeypatch's book-keeping — a trailing
    # monkeypatch.delenv would RE-restore that leaked value at teardown and
    # poison every later planner test, so clean up with a plain finally.
    try:
        p = tmp_path / "cal.json"
        out = at.ensure_autotune(str(p))  # missing -> fit once + save
        assert out == str(p) and p.exists() and calls == [1]
        assert json.loads(p.read_text())["stream_bps"] == 123e9
        assert G._cost_constants() == (5e-6, 7e-6, 123e9)

        at.ensure_autotune(str(p))  # present -> reused, no second fit
        assert calls == [1]
    finally:
        os.environ.pop("GLASS_TPU_AUTOTUNE", None)
