"""GNN-seg baseline tests: extraction correctness and model oracle checks."""

import numpy as np
import jax
import jax.numpy as jnp
import torch

from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.data.seg import segregate, global_features
from glass_tpu.nn.seg import GSegGNN, DenseGCNConv, DenseGINConv, MaskedGraphNorm


def make_base(rng, n=20):
    ei = np.array([[0, 1, 1, 2, 3, 4], [1, 0, 2, 1, 4, 3]])
    pos = np.array([[0, 1, 2, -1], [3, 4, -1, -1], [0, 3, 4, -1]])
    y = np.array([0, 1, 0])
    mask = np.array([0, 1, 2])
    return BaseGraphData(
        x=np.zeros((n, 1), dtype=np.int64), edge_index=ei,
        edge_weight=np.ones(6, dtype=np.float32), pos=pos, y=y, mask=mask,
    )


def test_segregate_induced_edges(rng):
    base = make_base(rng)
    splits = segregate(base, "one")
    trn = splits["train"]  # subgraph {0,1,2}; L = max real size = 3
    assert trn.mask[0].sum() == 3
    # induced edges: 0-1, 1-0, 1-2, 2-1 (local ids)
    expected = np.zeros((3, 3), dtype=np.float32)
    expected[0, 1] = expected[1, 0] = expected[1, 2] = expected[2, 1] = 1.0
    np.testing.assert_array_equal(trn.adj_sum[0], expected)
    # GCN norm: deg = [1,2,1]; a[0,1] = 1/sqrt(1*2)
    np.testing.assert_allclose(trn.adj_norm[0][0, 1], 1 / np.sqrt(2), rtol=1e-6)
    # test split: subgraph {0,3,4} — edge 3-4 only (0 disconnected from 3,4)
    tst = splits["test"]
    assert tst.adj_sum[0][1, 2] == 1.0 and tst.adj_sum[0][0, 1] == 0.0
    # zero-degree node: normalized row is 0 (PyG gcn_norm masked-fill)
    assert tst.adj_norm[0][0].sum() == 0.0


def test_global_degree_features(rng):
    base = make_base(rng)
    f = global_features(base, "deg")
    # node 1 has degree 2 -> one-hot at index 2
    assert f[1, 2] == 1.0 and f[1].sum() == 1.0


def test_dense_gcn_matches_manual(rng):
    B, L, F, H = 2, 4, 3, 5
    adj = rng.random((B, L, L)).astype(np.float32)
    x = rng.normal(size=(B, L, F)).astype(np.float32)
    m = DenseGCNConv(H)
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(adj), None, jnp.asarray(x))
    out = m.apply(p, jnp.asarray(adj), None, jnp.asarray(x))
    w = np.asarray(p["params"]["kernel"])
    b = np.asarray(p["params"]["bias"])
    ref = adj @ (x @ w) + b
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_dense_gin_matches_manual(rng):
    B, L, F, H = 2, 4, 3, 5
    adj = rng.random((B, L, L)).astype(np.float32)
    x = rng.normal(size=(B, L, F)).astype(np.float32)
    m = DenseGINConv(H)
    p = m.init(jax.random.PRNGKey(0), None, jnp.asarray(adj), jnp.asarray(x))
    out = m.apply(p, None, jnp.asarray(adj), jnp.asarray(x))
    w = np.asarray(p["params"]["TorchLinear_0"]["kernel"])
    b = np.asarray(p["params"]["TorchLinear_0"]["bias"])
    ref = (x + adj @ x) @ w + b
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


def test_masked_graphnorm_ignores_padding(rng):
    B, L, F = 2, 5, 3
    x = rng.normal(size=(B, L, F)).astype(np.float32)
    mask = np.ones((B, L), dtype=bool)
    mask[1, 3:] = False
    m = MaskedGraphNorm()
    p = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(mask))
    out1 = m.apply(p, jnp.asarray(x), jnp.asarray(mask))
    x2 = x.copy()
    x2[1, 3:] = 99.0  # garbage in padding must not affect valid outputs
    out2 = m.apply(p, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(out1)[mask], np.asarray(out2)[mask], rtol=1e-5
    )
    # torch oracle over the valid (merged) nodes
    tx = torch.tensor(x[mask])
    mean = tx.mean(0, keepdim=True)
    o = tx - mean
    var = o.pow(2).mean(0, keepdim=True)
    ref = o / (var + 1e-5).sqrt()
    np.testing.assert_allclose(np.asarray(out1)[mask], ref.numpy(), rtol=1e-4, atol=1e-5)


def test_gseg_forward(rng):
    base = make_base(rng)
    splits = segregate(base, "one")
    d = splits["train"]
    model = GSegGNN(hidden_channels=8, output_channels=2, num_layers=2,
                    dropout=0.0, conv="gcn")
    p = model.init(jax.random.PRNGKey(0), jnp.asarray(d.adj_norm),
                   jnp.asarray(d.adj_sum), jnp.asarray(d.feats), jnp.asarray(d.mask))
    out = model.apply(p, jnp.asarray(d.adj_norm), jnp.asarray(d.adj_sum),
                      jnp.asarray(d.feats), jnp.asarray(d.mask))
    assert out.shape == (1, 2)
    assert np.isfinite(np.asarray(out)).all()
