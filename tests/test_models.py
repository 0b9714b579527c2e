"""Golden-activation tests for the model layer.

Level (2) of the SURVEY.md §4 test pyramid: identical weights are loaded into
an independent torch oracle (implementing the reference formulas from
impl/models.py, written from the math — not imported code) and into the flax
modules; per-layer outputs must be allclose with dropout disabled.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from glass_tpu.ops.graph import build_graph
from glass_tpu.nn.modules import GLASSConv, EmbZGConv, GLASS, MLP, TorchLinear
from glass_tpu.nn.pretrain import MyGCNConv, EmbGConv, EdgeGNN

N, H, E2 = 40, 8, 120


def small_graph(rng, aggr="mean"):
    src = rng.integers(0, N, size=E2 // 2)
    dst = rng.integers(0, N, size=E2 // 2)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return ei, build_graph(ei, None, N, aggr, materialize_dense=True)


# ---------------- torch oracle (reference math, f32) ----------------


def t_linear(x, kernel, bias):
    return x @ torch.tensor(np.asarray(kernel)) + torch.tensor(np.asarray(bias))


def t_graphnorm(x, p):
    w = torch.tensor(np.asarray(p["weight"]))
    b = torch.tensor(np.asarray(p["bias"]))
    ms = torch.tensor(np.asarray(p["mean_scale"]))
    mean = x.mean(dim=0, keepdim=True)
    out = x - mean * ms
    var = out.pow(2).mean(dim=0, keepdim=True)
    return w * out / (var + 1e-5).sqrt() + b


def t_adj(ei, n, aggr):
    a = torch.zeros(n, n)
    for r, c in zip(ei[0], ei[1]):
        a[r, c] += 1.0
    deg = a.sum(1)
    deg[deg < 0.5] += 1.0
    if aggr == "mean":
        return a / deg[:, None]
    if aggr == "sum":
        return a
    ds = deg.pow(-0.5)
    return ds[:, None] * a * ds[None, :]


def t_glassconv(x, adj, mask, p, z_ratio, act):
    def mix(x1, x0):
        return torch.where(mask, z_ratio * x1 + (1 - z_ratio) * x0,
                           z_ratio * x0 + (1 - z_ratio) * x1)

    x1 = act(t_linear(x, p["trans_1"]["kernel"], p["trans_1"]["bias"]))
    x0 = act(t_linear(x, p["trans_0"]["kernel"], p["trans_0"]["bias"]))
    h = mix(x1, x0)
    h = adj @ h
    h = t_graphnorm(h, p["gn"])
    h = torch.cat([h, x], dim=-1)
    x1 = t_linear(h, p["comb_1"]["kernel"], p["comb_1"]["bias"])
    x0 = t_linear(h, p["comb_0"]["kernel"], p["comb_0"]["bias"])
    return mix(x1, x0)


def t_embzgconv(x_int, z, adj, p, num_layers, z_ratio, act, jk=True):
    mask = torch.tensor(np.asarray(z) > 0.5).reshape(-1, 1)
    h = torch.tensor(np.asarray(p["input_emb"]["embedding"]))[torch.tensor(x_int)]
    h = t_graphnorm(h, p["emb_gn"])
    xs = []
    for layer in range(num_layers):
        h = t_glassconv(h, adj, mask, p[f"conv_{layer}"], z_ratio, act)
        xs.append(h)
        if layer < num_layers - 1:
            h = t_graphnorm(h, p[f"gn_{layer}"])
            h = act(h)
    h = torch.cat(xs, dim=-1) if jk else xs[-1]
    return t_graphnorm(h, p["gn_out"])


# ---------------- tests ----------------


@pytest.mark.parametrize("aggr", ["mean", "sum", "gcn"])
def test_glassconv_matches_oracle(rng, aggr):
    ei, g = small_graph(rng, aggr)
    x = rng.normal(size=(N, H)).astype(np.float32)
    z = (rng.random(N) < 0.3).astype(np.int32)
    mask = jnp.asarray(z > 0).reshape(-1, 1)

    m = GLASSConv(out_channels=H, z_ratio=0.8, dropout=0.0, activation="elu")
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x), mask)
    out = m.apply(params, g, jnp.asarray(x), mask)

    adj = t_adj(ei, N, aggr)
    ref = t_glassconv(
        torch.tensor(x), adj, torch.tensor(z > 0).reshape(-1, 1),
        jax.tree.map(np.asarray, params["params"]), 0.8, torch.nn.functional.elu,
    )
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-5)


def test_embzgconv_matches_oracle(rng):
    ei, g = small_graph(rng, "gcn")
    x_int = rng.integers(0, 5, size=N).astype(np.int32)
    z = (rng.random(N) < 0.3).astype(np.int32)

    m = EmbZGConv(hidden_channels=H, output_channels=H, num_layers=3,
                  max_deg=4, dropout=0.0, activation="elu", z_ratio=0.7, jk=True)
    params = m.init(jax.random.PRNGKey(1), g, jnp.asarray(x_int), jnp.asarray(z))
    out = m.apply(params, g, jnp.asarray(x_int), jnp.asarray(z))
    assert out.shape == (N, 3 * H)

    ref = t_embzgconv(x_int.astype(np.int64), z, t_adj(ei, N, "gcn"),
                      jax.tree.map(np.asarray, params["params"]), 3, 0.7,
                      torch.nn.functional.elu, jk=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=5e-4, atol=5e-5)


def test_glass_full_model_matches_oracle(rng):
    """End-to-end GLASS forward (trunk + size pool + linear head) vs the
    torch oracle with identical weights."""
    ei, g = small_graph(rng, "sum")
    x_int = rng.integers(0, 5, size=(N, 1)).astype(np.int32)
    z = (rng.random(N) < 0.3).astype(np.int32)
    pos = np.array([[0, 1, 2, -1], [5, 6, 7, 8]])

    m = GLASS(max_deg=4, hidden_channels=H, num_layers=2,
              output_channels=(3,), pools=("size",), dropout=0.0,
              activation="elu", z_ratio=0.7, jk=True)
    params = m.init(jax.random.PRNGKey(2), g, jnp.asarray(x_int),
                    jnp.asarray(pos), jnp.asarray(z))
    logits = m.apply(params, g, jnp.asarray(x_int), jnp.asarray(pos), jnp.asarray(z))

    p = jax.tree.map(np.asarray, params["params"])
    emb = t_embzgconv(x_int[:, 0].astype(np.int64), z, t_adj(ei, N, "sum"),
                      p["conv"], 2, 0.7, torch.nn.functional.elu, jk=True)
    pooled = []
    for nodes in [[0, 1, 2], [5, 6, 7, 8]]:
        sel = emb[torch.tensor(nodes)]
        pooled.append(sel.sum(0) / np.sqrt(len(nodes)))  # SizePool
    pooled = torch.stack(pooled)
    ref = t_linear(pooled, p["pred_0"]["kernel"], p["pred_0"]["bias"])
    np.testing.assert_allclose(np.asarray(logits), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_glass_forward_shapes_and_z_none(rng):
    _, g = small_graph(rng)
    x_int = rng.integers(0, 5, size=(N, 1)).astype(np.int32)
    pos = jnp.asarray(np.array([[0, 1, 2, -1], [5, 6, -1, -1]]))
    m = GLASS(max_deg=4, hidden_channels=H, num_layers=2,
              output_channels=(3,), pools=("size",), dropout=0.2,
              activation="elu", z_ratio=0.9, jk=True)
    z = jnp.zeros(N, dtype=jnp.int32)
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x_int), pos, z)
    logits = m.apply(params, g, jnp.asarray(x_int), pos, z)
    assert logits.shape == (2, 3)
    # reference parity (impl/models.py:240-246): z=None builds an all-TRUE
    # mask, equal to z = ones and different from z = zeros
    logits_none = m.apply(params, g, jnp.asarray(x_int), pos, None)
    logits_ones = m.apply(params, g, jnp.asarray(x_int), pos, jnp.ones(N, jnp.int32))
    np.testing.assert_allclose(np.asarray(logits_none), np.asarray(logits_ones), rtol=1e-6)
    assert not np.allclose(np.asarray(logits_none), np.asarray(logits))


def test_glass_multi_channel_features(rng):
    """x with C>1 channels: NodeEmb loops channels and averages
    (reference impl/models.py:336-344)."""
    _, g = small_graph(rng)
    x2 = rng.integers(0, 5, size=(N, 2)).astype(np.int32)
    pos = jnp.asarray(np.array([[0, 1, -1]]))
    m = GLASS(max_deg=4, hidden_channels=H, num_layers=1,
              output_channels=(3,), pools=("mean",), dropout=0.0,
              activation="elu", z_ratio=0.8, jk=True)
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x2), pos, None)
    out2 = m.apply(params, g, jnp.asarray(x2), pos, None)
    # average of the two single-channel applications
    outs = [
        np.asarray(m.apply(params, g, jnp.asarray(x2[:, c:c + 1]), pos, None))
        for c in range(2)
    ]
    # trunk output averages, then pool+head are linear in emb -> logits average
    np.testing.assert_allclose(np.asarray(out2), (outs[0] + outs[1]) / 2,
                               rtol=1e-4, atol=1e-5)


def test_glass_multi_task_heads(rng):
    """preds/pools lists with task selection via static id (reference
    impl/models.py:326-334, multi-task-ready)."""
    _, g = small_graph(rng)
    x_int = rng.integers(0, 5, size=(N, 1)).astype(np.int32)
    pos = jnp.asarray(np.array([[0, 1, -1], [3, 4, 5]]))
    m = GLASS(max_deg=4, hidden_channels=H, num_layers=1,
              output_channels=(3, 1), pools=("mean", "sum"), dropout=0.0,
              activation="elu", z_ratio=0.8, jk=True)
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x_int), pos, None)
    out0 = m.apply(params, g, jnp.asarray(x_int), pos, None, id=0)
    out1 = m.apply(params, g, jnp.asarray(x_int), pos, None, id=1)
    assert out0.shape == (2, 3) and out1.shape == (2, 1)


def test_glass_train_mode_dropout_needs_rng(rng):
    _, g = small_graph(rng)
    x_int = rng.integers(0, 5, size=(N, 1)).astype(np.int32)
    pos = jnp.asarray(np.array([[0, 1, -1]]))
    m = GLASS(max_deg=4, hidden_channels=H, num_layers=1,
              output_channels=(3,), pools=("mean",), dropout=0.5,
              activation="elu", z_ratio=0.9, jk=True)
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x_int), pos, None)
    l1 = m.apply(params, g, jnp.asarray(x_int), pos, None, training=True,
                 rngs={"dropout": jax.random.PRNGKey(1)})
    l2 = m.apply(params, g, jnp.asarray(x_int), pos, None, training=True,
                 rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_mygcnconv_and_embgconv(rng):
    ei, g = small_graph(rng, "mean")
    x = rng.normal(size=(N, H)).astype(np.float32)
    m = MyGCNConv(out_channels=H, activation="relu")
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x))
    out = m.apply(params, g, jnp.asarray(x))
    # oracle: act(linear) -> adj@ -> gn -> concat -> linear
    p = jax.tree.map(np.asarray, params["params"])
    h = torch.relu(t_linear(torch.tensor(x), p["trans"]["kernel"], p["trans"]["bias"]))
    h = t_adj(ei, N, "mean") @ h
    h = t_graphnorm(h, p["gn"])
    h = torch.cat([h, torch.tensor(x)], dim=-1)
    ref = t_linear(h, p["comb"]["kernel"], p["comb"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=2e-4, atol=2e-5)

    trunk = EmbGConv(hidden_channels=H, output_channels=H, num_layers=2,
                     max_deg=4, jk=True)
    xi = jnp.asarray(rng.integers(0, 5, size=N).astype(np.int32))
    tp = trunk.init(jax.random.PRNGKey(1), g, xi)
    out = trunk.apply(tp, g, xi)
    assert out.shape == (N, 2 * H)


def test_edge_gnn_forward(rng):
    _, g = small_graph(rng, "gcn")
    x_int = rng.integers(0, 5, size=(N, 1)).astype(np.int32)
    pos = jnp.asarray(rng.integers(0, N, size=(16, 2)))
    m = EdgeGNN(max_deg=4, hidden_channels=H, num_layers=2)
    params = m.init(jax.random.PRNGKey(0), g, jnp.asarray(x_int), pos)
    out = m.apply(params, g, jnp.asarray(x_int), pos)
    assert out.shape == (16, 1)


def test_torch_linear_init_distribution():
    m = TorchLinear(features=50)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 100)))
    k = np.asarray(params["params"]["kernel"])
    bound = 1 / np.sqrt(100)
    assert k.min() >= -bound and k.max() <= bound
    # roughly uniform: std of U(-b,b) is b/sqrt(3)
    np.testing.assert_allclose(k.std(), bound / np.sqrt(3), rtol=0.1)


def test_mlp_matches_reference_ordering(rng):
    x = rng.normal(size=(10, 6)).astype(np.float32)
    m = MLP(hidden_channels=8, output_channels=2, num_layers=2, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = m.apply(params, jnp.asarray(x))
    p = jax.tree.map(np.asarray, params["params"])
    h = t_linear(torch.tensor(x), p["TorchLinear_0"]["kernel"], p["TorchLinear_0"]["bias"])
    h = torch.relu(h)
    ref = t_linear(h, p["TorchLinear_1"]["kernel"], p["TorchLinear_1"]["bias"])
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)
