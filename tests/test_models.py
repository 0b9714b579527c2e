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
# single source of reference truth (VERDICT r2 item 6): the same oracle that
# backs the measured baseline is what the flax modules are checked against
from glass_tpu.testing.oracle import (
    t_adj,
    t_embzgconv,
    t_glass,
    t_glassconv,
    t_graphnorm,
    t_linear,
    make_oracle_modules,
)

N, H, E2 = 40, 8, 120


def small_graph(rng, aggr="mean"):
    src = rng.integers(0, N, size=E2 // 2)
    dst = rng.integers(0, N, size=E2 // 2)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return ei, build_graph(ei, None, N, aggr, materialize_dense=True)


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
    ref = t_linear(pooled, p["pred_0"])
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
    h = torch.relu(t_linear(torch.tensor(x), p["trans"]))
    h = t_adj(ei, N, "mean") @ h
    h = t_graphnorm(h, p["gn"])
    h = torch.cat([h, torch.tensor(x)], dim=-1)
    ref = t_linear(h, p["comb"])
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
    h = t_linear(torch.tensor(x), p["TorchLinear_0"])
    h = torch.relu(h)
    ref = t_linear(h, p["TorchLinear_1"])
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-5, atol=1e-6)


def test_embzgconv_z_none_matches_oracle(rng):
    """z=None quirk parity (impl/models.py:241-245): both the flax trunk and
    the torch oracle must build the all-TRUE mask — VERDICT r2 item 6 caught
    one oracle copy getting this backwards."""
    ei, g = small_graph(rng, "sum")
    x_int = rng.integers(0, 5, size=N).astype(np.int32)
    m = EmbZGConv(hidden_channels=H, output_channels=H, num_layers=2,
                  max_deg=4, dropout=0.0, activation="elu", z_ratio=0.7, jk=True)
    params = m.init(jax.random.PRNGKey(3), g, jnp.asarray(x_int), None)
    out = m.apply(params, g, jnp.asarray(x_int), None)
    ref = t_embzgconv(x_int.astype(np.int64), None, t_adj(ei, N, "sum"),
                      jax.tree.map(np.asarray, params["params"]), 2, 0.7,
                      torch.nn.functional.elu, jk=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=5e-4, atol=5e-5)


def test_oracle_modules_match_functional(rng):
    """The trainable torch modules (used by tools/oracle_baseline.py) must
    compute exactly the functional t_glass math with their own weights —
    one source of reference truth (VERDICT r2 item 6)."""
    mods = make_oracle_modules()
    cfg = dict(hidden_dim=H, conv_layer=2, dropout=0.0, z_ratio=0.7,
               aggr="gcn", pool="size")
    torch.manual_seed(0)
    model = mods["TGLASS"](cfg, 4, 3)
    model.eval()

    src = rng.integers(0, N, size=E2 // 2)
    dst = rng.integers(0, N, size=E2 // 2)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    x_int = rng.integers(0, 5, size=(N,)).astype(np.int64)
    pos = np.array([[0, 1, 2, -1], [5, 6, 7, 8]])
    z = (rng.random(N) < 0.3).astype(np.float32)

    with torch.no_grad():
        out_mod = model(torch.tensor(x_int), torch.tensor(ei.astype(np.int64)),
                        torch.tensor(pos), torch.tensor(z))
        params = {"conv": model.conv.flax_params(),
                  "pred_0": {"kernel": model.pred.weight.t(),
                             "bias": model.pred.bias}}
        out_fn = t_glass(x_int, z, pos, ei, N, "gcn", params, 2, 0.7, "size")
    np.testing.assert_allclose(out_mod.numpy(), out_fn.numpy(), rtol=1e-5, atol=1e-6)

    # z=None path on the module side too (the fixed quirk)
    with torch.no_grad():
        out_none = model(torch.tensor(x_int), torch.tensor(ei.astype(np.int64)),
                         torch.tensor(pos), None)
        out_ones = model(torch.tensor(x_int), torch.tensor(ei.astype(np.int64)),
                         torch.tensor(pos), torch.ones(N))
    np.testing.assert_allclose(out_none.numpy(), out_ones.numpy(), rtol=1e-6)


def test_remat_knob_is_bit_identical(rng, monkeypatch):
    """GLASS_TPU_REMAT=1 (the memory knob, README) must change nothing
    numerically: same loss and bit-equal params after a training epoch."""
    import jax
    import jax.numpy as jnp
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.train.loop import Trainer, TrainConfig

    n, e = 384, 3000
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    x = jnp.asarray(rng.integers(0, 8, size=(n, 1)).astype(np.int32))
    pos = jnp.asarray(np.stack([rng.choice(n, 8, replace=False)
                                for _ in range(4)]))
    y = jnp.asarray(rng.integers(0, 2, 4))

    def run(remat):
        monkeypatch.setenv("GLASS_TPU_REMAT", remat)
        model = GLASS(max_deg=8, hidden_channels=16, num_layers=2,
                      output_channels=(2,), pools=("size",), dropout=0.5,
                      activation="elu", z_ratio=0.75, jk=True)
        tr = Trainer(model, g, x, TrainConfig(lr=1e-3, batch_size=4,
                                              loss="ce", use_z=True),
                     donate=False)
        params, opt_state, plateau = tr.init(0, pos)
        p, o, pl, k, loss = tr.train_epoch(
            params, opt_state, plateau, jax.random.PRNGKey(0),
            pos[None], y[None])
        return float(loss), p

    loss0, p0 = run("0")
    loss1, p1 = run("1")
    assert loss0 == loss1
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
