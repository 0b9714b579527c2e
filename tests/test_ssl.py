"""SSL pretraining tests: the link-prediction objective must learn above
chance on a structured graph, and the embedding-table contract must hold."""

import numpy as np
import pytest

from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.train.ssl import SSLConfig, pretrain_once


def two_cluster_graph(rng, n=60, intra=400):
    """Two dense clusters, no inter-cluster edges: LP is easy."""
    half = n // 2
    e1 = rng.integers(0, half, size=(2, intra))
    e2 = rng.integers(half, n, size=(2, intra))
    ei = np.concatenate([e1, e2], axis=1)
    return ei


def test_pretrain_learns_link_prediction(rng):
    ei = two_cluster_graph(rng)
    base = BaseGraphData(
        x=np.zeros((60, 1), dtype=np.int64),
        edge_index=ei,
        edge_weight=np.ones(ei.shape[1], dtype=np.float32),
        pos=np.zeros((1, 2), dtype=np.int64),
        y=np.zeros(1),
        mask=np.zeros(1, dtype=np.int64),
    )
    base.set_degree_feature()
    cfg = SSLConfig(
        dataset="unused", hidden_dim=8, conv_layer=2, dropout=0.0,
        aggr="mean", lr=1e-2, batch_size=256, max_epochs=30,
        eval_every=5, early_stop=100, spmm_mode="segment",
    )
    logs = []
    score, emb = pretrain_once(cfg, base, seed=0, log=logs.append)
    assert emb.shape == (60, 8)
    assert np.isfinite(emb).all()
    # binary F1 well above the ~0.5 coin-flip regime
    assert score > 0.75, f"LP score {score}; logs {logs[-3:]}"


def test_pretrained_table_feeds_glass(rng, tmp_path):
    """The saved table must load into GLASS via the nodeid path (the
    GLASSTest --use_nodeid contract)."""
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.train.loop import Trainer, TrainConfig
    from glass_tpu.train.protocol import _load_pretrained_embedding

    n, h = 30, 8
    ei = two_cluster_graph(rng, n=n, intra=100)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    emb = rng.normal(size=(n, h)).astype(np.float32)
    np.savez(tmp_path / "t_8.npz", embedding=emb)
    loaded = np.load(tmp_path / "t_8.npz")["embedding"]

    model = GLASS(max_deg=n - 1, hidden_channels=h, num_layers=1,
                  output_channels=(2,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.arange(n, dtype=jnp.int32).reshape(n, 1)  # nodeid feature
    pos = jnp.asarray(np.array([[0, 1, -1]]))
    cfg = TrainConfig(batch_size=1, loss="ce", use_z=True)
    tr = Trainer(model, g, x, cfg)
    params, _, _ = tr.init(0, pos)
    params = _load_pretrained_embedding(params, loaded)
    got = np.asarray(params["params"]["conv"]["input_emb"]["embedding"])
    np.testing.assert_allclose(got, emb)
    # forward still works with the injected table
    logits = tr.evaluate(params, pos[None], 1)
    assert np.isfinite(logits).all()
