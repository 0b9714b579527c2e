"""Serving-path tests: checkpoint -> bucketed batched inference."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph
from glass_tpu.nn.modules import GLASS
from glass_tpu.serve import Predictor
from glass_tpu.utils.checkpoint import save_checkpoint


@pytest.fixture
def setup(rng):
    n = 50
    src = rng.integers(0, n, size=150)
    dst = rng.integers(0, n, size=150)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    model = GLASS(max_deg=1, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.ones((n, 1), dtype=jnp.int32)
    pos = jnp.asarray(np.array([[0, 1, -1]]))
    params = model.init(jax.random.PRNGKey(0), g, x, pos, None)
    return model, g, x, params


def test_predictor_matches_direct_forward(setup, rng):
    model, g, x, params = setup
    pred = Predictor(model, g, x, params)
    subs = [[0, 1, 2], [5, 6], [10, 11, 12, 13]]
    out = pred(subs)
    assert out.shape == (3, 3)
    # direct forward with the same padding bucket must agree
    pos = np.full((8, 16), -1, dtype=np.int32)
    for i, s in enumerate(subs):
        pos[i, : len(s)] = s
    from glass_tpu.ops.labeling import max_zero_one

    z = max_zero_one(jnp.asarray(pos), g.n_node)
    ref = np.asarray(model.apply(params, g, x, jnp.asarray(pos), z))[:3]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_predictor_from_checkpoint(setup, tmp_path):
    model, g, x, params = setup
    save_checkpoint(tmp_path / "m.npz", params)
    zero = jax.tree.map(jnp.zeros_like, params)
    pred = Predictor.from_checkpoint(model, g, x, tmp_path / "m.npz", zero)
    out = pred([[0, 1]])
    direct = Predictor(model, g, x, params)([[0, 1]])
    np.testing.assert_allclose(out, direct, rtol=1e-6)


def test_predictor_bucket_reuse_and_overflow(setup):
    model, g, x, params = setup
    pred = Predictor(model, g, x, params, batch_buckets=(2,), width_buckets=(4,))
    pred([[0]])
    pred([[1], [2]])
    assert len(pred._fns) == 1  # same bucket compiled once
    with pytest.raises(ValueError, match="exceeds"):
        pred([[0]] * 3)
    with pytest.raises(ValueError, match="exceeds"):
        pred([[0, 1, 2, 3, 4]])


def test_predictor_int8_adjacency(setup, rng):
    """Serving over an int8 row-quantized adjacency: logits within
    quantization tolerance of the f32 dense graph (production inference
    gets the same --dense_dtype knob as training)."""
    model, g, x, params = setup
    n = g.n_node
    ei = np.stack([np.asarray(g.row)[: g.n_edge],
                   np.asarray(g.col)[: g.n_edge]])
    g8 = build_graph(ei, np.asarray(g.weight)[: g.n_edge], n, "sum",
                     materialize_dense=True, dense_dtype="int8")
    # "sum" + prenormalized weights reproduces g's gcn adjacency exactly
    subs = [[0, 1], [2, 3, 4], [5]]
    ref = Predictor(model, g, x, params)(subs)
    out = Predictor(model, g8, x, params)(subs)
    scale = max(np.abs(ref).max(), 1e-6)
    assert np.abs(out - ref).max() / scale < 3e-2
