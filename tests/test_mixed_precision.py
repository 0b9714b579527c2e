"""Mixed-precision (bf16 activation stream) training mode.

The GLASS model body is HBM-bound at production graph sizes; ``dtype=
"bfloat16"`` halves every activation pass's bytes while keeping params,
optimizer state, GraphNorm statistics, and the loss in f32 (nn/modules.py,
ops/norm.py). These tests pin the numerics contract: bf16 forward tracks the
f32 forward, training runs and learns, and no f32 state silently degrades.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.nn.modules import GLASS
from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.labeling import max_zero_one
from glass_tpu.train.loop import Trainer, TrainConfig


@pytest.fixture
def setup(rng):
    n, e = 60, 240
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    x = jnp.asarray(rng.integers(0, 5, size=(n, 1)).astype(np.int32))
    pos = jnp.asarray(
        np.stack([rng.choice(n, size=5, replace=False) for _ in range(8)])
    )
    y = jnp.asarray(rng.integers(0, 3, size=8))
    return g, x, pos, y


def mk_model(dtype):
    return GLASS(
        max_deg=4, hidden_channels=8, num_layers=2, output_channels=(3,),
        pools=("size",), dropout=0.0, activation="elu", z_ratio=0.8, jk=True,
        dtype=dtype,
    )


def test_bf16_forward_tracks_f32(setup):
    g, x, pos, y = setup
    z = max_zero_one(pos, g.n_node)
    m32, m16 = mk_model(None), mk_model("bfloat16")
    params = m32.init(jax.random.PRNGKey(0), g, x, pos, z)
    out32 = m32.apply(params, g, x, pos, z)
    out16 = m16.apply(params, g, x, pos, z)  # identical param pytree
    assert out32.dtype == jnp.float32
    assert out16.dtype == jnp.float32  # head promotes back to f32 logits
    # bf16 has ~3 decimal digits; after 2 conv layers expect ~1e-2 agreement
    np.testing.assert_allclose(
        np.asarray(out16), np.asarray(out32), rtol=0.1, atol=0.05
    )


def test_bf16_params_and_init_stay_f32(setup):
    g, x, pos, y = setup
    z = max_zero_one(pos, g.n_node)
    params = mk_model("bfloat16").init(jax.random.PRNGKey(0), g, x, pos, z)
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32, leaf.dtype


def test_bf16_training_learns(setup):
    g, x, pos, y = setup
    cfg = TrainConfig(lr=1e-2, batch_size=8, loss="ce", use_z=True)
    tr = Trainer(mk_model("bfloat16"), g, x, cfg, donate=False)
    params, opt_state, plateau = tr.init(0, pos)
    key = jax.random.PRNGKey(1)
    pos_b, y_b = pos[None], y[None]
    first = None
    for _ in range(30):
        params, opt_state, plateau, key, loss = tr.train_epoch(
            params, opt_state, plateau, key, pos_b, y_b
        )
        if first is None:
            first = float(loss)
    last = float(loss)
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)
    # optimizer state stays f32
    for leaf in jax.tree.leaves(opt_state):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32


def test_bf16_x_through_pallas_layouts(rng):
    """bf16 activations through the band/BCSR/hybrid kernels (interpret mode
    on CPU): forward tracks the f32 segment path, and the custom-VJP
    cotangent comes back in the primal's dtype."""
    n = 600
    src = rng.integers(0, n, 3000)
    dst = np.clip(src + rng.integers(-100, 100, 3000), 0, n - 1)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "gcn", materialize_dense=False,
                    materialize_bcsr=True)
    from glass_tpu.ops.spmm import spmm

    x32 = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    x16 = x32.astype(jnp.bfloat16)
    ref = spmm(g, x32, "segment")
    out = spmm(g, x16, "pallas")
    assert out.dtype == jnp.float32  # kernels accumulate f32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.05, atol=0.05)
    dx = jax.grad(lambda v: (spmm(g, v, "pallas") ** 2).sum())(x16)
    assert dx.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(dx, dtype=np.float32)).all()


def test_bf16_pretrain_model(setup):
    """EdgeGNN (the SSL pretraining model) also runs with the bf16 stream."""
    from glass_tpu.nn.pretrain import EdgeGNN

    g, x, pos, y = setup
    pairs = jnp.asarray(np.stack([np.asarray(pos[:, 0]), np.asarray(pos[:, 1])], 1))
    m = EdgeGNN(max_deg=4, hidden_channels=8, num_layers=2, dropout=0.0,
                activation="relu", dtype="bfloat16")
    params = m.init(jax.random.PRNGKey(0), g, x, pairs)
    out = m.apply(params, g, x, pairs)
    assert np.isfinite(np.asarray(out, dtype=np.float32)).all()
    for leaf in jax.tree.leaves(params):
        assert leaf.dtype == jnp.float32


def test_bf16_protocol_end_to_end():
    """compute_dtype='bf16' through the experiment protocol (density)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=12, compute_dtype="bf16",
    )
    scores, mean, err = run_experiment(cfg, log=lambda *_: None)
    assert 0.0 <= mean <= 1.0
