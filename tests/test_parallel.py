"""Distributed tests on the host-simulated 8-device CPU mesh (SURVEY.md §4:
"partitioned == replicated allclose" — the multi-node test the reference
never had)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.spmm import spmm
from glass_tpu.ops.labeling import max_zero_one, max_zero_one_local
from glass_tpu.nn.modules import GLASS
from glass_tpu.parallel.mesh import make_mesh
from glass_tpu.parallel.partition import partition_graph
from glass_tpu.parallel.train import ShardedTrainer
from glass_tpu.train.loop import Trainer, TrainConfig


pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs 8 (virtual) devices"
)


def toy(rng, n=50, e=200):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return ei, n


def test_partition_covers_all_edges(rng):
    ei, n = toy(rng)
    pg = partition_graph(ei, None, n, "gcn", 4)
    assert pg.n_edge == ei.shape[1]
    # off-block + own-block (overlap split) edges together cover everything
    nnz = (pg.weight != 0).sum() + (pg.loc_weight != 0).sum()
    assert nnz == pg.n_edge
    g = build_graph(ei, None, n, "gcn", materialize_dense=False)
    total = float(np.asarray(g.weight).sum())
    np.testing.assert_allclose(pg.weight.sum() + pg.loc_weight.sum(), total, rtol=1e-5)
    # no-overlap mode keeps everything in the main arrays
    pg2 = partition_graph(ei, None, n, "gcn", 4, overlap=False)
    assert pg2.loc_row is None
    assert (pg2.weight != 0).sum() == pg.n_edge


@pytest.mark.parametrize("use_dense", [False, True])
@pytest.mark.parametrize("overlap", [False, True])
def test_sharded_spmm_matches_unsharded(rng, use_dense, overlap):
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = toy(rng)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_dense=use_dense,
                         overlap=overlap)
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    def body(x_loc, *gargs):
        row, col, w = gargs[:3]
        i = 3
        dense = None
        if use_dense:
            dense = gargs[i]
            i += 1
        loc = gargs[i: i + 3] if overlap else (None, None, None)
        graph = pg.local_graph(row, col, w, dense, "graph", *loc)
        return spmm(graph, x_loc, "dense" if use_dense else "segment")

    gargs = [jnp.asarray(pg.row), jnp.asarray(pg.col), jnp.asarray(pg.weight)]
    gspecs = [P("graph", None)] * 3
    if use_dense:
        gargs.append(jnp.asarray(pg.dense))
        gspecs.append(P("graph", None, None))
    if overlap:
        gargs += [jnp.asarray(pg.loc_row), jnp.asarray(pg.loc_col),
                  jnp.asarray(pg.loc_weight)]
        gspecs += [P("graph", None)] * 3

    out = shard_map(
        body,
        mesh=mesh,
        in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None),
        check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-5)


def test_ring_spmm_matches_unsharded(rng):
    """ppermute-ring halo exchange == all-gather == unsharded (the collective
    swap changes communication structure, not results)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = toy(rng, n=70, e=300)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))

    K = 4
    pg = partition_graph(ei, None, n, "gcn", K, ring=True)
    assert pg.ring_row is not None and pg.ring_row.shape[:2] == (K, K - 1)
    # ring buckets + local split together cover every edge exactly once
    n_ring = int((pg.ring_weight != 0).sum())
    n_loc = int((pg.loc_weight != 0).sum())
    assert n_ring + n_loc == pg.n_edge
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    def body(x_loc, *gargs):
        graph = pg.local_graph(gargs[0], gargs[1], gargs[2], None, "graph",
                               *gargs[3:6], *gargs[6:9])
        assert graph.ring_row is not None
        return spmm(graph, x_loc, "segment")  # auto-promotes to ring

    gargs = [jnp.asarray(a) for a in
             (pg.row, pg.col, pg.weight, pg.loc_row, pg.loc_col,
              pg.loc_weight, pg.ring_row, pg.ring_col, pg.ring_weight)]
    gspecs = [P("graph", None)] * 6 + [P("graph", None, None)] * 3
    out = shard_map(
        body, mesh=mesh,
        in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None),
        check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-5)


def test_ring_training_matches_single_device(rng):
    """A ShardedTrainer built on ring buckets reproduces the unsharded
    whole-epoch step."""
    ei, n = toy(rng, n=50, e=200)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref_tr = Trainer(model, g, jnp.asarray(x.astype(np.int32)), cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    rngk = jax.random.PRNGKey(7)
    ref_params, _, _, _, ref_loss = ref_tr.train_epoch(
        params, opt_state, plateau, rngk,
        jnp.asarray(pos[None]), jnp.asarray(y[None]),
    )

    pg = partition_graph(ei, None, n, "mean", 4, ring=True)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    assert st.has_ring
    sh_params, sh_opt, sh_loss = st.train_step(
        params, st.tx.init(params), plateau.lr, rngk, pos, y
    )
    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2)


def test_max_zero_one_local_blocks():
    pos = jnp.asarray(np.array([[3, 12, -1]]))
    full = np.asarray(max_zero_one(pos, 16))
    parts = [np.asarray(max_zero_one_local(pos, 8, off)) for off in (0, 8)]
    np.testing.assert_array_equal(np.concatenate(parts), full)


def test_sharded_training_matches_single_device(rng):
    """One train step on a (2 data x 4 graph) mesh must match the unsharded
    Trainer step: same params in, allclose params out (dropout off).

    Node features are varied (not uniform): with uniform features GraphNorm
    sits in a zero-variance regime (std = sqrt(eps)) that amplifies f32
    reduction-order noise ~300x, which would swamp the comparison."""
    ei, n = toy(rng, n=50, e=200)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)

    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    # single-device reference step
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref_tr = Trainer(model, g, jnp.asarray(x.astype(np.int32)), cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    rngk = jax.random.PRNGKey(7)
    ref_params, _, _, _, ref_loss = ref_tr.train_epoch(
        params, opt_state, plateau, rngk,
        jnp.asarray(pos[None]), jnp.asarray(y[None]),
    )

    # sharded step with the SAME initial params
    pg = partition_graph(ei, None, n, "mean", 4)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    sh_params, sh_opt, sh_loss = st.train_step(
        params, st.tx.init(params), plateau.lr, rngk, pos, y
    )

    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-4)
    # post-adam params: identical up to f32 reduction-order noise in the
    # gradients (adam normalizes, so compare with an absolute tolerance a
    # couple of orders below the 1e-2 step size)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2)


@pytest.mark.parametrize("spmm_mode", [None, "dense"])
def test_sharded_protocol_end_to_end(spmm_mode):
    """The experiment protocol runs unchanged over a (2 data x 4 graph) mesh
    via the Trainer-compatible ShardedTrainer facade (also with the dense
    SpMM strategy, which requires the partition to materialize row blocks)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=18 if spmm_mode is None else 2,
        graph_shards=4, data_shards=2, spmm_mode=spmm_mode,
    )
    logs = []
    scores, mean, err = run_experiment(cfg, log=logs.append)
    assert 0.0 <= mean <= 1.0
    if spmm_mode is None:
        assert any("iter" in l for l in logs), logs[-3:]


def test_ring_protocol_end_to_end():
    """ExperimentConfig(ring=True) trains over the ppermute-ring halo
    exchange end to end."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=2, graph_shards=4, data_shards=2, ring=True,
    )
    scores, mean, err = run_experiment(cfg, log=lambda *_: None)
    assert 0.0 <= mean <= 1.0


def test_auto_trainer_matches_single_device(rng):
    """GSPMD auto-sharded DP: identical program partitioned over 8 devices
    must reproduce the single-device epoch bit-for-bit (up to f32 order)."""
    from glass_tpu.parallel.auto import AutoTrainer
    from glass_tpu.parallel.mesh import make_mesh

    ei, n = toy(rng)
    n_sub, L = 16, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.asarray(rng.integers(0, 5, size=(n, 1)).astype(np.int32))
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    cfg = TrainConfig(lr=1e-2, batch_size=8, loss="ce", use_z=True)

    ref = Trainer(model, g, x, cfg, donate=False)
    params, opt_state, plateau = ref.init(0, jnp.asarray(pos[:8]))
    key = jax.random.PRNGKey(3)
    pos_b = jnp.asarray(pos.reshape(2, 8, L))
    y_b = jnp.asarray(y.reshape(2, 8))
    r_params, _, _, _, r_loss = ref.train_epoch(params, opt_state, plateau, key, pos_b, y_b)

    mesh = make_mesh(graph_shards=1, data_shards=8)
    auto = AutoTrainer(model, g, x, cfg, mesh)
    a_params, _, _, _, a_loss = auto.train_epoch(
        params, auto.tx.init(params), plateau, key, pos_b, y_b
    )
    np.testing.assert_allclose(float(a_loss), float(r_loss), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(r_params), jax.tree.leaves(a_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-5)

    # eval too
    r_logits = ref.evaluate(params, pos_b, n_sub)
    a_logits = auto.evaluate(params, pos_b, n_sub)
    np.testing.assert_allclose(a_logits, r_logits, rtol=1e-4, atol=1e-5)


def test_sharded_epoch_matches_per_batch_steps(rng):
    """The whole-epoch shard_map scan (one dispatch) must reproduce the
    per-batch train_step sequence exactly — same rng threading, same plateau
    math (VERDICT round-1 item 2 'done' criterion)."""
    from glass_tpu.train.schedule import plateau_step

    ei, n = toy(rng)
    nb, B, L = 3, 8, 5
    pos_b = np.stack([np.stack([rng.choice(n, size=L, replace=False)
                                for _ in range(B)]) for _ in range(nb)])
    y_b = rng.integers(0, 3, size=(nb, B))

    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=B, loss="ce", use_z=True)

    pg = partition_graph(ei, None, n, "mean", 4)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    params, opt_state, plateau = st.init(0, pos_b[0])

    # reference: the per-batch step sequence with host-side rng threading
    rngk = jax.random.PRNGKey(11)
    p_ref, o_ref, r_ref = params, opt_state, rngk
    losses = []
    for b in range(nb):
        r_ref, _ = jax.random.split(r_ref)
        p_ref, o_ref, loss = st.train_step(
            p_ref, o_ref, plateau.lr, r_ref, pos_b[b], y_b[b]
        )
        losses.append(float(loss))
    ref_mean = float(np.mean(losses))

    # one-dispatch epoch program
    p_new, _, plat_new, _, loss_new = st.train_epoch(
        params, opt_state, plateau, rngk, jnp.asarray(pos_b), jnp.asarray(y_b)
    )
    np.testing.assert_allclose(loss_new, ref_mean, rtol=1e-5)
    for a, b_ in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4)
    exp_plat = plateau_step(plateau, ref_mean, factor=cfg.resi, min_lr=cfg.min_lr,
                            patience=cfg.plateau_patience,
                            threshold=cfg.plateau_threshold)
    np.testing.assert_allclose(float(plat_new.lr), float(exp_plat.lr))


def test_sharded_train_epochs_matches_epoch_loop(rng):
    """K epochs as one program == K train_epoch dispatches (plateau in-scan)."""
    ei, n = toy(rng)
    K, nb, B, L = 2, 2, 8, 5
    pos_bs = np.stack([np.stack([np.stack([rng.choice(n, size=L, replace=False)
                                           for _ in range(B)])
                                 for _ in range(nb)]) for _ in range(K)])
    y_bs = rng.integers(0, 3, size=(K, nb, B))

    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.9, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=B, loss="ce", use_z=True)

    pg = partition_graph(ei, None, n, "sum", 4)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    params, opt_state, plateau = st.init(1, pos_bs[0, 0])
    rngk = jax.random.PRNGKey(5)

    p1, o1, plat1, r1 = params, opt_state, plateau, rngk
    losses_ref = []
    for k in range(K):
        p1, o1, plat1, r1, loss = st.train_epoch(p1, o1, plat1, r1,
                                                 pos_bs[k], y_bs[k])
        losses_ref.append(loss)

    p2, _, plat2, _, losses = st.train_epochs(
        params, opt_state, plateau, rngk, pos_bs, y_bs
    )
    np.testing.assert_allclose(losses, losses_ref, rtol=1e-5)
    np.testing.assert_allclose(float(plat2.lr), float(plat1.lr))
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-5, rtol=1e-4)


def test_sharded_batch_divisibility_error(rng):
    """A batch that does not divide the data axis raises a clear ValueError
    instead of an opaque shard_map failure (ADVICE round-1)."""
    ei, n = toy(rng)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.9, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(batch_size=3, loss="ce", use_z=True)
    pg = partition_graph(ei, None, n, "sum", 4)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    params, _, _ = st.init(0, np.full((4, 5), -1))
    with pytest.raises(ValueError, match="data"):
        st.eval_step(params, np.full((3, 5), -1))


def test_auto_sharding_protocol_end_to_end():
    """sharding='auto' (GSPMD DP) drives the full protocol from the config
    surface (VERDICT round-1 weak #6: AutoTrainer was API-only)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=8,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=4, data_shards=8, sharding="auto",
    )
    scores, mean, err = run_experiment(cfg, log=lambda *_: None)
    assert 0.0 <= mean <= 1.0


def test_sharded_eval_matches_single_device(rng):
    ei, n = toy(rng)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.9, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    ref_tr = Trainer(model, g, jnp.asarray(x.astype(np.int32)), cfg)
    params, _, _ = ref_tr.init(3, jnp.asarray(pos))
    ref_logits = ref_tr.evaluate(params, jnp.asarray(pos[None]), n_sub)

    pg = partition_graph(ei, None, n, "gcn", 4)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    sh_logits = np.asarray(st.eval_step(params, pos))
    np.testing.assert_allclose(sh_logits, ref_logits, rtol=1e-4, atol=1e-5)


def test_sharded_pallas_spmm_matches_unsharded(rng):
    """Per-shard BCSR layouts (partition_graph(materialize_bcsr=True)) run
    the Pallas kernel inside shard_map on the gathered features; forward and
    backward must match the unsharded dense path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = toy(rng)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))
    ref_grad = np.asarray(jax.grad(
        lambda v: (spmm(g, v, "dense") ** 2).sum()
    )(jnp.asarray(x)))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_bcsr=True,
                         sparse_layout="bcsr")
    assert pg.bcsr is not None and pg.bcsr_t is not None
    # forward layouts are rectangular: local rows x global columns
    assert pg.bcsr.n_node == pg.block
    assert pg.bcsr_t.n_node == K * pg.block
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    def local_graph(gargs):
        graph = pg.local_graph(*gargs[:3], None, "graph", *gargs[3:6])
        return graph.replace(bcsr=pg.bcsr.local(gargs[6:13]),
                             bcsr_t=pg.bcsr_t.local(gargs[13:20]))

    def body(x_loc, *gargs):
        return spmm(local_graph(gargs), x_loc, "pallas")

    def grad_body(x_loc, *gargs):
        graph = local_graph(gargs)

        # per-shard local loss (no psum): the implicit total over shards is
        # the reference loss, and the all_gather transpose (reduce-scatter)
        # combines every shard's dx contribution. A psum here would inflate
        # the cotangent K-fold (psum transposes to psum under check_vma=False).
        def loss(v):
            out = spmm(graph, v, "pallas")
            return (out ** 2).sum()

        return jax.grad(loss)(x_loc)

    gargs = [jnp.asarray(pg.row), jnp.asarray(pg.col), jnp.asarray(pg.weight),
             jnp.asarray(pg.loc_row), jnp.asarray(pg.loc_col),
             jnp.asarray(pg.loc_weight)]
    gspecs = [P("graph", None)] * 6
    gargs += list(pg.bcsr.tree()) + list(pg.bcsr_t.tree())
    gspecs += list(pg.bcsr.specs("graph")) + list(pg.bcsr_t.specs("graph"))

    out = shard_map(
        body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-5)

    gout = shard_map(
        grad_body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(gout)[:n], ref_grad, rtol=1e-4,
                               atol=1e-4)


def test_sharded_pallas_training_matches_single_device(rng):
    """A ShardedTrainer whose model runs --spmm pallas over the per-shard
    BCSR layouts reproduces the unsharded whole-epoch step (the sharded
    fast-kernel path end-to-end)."""
    ei, n = toy(rng, n=50, e=200)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="pallas")
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "mean", materialize_dense=False,
                    materialize_bcsr=True)
    ref_tr = Trainer(model, g, jnp.asarray(x.astype(np.int32)), cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    rngk = jax.random.PRNGKey(7)
    ref_params, _, _, _, ref_loss = ref_tr.train_epoch(
        params, opt_state, plateau, rngk,
        jnp.asarray(pos[None]), jnp.asarray(y[None]),
    )

    pg = partition_graph(ei, None, n, "mean", 4, materialize_bcsr=True,
                         sparse_layout="bcsr")
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    assert st.has_bcsr
    sh_params, sh_opt, sh_loss = st.train_step(
        params, st.tx.init(params), plateau.lr, rngk, pos, y
    )
    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2)


def test_auto_sharding_with_pallas_matches_single_device(rng):
    """GSPMD sharding='auto' with a prebuilt BCSR Graph (--spmm pallas):
    the kernel runs replicated under the sharding annotations and the epoch
    must match the single-device Trainer exactly (same program, partitioned
    batch)."""
    from glass_tpu.parallel.auto import AutoTrainer

    ei, n = toy(rng, n=60, e=240)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="pallas")
    x = jnp.asarray(rng.integers(0, 5, size=(n, 1)).astype(np.int32))
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "mean", materialize_dense=False,
                    materialize_bcsr=True)
    ref_tr = Trainer(model, g, x, cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    key = jax.random.PRNGKey(7)
    ref = ref_tr.train_epoch(params, opt_state, plateau, key,
                        jnp.asarray(pos[None]), jnp.asarray(y[None]))

    mesh = make_mesh(graph_shards=1, data_shards=8)
    at = AutoTrainer(model, g, x, cfg, mesh)
    got = at.train_epoch(params, opt_state, plateau, key,
                    jnp.asarray(pos[None]), jnp.asarray(y[None]))
    np.testing.assert_allclose(float(got[4]), float(ref[4]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref[0]), jax.tree.leaves(got[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("k,n,e", [(2, 300, 900), (3, 257, 700), (5, 640, 2000)])
def test_stacked_bcsr_layouts_match_dense(rng, k, n, e):
    """Property test of the per-shard rectangular BCSR build over awkward
    shapes (n not a multiple of K*128, shard counts that force uneven chunk
    padding): each shard's forward layout times the global features must
    equal that shard's dense rows, and the transposed layout must compute
    A_local^T exactly — via direct kernel calls, independent of shard_map."""
    from glass_tpu.ops.pallas_spmm import bcsr_spmm
    from glass_tpu.parallel.partition import partition_graph

    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    pg = partition_graph(ei, None, n, "mean", k, materialize_bcsr=True,
                         sparse_layout="bcsr")
    nb = pg.block

    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    dense = np.zeros((n, n), np.float32)
    r, c, w = (np.asarray(a) for a in (g.row, g.col, g.weight))
    keep = w != 0
    np.add.at(dense, (r[keep], c[keep]), w[keep])

    h = 24
    x = rng.normal(size=(k * nb, h)).astype(np.float32)
    x[n:] = 0.0
    xj = jnp.asarray(x)

    for s in range(k):
        fwd = pg.bcsr.local(tuple(a[s][None] for a in pg.bcsr.tree()))
        out = np.asarray(bcsr_spmm(fwd, xj, interpret=True))
        lo, hi = s * nb, min((s + 1) * nb, n)
        ref = dense[lo:hi] @ x[:n]
        np.testing.assert_allclose(out[: hi - lo], ref, rtol=1e-4, atol=1e-4)
        if hi - lo < nb:  # padded rows of the last shard stay zero
            np.testing.assert_allclose(out[hi - lo:], 0.0, atol=1e-6)

        bwd = pg.bcsr_t.local(tuple(a[s][None] for a in pg.bcsr_t.tree()))
        gloc = rng.normal(size=(nb, h)).astype(np.float32)
        out_t = np.asarray(bcsr_spmm(bwd, jnp.asarray(gloc), interpret=True))
        a_loc = np.zeros((nb, k * nb), np.float32)
        a_loc[: hi - lo, :n] = dense[lo:hi]
        ref_t = a_loc.T @ gloc
        np.testing.assert_allclose(out_t[: k * nb], ref_t, rtol=1e-4, atol=1e-4)


def test_sharded_pallas_bf16_blocks(rng):
    """partition_graph(dense_dtype='bf16') materializes bf16 per-shard BCSR
    layouts (the --dense_dtype bf16 sharded fast path); results within bf16
    rounding of the unsharded dense path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = toy(rng)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_bcsr=True,
                         sparse_layout="bcsr",
                         dense_dtype="bf16")
    assert pg.bcsr.blocks.dtype == jnp.bfloat16
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    def body(x_loc, *gargs):
        graph = pg.local_graph(*gargs[:3], None, "graph", *gargs[3:6])
        graph = graph.replace(bcsr=pg.bcsr.local(gargs[6:13]),
                              bcsr_t=pg.bcsr_t.local(gargs[13:20]))
        return spmm(graph, x_loc, "pallas")

    gargs = [jnp.asarray(pg.row), jnp.asarray(pg.col), jnp.asarray(pg.weight),
             jnp.asarray(pg.loc_row), jnp.asarray(pg.loc_col),
             jnp.asarray(pg.loc_weight)]
    gspecs = [P("graph", None)] * 6
    gargs += list(pg.bcsr.tree()) + list(pg.bcsr_t.tree())
    gspecs += list(pg.bcsr.specs("graph")) + list(pg.bcsr_t.specs("graph"))
    out = shard_map(
        body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=0.05, atol=0.05)


def banded_toy(rng, n=700, e=3000, bw=40):
    """Banded toy graph (the RCM-ordered regime the band layout targets)."""
    src = rng.integers(0, n, size=e)
    dst = np.clip(src + rng.integers(-bw, bw, size=e), 0, n - 1)
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])]), n


def test_stacked_band_matches_unsharded(rng):
    """Per-shard banded-slab layouts (partition_graph(sparse_layout='band'))
    run the band kernel inside shard_map on the gathered features; forward
    and backward must match the unsharded dense path. The transposed
    layouts are row-range trimmed with traced per-shard g_lo offsets."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    # large enough that the planner's rps leaves multiple transposed
    # groups, so the row-range trim is actually exercised
    ei, n = banded_toy(rng, n=5000, e=15000, bw=40)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))
    ref_grad = np.asarray(jax.grad(
        lambda v: (spmm(g, v, "dense") ** 2).sum()
    )(jnp.asarray(x)))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_bcsr=True,
                         sparse_layout="band")
    assert pg.band is not None and pg.band_t is not None and pg.bcsr is None
    assert pg.band.n_node == pg.block
    assert pg.band_t.n_node == K * pg.block
    # trimming is real: stored groups < total groups
    assert pg.band_t.slabs.shape[1] < pg.band_t.n_g_total
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    def local_graph(gargs):
        graph = pg.local_graph(*gargs[:3], None, "graph", *gargs[3:6])
        return graph.replace(band=pg.band.local(gargs[6:9]),
                             band_t=pg.band_t.local(gargs[9:12]))

    def body(x_loc, *gargs):
        return spmm(local_graph(gargs), x_loc, "pallas")

    def grad_body(x_loc, *gargs):
        graph = local_graph(gargs)
        return jax.grad(lambda v: (spmm(graph, v, "pallas") ** 2).sum())(x_loc)

    gargs = [jnp.asarray(pg.row), jnp.asarray(pg.col), jnp.asarray(pg.weight),
             jnp.asarray(pg.loc_row), jnp.asarray(pg.loc_col),
             jnp.asarray(pg.loc_weight)]
    gspecs = [P("graph", None)] * 6
    gargs += list(pg.band.tree()) + list(pg.band_t.tree())
    gspecs += list(pg.band.specs("graph")) + list(pg.band_t.specs("graph"))

    out = shard_map(
        body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-5)

    gout = shard_map(
        grad_body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(gout)[:n], ref_grad, rtol=1e-4,
                               atol=1e-4)


def test_stacked_layout_auto_plan(rng):
    """The partition planner picks banded slabs for band-structured graphs;
    forcing 'band' on a VMEM-infeasible profile raises."""
    ei, n = banded_toy(rng)
    pg = partition_graph(ei, None, n, "mean", 4, materialize_bcsr=True)
    assert pg.band is not None and pg.bcsr is None
    # a wide random profile at scale: every shard's window spans all columns;
    # n chosen so a full-width slab cannot fit the VMEM budget
    n2 = 260 * 128
    src = rng.integers(0, n2, size=4000)
    dst = rng.integers(0, n2, size=4000)
    ei2 = np.stack([src, dst])
    with pytest.raises(ValueError, match="band"):
        partition_graph(ei2, None, n2, "sum", 2, materialize_bcsr=True,
                        sparse_layout="band")
    pg2 = partition_graph(ei2, None, n2, "sum", 2, materialize_bcsr=True)
    assert pg2.band is None and pg2.bcsr is not None


def test_sharded_band_training_matches_single_device(rng):
    """A ShardedTrainer whose model runs --spmm pallas over the per-shard
    banded-slab layouts reproduces the unsharded whole-epoch step (the
    sharded band fast-kernel path end-to-end)."""
    ei, n = banded_toy(rng, n=120, e=500, bw=15)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="pallas")
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "mean", materialize_dense=False,
                    materialize_bcsr=True)
    ref_tr = Trainer(model, g, jnp.asarray(x.astype(np.int32)), cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    rngk = jax.random.PRNGKey(7)
    ref_params, _, _, _, ref_loss = ref_tr.train_epoch(
        params, opt_state, plateau, rngk,
        jnp.asarray(pos[None]), jnp.asarray(y[None]),
    )

    pg = partition_graph(ei, None, n, "mean", 4, materialize_bcsr=True,
                         sparse_layout="band")
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    assert st.has_band and not st.has_bcsr
    sh_params, sh_opt, sh_loss = st.train_step(
        params, st.tx.init(params), plateau.lr, rngk, pos, y
    )
    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2)


def test_auto_sharding_with_band_matches_single_device(rng):
    """GSPMD sharding='auto' with a prebuilt banded-slab Graph (--spmm
    pallas over the band layout): the kernel runs replicated under the
    sharding annotations and the epoch must match the single-device
    Trainer."""
    from glass_tpu.parallel.auto import AutoTrainer

    ei, n = banded_toy(rng, n=60, e=240, bw=10)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="pallas")
    x = jnp.asarray(rng.integers(0, 5, size=(n, 1)).astype(np.int32))
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "mean", materialize_dense=False,
                    materialize_bcsr=True, sparse_layout="band")
    assert g.band is not None
    ref_tr = Trainer(model, g, x, cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    key = jax.random.PRNGKey(7)
    ref = ref_tr.train_epoch(params, opt_state, plateau, key,
                        jnp.asarray(pos[None]), jnp.asarray(y[None]))

    mesh = make_mesh(graph_shards=1, data_shards=8)
    at = AutoTrainer(model, g, x, cfg, mesh)
    got = at.train_epoch(params, opt_state, plateau, key,
                    jnp.asarray(pos[None]), jnp.asarray(y[None]))
    np.testing.assert_allclose(float(got[4]), float(ref[4]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ref[0]), jax.tree.leaves(got[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("k,n,e,bw", [(2, 300, 900, 30), (3, 257, 700, 25),
                                      (5, 640, 2000, 50), (4, 100, 300, 100)])
def test_stacked_band_layouts_match_dense(rng, k, n, e, bw):
    """Property test of the per-shard banded-slab build over awkward shapes
    (n not a multiple of K*128, shard blocks below one BLOCK, windows as
    wide as the matrix): each shard's forward layout times the global
    features must equal that shard's dense rows, and the trimmed transposed
    layout must compute A_local^T exactly — direct kernel calls, independent
    of shard_map."""
    from glass_tpu.ops.pallas_band import band_spmm

    src = rng.integers(0, n, size=e)
    dst = np.clip(src + rng.integers(-bw, bw, size=e), 0, n - 1)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    pg = partition_graph(ei, None, n, "mean", k, materialize_bcsr=True,
                         sparse_layout="band")
    nb = pg.block

    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    dense = np.zeros((n, n), np.float32)
    r, c, w = (np.asarray(a) for a in (g.row, g.col, g.weight))
    keep = w != 0
    np.add.at(dense, (r[keep], c[keep]), w[keep])

    h = 24
    x = rng.normal(size=(k * nb, h)).astype(np.float32)
    x[n:] = 0.0
    xj = jnp.asarray(x)
    xloc = rng.normal(size=(nb, h)).astype(np.float32)

    for s in range(k):
        fwd = pg.band.local(tuple(a[s][None] for a in pg.band.tree()))
        out = np.asarray(band_spmm(fwd, xj, interpret=True))
        ref = dense[s * nb: (s + 1) * nb] @ x[:n]
        ref = np.pad(ref, [(0, nb - ref.shape[0]), (0, 0)])
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)

        bwd = pg.band_t.local(tuple(a[s][None] for a in pg.band_t.tree()))
        out_t = np.asarray(band_spmm(bwd, jnp.asarray(xloc), interpret=True))
        a_loc = np.zeros((nb, k * nb), np.float32)
        a_loc[: min(nb, n - s * nb) if s * nb < n else 0, :n] = \
            dense[s * nb: (s + 1) * nb]
        ref_t = a_loc.T @ xloc
        np.testing.assert_allclose(out_t, ref_t, rtol=1e-4, atol=1e-4)


def outlier_banded_toy(rng, n=2048, e=12000, bw=100, n_out_rows=8, n_out=300):
    """Banded bulk plus a few far-range rows — the hybrid-split regime."""
    src = rng.integers(0, n, e)
    dst = np.clip(src + rng.integers(-bw, bw, size=e), 0, n - 1)
    osrc = rng.choice(n, n_out_rows)[rng.integers(0, n_out_rows, n_out)]
    odst = rng.integers(0, n, n_out)
    s_all = np.concatenate([src, osrc])
    d_all = np.concatenate([dst, odst])
    return np.stack([np.concatenate([s_all, d_all]),
                     np.concatenate([d_all, s_all])]), n


def test_stacked_hybrid_matches_unsharded(rng):
    """Per-shard hybrid split (sparse_layout='hybrid'): banded slabs over
    per-group best windows + stacked-BCSR residue, summed inside shard_map;
    forward and backward must match the unsharded dense path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = outlier_banded_toy(rng)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))
    ref_grad = np.asarray(jax.grad(
        lambda v: (spmm(g, v, "dense") ** 2).sum()
    )(jnp.asarray(x)))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_bcsr=True,
                         sparse_layout="hybrid")
    assert pg.band is not None and pg.bcsr is not None
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    def local_graph(gargs):
        graph = pg.local_graph(*gargs[:3], None, "graph", *gargs[3:6])
        graph = graph.replace(bcsr=pg.bcsr.local(gargs[6:13]),
                              bcsr_t=pg.bcsr_t.local(gargs[13:20]))
        return graph.replace(band=pg.band.local(gargs[20:23]),
                              band_t=pg.band_t.local(gargs[23:26]))

    def body(x_loc, *gargs):
        return spmm(local_graph(gargs), x_loc, "pallas")

    def grad_body(x_loc, *gargs):
        graph = local_graph(gargs)
        return jax.grad(lambda v: (spmm(graph, v, "pallas") ** 2).sum())(x_loc)

    gargs = [jnp.asarray(a) for a in
             (pg.row, pg.col, pg.weight, pg.loc_row, pg.loc_col,
              pg.loc_weight)]
    gspecs = [P("graph", None)] * 6
    gargs += list(pg.bcsr.tree()) + list(pg.bcsr_t.tree())
    gspecs += list(pg.bcsr.specs("graph")) + list(pg.bcsr_t.specs("graph"))
    gargs += list(pg.band.tree()) + list(pg.band_t.tree())
    gspecs += list(pg.band.specs("graph")) + list(pg.band_t.specs("graph"))

    out = shard_map(
        body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(out)[:n], ref, rtol=1e-4, atol=1e-4)

    gout = shard_map(
        grad_body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    np.testing.assert_allclose(np.asarray(gout)[:n], ref_grad, rtol=1e-4,
                               atol=1e-3)


def test_stacked_hybrid_auto_pick(rng):
    """At scale, a narrow band + a few full-width rows makes the auto
    planner choose the hybrid split (a full-width common window would be
    VMEM-hostile and stream mostly zeros)."""
    ei, n = outlier_banded_toy(rng, n=64 * 128, e=60000, bw=150,
                               n_out_rows=6, n_out=800)
    pg = partition_graph(ei, None, n, "mean", 4, materialize_bcsr=True)
    assert pg.band is not None and pg.bcsr is not None
    # the band window must be far narrower than the 64-block full profile
    assert pg.band.w_blocks <= 16


def test_sharded_hybrid_training_matches_single_device(rng):
    """A ShardedTrainer on the hybrid split reproduces the unsharded
    whole-epoch step end-to-end."""
    ei, n = outlier_banded_toy(rng, n=1200, e=4000, bw=50, n_out_rows=3,
                               n_out=60)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="pallas")
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    g = build_graph(ei, None, n, "mean", materialize_dense=False,
                    materialize_bcsr=True)
    ref_tr = Trainer(model, g, jnp.asarray(x.astype(np.int32)), cfg, donate=False)
    params, opt_state, plateau = ref_tr.init(0, jnp.asarray(pos))
    rngk = jax.random.PRNGKey(7)
    ref_params, _, _, _, ref_loss = ref_tr.train_epoch(
        params, opt_state, plateau, rngk,
        jnp.asarray(pos[None]), jnp.asarray(y[None]),
    )

    pg = partition_graph(ei, None, n, "mean", 4, materialize_bcsr=True,
                         sparse_layout="hybrid")
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    assert st.has_band and st.has_bcsr
    sh_params, sh_opt, sh_loss = st.train_step(
        params, st.tx.init(params), plateau.lr, rngk, pos, y
    )
    np.testing.assert_allclose(float(sh_loss), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(ref_params), jax.tree.leaves(sh_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-2)


def test_sharded_training_with_dropout_runs(rng):
    """HWDropout (hardware-RNG mask bits) must execute inside shard_map and
    GSPMD programs. Dropout sits after the SpMM in GLASSConv, so it is
    purely row-local — per-shard mask streams need no cross-shard
    consistency; this asserts execution and a finite, decreasing-capable
    loss, not bit-equality with the single-device run (RNG streams differ
    by construction)."""
    ei, n = toy(rng, n=50, e=200)
    n_sub, L = 8, 5
    pos = np.stack([rng.choice(n, size=L, replace=False) for _ in range(n_sub)])
    y = rng.integers(0, 3, size=n_sub)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=2,
                  output_channels=(3,), pools=("size",), dropout=0.5,
                  activation="elu", z_ratio=0.8, jk=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    cfg = TrainConfig(lr=1e-2, batch_size=n_sub, loss="ce", use_z=True)

    pg = partition_graph(ei, None, n, "mean", 4)
    mesh = make_mesh(graph_shards=4, data_shards=2)
    st = ShardedTrainer(model, pg, x, cfg, mesh)
    params, opt_state, plateau = st.init(0, jnp.asarray(pos))
    p2, o2, loss = st.train_step(params, opt_state, plateau.lr,
                                 jax.random.PRNGKey(7), pos, y)
    assert np.isfinite(float(loss))
    # params actually moved
    moved = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2))
    )
    assert moved

    # GSPMD data-parallel path with dropout
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.parallel.auto import AutoTrainer

    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    mesh2 = make_mesh(graph_shards=1, data_shards=8)
    at = AutoTrainer(model, g, jnp.asarray(x.astype(np.int32)), cfg, mesh2)
    ap, ao, aplat = at.init(0, jnp.asarray(pos))
    ap2, ao2, aplat2, _, aloss = at.train_epoch(
        ap, ao, aplat, jax.random.PRNGKey(3),
        jnp.asarray(pos[None]), jnp.asarray(y[None]))
    assert np.isfinite(float(aloss))


def test_sharded_int8_bcsr_matches_unsharded(rng):
    """int8 StackedBCSR (dense_dtype='int8'): each shard's rectangular
    layout carries its own per-row dequant scales as an 8th shard_map
    operand; forward and backward stay within quantization tolerance of
    the unsharded dense path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = toy(rng)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))
    ref_grad = np.asarray(jax.grad(
        lambda v: (spmm(g, v, "dense") ** 2).sum()
    )(jnp.asarray(x)))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_bcsr=True,
                         sparse_layout="bcsr", dense_dtype="int8")
    assert pg.bcsr.row_scale is not None
    assert pg.bcsr.blocks.dtype == np.int8
    assert pg.bcsr.n_ops == 8 and pg.bcsr_t.n_ops == 8
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)

    nf, nt = pg.bcsr.n_ops, pg.bcsr_t.n_ops

    def local_graph(gargs):
        graph = pg.local_graph(*gargs[:3], None, "graph", *gargs[3:6])
        return graph.replace(
            bcsr=pg.bcsr.local(gargs[6: 6 + nf]),
            bcsr_t=pg.bcsr_t.local(gargs[6 + nf: 6 + nf + nt]))

    def body(x_loc, *gargs):
        return spmm(local_graph(gargs), x_loc, "pallas")

    def grad_body(x_loc, *gargs):
        graph = local_graph(gargs)
        return jax.grad(lambda v: (spmm(graph, v, "pallas") ** 2).sum())(x_loc)

    gargs = [jnp.asarray(pg.row), jnp.asarray(pg.col), jnp.asarray(pg.weight),
             jnp.asarray(pg.loc_row), jnp.asarray(pg.loc_col),
             jnp.asarray(pg.loc_weight)]
    gspecs = [P("graph", None)] * 6
    gargs += list(pg.bcsr.tree()) + list(pg.bcsr_t.tree())
    gspecs += list(pg.bcsr.specs("graph")) + list(pg.bcsr_t.specs("graph"))

    out = shard_map(
        body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(out)[:n] - ref).max() / scale < 2e-2

    gout = shard_map(
        grad_body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    gscale = np.abs(ref_grad).max()
    assert np.abs(np.asarray(gout)[:n] - ref_grad).max() / gscale < 4e-2


def test_sharded_int8_band_matches_unsharded(rng):
    """int8 StackedBand: per-shard per-output-row scales ride shard_map as a
    4th stacked operand (forward rectangular AND trimmed transposed
    layouts); forward and backward stay within quantization tolerance of
    the unsharded dense path."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    ei, n = banded_toy(rng, n=5000, e=15000, bw=40)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    ref = np.asarray(spmm(g, jnp.asarray(x), "dense"))
    ref_grad = np.asarray(jax.grad(
        lambda v: (spmm(g, v, "dense") ** 2).sum()
    )(jnp.asarray(x)))

    K = 4
    pg = partition_graph(ei, None, n, "mean", K, materialize_bcsr=True,
                         sparse_layout="band", dense_dtype="int8")
    assert pg.band.row_scale is not None
    assert pg.band.slabs.dtype == np.int8
    assert pg.band.n_ops == 4 and pg.band_t.n_ops == 4
    mesh = make_mesh(graph_shards=K, data_shards=2)
    xp = pg.pad_nodes(x)
    nf, nt = pg.band.n_ops, pg.band_t.n_ops

    def local_graph(gargs):
        graph = pg.local_graph(*gargs[:3], None, "graph", *gargs[3:6])
        return graph.replace(
            band=pg.band.local(gargs[6: 6 + nf]),
            band_t=pg.band_t.local(gargs[6 + nf: 6 + nf + nt]))

    def body(x_loc, *gargs):
        return spmm(local_graph(gargs), x_loc, "pallas")

    def grad_body(x_loc, *gargs):
        graph = local_graph(gargs)
        return jax.grad(lambda v: (spmm(graph, v, "pallas") ** 2).sum())(x_loc)

    gargs = [jnp.asarray(pg.row), jnp.asarray(pg.col), jnp.asarray(pg.weight),
             jnp.asarray(pg.loc_row), jnp.asarray(pg.loc_col),
             jnp.asarray(pg.loc_weight)]
    gspecs = [P("graph", None)] * 6
    gargs += list(pg.band.tree()) + list(pg.band_t.tree())
    gspecs += list(pg.band.specs("graph")) + list(pg.band_t.specs("graph"))

    out = shard_map(
        body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    scale = np.abs(ref).max()
    assert np.abs(np.asarray(out)[:n] - ref).max() / scale < 2e-2

    gout = shard_map(
        grad_body, mesh=mesh, in_specs=(P("graph", None), *gspecs),
        out_specs=P("graph", None), check_vma=False,
    )(jnp.asarray(xp), *gargs)
    gscale = np.abs(ref_grad).max()
    assert np.abs(np.asarray(gout)[:n] - ref_grad).max() / gscale < 4e-2


def test_auto_sharding_int8_dense_trains(rng):
    """GSPMD AutoTrainer over an int8 (dense_q) graph: the quantized Pallas
    layout rides pjit's auto-sharding as ordinary replicated operands and a
    data-parallel epoch trains to a finite loss."""
    from glass_tpu.parallel.auto import AutoTrainer
    from glass_tpu.train.loop import TrainConfig

    n, e = 256, 2000
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "gcn", materialize_dense=True,
                    dense_dtype="int8")
    assert g.dense_q is not None
    from glass_tpu.nn.modules import GLASS

    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("size",), dropout=0.1,
                  activation="elu", z_ratio=0.8, jk=True)
    mesh = make_mesh(graph_shards=1, data_shards=jax.device_count())
    cfg = TrainConfig(lr=1e-3, batch_size=2 * jax.device_count(), loss="ce",
                      use_z=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    pos = np.stack([rng.choice(n, 4, replace=False)
                    for _ in range(cfg.batch_size)])
    y = rng.integers(0, 3, cfg.batch_size)
    tr = AutoTrainer(model, g, x, cfg, mesh)
    p, o, pl = tr.init(0, pos)
    out = tr.train_epoch(p, o, pl, jax.random.PRNGKey(0),
                         jnp.asarray(pos[None]), jnp.asarray(y[None]))
    assert np.isfinite(float(out[-1]))


def test_multihost_two_process_cluster_parity():
    """The multi-host bootstrap EXECUTES: a real 2-process jax cluster over
    gloo CPU collectives (2 processes x 2 devices) runs the sharded train
    step and the whole-epoch scan, both ranks agree, and the losses equal
    the single-process 4-device values to float tolerance. This exercises
    what single-process shard_map cannot: distributed init ordering,
    non-addressable mesh devices, cross-process collectives. (The reference
    has no multi-host story at all — its device handling is a CUDA index,
    GLASSTest.py:272-275 via impl/config.py.)"""
    import os
    import re
    import socket
    import subprocess
    import sys
    from pathlib import Path

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    repo = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo + ":" + env.get("PYTHONPATH", "")
    # the workers configure their own device counts (jax_num_cpu_devices=2);
    # drop this session's 8-virtual-device XLA flag so the two don't fight
    env["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "",
        env.get("XLA_FLAGS", ""),
    ).strip()

    cmd = [
        sys.executable, "-m", "glass_tpu.parallel.multihost",
        "--coordinator", f"localhost:{port}", "--num_processes", "2",
        "--cpu_collectives", "gloo", "--local_devices", "2",
        "--graph_shards", "2", "--data_shards", "2",
    ]
    procs = [
        subprocess.Popen(
            cmd + ["--process_id", str(i)], env=env, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    finally:
        for p in procs:
            p.kill()
    blob = "\n".join(outs)
    if any(p.returncode for p in procs):
        if re.search(r"gloo|collectives", blob, re.I):
            pytest.skip(f"gloo CPU collectives unavailable: {blob[-500:]}")
        raise AssertionError(f"multihost workers failed:\n{blob[-3000:]}")

    losses = []
    for out in outs:
        m = re.search(r"step_loss=([\d.]+) epoch_loss=([\d.]+)", out)
        assert m, f"no losses in worker output:\n{out[-2000:]}"
        losses.append((float(m.group(1)), float(m.group(2))))
    assert losses[0] == losses[1], f"ranks disagree: {losses}"

    # single-process reference on 4 of this session's virtual devices
    from glass_tpu.parallel.multihost import run_smoke

    ref = run_smoke(graph_shards=2, data_shards=2, devices=jax.devices()[:4])
    np.testing.assert_allclose(
        losses[0], [ref["step_loss"], ref["epoch_loss"]], rtol=1e-6
    )


def test_sharded_evaluate_score_matches_host_metric(rng):
    """ShardedTrainer.evaluate_score (psum'd counts) == the sklearn metric
    over the gathered logits — on both a ce (multiclass) and bce (binary)
    head."""
    from glass_tpu.train.loop import make_eval_batches
    from glass_tpu.train.metrics import (
        binary_f1, micro_f1, pad_eval_labels,
    )

    ei, n = toy(rng)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    pos = np.stack([rng.choice(n, 4, replace=False) for _ in range(10)])
    mesh = make_mesh(graph_shards=2, data_shards=4)
    pg = partition_graph(ei, None, n, "gcn", 2)

    for loss, n_out, ydt in (("ce", 3, np.int64), ("bce", 1, np.float32)):
        y = rng.integers(0, max(2, n_out), size=10).astype(ydt)
        model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                      output_channels=(n_out,), pools=("size",), dropout=0.0,
                      activation="elu", z_ratio=0.8, jk=True)
        cfg = TrainConfig(lr=1e-3, batch_size=8, loss=loss, use_z=True)
        tr = ShardedTrainer(model, pg, x, cfg, mesh)
        params, _, _ = tr.init(0, pos[:8])
        b, y_p, n_real = make_eval_batches(pos, y, 8)
        logits = tr.evaluate(params, b, n_real)
        want = (binary_f1 if loss == "bce" else micro_f1)(logits, y_p)
        y_pad, mask = pad_eval_labels(y_p, b.shape[0], 8)
        got = tr.evaluate_score(params, b, y_pad, mask)
        assert got == want, (loss, got, want)


def test_auto_sharding_graph_axis_matches_replicated(rng):
    """GSPMD with the dense adjacency's rows annotated over 'graph'
    (round-5: the graph_shards==1 restriction reversed for the dense
    layout) is the SAME program as the replicated run, partitioned — the
    epoch losses must agree to float tolerance, and a Pallas-layout graph
    must be rejected with a clear error."""
    from glass_tpu.parallel.auto import AutoTrainer
    from glass_tpu.train.loop import TrainConfig

    n, e = 256, 2000
    src, dst = rng.integers(0, n, e), rng.integers(0, n, e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("size",), dropout=0.1,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="dense")
    cfg = TrainConfig(lr=1e-3, batch_size=4, loss="ce", use_z=True)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    pos = np.stack([rng.choice(n, 4, replace=False) for _ in range(8)])
    y = rng.integers(0, 3, 8)
    pos_b, y_b = jnp.asarray(pos.reshape(2, 4, 4)), jnp.asarray(y.reshape(2, 4))

    losses = {}
    for gs, ds in ((1, 1), (4, 2), (8, 1)):
        devs = jax.devices()[: gs * ds]
        tr = AutoTrainer(model, g, jnp.asarray(x.astype(np.int32)), cfg,
                         make_mesh(graph_shards=gs, data_shards=ds,
                                   devices=devs))
        p, o, pl = tr.init(0, jnp.asarray(pos[:4]))
        out = tr.train_epoch(p, o, pl, jax.random.PRNGKey(0), pos_b, y_b)
        losses[(gs, ds)] = float(out[-1])
    base = losses[(1, 1)]
    for k, v in losses.items():
        np.testing.assert_allclose(v, base, rtol=1e-5, err_msg=str(k))

    # n=256 is not a multiple of 8 blocks of 128 — GSPMD handles the
    # non-divisible row sharding internally (no padding on our side)

    g_band = build_graph(ei, None, n, "gcn", materialize_dense=False,
                         materialize_bcsr=True, sparse_layout="bcsr")
    assert g_band.dense is None
    with pytest.raises(ValueError, match="auto-partitioned"):
        AutoTrainer(model, g_band, jnp.asarray(x.astype(np.int32)), cfg,
                    make_mesh(graph_shards=8, data_shards=1))
