"""End-to-end experiment-protocol test on the bundled density dataset
(level 3 of the SURVEY.md §4 pyramid). Kept short: a capped epoch budget is
enough to confirm the full pipeline (loader -> graph -> GLASS -> jitted epoch
-> selection protocol) reaches a meaningfully-above-chance micro-F1."""

import numpy as np
import pytest

from glass_tpu.train.protocol import ExperimentConfig, run_experiment


def test_rcm_relabeling_preserves_scores():
    """RCM reordering permutes node ids only; the learning problem is
    identical, so a short run reaches comparable accuracy (exact equality is
    not expected — init/dropout streams act on relabeled nodes)."""
    base_kwargs = dict(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=22, spmm_mode="segment",
    )
    _, plain, _ = run_experiment(ExperimentConfig(**base_kwargs), log=lambda *_: None)
    _, rcm, _ = run_experiment(ExperimentConfig(rcm=True, **base_kwargs),
                               log=lambda *_: None)
    assert abs(plain - rcm) < 0.2, (plain, rcm)
    assert rcm > 0.6


def test_relabel_nodes_roundtrip(rng):
    from glass_tpu.data.loaders import load_dataset

    base = load_dataset("density", np.random.default_rng(0))
    base.set_degree_feature()
    deg_before = {int(n): int(base.x[n, 0]) for n in base.pos[0][base.pos[0] >= 0]}
    edges_before = base.edge_index.shape[1]
    perm = np.random.default_rng(1).permutation(base.n_node)
    base.relabel_nodes(perm)
    assert base.edge_index.shape[1] == edges_before
    # features moved with their nodes: the relabeled first subgraph's nodes
    # carry the same degree multiset
    deg_after = sorted(int(base.x[n, 0]) for n in base.pos[0][base.pos[0] >= 0])
    assert deg_after == sorted(deg_before.values())


def test_repeats_deterministic_with_trainer_cache():
    """The cross-repeat graph/trainer cache must not change results:
    two identical 2-repeat runs produce identical per-repeat scores."""
    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=2,
        max_epochs=20, spmm_mode="segment",
    )
    s1, _, _ = run_experiment(cfg, log=lambda *_: None)
    s2, _, _ = run_experiment(cfg, log=lambda *_: None)
    assert s1 == s2
    assert s1[0] != s1[1] or True  # different seeds usually differ


def test_multi_epoch_chunk_equivalent(rng):
    """The pre-eval-gate multi-epoch scan follows the same RNG stream and
    plateau arithmetic as per-epoch stepping; the two XLA programs only
    differ by f32 fusion order, so losses agree to float tolerance (bitwise
    equality across different compiled programs is not a JAX guarantee)."""
    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.train.loop import Trainer, TrainConfig, make_train_batches

    n = 60
    src = rng.integers(0, n, size=200)
    dst = rng.integers(0, n, size=200)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    pos = np.stack([rng.choice(n, size=5, replace=False) for _ in range(20)])
    y = rng.integers(0, 3, size=20)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    model = GLASS(max_deg=4, hidden_channels=8, num_layers=1,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = np.random.default_rng(1).integers(0, 5, size=(n, 1)).astype(np.int32)
    cfg = TrainConfig(lr=1e-3, batch_size=4, loss="ce", use_z=True)
    tr = Trainer(model, g, jnp.asarray(x), cfg, donate=False)
    params, opt, plat = tr.init(0, jnp.asarray(pos[:4]))
    key = jax.random.PRNGKey(1)

    K = 4
    r1 = np.random.default_rng(3)
    bs = [make_train_batches(r1, pos, y, 4) for _ in range(K)]
    pos_bs = jnp.asarray(np.stack([b[0] for b in bs]))
    y_bs = jnp.asarray(np.stack([b[1] for b in bs]))
    _, _, plat_c, _, losses_c = tr.train_epochs(params, opt, plat, key, pos_bs, y_bs)

    r2 = np.random.default_rng(3)
    p2, o2, plat_s, k2 = params, opt, plat, key
    losses_s = []
    for _ in range(K):
        pb, yb = make_train_batches(r2, pos, y, 4)
        p2, o2, plat_s, k2, l = tr.train_epoch(p2, o2, plat_s, k2,
                                               jnp.asarray(pb), jnp.asarray(yb))
        losses_s.append(l)
    np.testing.assert_allclose(np.asarray(losses_c), np.asarray(losses_s),
                               rtol=5e-3, atol=1e-3)
    np.testing.assert_allclose(float(plat_c.lr), float(plat_s.lr), rtol=1e-6)


def test_kill_and_resume_bit_equivalence(tmp_path):
    """A run interrupted at epoch K and resumed must match an uninterrupted
    run bit-for-bit: full run state (params/opt/plateau/rngs/counters) is
    checkpointed every epoch (VERDICT round-1 item 7 'done' criterion)."""
    import dataclasses

    def mkcfg(ckpt_dir, max_epochs, resume=False):
        return ExperimentConfig(
            dataset="density", pool="size", aggr="sum", hidden_dim=8,
            conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
            resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
            max_epochs=max_epochs, spmm_mode="segment",
            ckpt_dir=str(ckpt_dir), resume=resume,
        )

    # 20 epochs crosses the eval gate (~16 for density bs=2)
    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    _, mean_a, _ = run_experiment(mkcfg(dir_a, 20), log=lambda *_: None)

    # interrupted at epoch 10, then resumed to 20
    _, _, _ = run_experiment(mkcfg(dir_b, 10), log=lambda *_: None)
    logs = []
    _, mean_b, _ = run_experiment(mkcfg(dir_b, 20, resume=True), log=logs.append)
    assert any("resumed at epoch 10" in l for l in logs), logs[:3]
    assert mean_b == mean_a

    sa = np.load(dir_a / "density_seed0_state.npz")
    sb = np.load(dir_b / "density_seed0_state.npz")
    assert set(sa.files) == set(sb.files)
    for k in sa.files:
        if k == "__meta__":
            assert str(sa[k]) == str(sb[k])
        else:
            np.testing.assert_array_equal(sa[k], sb[k], err_msg=k)


def test_density_short_run_reaches_signal():
    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=30, spmm_mode="segment",
    )
    logs = []
    scores, mean, err = run_experiment(cfg, log=logs.append)
    # 3-class chance is ~0.33; full runs reach ~0.92 (paper ~0.93).
    assert mean > 0.6, f"density short run micro-F1 {mean}; logs: {logs[-3:]}"
    assert any("iter" in l for l in logs)
    assert any(l.startswith("average") for l in logs)


def test_auto_route_gate():
    """TPU auto-routing to the Pallas BCSR path covers all three trainer
    modes: single-device, explicit-sharded (per-shard StackedBCSR layouts),
    and GSPMD sharding='auto' (layouts prebuilt host-side before the global
    trace — VERDICT r2 item 4)."""
    from glass_tpu.train.protocol import ExperimentConfig, _auto_route

    big = 20000  # > DENSE_NODE_LIMIT
    base = dict(dataset="density", spmm_mode=None)
    assert _auto_route(ExperimentConfig(**base), big, "tpu") == ("pallas", True)
    # explicit-sharded runs route too (ShardedTrainer materializes
    # per-shard BCSR layouts)
    for kw in (dict(data_shards=4), dict(graph_shards=2),
               dict(graph_shards=2, data_shards=2)):
        cfg = ExperimentConfig(**base, **kw)
        assert _auto_route(cfg, big, "tpu") == ("pallas", True)
    # GSPMD auto mode routes too: its graph (and planner layout) is built
    # before trace, so the fast kernels ride as replicated operands
    cfg = ExperimentConfig(**base, sharding="auto")
    assert _auto_route(cfg, big, "tpu") == ("pallas", True)
    # CPU backend / small graphs / explicit mode are untouched
    assert _auto_route(ExperimentConfig(**base), big, "cpu") == (None, False)
    assert _auto_route(ExperimentConfig(**base), 100, "tpu") == (None, False)
    cfg = ExperimentConfig(dataset="density", spmm_mode="segment")
    assert _auto_route(cfg, big, "tpu") == ("segment", False)


def test_gspmd_protocol_run_with_pallas_layout(tmp_path):
    """End-to-end: a GSPMD (sharding='auto') protocol run over a prebuilt
    block-sparse layout — the routing _auto_route now selects above the
    dense limit (the layout build itself happens pre-trace in build_graph).
    Forced here via spmm_mode='pallas' on a small graph so it runs on the
    CPU mesh in interpret mode."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=8,
        repeat=1, max_epochs=3, feature="one",
        sharding="auto", data_shards=8, spmm_mode="pallas",
    )
    logs = []
    scores, mean, err = run_experiment(cfg, log=logs.append)
    assert len(scores) == 1 and 0.0 <= mean <= 1.0


def test_protocol_device_metrics_match_host_metrics(monkeypatch):
    """The protocol's default on-device eval scoring reproduces the sklearn
    readback path identically: same per-iter lines, same final score (the
    counts are exact integers; the host division is float64 both ways)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", repeat=1, max_epochs=25,
    )
    runs = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("GLASS_TPU_HOST_EVAL_METRICS", mode)
        logs = []
        runs[mode] = run_experiment(cfg, log=logs.append)
        runs[mode + "_logs"] = [l for l in logs if l.startswith("iter")]
    assert runs["0"][1] == runs["1"][1], (runs["0"], runs["1"])
    assert runs["0_logs"] == runs["1_logs"]


def test_inert_sparse_layout_warns():
    """An explicit --sparse_layout that the execution route ignores logs a
    warning (round-5: a 'band' sweep silently ran the dense path)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", repeat=1, max_epochs=2,
        sparse_layout="band",
    )
    logs = []
    run_experiment(cfg, log=logs.append)
    assert any("no effect" in str(l) for l in logs), logs[:5]
