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


def test_hpo_random_search_resumes_from_study_file(tmp_path, monkeypatch):
    """The no-optuna path persists completed trials in SQLITE (the
    reference's optuna storage contract, GNNEmb.py:194-199) and resumes
    without re-training them; n_trials is the total study budget."""
    import glass_tpu.train.ssl as ssl
    from glass_tpu.compat import optuna_lite

    calls = []

    def fake_pretrain(trial_cfg, log=print):
        calls.append(trial_cfg)
        return 0.5 + 0.01 * len(calls), np.zeros((4, 2), np.float32)

    monkeypatch.setattr(ssl, "pretrain", fake_pretrain)
    # hide optuna if it were ever installed: force the shim path
    import builtins

    real_import = builtins.__import__

    def no_optuna(name, *a, **k):
        if name == "optuna":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_optuna)

    cfg = ssl.SSLConfig(dataset="stub", hidden_dim=2)
    storage = f"sqlite:///{tmp_path / 'study.db'}"
    saved = []
    best1 = ssl.run_hpo(cfg, 4, saved.append, log=lambda *_: None,
                        storage=storage, sampler="random")
    assert len(calls) == 4
    assert (tmp_path / "study.db").exists()

    # resume with a larger budget: the 4 completed trials are not re-run
    logs = []
    best2 = ssl.run_hpo(cfg, 6, saved.append, log=logs.append,
                        storage=storage, sampler="random")
    assert len(calls) == 6
    assert any("resumed study: 4 completed trials" in l for l in logs)
    assert best2["score"] >= best1["score"]

    # resume determinism: the interrupted-then-resumed study's trial
    # sequence equals an uninterrupted 6-trial study's
    ref_storage = f"sqlite:///{tmp_path / 'ref.db'}"
    calls.clear()
    ssl.run_hpo(cfg, 6, lambda e: None, log=lambda *_: None,
                storage=ref_storage, sampler="random")
    got = optuna_lite.create_study(
        "maximize", storage, "stub", load_if_exists=True)
    ref = optuna_lite.create_study(
        "maximize", ref_storage, "stub", load_if_exists=True)
    assert [t.params for t in got.trials] == [t.params for t in ref.trials]


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


def test_tpe_sampler_concentrates_and_is_resume_deterministic():
    """The in-repo TPE (train/tpe.py — the no-optuna default sampler,
    reference GNNEmb.py:194-199 role): after the random startup phase it
    must concentrate on the better region of a synthetic objective, and a
    suggestion must be a pure function of (seed, trial index, history) so
    resumed studies reproduce an uninterrupted run."""
    from glass_tpu.train.tpe import TPESampler

    space = dict(a=[0, 1, 2, 3], b=["x", "y"])

    def score(p):  # a=2 dominant, b='y' mildly better
        return (2.0 if p["a"] == 2 else 0.0) + (0.2 if p["b"] == "y" else 0.0)

    tpe = TPESampler(seed=3, n_startup=8)
    hist = []
    for t in range(60):
        params = tpe.suggest(space, hist, t)
        hist.append({"params": params, "score": score(params)})
    tail = [h["params"]["a"] for h in hist[30:]]
    assert tail.count(2) / len(tail) > 0.6, f"TPE did not concentrate: {tail}"
    head = [h["params"]["a"] for h in hist[:8]]
    assert len(set(head)) > 1, "startup phase is not exploring"

    # resume determinism: same history prefix -> same next suggestion
    again = TPESampler(seed=3, n_startup=8)
    for t in (8, 20, 59):
        assert again.suggest(space, hist[:t], t) == tpe.suggest(space, hist[:t], t)


def test_hpo_tpe_resumes_from_study_file(tmp_path, monkeypatch):
    """run_hpo's default (TPE shim) persists completed trials in sqlite and
    a resumed study continues with exactly the suggestions the
    uninterrupted run makes (suggestions are pure functions of seed, trial
    number, name, and history)."""
    import glass_tpu.train.ssl as ssl
    from glass_tpu.compat import optuna_lite

    calls = []

    def fake_pretrain(trial_cfg, log=print):
        calls.append(trial_cfg)
        # deterministic objective: prefer aggr=gcn strongly
        return (1.0 if trial_cfg.aggr == "gcn" else 0.1), np.zeros((4, 2), np.float32)

    monkeypatch.setattr(ssl, "pretrain", fake_pretrain)
    import builtins

    real_import = builtins.__import__

    def no_optuna(name, *a, **k):
        if name == "optuna":
            raise ImportError(name)
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_optuna)

    cfg = ssl.SSLConfig(dataset="stub", hidden_dim=2)

    # uninterrupted 16-trial reference study
    ref_storage = f"sqlite:///{tmp_path / 'ref.db'}"
    ssl.run_hpo(cfg, 16, lambda e: None, log=lambda *_: None, storage=ref_storage)

    # interrupted at 5, resumed to 16: identical trial sequence
    storage = f"sqlite:///{tmp_path / 'study.db'}"
    ssl.run_hpo(cfg, 5, lambda e: None, log=lambda *_: None, storage=storage)
    logs = []
    best = ssl.run_hpo(cfg, 16, lambda e: None, log=logs.append, storage=storage)
    assert any("resumed study: 5 completed trials" in l for l in logs)
    got = optuna_lite.create_study(
        "maximize", storage, "stub", load_if_exists=True)
    ref = optuna_lite.create_study(
        "maximize", ref_storage, "stub", load_if_exists=True)
    assert [(t.number, t.params, t.value) for t in got.trials] == \
        [(t.number, t.params, t.value) for t in ref.trials]
    assert best["params"]["aggr"] == "gcn"


def test_optuna_lite_study_api(tmp_path):
    """The shim's optuna API slice: sqlite round-trip, load_if_exists,
    direction checks, best_params/value, int/float grids."""
    import pytest
    from glass_tpu.compat import optuna_lite as ol

    storage = f"sqlite:///{tmp_path / 's.db'}"

    def obj(trial):
        a = trial.suggest_categorical("a", ["x", "y"])
        k = trial.suggest_int("k", 2, 5)
        d = trial.suggest_float("d", 0.0, 0.5, step=0.1)
        assert a in ("x", "y") and 2 <= k <= 5 and 0.0 <= d <= 0.5
        return (1.0 if a == "y" else 0.0) + k * 0.01 - d * 0.001

    st = ol.create_study("maximize", storage, "demo", load_if_exists=True,
                         sampler=ol.LiteTPESampler(seed=1))
    st.optimize(obj, n_trials=12)
    assert len(st.trials) == 12
    assert st.best_value == max(t.value for t in st.trials)
    assert st.best_params["a"] in ("x", "y")

    # reload: trials restored, numbering continues
    st2 = ol.create_study("maximize", storage, "demo", load_if_exists=True)
    assert len(st2.trials) == 12
    st2.optimize(obj, n_trials=1)
    assert st2.trials[-1].number == 12

    # direction mismatch on an existing study fails loudly
    with pytest.raises(ValueError, match="direction"):
        ol.create_study("minimize", storage, "demo", load_if_exists=True)
    # duplicate without load_if_exists fails loudly
    with pytest.raises(ValueError, match="exists"):
        ol.create_study("maximize", storage, "demo", load_if_exists=False)


def test_optuna_lite_minimize_direction(tmp_path):
    """A minimize study's TPE must concentrate on LOW objective values (the
    sampler internally maximizes, so the direction sign matters)."""
    from glass_tpu.compat import optuna_lite as ol

    def obj(trial):
        a = trial.suggest_categorical("a", [0, 1, 2, 3])
        return float(a)  # minimize -> should concentrate on a=0

    st = ol.create_study("minimize", None, "m", sampler=ol.LiteTPESampler(
        seed=0, n_startup=8))
    st.optimize(obj, n_trials=50)
    tail = [t.params["a"] for t in st.trials[25:]]
    assert tail.count(0) / len(tail) > 0.5, tail
    assert st.best_value == 0.0
