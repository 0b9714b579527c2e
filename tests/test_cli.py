"""CLI-level tests: the two-stage reference recipe driven through the real
argparse surfaces (reference: README.md:55-66 — `python GNNEmb.py ...` then
`python GLASSTest.py --use_nodeid ...`).

These run the actual `main()` entry points in-process on CPU against a tiny
generated dataset in the reference's `dataset_/{name}/tmp.npy` format; they
lock the file contract between the two stages ({path}/{dataset}_{hidden}.npz,
key 'embedding') and the config/data_root plumbing. The same recipe at full
density scale is validated on the real TPU (RESULTS.md "two-stage reference
recipe" row).
"""

import numpy as np
import pytest
import yaml


@pytest.fixture
def tiny_density_root(tmp_path):
    """A dataset_/density/tmp.npy miniature (reference format:
    datasets.py:105-116 — dict with networkx graph, subG lists, letter
    labels)."""
    import networkx as nx

    rng = np.random.default_rng(0)
    n = 120
    g = nx.Graph()
    g.add_nodes_from(range(n))
    src = rng.integers(0, n, size=500)
    dst = rng.integers(0, n, size=500)
    g.add_edges_from(zip(src.tolist(), dst.tolist()))
    subg = [sorted(rng.choice(n, size=5, replace=False).tolist())
            for _ in range(200)]
    labels = ["A" if i % 2 else "B" for i in range(200)]
    d = tmp_path / "data" / "dataset_" / "density"
    d.mkdir(parents=True)
    np.save(d / "tmp.npy", {"G": g, "subG": subg, "subGLabel": labels})
    return tmp_path / "data"


def test_two_stage_ssl_then_glass(tmp_path, tiny_density_root):
    from glass_tpu.cli import glass_test, gnn_emb

    emb_dir = tmp_path / "emb"

    # stage 1: SSL pretraining — writes {emb_dir}/density_64.npz
    gnn_emb.main([
        "--dataset", "density", "--use_nodeid", "--optruns", "1",
        "--max_epochs", "1", "--path", str(emb_dir), "--device", "-1",
        "--data_root", str(tiny_density_root),
    ])
    table = np.load(emb_dir / "density_64.npz")["embedding"]
    assert table.shape == (120, 64) and np.isfinite(table).all()

    # stage 2: fine-tune with the pretrained table. The table dim must equal
    # the config's hidden_dim (GLASSTest.py:153-157), so use a 64-d config.
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    cfg = yaml.safe_load(
        (glass_test.Path(glass_test.__file__).parent.parent
         / "configs" / "density.yml").read_text()
    )
    cfg["hidden_dim"] = 64
    (cfg_dir / "density.yml").write_text(yaml.safe_dump(cfg))

    mean, err = glass_test.main([
        "--dataset", "density", "--use_nodeid", "--use_maxzeroone",
        "--repeat", "1", "--max_epochs", "25", "--device", "-1",
        "--emb_path", str(emb_dir), "--config_dir", str(cfg_dir),
        "--data_root", str(tiny_density_root),
    ])
    assert np.isfinite(mean) and mean > 0.0


def test_use_nodeid_dim_mismatch_message(tmp_path):
    """A 64-d table with an 8-d config must fail with the dim-contract hint,
    not a bare file-not-found."""
    from glass_tpu.cli.glass_test import load_pretrained_table

    np.savez(tmp_path / "density_64.npz", embedding=np.zeros((10, 64), np.float32))
    with pytest.raises(FileNotFoundError, match="hidden_dim"):
        load_pretrained_table(str(tmp_path), "density", 8)


def test_glass_predict_serving_roundtrip(tmp_path, tiny_density_root):
    """Train with --ckpt_dir, then serve the checkpoint with glass_predict:
    split scoring and TSV-file scoring must agree (same deterministic
    batching), rows must cover the whole input, and the returned F1 must be
    finite. Locks the train->checkpoint->serve file contract."""
    from glass_tpu.cli import glass_test, glass_predict

    ckpt_dir = tmp_path / "ckpt"
    glass_test.main([
        "--dataset", "density", "--use_one", "--use_maxzeroone",
        "--repeat", "1", "--max_epochs", "22", "--device", "-1",
        "--data_root", str(tiny_density_root), "--ckpt_dir", str(ckpt_dir),
    ])
    ckpt = ckpt_dir / "density_seed0_best.npz"
    assert ckpt.exists()

    out1 = tmp_path / "preds.tsv"
    score = glass_predict.main([
        "--dataset", "density", "--use_one", "--use_maxzeroone",
        "--ckpt", str(ckpt), "--device", "-1", "--split", "test",
        "--data_root", str(tiny_density_root), "--output", str(out1),
        "--logits",
    ])
    rows = [l.split("\t") for l in out1.read_text().splitlines()]
    assert len(rows) == 50  # 25% test split of 200 subgraphs
    assert all(len(r) == 4 for r in rows)
    assert np.isfinite(score) and 0.0 <= score <= 1.0

    # feed the emitted node lists back in as a subgraphs TSV: predictions
    # must be identical (deterministic batching, ids round-trip)
    subg = tmp_path / "subg.tsv"
    subg.write_text("\n".join(r[1] for r in rows) + "\n")
    out2 = tmp_path / "preds2.tsv"
    res = glass_predict.main([
        "--dataset", "density", "--use_one", "--use_maxzeroone",
        "--ckpt", str(ckpt), "--device", "-1", "--subgraphs", str(subg),
        "--data_root", str(tiny_density_root), "--output", str(out2),
    ])
    assert res is None  # no labels -> no score
    rows2 = [l.split("\t") for l in out2.read_text().splitlines()]
    assert [r[2] for r in rows2] == [r[2] for r in rows]
    assert [r[1] for r in rows2] == [r[1] for r in rows]


def test_glass_predict_multilabel(tmp_path):
    """Multilabel serving: predictions are per-task bit rows and the split
    scorer uses binary_f1 (hpo_neuro-style labels, reference
    datasets.py:207-212 k-hot conversion)."""
    from test_protocol_real import write_dataset
    from glass_tpu.cli import glass_test, glass_predict

    write_dataset(tmp_path, "hpo_neuro", multilabel=True)
    cfg_dir = tmp_path / "cfg"
    cfg_dir.mkdir()
    (cfg_dir / "hpo_neuro.yml").write_text(yaml.safe_dump(dict(
        pool="sum", aggr="mean", hidden_dim=8, conv_layer=1, dropout=0.0,
        lr=1e-2, z_ratio=0.9, batch_size=3, resi=0.7,
    )))
    ckpt_dir = tmp_path / "ckpt"
    glass_test.main([
        "--dataset", "hpo_neuro", "--use_deg", "--use_maxzeroone",
        "--repeat", "1", "--max_epochs", "60", "--device", "-1",
        "--data_root", str(tmp_path), "--config_dir", str(cfg_dir),
        "--ckpt_dir", str(ckpt_dir),
    ])
    out = tmp_path / "preds.tsv"
    score = glass_predict.main([
        "--dataset", "hpo_neuro", "--use_deg", "--use_maxzeroone",
        "--ckpt", str(ckpt_dir / "hpo_neuro_seed0_best.npz"),
        "--device", "-1", "--split", "test", "--data_root", str(tmp_path),
        "--config_dir", str(cfg_dir), "--output", str(out),
    ])
    rows = [l.split("\t") for l in out.read_text().splitlines()]
    assert rows, "no predictions emitted"
    # 3 classes (A, B, C) -> 3 comma-separated bits per row
    assert all(len(r[2].split(",")) == 3 for r in rows)
    assert all(set(r[2].split(",")) <= {"0", "1"} for r in rows)
    assert np.isfinite(score)
