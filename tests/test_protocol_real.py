"""End-to-end protocol runs over the real-world (SubGNN-format) path using
generated fixtures — exercises the BCE binary and multilabel losses, the
metric switch by label arity, and the eval gating with file-based splits."""

import numpy as np
import pytest

from glass_tpu.train.protocol import ExperimentConfig, run_experiment


def write_dataset(root, name, n_nodes=40, n_sub=30, multilabel=False, seed=0):
    rng = np.random.default_rng(seed)
    d = root / "dataset" / name
    d.mkdir(parents=True)
    # two communities; subgraph label = community (+ a second label if multi)
    half = n_nodes // 2
    edges = []
    for _ in range(n_nodes * 4):
        a, b = rng.integers(0, half, size=2)
        edges.append((a, b))
        a, b = rng.integers(half, n_nodes, size=2)
        edges.append((a, b))
    lines = []
    for i in range(n_sub):
        com = i % 2
        lo, hi = (0, half) if com == 0 else (half, n_nodes)
        nodes = rng.choice(np.arange(lo, hi), size=5, replace=False)
        lab = ["A", "B"][com]
        if multilabel and com == 0:
            lab = "A-C"
        split = ["train"] * 3 + ["val", "test"]
        lines.append(f"{'-'.join(map(str, nodes))}\t{lab}\t{split[i % 5]}\n")
    (d / "subgraphs.pth").write_text("".join(lines))
    (d / "edge_list.txt").write_text("".join(f"{a} {b}\n" for a, b in edges))


@pytest.mark.parametrize("name,multilabel", [("ppi_bp", False), ("hpo_neuro", True)])
def test_real_world_protocol_end_to_end(tmp_path, name, multilabel):
    write_dataset(tmp_path, name, multilabel=multilabel)
    cfg = ExperimentConfig(
        dataset=name, pool="sum", aggr="mean", hidden_dim=8, conv_layer=1,
        dropout=0.0, lr=1e-2, z_ratio=0.9, batch_size=3, resi=0.7,
        feature="deg", use_maxzeroone=True, repeat=1, max_epochs=120,
        spmm_mode="segment", data_root=str(tmp_path),
    )
    logs = []
    scores, mean, err = run_experiment(cfg, log=logs.append)
    # binary/multilabel -> BCE + binary_f1; community task is separable
    assert 0.0 <= mean <= 1.0
    assert mean > 0.55, f"{name} score {mean}; logs {logs[-3:]}"
