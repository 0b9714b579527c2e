"""Real SubGNN-data drop-in verification (skipped unless the download is
present).

The real-world files (`dataset/{name}/subgraphs.pth` + `edge_list.txt`,
reference README.md:24-41, loaders at reference datasets.py:127-229) are not
bundled in this snapshot. When a user fetches them (tools/fetch_realworld.sh
is the runbook), these tests verify byte-for-byte drop-in compatibility:
the loader must accept the exact files, the known-good shapes/classes must
come out, and one protocol epoch must run end-to-end under each dataset's
published config.

Known-good values: node counts from the SubGNN paper / the bundled
reference embedding tables (`Emb/hpo_metab_64.pt` is (14587, 64)); class
arities from the reference configs and datasets.py's label handling.

Run with the data at $GLASS_DATA_ROOT (or a `dataset/` dir in cwd):

    GLASS_DATA_ROOT=/path/to/download python -m pytest \
        tests/test_realdata_integration.py -v
"""

import os
from pathlib import Path

import numpy as np
import pytest

# (n_node, n_subgraphs, output_channels, multilabel) — SubGNN published
# stats; hpo node count independently pinned by the reference's own
# Emb/hpo_metab_64.pt table shape (14587, 64).
EXPECTED = {
    "ppi_bp": (17080, 1591, 6, False),
    "hpo_metab": (14587, 2400, 6, False),
    "hpo_neuro": (14587, 4000, 10, True),
    "em_user": (57333, 324, 1, False),  # binary -> 1 logit
}


def _data_root(name: str):
    """First root containing dataset/{name}/subgraphs.pth, else None."""
    roots = [os.environ.get("GLASS_DATA_ROOT", ""), ".",
             str(Path(__file__).resolve().parent.parent)]
    for r in roots:
        if r and (Path(r) / "dataset" / name / "subgraphs.pth").exists():
            return r
    return None


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_real_dataset_loads_with_known_shapes(name):
    root = _data_root(name)
    if root is None:
        pytest.skip(f"real dataset/{name} not present (tools/fetch_realworld.sh)")
    from glass_tpu.data.loaders import load_dataset

    n_node, n_sub, out_ch, multilabel = EXPECTED[name]
    base = load_dataset(name, np.random.default_rng(0), root)
    assert base.n_node == n_node
    assert base.pos.shape[0] == n_sub
    assert base.output_channels == out_ch
    if multilabel:
        assert base.y.ndim == 2 and base.y.shape[1] == out_ch  # k-hot
    # file-tag splits (reference datasets.py:156-168): all three present
    assert {0, 1, 2} <= set(np.unique(base.mask).tolist())
    # pos is the padded (-1) subgraph matrix; every real node id in range
    real = base.pos[base.pos >= 0]
    assert real.size > 0 and int(real.max()) < n_node


@pytest.mark.parametrize("name", sorted(EXPECTED))
def test_real_dataset_one_protocol_epoch(name):
    root = _data_root(name)
    if root is None:
        pytest.skip(f"real dataset/{name} not present (tools/fetch_realworld.sh)")
    import yaml

    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfgdir = Path(__file__).resolve().parent.parent / "glass_tpu" / "configs"
    with open(cfgdir / f"{name}.yml") as f:
        params = yaml.safe_load(f)
    cfg = ExperimentConfig(
        dataset=name, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=1, data_root=root, spmm_mode="segment",
        **{k: v for k, v in params.items() if k in
           ("pool", "aggr", "hidden_dim", "conv_layer", "dropout", "lr",
            "z_ratio", "batch_size", "resi")},
    )
    scores, mean, err = run_experiment(cfg, log=lambda s: None)
    assert len(scores) == 1  # one repeat ran end-to-end without error
