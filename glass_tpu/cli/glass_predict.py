"""Batch inference CLI — score subgraphs with a trained GLASS checkpoint.

The reference repo has no serving path (training scripts only; its closest
artifact is the best-val model the protocol evaluates in-process,
GLASSTest.py:233-252). This driver completes the deployment story:
reconstruct the model from the dataset config exactly as the experiment
protocol does, load a best-val checkpoint saved by
``glass_test --ckpt_dir``, and emit one prediction per subgraph.

Usage:
    python -m glass_tpu.cli.glass_test --dataset density --use_one \
        --use_maxzeroone --repeat 1 --ckpt_dir ckpts          # train+save
    python -m glass_tpu.cli.glass_predict --dataset density --use_one \
        --use_maxzeroone --ckpt ckpts/density_seed0_best.npz  # serve

Subgraph sources: a dataset split (``--split test``, default) or a TSV file
(``--subgraphs``) of '-'-joined node-id lists — the node column of the
reference's ``subgraphs.pth`` format (datasets.py:131-178), so real-world
dataset files can be scored directly.

For online serving (latency-oriented, shape-bucketed jit) use the library
API ``glass_tpu.serve.Predictor`` instead; this CLI is the offline batch
scorer with the experiment protocol's eval batching.

Note the zero-one labeling trick makes predictions depend on batch
composition (z is computed per batch, reference impl/SubGDataset.py:92-96):
this driver batches deterministically in input order, so output is
reproducible, but scoring the same subgraph in a different batch can change
its logits — inherent to the method's eval protocol, not a serving bug.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="GLASS batch inference")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--ckpt", type=str, required=True,
                        help="params checkpoint (.npz written by "
                             "glass_test --ckpt_dir: {dataset}_seed{k}_best.npz)")
    parser.add_argument("--use_deg", action="store_true")
    parser.add_argument("--use_one", action="store_true")
    parser.add_argument("--use_nodeid", action="store_true")
    parser.add_argument("--use_maxzeroone", action="store_true")
    parser.add_argument("--split", type=str, default="test",
                        choices=["train", "valid", "test"],
                        help="dataset split to score (ignored with --subgraphs)")
    parser.add_argument("--subgraphs", type=str, default=None,
                        help="TSV of '-'-joined node ids, one subgraph per "
                             "line (extra tab-separated columns ignored)")
    parser.add_argument("--output", type=str, default="-",
                        help="output TSV path ('-' = stdout)")
    parser.add_argument("--logits", action="store_true",
                        help="append raw logits to each output row")
    parser.add_argument("--batch_size", type=int, default=0,
                        help="0 = the dataset config's batch_size")
    parser.add_argument("--device", type=int, default=0,
                        help="-1 forces the CPU backend")
    parser.add_argument("--spmm", type=str, default=None,
                        choices=["dense", "segment", "pallas"])
    parser.add_argument("--seed", type=int, default=0,
                        help="split-regeneration seed; must match the "
                             "training repeat's seed ((1<<r)-1) for the "
                             "synthetics' re-rolled splits to line up")
    parser.add_argument("--config_dir", type=str, default=None)
    parser.add_argument("--data_root", type=str, default=None)
    return parser


def read_subgraphs_file(path: str, n_node: int, pad: int) -> np.ndarray:
    """(S, pad) int64 pos matrix (pad=-1) from a TSV whose first column is a
    '-'-joined node-id list (the reference subgraphs.pth node column)."""
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            nodes = [int(t) for t in line.split("\t")[0].split("-")]
            bad = [v for v in nodes if not 0 <= v < n_node]
            if bad:
                raise ValueError(f"node id {bad[0]} outside [0, {n_node})")
            rows.append(nodes)
    if not rows:
        raise ValueError(f"no subgraphs in {path}")
    width = max(pad, max(len(r) for r in rows))
    pos = np.full((len(rows), width), -1, dtype=np.int64)
    for i, r in enumerate(rows):
        pos[i, : len(r)] = r
    return pos


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.device == -1:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from glass_tpu.cli.glass_test import load_config
    from glass_tpu.data.loaders import load_dataset
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.train.loop import Trainer, TrainConfig, make_eval_batches
    from glass_tpu.train.metrics import binary_f1, micro_f1
    from glass_tpu.train.protocol import (
        ExperimentConfig, _auto_route, apply_feature, make_glass_model,
    )
    from glass_tpu.utils.checkpoint import load_checkpoint

    if args.use_deg:
        feature = "deg"
    elif args.use_one:
        feature = "one"
    elif args.use_nodeid:
        feature = "nodeid"
    else:
        raise NotImplementedError("pick one of --use_deg / --use_one / --use_nodeid")

    params_yaml = load_config(args.dataset, args.config_dir)
    cfg = ExperimentConfig(
        dataset=args.dataset, feature=feature,
        use_maxzeroone=args.use_maxzeroone, repeat=1,
        spmm_mode=args.spmm, data_root=args.data_root, **params_yaml,
    )

    rng = np.random.default_rng(args.seed)
    base = load_dataset(cfg.dataset, rng, cfg.data_root)
    apply_feature(base, feature)
    spmm_mode, use_rcm = _auto_route(cfg, base.n_node, jax.default_backend())
    perm = None  # RCM relabeling: perm[new_id] = original id
    if use_rcm:
        from glass_tpu.native import rcm_ordering

        # predictions are invariant to the reordering (tested in
        # test_protocol.py); only the id <-> row mapping changes
        perm = rcm_ordering(base.edge_index, base.n_node)
        base.relabel_nodes(perm)

    model = make_glass_model(cfg, base, spmm_mode)
    graph = build_graph(
        base.edge_index, base.edge_weight, base.n_node, cfg.aggr,
        materialize_dense=(None if spmm_mode is None else spmm_mode == "dense"),
        dense_dtype=cfg.dense_dtype,
        materialize_bcsr=spmm_mode == "pallas",
    )
    tcfg = TrainConfig(
        lr=cfg.lr, resi=cfg.resi, batch_size=cfg.batch_size,
        loss="bce" if base.binary else "ce", use_z=cfg.use_maxzeroone,
    )

    y = None
    if args.subgraphs is not None:
        pos = read_subgraphs_file(args.subgraphs, base.n_node, base.pos.shape[1])
        if perm is not None:  # TSV ids are original ids — map into the
            # relabeled space with the same helper relabel_nodes uses
            from glass_tpu.data.basegraph import relabel_pos

            pos = relabel_pos(pos, perm, base.n_node)
    else:
        pos, y = base.get_split(args.split)  # already relabeled with the graph
        y = y.astype(np.float32 if base.binary else np.int64)
    batch_size = args.batch_size or cfg.batch_size

    trainer = Trainer(model, graph, jnp.asarray(base.x.astype(np.int32)), tcfg,
                      donate=False)
    params, _, _ = trainer.init(0, jnp.asarray(pos[:1]))
    params = load_checkpoint(args.ckpt, like=params)

    # deterministic (unshuffled) batches: reproducible serving output
    dummy_y = np.zeros(pos.shape[0], np.float32) if y is None else y
    pos_b, y_p, n_real = make_eval_batches(pos, dummy_y, batch_size, rng=None)
    logits = trainer.evaluate(params, jnp.asarray(pos_b), n_real)

    if base.binary:
        pred = (logits > 0).astype(np.int64)
        pred_str = [",".join(map(str, row)) for row in pred]
    else:
        pred = logits.argmax(axis=-1)
        pred_str = [str(v) for v in pred]

    out = sys.stdout if args.output == "-" else open(args.output, "w")
    try:
        for i in range(n_real):
            ids = pos[i][pos[i] >= 0]
            if perm is not None:  # report original node ids
                ids = np.asarray(perm)[ids]
            nodes = "-".join(str(v) for v in ids)
            row = [str(i), nodes, pred_str[i]]
            if args.logits:
                row.append(",".join(f"{v:.6g}" for v in np.atleast_1d(logits[i])))
            print("\t".join(row), file=out)
    finally:
        if out is not sys.stdout:
            out.close()

    if y is not None:
        score_fn = binary_f1 if base.binary else micro_f1
        score = score_fn(logits, y_p[:n_real])
        print(f"{args.split} micro-F1 {score:.4f} over {n_real} subgraphs",
              file=sys.stderr)
        return score
    return None


if __name__ == "__main__":
    main()
