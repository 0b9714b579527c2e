"""Coreness ablation arm 2 (VERDICT r2 item 3): the full flax protocol with
TORCH-drawn initial weights injected per seed.

The splits are identical per seed across tools/oracle_baseline.py and the
flax CLI (both draw from ``np.random.default_rng(seed)`` through
``load_dataset``), so this gives a three-way PAIRED comparison on the same
splits:

  oracle (torch init, torch training)        -- /tmp or RESULTS baseline
  flax   (torch init, flax training)         -- THIS TOOL
  flax   (flax  init, flax training)         -- the CLI

If (torch init, flax training) recovers the oracle's scores, the residual
coreness gap is initialization statistics, not training semantics; if it
stays at the flax level, the semantics differ somewhere downstream of init.

Usage:
    python tools/coreness_inject.py --dataset coreness --repeats 8
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch

import jax

jax.config.update("jax_platforms", "cpu")  # the ONLY reliable CPU override here

import jax.numpy as jnp

from glass_tpu.data.loaders import load_dataset
from glass_tpu.ops.graph import build_graph
from glass_tpu.testing.oracle import make_oracle_modules
from glass_tpu.train.loop import (
    Trainer,
    TrainConfig,
    make_eval_batches,
    make_train_batches,
)
from glass_tpu.train.metrics import binary_f1, micro_f1
from tools.oracle_baseline import CONFIGS
from tools.trajectory_diff import inject_torch_weights

TGLASS = make_oracle_modules()["TGLASS"]

SYNTHETICS = ("density", "component", "cut_ratio", "coreness")


def run_one(dataset: str, seed: int, max_epochs: int = 300) -> float:
    cfg = CONFIGS[dataset]
    rng = np.random.default_rng(seed)
    base = load_dataset(dataset, rng)
    base.set_one_feature()
    binary = base.binary
    score_fn = binary_f1 if binary else micro_f1

    trn_pos, trn_y = base.get_split("train")
    val_pos, val_y = base.get_split("valid")
    tst_pos, tst_y = base.get_split("test")

    # torch init draw, exactly as tools/oracle_baseline.py::run_one does
    torch.manual_seed(seed)
    tmodel = TGLASS(cfg, base.max_deg, base.output_channels)

    graph = build_graph(base.edge_index, base.edge_weight, base.n_node,
                        cfg["aggr"], materialize_dense=False)
    tcfg = TrainConfig(lr=cfg["lr"], resi=cfg["resi"],
                       batch_size=cfg["batch_size"],
                       loss="bce" if binary else "ce", use_z=True)
    model_x = jnp.asarray(base.x.astype(np.int32))
    from glass_tpu.train.protocol import ExperimentConfig, make_glass_model

    ecfg = ExperimentConfig(
        dataset=dataset, pool=cfg["pool"], aggr=cfg["aggr"],
        hidden_dim=cfg["hidden_dim"], conv_layer=cfg["conv_layer"],
        dropout=cfg["dropout"], lr=cfg["lr"], z_ratio=cfg["z_ratio"],
        batch_size=cfg["batch_size"], resi=cfg["resi"], spmm_mode="segment",
    )
    model = make_glass_model(ecfg, base, "segment")
    trainer = Trainer(model, graph, model_x, tcfg, donate=False)
    params, opt_state, plateau = trainer.init(
        seed, jnp.asarray(trn_pos[: cfg["batch_size"]]))
    params = inject_torch_weights(params, tmodel)
    rng_jax = jax.random.PRNGKey(seed + 1)

    ydt = np.float32 if binary else np.int64
    bs = cfg["batch_size"]
    num_div = tst_y.shape[0] / bs
    if dataset in SYNTHETICS:
        num_div /= 5
    eval_after = stop_after = 100 / num_div

    def eval_split(pos, y):
        b, y_p, n_real = make_eval_batches(pos, y, bs, rng)
        return score_fn(trainer.evaluate(params, jnp.asarray(b), n_real), y_p)

    val_score, tst_best, early = 0.0, 0.0, 0
    t0 = time.time()
    for i in range(max_epochs):
        pos_b, y_b = make_train_batches(rng, trn_pos, trn_y, bs)
        params, opt_state, plateau, rng_jax, loss = trainer.train_epoch(
            params, opt_state, plateau, rng_jax,
            jnp.asarray(pos_b), jnp.asarray(y_b.astype(ydt)))
        if i >= eval_after:
            score = eval_split(val_pos, val_y)
            if score > val_score:
                early, val_score = 0, score
                tst_best = eval_split(tst_pos, tst_y)
                print(f"iter {i} loss {float(loss):.4f} val {val_score:.4f} "
                      f"tst {tst_best:.4f}", flush=True)
            elif score >= val_score - 1e-5:
                tst_best = max(eval_split(tst_pos, tst_y), tst_best)
            else:
                early += 1
        if val_score >= 1 - 1e-5:
            early += 1
        if early > stop_after:
            break
    print(f"end: epoch {i + 1}, {time.time() - t0:.1f} s, "
          f"val {val_score:.3f} tst {tst_best:.3f}", flush=True)
    return tst_best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="coreness")
    ap.add_argument("--repeats", type=int, default=8)
    ap.add_argument("--rep_start", type=int, default=0,
                    help="first repeat index (seeds stay (1<<r)-1, so shards "
                    "of the sweep pair with the CLI's --use_seed runs)")
    args = ap.parse_args()
    scores = []
    for r in range(args.rep_start, args.rep_start + args.repeats):
        seed = (1 << r) - 1
        print(f"== {args.dataset} inject repeat {r} (seed {seed})", flush=True)
        scores.append(run_one(args.dataset, seed))
    print(f"average {np.average(scores):.4f} "
          f"error {np.std(scores) / np.sqrt(len(scores)):.4f} "
          f"scores {[round(s, 4) for s in scores]}", flush=True)


if __name__ == "__main__":
    main()
