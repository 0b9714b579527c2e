"""Measured reference baseline: train the torch oracle with the reference
protocol on the bundled synthetics.

VERDICT.md round-1 item 3: the accuracy gate so far compared against paper
numbers recalled from the ICLR 2022 paper. The reference itself cannot run in
this image (PyTorch-Geometric is absent), but its full math lives in
glass_tpu/testing/oracle.py (the single activation-parity-tested source of
reference truth — VERDICT round-2 item 6 unified the two former oracles);
this script supplies only the *protocol*: the dataloaders' shuffle semantics
(impl/SubGDataset.py:38-96), MaxZOZ labeling (impl/utils.py:32-45), and the
exact experiment loop — Adam + ReduceLROnPlateau(factor=resi, min_lr=5e-5)
on train loss, num_div eval gating, the 1e-5 val tie-window, saturation
early-stop (GLASSTest.py:188-269).

Running this on the 4 bundled synthetics with --repeat 10 produces *measured*
reference-framework baselines on this host, replacing the recalled rows in
BASELINE.md.

Usage:
    JAX_PLATFORMS=cpu python tools/oracle_baseline.py \
        --datasets density coreness cut_ratio component --repeat 10 \
        --out BASELINE_measured.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch
import torch.nn.functional as F

from glass_tpu.data.loaders import load_dataset
from glass_tpu.testing.oracle import make_oracle_modules

TGLASS = make_oracle_modules()["TGLASS"]

# per-dataset hyperparameters — identical to glass_tpu/configs/*.yml, which
# match the reference's config/*.yml (SURVEY.md §2.5)
CONFIGS = {
    "density": dict(aggr="sum", batch_size=2, conv_layer=1, dropout=0.0,
                    hidden_dim=8, lr=0.001, pool="size", resi=0.9, z_ratio=1.0),
    "component": dict(aggr="sum", batch_size=8, conv_layer=1, dropout=0.0,
                      hidden_dim=17, lr=0.001, pool="sum", resi=0.7, z_ratio=0.9),
    "coreness": dict(aggr="sum", batch_size=2, conv_layer=2, dropout=0.05,
                     hidden_dim=20, lr=0.0067, pool="mean", resi=0.9, z_ratio=1.0),
    "cut_ratio": dict(aggr="sum", batch_size=3, conv_layer=1, dropout=0.3,
                      hidden_dim=8, lr=0.01, pool="mean", resi=0.9, z_ratio=0.75),
}


# ---------------------------------------------------------------- protocol


def max_zoz(pos, n):
    """reference: impl/utils.py:32-45."""
    z = torch.zeros(n)
    nodes = pos[pos >= 0]
    z[nodes] = 1.0
    return z


def micro_f1(pred, y):
    from sklearn.metrics import f1_score

    return f1_score(y, pred.argmax(dim=1).numpy(), average="micro")


def binary_f1(pred, y):
    from sklearn.metrics import f1_score

    return f1_score(y.reshape(-1), (pred.numpy().reshape(-1) > 0).astype(int))


@torch.no_grad()
def evaluate(model, x, ei, pos, y, bs, rng, n, score_fn):
    """Shuffled keep-all eval batches (reference: GLASSTest.py:118-119 —
    batch composition sets z, so shuffling is part of the protocol)."""
    model.eval()
    perm = rng.permutation(len(pos))
    preds = []
    for i in range(0, len(perm), bs):
        sel = perm[i: i + bs]
        p = torch.tensor(pos[sel])
        z = max_zoz(p, n)
        preds.append(model(x, ei, p, z))
    pred = torch.cat(preds)
    return score_fn(pred, y[perm])


def run_one(name, cfg, seed, log=print, trajectory=None):
    rng = np.random.default_rng(seed)
    torch.manual_seed(seed)
    base = load_dataset(name, rng)
    base.set_one_feature()
    n = base.n_node
    x = torch.tensor(base.x.astype(np.int64))
    ei = torch.tensor(base.edge_index.astype(np.int64))

    binary = base.binary
    out_ch = base.output_channels
    loss_fn = (
        (lambda p, t: F.binary_cross_entropy_with_logits(p.flatten(), t.flatten()))
        if binary else F.cross_entropy
    )
    score_fn = binary_f1 if binary else micro_f1
    ydt = torch.float32 if binary else torch.int64

    trn_pos, trn_y = base.get_split("train")
    val_pos, val_y = base.get_split("valid")
    tst_pos, tst_y = base.get_split("test")
    trn_y = torch.tensor(trn_y).to(ydt)
    val_y_np, tst_y_np = np.asarray(val_y), np.asarray(tst_y)

    model = TGLASS(cfg, base.max_deg, out_ch)
    opt = torch.optim.Adam(model.parameters(), lr=cfg["lr"])
    scd = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, factor=cfg["resi"], min_lr=5e-5
    )

    bs = cfg["batch_size"]
    num_div = len(tst_pos) / bs / 5  # synthetics: /5 (GLASSTest.py:198-201)
    gate = 100 / num_div

    val_score, tst_best, early_stop = 0.0, 0.0, 0
    t0 = time.time()
    for i in range(300):
        model.train()
        perm = rng.permutation(len(trn_pos))
        nb = len(perm) // bs
        losses = []
        for b in range(nb):  # drop_last=True (GLASSTest.py:108-116)
            sel = perm[b * bs: (b + 1) * bs]
            p = torch.tensor(trn_pos[sel])
            z = max_zoz(p, n)
            opt.zero_grad()
            out = model(x, ei, p, z)
            loss = loss_fn(out, trn_y[sel])
            loss.backward()
            opt.step()
            losses.append(loss.item())
        scd.step(float(np.mean(losses)))
        if trajectory is not None:
            trajectory.append(
                {"epoch": i, "loss": float(np.mean(losses)),
                 "lr": float(opt.param_groups[0]["lr"])}
            )

        if i >= gate:
            score = evaluate(model, x, ei, val_pos, val_y_np, bs, rng, n, score_fn)
            if score > val_score:
                early_stop = 0
                val_score = score
                tst_best = evaluate(model, x, ei, tst_pos, tst_y_np, bs, rng, n, score_fn)
                log(f"iter {i} loss {np.mean(losses):.4f} val {val_score:.4f} tst {tst_best:.4f}")
            elif score >= val_score - 1e-5:
                probe = evaluate(model, x, ei, tst_pos, tst_y_np, bs, rng, n, score_fn)
                tst_best = max(probe, tst_best)
            else:
                early_stop += 1
        if val_score >= 1 - 1e-5:
            early_stop += 1
        if early_stop > gate:
            break
    log(f"end: epoch {i + 1}, {time.time() - t0:.1f} s, val {val_score:.3f} tst {tst_best:.3f}")
    return tst_best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datasets", nargs="+", default=list(CONFIGS))
    ap.add_argument("--repeat", type=int, default=10)
    ap.add_argument("--rep_start", type=int, default=0,
                    help="first repeat index; seeds stay (1<<r)-1, pairing "
                    "with the CLI's --use_seed runs on extended seed sets")
    ap.add_argument("--out", type=str, default="BASELINE_measured.json")
    args = ap.parse_args()

    results = {}
    for name in args.datasets:
        cfg = CONFIGS[name]
        scores = []
        for r in range(args.rep_start, args.rep_start + args.repeat):
            seed = (1 << r) - 1
            print(f"== {name} repeat {r} (seed {seed})", flush=True)
            scores.append(run_one(name, cfg, seed))
        mean = float(np.average(scores))
        err = float(np.std(scores) / np.sqrt(len(scores)))
        results[name] = {"scores": [float(s) for s in scores],
                         "mean": mean, "stderr": err}
        print(f"== {name}: {mean:.3f} +- {err:.3f}", flush=True)
        Path(args.out).write_text(json.dumps(results, indent=2))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
