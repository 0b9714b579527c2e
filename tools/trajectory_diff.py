"""Controlled coreness ablation (VERDICT r2 item 3): identical initial
weights into the torch oracle (glass_tpu/testing/oracle.py modules) and the
flax Trainer, identical batch permutations, dropout off — then diff the
training trajectories (per-epoch train loss, plateau LR, val/test scores on
shared eval draws) epoch by epoch.

If the two frameworks' math is equivalent, the trajectories track to float
accumulation noise for the first tens of epochs; a systematic early split
localizes a semantics bug (loss, Adam, plateau, z labeling, eval batching).

Usage:
    python tools/trajectory_diff.py --dataset coreness --epochs 60 [--dropout]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch
import torch.nn.functional as F

import jax

jax.config.update("jax_platforms", "cpu")  # the ONLY reliable CPU override here

import jax.numpy as jnp

from glass_tpu.data.loaders import load_dataset
from glass_tpu.testing.oracle import make_oracle_modules
from glass_tpu.train.loop import Trainer, TrainConfig, make_eval_batches
from glass_tpu.train.metrics import micro_f1, binary_f1
from glass_tpu.train.protocol import make_glass_model, ExperimentConfig
from glass_tpu.ops.graph import build_graph
from tools.oracle_baseline import CONFIGS, max_zoz

TGLASS = make_oracle_modules()["TGLASS"]


def inject_torch_weights(flax_params, tmodel):
    """Copy the torch oracle module's initial weights into the flax param
    pytree (structures match by construction — oracle.flax_params())."""
    src = {"conv": tmodel.conv.flax_params(),
           "pred_0": {"kernel": tmodel.pred.weight.t(), "bias": tmodel.pred.bias}}

    def conv(v):
        # COPY, do not alias: on the CPU backend jnp.asarray of a
        # torch-backed numpy view shares memory with the torch parameter,
        # so every later torch optimizer.step() would silently mutate the
        # "injected" flax params (observed: the flax trajectory tracked
        # torch's post-epoch weights, poisoning the whole diff)
        return jnp.asarray(np.array(v.detach().numpy(), copy=True))

    def rec(dst, s):
        out = {}
        for k in dst:
            out[k] = rec(dst[k], s[k]) if isinstance(dst[k], dict) else conv(s[k])
        return out

    return {"params": rec(flax_params["params"], src)}


def run(dataset: str, epochs: int, use_dropout: bool, seed: int = 0):
    cfg = dict(CONFIGS[dataset])
    if not use_dropout:
        cfg["dropout"] = 0.0

    rng = np.random.default_rng(seed)
    base = load_dataset(dataset, rng)
    base.set_one_feature()
    n = base.n_node
    binary = base.binary

    trn_pos, trn_y = base.get_split("train")
    val_pos, val_y = base.get_split("valid")
    tst_pos, tst_y = base.get_split("test")

    # ---- torch side
    torch.manual_seed(seed)
    tmodel = TGLASS(cfg, base.max_deg, base.output_channels)
    topt = torch.optim.Adam(tmodel.parameters(), lr=cfg["lr"])
    tscd = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, factor=cfg["resi"], min_lr=5e-5
    )
    tx = torch.tensor(base.x.astype(np.int64))
    tei = torch.tensor(base.edge_index.astype(np.int64))
    tloss_fn = (
        (lambda p, t: F.binary_cross_entropy_with_logits(p.flatten(), t.flatten()))
        if binary else F.cross_entropy
    )
    ydt = torch.float32 if binary else torch.int64
    ttrn_y = torch.tensor(trn_y).to(ydt)

    # ---- flax side (same init weights, injected from the torch module)
    ecfg = ExperimentConfig(
        dataset=dataset, pool=cfg["pool"], aggr=cfg["aggr"],
        hidden_dim=cfg["hidden_dim"], conv_layer=cfg["conv_layer"],
        dropout=cfg["dropout"], lr=cfg["lr"], z_ratio=cfg["z_ratio"],
        batch_size=cfg["batch_size"], resi=cfg["resi"],
        spmm_mode="segment",
    )
    model = make_glass_model(ecfg, base, "segment")
    graph = build_graph(base.edge_index, base.edge_weight, n, cfg["aggr"],
                        materialize_dense=False)
    tcfg = TrainConfig(lr=cfg["lr"], resi=cfg["resi"],
                       batch_size=cfg["batch_size"], loss="bce" if binary else "ce",
                       use_z=True)
    x = jnp.asarray(base.x.astype(np.int32))
    trainer = Trainer(model, graph, x, tcfg, donate=False)
    params, opt_state, plateau = trainer.init(seed, jnp.asarray(trn_pos[: cfg["batch_size"]]))
    params = inject_torch_weights(params, tmodel)
    key = jax.random.PRNGKey(seed + 1)

    score_fn = binary_f1 if binary else micro_f1

    def t_micro(pred, y):
        from sklearn.metrics import f1_score

        if binary:
            return f1_score(np.asarray(y).reshape(-1),
                            (pred.numpy().reshape(-1) > 0).astype(int))
        return f1_score(np.asarray(y), pred.argmax(dim=1).numpy(), average="micro")

    bs = cfg["batch_size"]
    perm_rng = np.random.default_rng(12345)  # shared batch-draw stream

    def eval_both(pos_split, y_split):
        perm = perm_rng.permutation(len(pos_split))
        p, yy = pos_split[perm], np.asarray(y_split)[perm]
        # torch
        tmodel.eval()
        with torch.no_grad():
            preds = []
            for i in range(0, len(p), bs):
                pp = torch.tensor(p[i: i + bs])
                preds.append(tmodel(tx, tei, pp, max_zoz(pp, n)))
            ts = t_micro(torch.cat(preds), yy)
        # flax (same permutation; pad-batched)
        b, y_p, n_real = make_eval_batches(p, yy, bs, rng=None)
        fs = score_fn(trainer.evaluate(params, jnp.asarray(b), n_real), y_p)
        return ts, fs

    rows = []
    for ep in range(epochs):
        perm = perm_rng.permutation(len(trn_pos))
        nbk = len(perm) // bs
        sel = perm[: nbk * bs].reshape(nbk, bs)

        # torch epoch
        tmodel.train()
        tlosses = []
        for b in range(nbk):
            pp = torch.tensor(trn_pos[sel[b]])
            z = max_zoz(pp, n)
            topt.zero_grad()
            out = tmodel(tx, tei, pp, z)
            tl = tloss_fn(out, ttrn_y[sel[b]])
            tl.backward()
            topt.step()
            tlosses.append(tl.item())
        tscd.step(float(np.mean(tlosses)))

        # flax epoch (identical batches)
        pos_b = jnp.asarray(trn_pos[sel])
        y_b = jnp.asarray(trn_y[sel].astype(np.float32 if binary else np.int64))
        params, opt_state, plateau, key, floss = trainer.train_epoch(
            params, opt_state, plateau, key, pos_b, y_b
        )
        row = {
            "epoch": ep,
            "t_loss": float(np.mean(tlosses)),
            "f_loss": float(floss),
            "t_lr": float(topt.param_groups[0]["lr"]),
            "f_lr": float(plateau.lr),
        }
        if ep % 10 == 0 or ep == epochs - 1:
            tv, fv = eval_both(val_pos, val_y)
            tt, ft = eval_both(tst_pos, tst_y)
            row.update(t_val=tv, f_val=fv, t_tst=tt, f_tst=ft)
        rows.append(row)
        print(json.dumps(row), flush=True)

    dl = np.array([abs(r["t_loss"] - r["f_loss"]) for r in rows])
    rel = dl / np.maximum(np.array([abs(r["t_loss"]) for r in rows]), 1e-9)
    first_split = next((r["epoch"] for r, rr in zip(rows, rel) if rr > 0.02), None)
    print(f"# max rel loss diff {rel.max():.4f}; first epoch with >2% split: "
          f"{first_split}; LR trajectories equal: "
          f"{all(abs(r['t_lr'] - r['f_lr']) < 1e-9 for r in rows)}", flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="coreness")
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--dropout", action="store_true",
                    help="keep the config dropout (trajectories then diverge "
                    "by RNG design; loss curves compare statistically only)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    run(args.dataset, args.epochs, args.dropout, args.seed)
