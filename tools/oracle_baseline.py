"""Measured reference baseline: train the torch oracle with the reference
protocol on the bundled synthetics.

VERDICT.md round-1 item 3: the accuracy gate so far compared against paper
numbers recalled from the ICLR 2022 paper. The reference itself cannot run in
this image (PyTorch-Geometric is absent), but its full math is re-implemented
here in plain torch (an extension of glass_tpu/testing/oracle.py, which is
activation-parity-tested against the flax models): GLASSConv / EmbZGConv /
pools (reference: impl/models.py:114-355), the dataloaders' shuffle semantics
(impl/SubGDataset.py:38-96), MaxZOZ labeling (impl/utils.py:32-45), and the
exact experiment protocol — Adam + ReduceLROnPlateau(factor=resi, min_lr=5e-5)
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
import math
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch
import torch.nn as nn
import torch.nn.functional as F

from glass_tpu.data.loaders import load_dataset

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


# ---------------------------------------------------------------- modules


class TGraphNorm(nn.Module):
    """PyG 1.7.2 GraphNorm, batch=None whole-graph statistics (SURVEY §2.3)."""

    def __init__(self, channels: int):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(channels))
        self.bias = nn.Parameter(torch.zeros(channels))
        self.mean_scale = nn.Parameter(torch.ones(channels))
        self.eps = 1e-5

    def forward(self, x):
        mean = x.mean(dim=0, keepdim=True)
        out = x - mean * self.mean_scale
        var = out.pow(2).mean(dim=0, keepdim=True)
        return self.weight * out / (var + self.eps).sqrt() + self.bias


def build_adj(edge_index: torch.Tensor, n: int, aggr: str) -> torch.Tensor:
    """Normalized sparse adjacency (reference: impl/models.py:83-111)."""
    w = torch.ones(edge_index.shape[1])
    adj = torch.sparse_coo_tensor(edge_index, w, size=(n, n)).coalesce()
    deg = torch.sparse.sum(adj, dim=1).to_dense()
    deg[deg < 0.5] += 1.0
    idx, val = adj.indices(), adj.values()
    if aggr == "mean":
        val = val / deg[idx[0]]
    elif aggr == "gcn":
        ds = deg.pow(-0.5)
        val = ds[idx[0]] * val * ds[idx[1]]
    elif aggr != "sum":
        raise ValueError(aggr)
    return torch.sparse_coo_tensor(idx, val, size=(n, n)).coalesce()


class TGLASSConv(nn.Module):
    """reference: impl/models.py:114-174 (dual trans/comb + masked mix)."""

    def __init__(self, in_ch, out_ch, z_ratio, dropout, aggr):
        super().__init__()
        self.trans = nn.ModuleList([nn.Linear(in_ch, out_ch) for _ in range(2)])
        self.comb = nn.ModuleList(
            [nn.Linear(in_ch + out_ch, out_ch) for _ in range(2)]
        )
        self.gn = TGraphNorm(out_ch)
        self.z_ratio = z_ratio
        self.dropout = dropout
        self.aggr = aggr
        self.adj = None  # cached on first call (impl/models.py:154-156)

    def mix(self, x1, x0, mask):
        zr = self.z_ratio
        return torch.where(mask, zr * x1 + (1 - zr) * x0, zr * x0 + (1 - zr) * x1)

    def forward(self, x_, edge_index, mask):
        if self.adj is None:
            self.adj = build_adj(edge_index, x_.shape[0], self.aggr)
        x1 = F.elu(self.trans[1](x_))
        x0 = F.elu(self.trans[0](x_))
        x = self.mix(x1, x0, mask)
        x = self.adj @ x
        x = self.gn(x)
        x = F.dropout(x, p=self.dropout, training=self.training)
        x = torch.cat((x, x_), dim=-1)
        return self.mix(self.comb[1](x), self.comb[0](x), mask)


class TEmbZGConv(nn.Module):
    """reference: impl/models.py:177-272 (trunk, JK, pre-norm between layers)."""

    def __init__(self, hidden, num_layers, max_deg, dropout, z_ratio, aggr):
        super().__init__()
        self.input_emb = nn.Embedding(max_deg + 1, hidden)
        self.emb_gn = TGraphNorm(hidden)
        self.convs = nn.ModuleList(
            [TGLASSConv(hidden, hidden, z_ratio, dropout, aggr)
             for _ in range(num_layers)]
        )
        self.gns = nn.ModuleList(
            [TGraphNorm(hidden) for _ in range(num_layers - 1)]
            + [TGraphNorm(hidden * num_layers)]  # jk=1 always (GLASSTest.py:187)
        )
        self.dropout = dropout

    def forward(self, x, edge_index, z):
        if z is None:
            mask = torch.zeros(x.shape[0], 1, dtype=torch.bool)
        else:
            mask = (z > 0.5).reshape(-1, 1)
        h = self.input_emb(x).reshape(x.shape[0], -1)
        h = self.emb_gn(h)
        h = F.dropout(h, p=self.dropout, training=self.training)
        xs = []
        for layer, conv in enumerate(self.convs[:-1]):
            h = conv(h, edge_index, mask)
            xs.append(h)
            h = self.gns[layer](h)
            h = F.elu(h)
            h = F.dropout(h, p=self.dropout, training=self.training)
        h = self.convs[-1](h, edge_index, mask)
        xs.append(h)
        return self.gns[-1](torch.cat(xs, dim=-1))


def pool_batches(emb, pos, kind):
    """Pools over padded pos rows (reference: impl/models.py:275-319)."""
    outs = []
    for row in pos:
        nodes = row[row >= 0]
        sel = emb[nodes]
        if kind == "sum":
            outs.append(sel.sum(0))
        elif kind == "mean":
            outs.append(sel.mean(0))
        elif kind == "max":
            outs.append(sel.max(0).values)
        elif kind == "size":
            outs.append(sel.sum(0) / math.sqrt(len(nodes)))
        else:
            raise ValueError(kind)
    return torch.stack(outs)


class TGLASS(nn.Module):
    """reference: impl/models.py:322-355 + driver head (GLASSTest.py:159)."""

    def __init__(self, cfg, max_deg, out_ch):
        super().__init__()
        self.conv = TEmbZGConv(cfg["hidden_dim"], cfg["conv_layer"], max_deg,
                               cfg["dropout"], cfg["z_ratio"], cfg["aggr"])
        self.pred = nn.Linear(cfg["hidden_dim"] * cfg["conv_layer"], out_ch)
        self.pool = cfg["pool"]

    def forward(self, x, edge_index, pos, z):
        emb = self.conv(x, edge_index, z)
        return self.pred(pool_batches(emb, pos, self.pool))


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


def run_one(name, cfg, seed, log=print):
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
    ap.add_argument("--out", type=str, default="BASELINE_measured.json")
    args = ap.parse_args()

    results = {}
    for name in args.datasets:
        cfg = CONFIGS[name]
        scores = []
        for r in range(args.repeat):
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
