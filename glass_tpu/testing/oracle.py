"""Independent torch implementation of the GLASS math — the single source of
reference truth for both parity checks and the measured baseline.

Written from the reference formulas (impl/models.py, cited per function) —
not imported reference code. Two consumer surfaces share the same math:

* functional ``t_*`` helpers taking flax-layout param dicts — used by the
  activation-parity gates (tests/test_models.py, tools/parity_check.py);
* trainable ``nn.Module`` twins (TGraphNorm/TGLASSConv/TEmbZGConv/TGLASS)
  whose ``forward`` delegates to the same ``t_*`` functions — used by
  tools/oracle_baseline.py to *train* the reference math with the reference
  protocol and produce measured baselines.

Given identical weights, the flax models and this oracle must agree to float
tolerance with dropout off; that is the "per-layer activations allclose"
gate.
"""

from __future__ import annotations

import math

import numpy as np


def _torch():
    import torch

    return torch


def _as_t(v):
    """Coerce numpy/jax arrays to torch tensors; pass torch tensors through
    untouched so module Parameters keep their autograd graph."""
    torch = _torch()
    if isinstance(v, torch.Tensor):
        return v
    return torch.tensor(np.asarray(v))


def t_linear(x, p):
    """y = x @ kernel + bias with flax-layout (in, out) kernels."""
    return x @ _as_t(p["kernel"]) + _as_t(p["bias"])


def t_graphnorm(x, p, eps=1e-5):
    """PyG 1.7.2 GraphNorm, batch=None (impl/models.py usage; SURVEY §2.3)."""
    w = _as_t(p["weight"])
    b = _as_t(p["bias"])
    ms = _as_t(p["mean_scale"])
    mean = x.mean(dim=0, keepdim=True)
    out = x - mean * ms
    var = out.pow(2).mean(dim=0, keepdim=True)
    return w * out / (var + eps).sqrt() + b


def build_adj(edge_index, n, aggr):
    """Normalized sparse-COO adjacency (impl/models.py:83-111 buildAdj):
    coalesced duplicate edges, deg<0.5 -> 1 guard, mean/sum/gcn scaling."""
    torch = _torch()
    edge_index = _as_t(edge_index).long()
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


def t_adj(edge_index, n, aggr):
    """Dense normalized adjacency — build_adj materialized (parity tests
    multiply it against dense activations)."""
    return build_adj(edge_index, n, aggr).to_dense()


def t_glassconv(x, adj, mask, p, z_ratio, act, dropout=0.0, training=False):
    """impl/models.py:153-174 (dropout sits after the GraphNorm, line 166)."""
    torch = _torch()
    import torch.nn.functional as F

    def mix(x1, x0):
        return torch.where(mask, z_ratio * x1 + (1 - z_ratio) * x0,
                           z_ratio * x0 + (1 - z_ratio) * x1)

    x1 = act(t_linear(x, p["trans_1"]))
    x0 = act(t_linear(x, p["trans_0"]))
    h = mix(x1, x0)
    h = adj @ h
    h = t_graphnorm(h, p["gn"])
    h = F.dropout(h, p=dropout, training=training)
    h = torch.cat([h, x], dim=-1)
    return mix(t_linear(h, p["comb_1"]), t_linear(h, p["comb_0"]))


def t_embzgconv(x_int, z, adj, p, num_layers, z_ratio, act, jk=True,
                dropout=0.0, training=False):
    """impl/models.py:240-272. z=None -> mask = (zeros < 0.5) = all TRUE
    (lines 242-244): every node takes the "1" branch — NOT an all-zero z.
    Dropout placement per the reference: after emb_gn (line 251) and after
    the between-layer activation (line 259)."""
    torch = _torch()
    import torch.nn.functional as F

    x_int = _as_t(x_int).long()
    if z is None:
        mask = torch.ones(x_int.shape[0], 1, dtype=torch.bool)
    else:
        mask = (_as_t(z) > 0.5).reshape(-1, 1)
    # F.embedding, not weight[x_int]: same forward, but the duplicate-index
    # gradient accumulation order matches nn.Embedding's, keeping the trained
    # baseline bit-identical to the pre-unification modules
    h = F.embedding(x_int, _as_t(p["input_emb"]["embedding"]))
    h = h.reshape(x_int.shape[0], -1)
    h = t_graphnorm(h, p["emb_gn"])
    h = F.dropout(h, p=dropout, training=training)
    xs = []
    for layer in range(num_layers):
        h = t_glassconv(h, adj, mask, p[f"conv_{layer}"], z_ratio, act,
                        dropout=dropout, training=training)
        xs.append(h)
        if layer < num_layers - 1:
            h = t_graphnorm(h, p[f"gn_{layer}"])
            h = act(h)
            h = F.dropout(h, p=dropout, training=training)
    h = torch.cat(xs, dim=-1) if jk else xs[-1]
    return t_graphnorm(h, p["gn_out"])


def _pool_one(sel, kind, size):
    """One subgraph's reduce (impl/models.py:295-319)."""
    if kind == "sum":
        return sel.sum(0)
    if kind == "mean":
        return sel.mean(0)
    if kind == "max":
        return sel.max(0).values
    if kind == "size":
        return sel.sum(0) / math.sqrt(size)
    raise ValueError(kind)


def t_pool(emb, node_sets, kind):
    """impl/models.py:275-319 pools over explicit node lists."""
    torch = _torch()
    outs = []
    for nodes in node_sets:
        nodes = [int(v) for v in nodes]
        sel = emb[torch.tensor(nodes)]
        outs.append(_pool_one(sel, kind, len(nodes)))
    return torch.stack(outs)


def pool_batches(emb, pos, kind):
    """Pools over padded pos rows, pad = -1 (impl/utils.py:18-29 pad2batch
    feeding impl/models.py:275-319)."""
    torch = _torch()
    outs = []
    for row in pos:
        nodes = row[row >= 0]
        outs.append(_pool_one(emb[nodes], kind, len(nodes)))
    return torch.stack(outs)


def t_glass(x_int, z, pos, edge_index, n, aggr, params, num_layers, z_ratio,
            pool, act=None):
    """Full GLASS forward (impl/models.py:322-355 + driver head)."""
    torch = _torch()
    act = act or torch.nn.functional.elu
    adj = t_adj(edge_index, n, aggr)
    emb = t_embzgconv(x_int, z, adj, params["conv"], num_layers, z_ratio, act)
    node_sets = [[int(v) for v in row if v >= 0] for row in pos]
    pooled = t_pool(emb, node_sets, pool)
    return t_linear(pooled, params["pred_0"])


# --------------------------------------------------------------- trainable
# nn.Module twins: same math via the t_* functions, organized as torch
# modules so the reference *protocol* can train them (tools/oracle_baseline).
# Parameter creation order matches round-2's standalone modules exactly, so
# torch.manual_seed streams (init + dropout draws) are unchanged and the
# measured baseline re-derives bit-identically.


def _module_ns():
    import torch.nn as nn
    import torch.nn.functional as F

    return nn, F


def _linear_params(lin):
    """torch nn.Linear -> flax-layout param dict (kernel transposed); the
    transpose is differentiable so autograd flows through t_linear."""
    return {"kernel": lin.weight.t(), "bias": lin.bias}


def make_oracle_modules():
    """Build the trainable torch module classes lazily (keeps torch an
    optional import for the jax-only paths)."""
    torch = _torch()
    nn, F = _module_ns()

    class TGraphNorm(nn.Module):
        """PyG 1.7.2 GraphNorm, batch=None whole-graph statistics."""

        def __init__(self, channels):
            super().__init__()
            self.weight = nn.Parameter(torch.ones(channels))
            self.bias = nn.Parameter(torch.zeros(channels))
            self.mean_scale = nn.Parameter(torch.ones(channels))

        def flax_params(self):
            return {"weight": self.weight, "bias": self.bias,
                    "mean_scale": self.mean_scale}

        def forward(self, x):
            return t_graphnorm(x, self.flax_params())

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

        def flax_params(self):
            return {"trans_0": _linear_params(self.trans[0]),
                    "trans_1": _linear_params(self.trans[1]),
                    "comb_0": _linear_params(self.comb[0]),
                    "comb_1": _linear_params(self.comb[1]),
                    "gn": self.gn.flax_params()}

        def forward(self, x_, edge_index, mask):
            if self.adj is None:
                self.adj = build_adj(edge_index, x_.shape[0], self.aggr)
            return t_glassconv(x_, self.adj, mask, self.flax_params(),
                               self.z_ratio, F.elu,
                               dropout=self.dropout, training=self.training)

    class TEmbZGConv(nn.Module):
        """reference: impl/models.py:177-272 (trunk, JK, pre-norm between
        layers). forward delegates to t_embzgconv — including the z=None ->
        all-True-mask quirk (impl/models.py:241-245)."""

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
            self.z_ratio = z_ratio
            self.aggr = aggr
            self.adj = None

        def flax_params(self):
            p = {"input_emb": {"embedding": self.input_emb.weight},
                 "emb_gn": self.emb_gn.flax_params(),
                 "gn_out": self.gns[-1].flax_params()}
            for i, conv in enumerate(self.convs):
                p[f"conv_{i}"] = conv.flax_params()
            for i in range(len(self.convs) - 1):
                p[f"gn_{i}"] = self.gns[i].flax_params()
            return p

        def forward(self, x, edge_index, z):
            if self.adj is None:
                self.adj = build_adj(edge_index, x.shape[0], self.aggr)
            return t_embzgconv(x, z, self.adj, self.flax_params(),
                               len(self.convs), self.z_ratio, F.elu,
                               dropout=self.dropout, training=self.training)

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

    return {"TGraphNorm": TGraphNorm, "TGLASSConv": TGLASSConv,
            "TEmbZGConv": TEmbZGConv, "TGLASS": TGLASS}
