"""Independent torch implementation of the GLASS math, used as the golden
oracle for activation-parity checks.

Written from the reference formulas (impl/models.py, cited per function) —
not imported reference code. Given identical weights, the flax models and
this oracle must agree to float tolerance with dropout off; that is the
"per-layer activations allclose" gate, exercised by tests/test_models.py and
the tools/parity_check.py harness.
"""

from __future__ import annotations

import numpy as np


def _torch():
    import torch

    return torch


def t_linear(x, p):
    """y = x @ kernel + bias with flax-layout (in, out) kernels."""
    torch = _torch()
    return x @ torch.tensor(np.asarray(p["kernel"])) + torch.tensor(np.asarray(p["bias"]))


def t_graphnorm(x, p, eps=1e-5):
    """PyG 1.7.2 GraphNorm, batch=None (impl/models.py usage; SURVEY §2.3)."""
    torch = _torch()
    w = torch.tensor(np.asarray(p["weight"]))
    b = torch.tensor(np.asarray(p["bias"]))
    ms = torch.tensor(np.asarray(p["mean_scale"]))
    mean = x.mean(dim=0, keepdim=True)
    out = x - mean * ms
    var = out.pow(2).mean(dim=0, keepdim=True)
    return w * out / (var + eps).sqrt() + b


def t_adj(edge_index, n, aggr):
    """Normalized dense adjacency (impl/models.py:83-111 buildAdj)."""
    torch = _torch()
    a = torch.zeros(n, n)
    for r, c in zip(edge_index[0], edge_index[1]):
        a[int(r), int(c)] += 1.0
    deg = a.sum(1)
    deg[deg < 0.5] += 1.0
    if aggr == "mean":
        return a / deg[:, None]
    if aggr == "sum":
        return a
    ds = deg.pow(-0.5)
    return ds[:, None] * a * ds[None, :]


def t_glassconv(x, adj, mask, p, z_ratio, act):
    """impl/models.py:153-174."""
    torch = _torch()

    def mix(x1, x0):
        return torch.where(mask, z_ratio * x1 + (1 - z_ratio) * x0,
                           z_ratio * x0 + (1 - z_ratio) * x1)

    x1 = act(t_linear(x, p["trans_1"]))
    x0 = act(t_linear(x, p["trans_0"]))
    h = mix(x1, x0)
    h = adj @ h
    h = t_graphnorm(h, p["gn"])
    h = torch.cat([h, x], dim=-1)
    return mix(t_linear(h, p["comb_1"]), t_linear(h, p["comb_0"]))


def t_embzgconv(x_int, z, adj, p, num_layers, z_ratio, act, jk=True):
    """impl/models.py:240-272 (z=None -> all-True mask, lines 242-244)."""
    torch = _torch()
    if z is None:
        mask = torch.ones(len(x_int), 1, dtype=torch.bool)
    else:
        mask = torch.tensor(np.asarray(z) > 0.5).reshape(-1, 1)
    h = torch.tensor(np.asarray(p["input_emb"]["embedding"]))[torch.tensor(x_int)]
    h = t_graphnorm(h, p["emb_gn"])
    xs = []
    for layer in range(num_layers):
        h = t_glassconv(h, adj, mask, p[f"conv_{layer}"], z_ratio, act)
        xs.append(h)
        if layer < num_layers - 1:
            h = t_graphnorm(h, p[f"gn_{layer}"])
            h = act(h)
    h = torch.cat(xs, dim=-1) if jk else xs[-1]
    return t_graphnorm(h, p["gn_out"])


def t_pool(emb, node_sets, kind):
    """impl/models.py:295-319 pools."""
    torch = _torch()
    outs = []
    for nodes in node_sets:
        sel = emb[torch.tensor(list(nodes))]
        if kind == "sum":
            outs.append(sel.sum(0))
        elif kind == "mean":
            outs.append(sel.mean(0))
        elif kind == "max":
            outs.append(sel.max(0).values)
        elif kind == "size":
            outs.append(sel.sum(0) / np.sqrt(len(nodes)))
        else:
            raise ValueError(kind)
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
