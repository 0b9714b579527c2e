"""GNN-seg baseline models (reference: GNNSeg.py:70-171).

All message passing is batched-dense: per-subgraph adjacencies (B, L, L)
against features (B, L, F) via einsum on the MXU. GraphNorm statistics span
all *valid* nodes of the whole batch (the reference calls PyG GraphNorm with
batch=None on the merged graph, which couples subgraphs in a batch —
GNNSeg.py:117-118), reproduced here with masked reductions.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from glass_tpu.nn.dropout import HWDropout

from glass_tpu.nn.modules import ACTIVATIONS, MLP, TorchLinear


def glorot_kernel_init(key, shape, dtype=jnp.float32):
    """PyG glorot: U(-s, s), s = sqrt(6 / (fan_in + fan_out))."""
    s = np.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -s, s)


class MaskedGraphNorm(nn.Module):
    """GraphNorm over every valid node of the batch (merged-graph batch=None
    semantics); mask: (B, L) validity."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask):
        f = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean_scale = self.param("mean_scale", nn.initializers.ones, (f,))
        m = mask[..., None].astype(x.dtype)
        cnt = jnp.maximum(m.sum(), 1.0)
        mean = (x * m).sum(axis=(0, 1)) / cnt
        out = x - mean * mean_scale
        var = ((out * out) * m).sum(axis=(0, 1)) / cnt
        return weight * out / jnp.sqrt(var + self.eps) + bias


class DenseGCNConv(nn.Module):
    """PyG GCNConv(add_self_loops=False) on batched dense adjacencies:
    out = A_norm @ (x W) + b, W glorot, b zeros."""

    features: int

    @nn.compact
    def __call__(self, adj_norm, adj_sum, x):
        w = self.param("kernel", glorot_kernel_init, (x.shape[-1], self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        h = x @ w
        return jnp.einsum("blk,bkf->blf", adj_norm, h,
                          precision=jax.lax.Precision.HIGHEST) + b


class DenseGINConv(nn.Module):
    """GINConv(Linear, eps=0): out = Linear(x + A_sum @ x)
    (reference: GNNSeg.py:161-171)."""

    features: int

    @nn.compact
    def __call__(self, adj_norm, adj_sum, x):
        agg = x + jnp.einsum("blk,bkf->blf", adj_sum, x,
                             precision=jax.lax.Precision.HIGHEST)
        return TorchLinear(self.features)(agg)


class GSegGNN(nn.Module):
    """GConv trunk (always-JK) + sum pool + 2-layer MLP head
    (reference: GNNSeg.py:70-158, buildModel 261-280)."""

    hidden_channels: int
    output_channels: int
    num_layers: int
    dropout: float = 0.0
    activation: str = "elu"
    conv: str = "gcn"  # "gcn" | "gin" (gin for density, GNNSeg.py:267)

    @nn.compact
    def __call__(self, adj_norm, adj_sum, feats, mask, *, training: bool = False):
        act = ACTIVATIONS[self.activation]
        Conv = DenseGCNConv if self.conv == "gcn" else DenseGINConv
        h = feats
        xs = []
        for layer in range(self.num_layers):
            last = layer == self.num_layers - 1
            out_ch = self.hidden_channels
            h = Conv(out_ch, name=f"conv_{layer}")(adj_norm, adj_sum, h)
            if not last:
                h = MaskedGraphNorm(name=f"gn_{layer}")(h, mask)
                xs.append(h)
                h = act(h)
                h = HWDropout(self.dropout)(h, deterministic=not training)
            else:
                xs.append(h)
        h = jnp.concatenate(xs, axis=-1)
        # sum pool over valid nodes (pos2sp membership SpMM, GNNSeg.py:134-156)
        pooled = (h * mask[..., None]).sum(axis=1)
        return MLP(
            hidden_channels=self.hidden_channels,
            output_channels=self.output_channels,
            num_layers=2,
            dropout=self.dropout,
            activation=self.activation,
            name="pred",
        )(pooled, training=training)
