"""SSL link-prediction pretraining models (the GNNEmb path).

Counterparts of the reference's pretraining twins (impl/models.py:361-509):
``MyGCNConv`` (single-weight conv, no labeling), ``EmbGConv`` (trunk) and
``EdgeGNN`` (link-prediction model whose "subgraphs" are edge endpoint pairs).
Their output contract is the (N, 64) node-embedding table that GLASS loads as
a warm-start embedding (reference: GNNEmb.py:186-188, GLASSTest.py:153-157).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import flax.linen as nn

from glass_tpu.nn.dropout import HWDropout

from glass_tpu.ops.graph import Graph
from glass_tpu.ops.spmm import spmm
from glass_tpu.ops.segment import mean_over_nodes
from glass_tpu.ops.spmm import gather_global
from glass_tpu.nn.modules import (
    ACTIVATIONS,
    TorchLinear,
    GraphNorm,
    MLP,
)
from glass_tpu.nn.init import normal_embedding_init


class MyGCNConv(nn.Module):
    """Pretraining conv: act(Linear) -> SpMM -> GraphNorm -> concat input ->
    Linear (reference: impl/models.py:361-395)."""

    out_channels: int
    activation: str = "relu"
    spmm_mode: Optional[str] = None
    dtype: Optional[str] = None  # "bfloat16" = mixed-precision activations

    @nn.compact
    def __call__(self, graph: Graph, x_, *, training: bool = False):
        act = ACTIVATIONS[self.activation]
        x = act(TorchLinear(self.out_channels, dtype=self.dtype, name="trans")(x_))
        x = spmm(graph, x, self.spmm_mode)
        if self.dtype is not None:
            x = x.astype(jnp.dtype(self.dtype))
        x = GraphNorm(name="gn")(x, graph)
        x = jnp.concatenate([x, x_], axis=-1)
        return TorchLinear(self.out_channels, dtype=self.dtype, name="comb")(x)


class EmbGConv(nn.Module):
    """Pretraining trunk: embedding lookup + stacked convs + GraphNorm + JK
    (reference: impl/models.py:398-475).

    Parity notes vs EmbZGConv: no emb_gn after the embedding lookup, and JK
    collects *post*-norm layer outputs (impl/models.py:464-468 appends after
    gns[layer]); no final norm.
    """

    hidden_channels: int
    output_channels: int
    num_layers: int
    max_deg: int
    dropout: float = 0.0
    activation: str = "relu"
    jk: bool = False
    gn: bool = True
    spmm_mode: Optional[str] = None
    dtype: Optional[str] = None  # "bfloat16" = mixed-precision activations

    @nn.compact
    def __call__(self, graph: Graph, x, z=None, *, training: bool = False):
        act = ACTIVATIONS[self.activation]
        h = nn.Embed(
            self.max_deg + 1,
            self.hidden_channels,
            embedding_init=normal_embedding_init,
            name="input_emb",
        )(x.reshape(-1))
        if self.dtype is not None:
            h = h.astype(jnp.dtype(self.dtype))
        h = HWDropout(self.dropout)(h, deterministic=not training)
        xs = []
        for layer in range(self.num_layers):
            last = layer == self.num_layers - 1
            out_ch = self.output_channels if last else self.hidden_channels
            h = MyGCNConv(
                out_channels=out_ch,
                activation=self.activation,
                spmm_mode=self.spmm_mode,
                dtype=self.dtype,
                name=f"conv_{layer}",
            )(graph, h, training=training)
            if not last:
                if self.gn:
                    h = GraphNorm(name=f"gn_{layer}")(h, graph)
                xs.append(h)
                h = act(h)
                h = HWDropout(self.dropout)(h, deterministic=not training)
            else:
                xs.append(h)
        return jnp.concatenate(xs, axis=-1) if self.jk else xs[-1]


class EdgeGNN(nn.Module):
    """Link-prediction model: trunk + endpoint-mean pool + MLP head
    (reference: impl/models.py:478-509 with driver assembly GNNEmb.py:76-105)."""

    max_deg: int
    hidden_channels: int
    num_layers: int
    dropout: float = 0.0
    activation: str = "relu"
    jk: bool = False
    spmm_mode: Optional[str] = None
    dtype: Optional[str] = None  # "bfloat16" = mixed-precision activations

    def setup(self):
        self.conv = EmbGConv(
            hidden_channels=self.hidden_channels,
            output_channels=self.hidden_channels,
            num_layers=self.num_layers,
            max_deg=self.max_deg,
            dropout=self.dropout,
            activation=self.activation,
            jk=self.jk,
            gn=True,
            spmm_mode=self.spmm_mode,
            dtype=self.dtype,
        )
        head_in = self.hidden_channels * (self.num_layers if self.jk else 1)
        del head_in  # head input width is shape-inferred by TorchLinear
        self.pred = MLP(
            hidden_channels=self.hidden_channels,
            output_channels=1,
            num_layers=2,
            dropout=self.dropout,
            activation=self.activation,
        )

    def node_emb(self, graph: Graph, x, z=None, *, training: bool = False):
        embs = [
            self.conv(graph, x[:, c], z, training=training) for c in range(x.shape[1])
        ]
        return sum(embs) / len(embs)

    def __call__(self, graph: Graph, x, pos, z=None, *, training: bool = False, id: int = 0):
        emb = self.node_emb(graph, x, z, training=training)
        pooled = mean_over_nodes(gather_global(graph, emb), pos)  # (B, 2) endpoints
        return self.pred(pooled, training=training)
