"""GLASS model family as flax.linen modules.

Semantics mirror the reference model layer (impl/models.py) with file:line
citations per class; the *implementation* is TPU-native: the adjacency is a
prebuilt static :class:`~glass_tpu.ops.graph.Graph` (dense-MXU or sorted-COO
segment-sum SpMM), the labeling-trick mix is a ``jnp.where`` that XLA fuses
into the surrounding matmuls, and pooling is the dense masked gather-reduce of
``ops.segment`` — no scatter, no dynamic shapes, everything jit-compiled once.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from glass_tpu.nn.dropout import HWDropout

from glass_tpu.ops.graph import Graph
from glass_tpu.ops.spmm import spmm, gather_global
from glass_tpu.ops.segment import pool_subgraphs
from glass_tpu.ops.norm import graph_norm
from glass_tpu.nn.init import (
    torch_linear_kernel_init,
    make_torch_bias_init,
    normal_embedding_init,
)

ACTIVATIONS = {
    "relu": jax.nn.relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "tanh": jnp.tanh,
}


def _fused_norm_enabled() -> bool:
    """GLASS_TPU_FUSED_NORM: '1' force, '0' off; default off.

    The fused Pallas GraphNorm (ops/pallas_norm.py) is formula-exact and
    minimizes HBM passes, but the same-day e2e A/B on the 9M-edge training
    workload measured it 8% SLOWER than the XLA formulation (467.9 vs
    433.3 steps/s, bench_logs/r4/fused_norm_e2e.log): XLA fuses the norm's
    reductions into the surrounding backward chain better than five
    separate pallas_call launches can recover. Kept as an opt-in for
    shapes/compilers where the trade flips."""
    import os

    return os.environ.get("GLASS_TPU_FUSED_NORM", "0") == "1"


class TorchLinear(nn.Module):
    """Dense layer with torch nn.Linear's init distribution (see nn.init).

    ``dtype`` (e.g. "bfloat16") casts input and params to the compute dtype
    for the matmul (params are stored f32; the MXU accumulates bf16 dots in
    f32). None = exact f32 path."""

    features: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param("kernel", torch_linear_kernel_init, (fan_in, self.features))
        bias = self.param("bias", make_torch_bias_init(fan_in), (self.features,))
        if self.dtype is not None:
            dt = jnp.dtype(self.dtype)
            return x.astype(dt) @ kernel.astype(dt) + bias.astype(dt)
        return x @ kernel + bias


class GraphNorm(nn.Module):
    """Learnable GraphNorm, whole-graph statistics (reference: PyG 1.7.2
    GraphNorm called with batch=None everywhere, impl/models.py:141,201).

    Pass ``graph`` when x is node-partitioned (shard_map): statistics are then
    reduced globally over the partition axis with padded rows masked."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, graph: Optional[Graph] = None):
        f = x.shape[-1]
        weight = self.param("weight", nn.initializers.ones, (f,))
        bias = self.param("bias", nn.initializers.zeros, (f,))
        mean_scale = self.param("mean_scale", nn.initializers.ones, (f,))
        if graph is not None and graph.axis is not None:
            return graph_norm(
                x, weight, bias, mean_scale, self.eps,
                axis=graph.axis, node_mask=graph.node_mask(),
                n_total=graph.n_global,
            )
        if x.ndim == 2 and _fused_norm_enabled():
            # fused Pallas forward+backward (ops/pallas_norm.py): identical
            # formula, minimum HBM passes — the unfused backward reductions
            # over (N, H) activations were the dominant non-SpMM step cost
            # (RESULTS.md round 3 profiling)
            from glass_tpu.ops.pallas_norm import fused_graph_norm

            return fused_graph_norm(
                x, weight, bias, mean_scale, self.eps,
                jax.default_backend() != "tpu",
            )
        return graph_norm(x, weight, bias, mean_scale, self.eps)


class MLP(nn.Module):
    """Multi-layer perceptron with the reference's exact layer ordering
    (impl/models.py:27-80): Linear [-> GraphNorm] [-> Dropout] -> act -> ...
    ``tail_activation`` appends the norm/dropout/act block after the last
    Linear as well."""

    hidden_channels: int
    output_channels: int
    num_layers: int
    dropout: float = 0.0
    tail_activation: bool = False
    activation: str = "relu"
    gn: bool = False

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        act = ACTIVATIONS[self.activation]

        def block(h):
            if self.gn:
                h = GraphNorm()(h)
            if self.dropout > 0:
                h = HWDropout(self.dropout)(h, deterministic=not training)
            return act(h)

        if self.num_layers == 1:
            x = TorchLinear(self.output_channels)(x)
            if self.tail_activation:
                x = block(x)
            return x
        x = TorchLinear(self.hidden_channels)(x)
        for _ in range(self.num_layers - 2):
            x = block(x)
            x = TorchLinear(self.hidden_channels)(x)
        x = block(x)
        x = TorchLinear(self.output_channels)(x)
        if self.tail_activation:
            x = block(x)
        return x


class AttentionConv(nn.Module):
    """GAT-style attention message passing built on the SDDMM/SpMM kernel
    pair (framework capability beyond the reference — ops/sddmm.py).

    score(i,j) = leaky_relu(<a_dst, W x_i> + <a_src, W x_j>), softmax over
    incoming edges, then attention-weighted aggregation.
    """

    out_channels: int
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, graph: Graph, x, *, training: bool = False):
        from glass_tpu.ops.sddmm import segment_softmax

        h = TorchLinear(self.out_channels, name="proj")(x)
        a_dst = self.param("att_dst", nn.initializers.normal(0.1), (self.out_channels,))
        a_src = self.param("att_src", nn.initializers.normal(0.1), (self.out_channels,))
        s_dst = h @ a_dst  # (N,)
        s_src = h @ a_src
        scores = s_dst[graph.row] + s_src[graph.col]
        scores = jax.nn.leaky_relu(scores, self.negative_slope)
        att = segment_softmax(graph, scores)
        return spmm(graph.replace(weight=att, dense=None), h, "segment")


class GLASSConv(nn.Module):
    """The labeling-trick dual-weight message-passing layer
    (reference: impl/models.py:114-174).

    Forward: two parallel Linears transform all nodes; features are mixed by
    the zero-one mask with ratio ``z_ratio`` (in-subgraph nodes lean on the
    "1" transform, others on the "0" transform); then SpMM aggregation,
    GraphNorm, dropout, JK-style concat with the input, and a second
    dual-Linear mixed combine. The mask mix lowers to a fused select on the
    VPU; both Linears batch over all N nodes so the MXU stays busy.
    """

    out_channels: int
    z_ratio: float = 0.8
    dropout: float = 0.2
    activation: str = "relu"
    spmm_mode: Optional[str] = None
    dtype: Optional[str] = None  # "bfloat16" = mixed-precision activations

    @nn.compact
    def __call__(self, graph: Graph, x_, mask, training: bool = False):
        # NOTE: ``training`` is positional (not keyword-only) so nn.remat can
        # mark it static by argnum — see EmbZGConv's GLASS_TPU_REMAT path
        act = ACTIVATIONS[self.activation]
        zr = self.z_ratio
        # the two label-branch Linears share their input; XLA's dot-merger
        # combines them into one MXU matmul, so no manual fusion is needed
        x1 = act(TorchLinear(self.out_channels, dtype=self.dtype, name="trans_1")(x_))
        x0 = act(TorchLinear(self.out_channels, dtype=self.dtype, name="trans_0")(x_))
        x = jnp.where(mask, zr * x1 + (1 - zr) * x0, zr * x0 + (1 - zr) * x1)
        x = spmm(graph, x, self.spmm_mode)
        if self.dtype is not None:
            # SpMM kernels accumulate in f32; keep the activation stream in
            # the compute dtype (every downstream op is HBM-bound)
            x = x.astype(jnp.dtype(self.dtype))
        x = GraphNorm(name="gn")(x, graph)
        x = HWDropout(self.dropout)(x, deterministic=not training)
        x = jnp.concatenate([x, x_], axis=-1)
        x1 = TorchLinear(self.out_channels, dtype=self.dtype, name="comb_1")(x)
        x0 = TorchLinear(self.out_channels, dtype=self.dtype, name="comb_0")(x)
        return jnp.where(mask, zr * x1 + (1 - zr) * x0, zr * x0 + (1 - zr) * x1)


class EmbZGConv(nn.Module):
    """GLASS trunk: integer-feature embedding + stacked GLASSConvs with
    per-layer GraphNorm/activation/dropout and Jumping-Knowledge concat
    (reference: impl/models.py:177-272).

    Parity notes: JK concatenates each conv's *pre-norm* output
    (impl/models.py:253-261 appends before gns[layer]); the final GraphNorm is
    applied after the JK concat (or to the last layer output when jk=False).
    """

    hidden_channels: int
    output_channels: int
    num_layers: int
    max_deg: int
    dropout: float = 0.0
    activation: str = "relu"
    z_ratio: float = 0.8
    conv_dropout: Optional[float] = None  # defaults to `dropout`
    jk: bool = True
    gn: bool = True
    spmm_mode: Optional[str] = None
    dtype: Optional[str] = None  # "bfloat16" = mixed-precision activations

    @nn.compact
    def __call__(self, graph: Graph, x, z=None, *, training: bool = False):
        # x: (N,) int32 feature ids; z: (N,) zero-one labels or None.
        act = ACTIVATIONS[self.activation]
        if z is None:
            # reference parity: z=None builds mask = (zeros < 0.5) = all TRUE
            # (impl/models.py:242-244), i.e. every node uses the "1" branch —
            # NOT the same as an all-zero z.
            mask = jnp.ones((x.shape[0], 1), dtype=bool)
        else:
            mask = (z > 0.5).reshape(-1, 1)

        h = nn.Embed(
            self.max_deg + 1,
            self.hidden_channels,
            embedding_init=normal_embedding_init,
            name="input_emb",
        )(x)
        if self.dtype is not None:
            # cast once after the table gather; params/optimizer stay f32
            h = h.astype(jnp.dtype(self.dtype))
        h = GraphNorm(name="emb_gn")(h, graph)
        h = HWDropout(self.dropout)(h, deterministic=not training)

        conv_dropout = self.dropout if self.conv_dropout is None else self.conv_dropout
        # GLASS_TPU_REMAT=1: rematerialize each conv body in the backward
        # pass instead of saving its intermediates — trades (cheap, MXU)
        # recompute for HBM reads of ~6 saved (N,H) activations per layer.
        # Opt-in pending a same-day e2e A/B (like GLASS_TPU_FUSED_NORM).
        import os

        conv_cls = GLASSConv
        if os.environ.get("GLASS_TPU_REMAT", "0") == "1":
            conv_cls = nn.remat(GLASSConv, static_argnums=(4,))
        xs = []
        for layer in range(self.num_layers):
            last = layer == self.num_layers - 1
            out_ch = self.output_channels if last else self.hidden_channels
            h = conv_cls(
                out_channels=out_ch,
                z_ratio=self.z_ratio,
                dropout=conv_dropout,
                activation=self.activation,
                spmm_mode=self.spmm_mode,
                dtype=self.dtype,
                name=f"conv_{layer}",
            )(graph, h, mask, training)
            xs.append(h)
            if not last:
                if self.gn:
                    h = GraphNorm(name=f"gn_{layer}")(h, graph)
                h = act(h)
                h = HWDropout(self.dropout)(h, deterministic=not training)

        h = jnp.concatenate(xs, axis=-1) if self.jk else xs[-1]
        if self.gn:
            h = GraphNorm(name="gn_out")(h, graph)
        return h


class GLASS(nn.Module):
    """Full GLASS model: trunk + per-task pooling + per-task prediction head
    (reference: impl/models.py:322-355 and driver assembly GLASSTest.py:129-175).

    ``output_channels``/``pools`` are per-task tuples (multi-task-capable like
    the reference's preds/pools ModuleLists); task selection via static ``id``.
    The prediction head is a single Linear as in the reference driver.
    """

    max_deg: int
    hidden_channels: int
    num_layers: int
    output_channels: Tuple[int, ...]
    pools: Tuple[str, ...]
    dropout: float = 0.0
    activation: str = "elu"
    z_ratio: float = 0.8
    jk: bool = True
    spmm_mode: Optional[str] = None
    # "bfloat16": mixed-precision training — bf16 activation stream (every
    # elementwise/norm/gather op is HBM-bound at production graph sizes),
    # f32 params + optimizer, f32 GraphNorm statistics, f32 logits/loss
    dtype: Optional[str] = None

    def setup(self):
        self.conv = EmbZGConv(
            hidden_channels=self.hidden_channels,
            output_channels=self.hidden_channels,
            num_layers=self.num_layers,
            max_deg=self.max_deg,
            dropout=self.dropout,
            activation=self.activation,
            z_ratio=self.z_ratio,
            jk=self.jk,
            gn=True,
            spmm_mode=self.spmm_mode,
            dtype=self.dtype,
        )
        self.preds = [TorchLinear(c, name=f"pred_{i}") for i, c in enumerate(self.output_channels)]

    def node_emb(self, graph: Graph, x, z=None, *, training: bool = False):
        """Per-channel trunk application, averaged (reference NodeEmb,
        impl/models.py:336-344; the channel dim is 1 in every config)."""
        embs = [
            self.conv(graph, x[:, c], z, training=training) for c in range(x.shape[1])
        ]
        return sum(embs) / len(embs)

    def __call__(self, graph: Graph, x, pos, z=None, *, training: bool = False, id: int = 0):
        emb = self.node_emb(graph, x, z, training=training)
        emb_g = gather_global(graph, emb)
        if self.is_initializing():
            # materialize every task head's params (the reference constructs
            # all preds/pools up front, impl/models.py:329-334)
            for i, head in enumerate(self.preds):
                if i != id:
                    head(pool_subgraphs(emb_g, pos, self.pools[i]))
        pooled = pool_subgraphs(emb_g, pos, self.pools[id])
        return self.preds[id](pooled)
