"""GSPMD auto-sharded parallelism.

The second of the framework's two distributed modes (the scaling-book
recipe: pick a mesh, annotate shardings, let XLA insert the collectives):

- parameters are replicated,
- the subgraph-batch dimension of every step is sharded over 'data',
- on a mesh with a 'graph' axis, the dense adjacency's ROW dim is sharded
  over it and XLA partitions the whole-graph SpMM itself (the round-5 A/B,
  tools/gspmd_graph_ab.py, measured XLA's auto-partitioned dense SpMM at
  parity with the explicit shard_map dense path — same per-device memory,
  near-identical collective schedule),
- the *same* jitted whole-epoch program as the single-device Trainer runs
  partitioned — XLA places the compute per device and inserts the
  gradient/statistics collectives automatically.

This mode is mathematically identical to single-device execution (same XLA
program, partitioned). The explicit shard_map path (parallel/train.py)
remains the one that can run the *Pallas block-sparse* layouts per shard
(banded slabs / chunked BCSR / int8) — auto-partitioning cannot split a
custom kernel, so graph-axis GSPMD requires the dense layout.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from glass_tpu.train.loop import Trainer, TrainConfig
from glass_tpu.ops.graph import Graph


class AutoTrainer(Trainer):
    """Trainer whose jitted programs carry GSPMD sharding annotations:
    batch dims split over the mesh's 'data' axis, the dense adjacency's
    rows split over a non-trivial 'graph' axis, everything else
    replicated."""

    def __init__(self, model, graph: Graph, x, cfg: TrainConfig, mesh: Mesh):
        self.mesh = mesh
        # donation is disabled: donated replicated buffers + resharding can
        # fight; these models are small
        super().__init__(model, graph, x, cfg, donate=False)
        repl = NamedSharding(mesh, P())
        batched = NamedSharding(mesh, P(None, "data"))  # (nb, B, ...) arrays

        batched2 = NamedSharding(mesh, P(None, None, "data"))  # (K, nb, B, ...)

        g_shard = repl
        if mesh.shape.get("graph", 1) > 1:
            if graph.dense is None:
                raise ValueError(
                    "GSPMD graph sharding partitions the dense whole-graph "
                    "SpMM; this graph has no dense layout (Pallas "
                    "block-sparse layouts cannot be auto-partitioned — use "
                    "the explicit shard_map mode for those)"
                )
            g_shard = jax.tree_util.tree_map(lambda _: repl, graph)
            g_shard = g_shard.replace(
                dense=NamedSharding(mesh, P("graph", None)))

        # leading (graph, x) args are replicated operands (never closure
        # constants — see Trainer.__init__)
        self._epoch = jax.jit(
            self._epoch_impl,
            in_shardings=(g_shard, repl, repl, repl, repl, repl, batched, batched),
            out_shardings=(repl, repl, repl, repl, repl),
        )
        self._eval = jax.jit(
            self._eval_impl,
            in_shardings=(g_shard, repl, repl, batched),
            out_shardings=repl,
        )
        # multi-epoch program (the protocol's pre-eval-gate scan)
        self._epochs = jax.jit(
            self._epochs_impl,
            in_shardings=(g_shard, repl, repl, repl, repl, repl, batched2,
                          batched2),
            out_shardings=(repl, repl, repl, repl, repl),
        )
        # on-device eval scoring (scalar readback instead of (S, C) logits);
        # labels/mask share the batch partitioning
        self._eval_score = jax.jit(
            self._eval_score_impl,
            in_shardings=(g_shard, repl, repl, batched, batched, batched),
            out_shardings=repl,
        )
