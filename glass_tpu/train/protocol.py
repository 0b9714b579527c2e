"""The reference experiment protocol: repeats, eval gating, model selection,
early stopping (reference: GLASSTest.py:178-269).

This protocol materially affects reported F1 (SURVEY.md §7.1 step 4) and is
reproduced faithfully:

- per repeat: seed = (1 << repeat) - 1, dataset re-split (synthetics re-roll
  their 50/25/25 mask), fresh model;
- ``num_div = |test| / batch_size``, divided by 5 for synthetics
  (GLASSTest.py:197-201);
- epochs up to 300; eval only once ``i >= 100 / num_div``;
- model selection: new best val -> record test score; val within 1e-5 of best
  -> probe test and keep the max (GLASSTest.py:233-252);
- early stop counter increments on worse-than-best val and when val is
  saturated (>= 1 - 1e-5), stop when > 100 / num_div (GLASSTest.py:253-262);
- report mean ± std/sqrt(n) of the per-repeat test scores.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.data.loaders import load_dataset, SYNTHETIC_DATASETS
from glass_tpu.ops.graph import build_graph
from glass_tpu.nn.modules import GLASS
from glass_tpu.train.loop import (
    Trainer,
    TrainConfig,
    make_train_batches,
    make_eval_batches,
)
from glass_tpu.train.metrics import binary_f1, micro_f1

# Max lax.scan steps per pre-gate multi-epoch dispatch (see the chunking
# note in _run_one). 172 steps x ~0.4 s segment-path steps completed at
# em_user scale while 774 crashed the remote worker; 128 keeps the largest
# single-chip workloads under ~1 min/dispatch and costs small graphs only
# a handful of extra ~27 ms dispatches. Env-overridable for bigger chips.
_PRE_GATE_MAX_STEPS = int(os.environ.get("GLASS_TPU_PRE_GATE_MAX_STEPS", 128))


@dataclasses.dataclass
class ExperimentConfig:
    """Mirrors the per-dataset YAML schema (reference: config/*.yml +
    test() defaults GLASSTest.py:178-187)."""

    dataset: str = "density"
    pool: str = "size"
    aggr: str = "mean"
    hidden_dim: int = 64
    conv_layer: int = 8
    dropout: float = 0.3
    jk: int = 1
    lr: float = 1e-3
    z_ratio: float = 0.8
    batch_size: Optional[int] = None
    resi: float = 0.7
    # driver flags (GLASSTest.py:14-30)
    feature: str = "one"  # one | deg | nodeid
    use_maxzeroone: bool = True
    repeat: int = 1
    max_epochs: int = 300
    # framework knobs
    spmm_mode: Optional[str] = None
    dense_dtype: str = "f32"  # "bf16" halves SpMM HBM traffic (non-parity)
    # "bf16": mixed-precision training — bf16 activation stream, f32
    # params/optimizer/GraphNorm-stats/loss (non-parity fast mode)
    compute_dtype: Optional[str] = None
    ckpt_dir: Optional[str] = None  # save best-val params + run state per repeat
    resume: bool = False  # resume from ckpt_dir's run-state checkpoint
    # run-state checkpoint cadence (epochs). Each save reads params + both
    # Adam moments back from the device — at em_user scale tens of MB through
    # a remote-TPU tunnel — so per-epoch saving would nullify the async epoch
    # pipeline; a resumed run replays identically from the last save anyway.
    ckpt_every: int = 10
    # multi-chip: node-partition the graph over this many mesh shards
    # (requires graph_shards * data_shards devices); 1 = single-device
    graph_shards: int = 1
    data_shards: int = 1
    # ppermute-ring halo exchange instead of the tiled all-gather (sharded
    # segment-path runs; O(block) activation memory per shard)
    ring: bool = False
    # "auto": GSPMD (batch dim annotated over 'data'; with graph_shards > 1
    # the DENSE adjacency's rows are annotated over 'graph' and XLA
    # partitions the whole-graph SpMM — dense layout only, since Pallas
    # kernels cannot be auto-partitioned). Default: the explicit shard_map
    # path when any shard count > 1.
    sharding: Optional[str] = None
    # block-sparse layout for --spmm pallas: "auto" (cost-model planner) |
    # "bcsr" | "band" | "hybrid" — applies to both the single-device
    # build_graph and the sharded partition_graph
    sparse_layout: str = "auto"
    # reverse Cuthill-McKee node reordering before building the graph:
    # concentrates edges near the diagonal (block-sparse/partition locality);
    # predictions are invariant under the relabeling
    rcm: bool = False
    node_emb: Optional[np.ndarray] = None  # pretrained (N, hidden) table
    data_root: Optional[str] = None
    # also log test AUROC at each test probe (reference metrics.py:23-27
    # implements it but never calls it; the real-world dress rehearsal
    # reports it alongside F1 — VERDICT r2 item 5)
    report_auroc: bool = False


def apply_feature(base: BaseGraphData, feature: str) -> None:
    if feature == "one":
        base.set_one_feature()
    elif feature == "deg":
        base.set_degree_feature()
    elif feature == "nodeid":
        base.set_node_id_feature()
    else:
        raise NotImplementedError(f"unknown feature {feature!r}")


def run_experiment(cfg: ExperimentConfig, log: Callable[[str], None] = print):
    """Runs ``cfg.repeat`` seeded repeats; returns (scores, mean, stderr)."""
    scores = []
    cache: dict = {}
    for repeat in range(cfg.repeat):
        seed = (1 << repeat) - 1
        log(f"repeat {repeat} (seed {seed})")
        scores.append(_run_one(cfg, seed, log, cache))
    mean = float(np.average(scores))
    err = float(np.std(scores) / np.sqrt(len(scores)))
    log(f"average {mean:.3f} error {err:.3f}")
    return scores, mean, err


def _auto_route(cfg: ExperimentConfig, n_node: int, backend: str):
    """(spmm_mode, use_rcm) after TPU auto-routing. Graphs beyond the
    dense-adjacency limit are RCM-reordered and handed to the layout
    planner (VERDICT round-1 weak #4: component-scale graphs fell to the
    slow segment path). The planner picks band/BCSR/hybrid Pallas layouts
    for block-structured graphs, the dense MXU path for near-dense block
    patterns (hpo-scale unstructured graphs), or the segment path when no
    materialized layout pays (ops/graph.py::build_graph). RCM is
    prediction-invariant (tested), so this changes speed, not results.

    Covers all three trainer modes: the single-device trainer, explicit-
    sharded runs (the ShardedTrainer materializes per-shard rectangular BCSR
    layouts, parallel/partition.py::StackedBCSR), and GSPMD
    ``sharding='auto'`` — the AutoTrainer's graph (and its planner-chosen
    band/BCSR layout) is materialized host-side in build_graph *before* the
    global program is traced, so the layouts ride the trace as replicated
    stacked operands exactly as the explicit path's do."""
    from glass_tpu.ops.graph import DENSE_NODE_LIMIT

    if (
        cfg.spmm_mode is None
        and n_node > DENSE_NODE_LIMIT
        and backend == "tpu"
        and cfg.sharding in (None, "auto")
    ):
        return "pallas", True
    return cfg.spmm_mode, cfg.rcm


def make_glass_model(cfg: ExperimentConfig, base, spmm_mode):
    """The GLASS module exactly as the experiment protocol constructs it
    (reference buildModel, GLASSTest.py:129-175) — shared with the inference
    CLI (cli/glass_predict.py) so a checkpoint always reloads into an
    identical module."""
    return GLASS(
        max_deg=base.max_deg,
        hidden_channels=cfg.hidden_dim,
        num_layers=cfg.conv_layer,
        output_channels=(base.output_channels,),
        pools=(cfg.pool,),
        dropout=cfg.dropout,
        activation="elu",
        z_ratio=cfg.z_ratio,
        jk=bool(cfg.jk),
        spmm_mode=spmm_mode,
        dtype=("bfloat16" if cfg.compute_dtype in ("bf16", "bfloat16") else None),
    )


def _run_one(
    cfg: ExperimentConfig,
    seed: int,
    log: Callable[[str], None],
    cache: Optional[dict] = None,
) -> float:
    rng = np.random.default_rng(seed)
    base = load_dataset(cfg.dataset, rng, cfg.data_root)
    apply_feature(base, cfg.feature)

    spmm_mode, use_rcm = _auto_route(cfg, base.n_node, jax.default_backend())
    if cfg.sparse_layout != "auto" and spmm_mode != "pallas":
        # an explicit layout request that the execution route ignores is a
        # silent no-op users (and round-5 us) mistake for a real A/B
        log(f"warning: --sparse_layout {cfg.sparse_layout} has no effect "
            f"without the pallas route (effective spmm mode: "
            f"{spmm_mode or 'auto/dense'}); pass --spmm pallas to force it")
    if use_rcm:
        from glass_tpu.native import rcm_ordering

        base.relabel_nodes(rcm_ordering(base.edge_index, base.n_node))

    binary = base.binary
    loss = "bce" if binary else "ce"
    score_fn = binary_f1 if binary else micro_f1

    model = make_glass_model(cfg, base, spmm_mode)
    tcfg = TrainConfig(
        lr=cfg.lr,
        resi=cfg.resi,
        batch_size=cfg.batch_size,
        loss=loss,
        use_z=cfg.use_maxzeroone,
    )

    trn_pos, trn_y = base.get_split("train")
    val_pos, val_y = base.get_split("valid")
    tst_pos, tst_y = base.get_split("test")
    ydtype = np.float32 if binary else np.int64
    trn_y, val_y, tst_y = (a.astype(ydtype) for a in (trn_y, val_y, tst_y))

    # Repeats re-roll the subgraph split, never the edges or the model config
    # (reference: datasets.py:119-123 only permutes the mask), so both the
    # device-resident graph (the dense adjacency alone can be ~100 MB) and
    # the jitted Trainer programs are reused across repeats — only the
    # parameters are re-initialized per seed.
    trainer = None if cache is None else cache.get("trainer")
    if trainer is None:
        x = jnp.asarray(base.x.astype(np.int32))
        if cfg.sharding == "auto":
            # GSPMD: batch over 'data'; with graph_shards > 1 the dense
            # adjacency's rows are annotated over 'graph' and XLA partitions
            # the whole-graph SpMM itself (measured at parity with the
            # explicit dense shard_map path — tools/gspmd_graph_ab.py;
            # AutoTrainer raises if the planner produced no dense layout,
            # since Pallas kernels cannot be auto-partitioned).
            from glass_tpu.parallel.auto import AutoTrainer
            from glass_tpu.parallel.mesh import make_mesh

            mesh = make_mesh(graph_shards=cfg.graph_shards,
                             data_shards=cfg.data_shards)
            graph = build_graph(
                base.edge_index, base.edge_weight, base.n_node, cfg.aggr,
                materialize_dense=(
                    None if spmm_mode is None else spmm_mode == "dense"
                ),
                dense_dtype=cfg.dense_dtype,
                materialize_bcsr=spmm_mode == "pallas",
                sparse_layout=cfg.sparse_layout,
            )
            trainer = AutoTrainer(model, graph, x, tcfg, mesh)
        elif cfg.graph_shards > 1 or cfg.data_shards > 1:
            from glass_tpu.parallel.mesh import make_mesh
            from glass_tpu.parallel.partition import partition_graph
            from glass_tpu.parallel.train import ShardedTrainer

            mesh = make_mesh(graph_shards=cfg.graph_shards,
                             data_shards=cfg.data_shards)
            pg = partition_graph(base.edge_index, base.edge_weight, base.n_node,
                                 cfg.aggr, cfg.graph_shards,
                                 materialize_dense=spmm_mode == "dense",
                                 materialize_bcsr=spmm_mode == "pallas",
                                 dense_dtype=cfg.dense_dtype,
                                 ring=cfg.ring and cfg.graph_shards > 1,
                                 sparse_layout=cfg.sparse_layout)
            trainer = ShardedTrainer(model, pg, base.x, tcfg, mesh)
        else:
            graph = build_graph(
                base.edge_index, base.edge_weight, base.n_node, cfg.aggr,
                materialize_dense=(
                    None if spmm_mode is None else spmm_mode == "dense"
                ),
                dense_dtype=cfg.dense_dtype,
                materialize_bcsr=spmm_mode == "pallas",
                sparse_layout=cfg.sparse_layout,
            )
            trainer = Trainer(model, graph, x, tcfg)
        if cache is not None:
            cache["trainer"] = trainer
    params, opt_state, plateau = trainer.init(
        seed, jnp.asarray(trn_pos[: cfg.batch_size])
    )
    if cfg.node_emb is not None:
        params = _load_pretrained_embedding(params, cfg.node_emb)

    rng_jax = jax.random.PRNGKey(seed + 1)

    num_div = tst_y.shape[0] / cfg.batch_size
    if cfg.dataset in SYNTHETIC_DATASETS:
        num_div /= 5
    eval_after = 100 / num_div
    stop_after = 100 / num_div

    # eval loaders shuffle (reference GLASSTest.py:118-119): batch composition
    # sets the zero-one labels, so each evaluation re-draws its batches.
    # Scores are computed ON DEVICE by default (micro-F1 from psum'd counts,
    # metrics.device_micro_f1 — test-pinned equal to the sklearn path): each
    # eval then syncs one scalar instead of an (S, C) logits array, which is
    # what a degraded remote-TPU tunnel punishes (RESULTS.md round 4: 45x).
    # GLASS_TPU_HOST_EVAL_METRICS=1 restores the sklearn readback path;
    # --report_auroc keeps it for test probes (AUROC needs the logits).
    host_metrics = os.environ.get("GLASS_TPU_HOST_EVAL_METRICS", "0") == "1"
    device_metrics = not host_metrics and hasattr(trainer, "evaluate_score")

    def _device_score(pos_s, y_s):
        from glass_tpu.train.metrics import pad_eval_labels

        b, y_p, _ = make_eval_batches(pos_s, y_s, cfg.batch_size, rng)
        y_pad, mask = pad_eval_labels(y_p, b.shape[0], cfg.batch_size)
        return trainer.evaluate_score(params, jnp.asarray(b), y_pad, mask)

    def val_score_fn():
        if device_metrics:
            return _device_score(val_pos, val_y)
        b, y_p, n_real = make_eval_batches(val_pos, val_y, cfg.batch_size, rng)
        return score_fn(trainer.evaluate(params, jnp.asarray(b), n_real), y_p)

    def tst_score():
        if device_metrics and not cfg.report_auroc:
            return _device_score(tst_pos, tst_y)
        b, y_p, n_real = make_eval_batches(tst_pos, tst_y, cfg.batch_size, rng)
        logits = trainer.evaluate(params, jnp.asarray(b), n_real)
        if cfg.report_auroc:
            from glass_tpu.train.metrics import auroc_from_logits

            try:
                log(f"  tst auroc {auroc_from_logits(logits, y_p):.4f}")
            except ValueError:  # degenerate split (single class present)
                pass
        return score_fn(logits, y_p)

    from glass_tpu.utils.profiling import StepMeter

    nb_per_epoch = trn_y.shape[0] // cfg.batch_size
    meter = StepMeter(
        # one SpMM edge-traversal per conv layer, forward; backward ~doubles
        edges_per_step=base.edge_index.shape[1] * cfg.conv_layer * 2,
        subgraphs_per_step=cfg.batch_size,
    )
    val_score, tst_best, early_stop = 0.0, 0.0, 0
    t0 = time.time()

    # Full-state resume (kill-and-resume bit-equivalence: params + optimizer +
    # plateau + both RNG streams + protocol counters are restored, so the
    # continued run draws the exact batch permutations the uninterrupted run
    # would have drawn).
    state_path = None
    start_epoch = 0
    if cfg.ckpt_dir is not None:
        from pathlib import Path as _Path

        state_path = _Path(cfg.ckpt_dir) / f"{cfg.dataset}_seed{seed}_state.npz"
        if cfg.resume and state_path.exists():
            from glass_tpu.utils.checkpoint import load_run_state

            params, opt_state, plateau, rng_jax, meta = load_run_state(
                state_path, params=params, opt_state=opt_state,
                plateau=plateau, rng_key=rng_jax, np_rng=rng,
            )
            rng_jax = jnp.asarray(rng_jax)
            start_epoch = meta["epoch"] + 1
            val_score = meta["val_score"]
            tst_best = meta["tst_best"]
            early_stop = meta["early_stop"]
            log(f"resumed at epoch {start_epoch} (val {val_score:.4f})")

    def save_state(epoch):
        if state_path is None:
            return
        from glass_tpu.utils.checkpoint import save_run_state

        save_run_state(
            state_path, params=params, opt_state=opt_state, plateau=plateau,
            rng_key=rng_jax, np_rng=rng, epoch=epoch, val_score=val_score,
            tst_best=tst_best, early_stop=early_stop,
        )

    # Before the eval gate opens no host decision depends on per-epoch state,
    # so run those epochs as one multi-epoch XLA program (plateau schedule
    # advanced in-scan) — identical math, K-1 fewer dispatches. The program
    # is CHUNKED to at most _PRE_GATE_MAX_STEPS scan steps per dispatch:
    # the remote-TPU worker dies on minutes-long single dispatches
    # (reproduced at em_user scale: an 18-epoch x 43-batch program whose
    # segment-path steps run ~0.4 s crashes the worker, while 4-epoch
    # chunks of the SAME math complete — a per-dispatch execution limit,
    # not a memory one). Chunking is mathematically identical: the scan
    # carry (params/opt/plateau/rng) round-trips between chunks.
    i = start_epoch - 1
    loss_val = float("nan")
    pre = min(int(np.floor(eval_after)) + (0 if eval_after == int(eval_after) else 1),
              cfg.max_epochs)
    n_pre = pre - start_epoch
    if n_pre > 1 and hasattr(trainer, "train_epochs"):
        max_ep = max(1, _PRE_GATE_MAX_STEPS // max(nb_per_epoch, 1))
        done = 0
        while done < n_pre:
            k = min(max_ep, n_pre - done)
            batches = [make_train_batches(rng, trn_pos, trn_y, cfg.batch_size)
                       for _ in range(k)]
            pos_bs = jnp.asarray(np.stack([b[0] for b in batches]))
            y_bs = jnp.asarray(np.stack([b[1] for b in batches]))
            meter.start()
            params, opt_state, plateau, rng_jax, losses = trainer.train_epochs(
                params, opt_state, plateau, rng_jax, pos_bs, y_bs
            )
            meter.tick(nb_per_epoch * k)
            done += k
        loss_val = float(losses[-1])
        i = pre - 1
        save_state(i)

    for i in range(i + 1, cfg.max_epochs):
        pos_b, y_b = make_train_batches(rng, trn_pos, trn_y, cfg.batch_size)
        # train_epoch returns a lazy device loss so epochs pipeline with the
        # eval dispatch (one host sync per epoch instead of two, ~27 ms each
        # through the TPU tunnel). The throughput meter therefore *samples*:
        # every 10th epoch is timed with an explicit block inside the window
        # (honest compute timing); unmetered epochs stay fully asynchronous.
        metered = i % 10 == 0
        if metered:
            meter.start()  # time the training epoch only, not the evals
        params, opt_state, plateau, rng_jax, loss_val = trainer.train_epoch(
            params, opt_state, plateau, rng_jax, jnp.asarray(pos_b), jnp.asarray(y_b)
        )
        if metered:
            # scalar readback, not block_until_ready: some remote-TPU
            # terminals resolve block_until_ready before execution finishes,
            # which would inflate the sampled throughput
            float(loss_val)
            meter.tick(nb_per_epoch)
        if i >= eval_after:
            score = val_score_fn()
            if score > val_score:
                early_stop = 0
                val_score = score
                tst_best = tst_score()
                log(f"iter {i} loss {loss_val:.4f} val {val_score:.4f} tst {tst_best:.4f}")
                if cfg.ckpt_dir is not None:
                    from glass_tpu.utils.checkpoint import save_checkpoint

                    save_checkpoint(
                        f"{cfg.ckpt_dir}/{cfg.dataset}_seed{seed}_best.npz", params
                    )
            elif score >= val_score - 1e-5:
                probe = tst_score()
                tst_best = max(probe, tst_best)
                log(f"iter {i} loss {loss_val:.4f} val {val_score:.4f} tst {probe:.4f}")
            else:
                early_stop += 1
                if i % 10 == 0:
                    log(f"iter {i} loss {loss_val:.4f} val {score:.4f} tst {tst_score():.4f}")
        if val_score >= 1 - 1e-5:
            early_stop += 1
        if (i + 1) % cfg.ckpt_every == 0:
            save_state(i)
        if early_stop > stop_after:
            break
    if (i + 1) % cfg.ckpt_every != 0:  # final state, unless just saved
        save_state(i)
    log(
        f"end: epoch {i + 1}, train time {time.time() - t0:.2f} s, "
        f"val {val_score:.3f}, tst {tst_best:.3f}"
    )
    log(f"throughput: {meter.summary()}")
    return tst_best


def _load_pretrained_embedding(params, emb: np.ndarray):
    """Warm-start the trunk embedding table from a pretrained (N, H) array
    (reference: GLASSTest.py:153-157, Embedding.from_pretrained(freeze=False))."""
    params = jax.tree_util.tree_map(lambda a: a, params)  # copy leaves
    tgt = params["params"]["conv"]["input_emb"]["embedding"]
    assert tgt.shape == emb.shape, f"pretrained emb {emb.shape} != table {tgt.shape}"
    params["params"]["conv"]["input_emb"]["embedding"] = jnp.asarray(
        emb, dtype=tgt.dtype
    )
    return params
