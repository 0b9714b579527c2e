"""SSL link-prediction pretraining of node embeddings (the GNNEmb path).

Mirrors the reference pretraining protocol (GNNEmb.py:108-163 ``work``):
per epoch, up to 10 shuffled batches of 131072 edge pairs; the plateau LR
schedule steps on *every batch* (factor 0.7, min_lr 5e-5, patience 50);
every 5 epochs the model is scored (binary F1) on a held-out 5% edge split
and the best-scoring node-embedding table is snapshotted. The snapshot is the
(N, hidden) table GLASS warm-starts from (GLASSTest.py:153-157).

Hyperparameter search (GNNEmb.py:169-199) runs over conv_layer in [2,5],
dropout in {0.0..0.5}, aggr in {sum, mean, gcn}; optuna is used when
installed, otherwise a seeded random search over the same space.

TPU note: each batch is one jitted step; with 131072 pairs per batch the
gather/pool work dominates dispatch, so per-batch stepping (needed for the
per-batch LR schedule) costs nothing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.data.loaders import load_dataset
from glass_tpu.ops.graph import build_graph
from glass_tpu.nn.pretrain import EdgeGNN
from glass_tpu.train.loop import bce_with_logits
from glass_tpu.train.metrics import binary_f1
from glass_tpu.train.schedule import plateau_init, plateau_step


@dataclasses.dataclass
class SSLConfig:
    dataset: str = "ppi_bp"
    # the reference recipe runs GNNEmb with --use_nodeid (README:55-57):
    # x = arange(N), i.e. a free trainable embedding row per node
    feature: str = "nodeid"
    hidden_dim: int = 64
    conv_layer: int = 3
    dropout: float = 0.3
    aggr: str = "mean"
    jk: int = 0
    lr: float = 1e-3
    batch_size: int = 131072
    max_epochs: int = 100
    batches_per_epoch: int = 10
    eval_every: int = 5
    early_stop: int = 3
    repeat: int = 1
    spmm_mode: Optional[str] = None
    data_root: Optional[str] = None


def pretrain_once(
    cfg: SSLConfig,
    base: BaseGraphData,
    seed: int,
    log: Callable[[str], None] = print,
) -> Tuple[float, np.ndarray]:
    """One pretraining run; returns (best val F1, best (N, hidden) table)."""
    rng = np.random.default_rng(seed)
    graph = build_graph(
        base.edge_index, base.edge_weight, base.n_node, cfg.aggr,
        materialize_dense=None if cfg.spmm_mode is None else cfg.spmm_mode == "dense",
        materialize_bcsr=cfg.spmm_mode == "pallas",
    )
    pos_all, y_all = base.get_lp_dataset(rng)
    # 95/5 train/val split of edge pairs (reference: GNNEmb.py:59-64)
    perm = rng.permutation(pos_all.shape[0])
    trn_len = int(0.95 * perm.shape[0])
    trn_idx, val_idx = perm[:trn_len], perm[trn_len:]
    pos_trn, y_trn = pos_all[trn_idx], y_all[trn_idx]
    pos_val, y_val = jnp.asarray(pos_all[val_idx]), y_all[val_idx]

    model = EdgeGNN(
        max_deg=base.max_deg,
        hidden_channels=cfg.hidden_dim,
        num_layers=cfg.conv_layer,
        dropout=cfg.dropout,
        activation="relu",
        jk=bool(cfg.jk),
        spmm_mode=cfg.spmm_mode,
    )
    x = jnp.asarray(base.x.astype(np.int32))
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

    key = jax.random.PRNGKey(seed)
    params = model.init(key, graph, x, jnp.asarray(pos_trn[:2]))
    opt_state = tx.init(params)
    plateau = plateau_init(cfg.lr)

    # graph/x/pos_val are jit ARGUMENTS: closed-over arrays inline into the
    # HLO as constants, which at real-world edge counts (em_user: ~4.6M
    # directed edges) overflows the remote-compile request of tunneled TPUs
    # (HTTP 413) and bloats the compile cache (see train/loop.py).
    @jax.jit
    def step(graph, x, params, opt_state, lr, dkey, pos, y):
        opt_state.hyperparams["learning_rate"] = lr

        def loss_of(p):
            logits = model.apply(p, graph, x, pos, training=True,
                                 rngs={"dropout": dkey})
            return bce_with_logits(logits, y)

        loss, grads = jax.value_and_grad(loss_of)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def node_table(graph, x, params):
        return model.apply(params, graph, x, jnp.zeros((1, 2), jnp.int32),
                           method=EdgeGNN.node_emb)

    @jax.jit
    def val_logits(graph, x, params, pos_val):
        return model.apply(params, graph, x, pos_val)

    best_score, best_emb, early = 0.0, np.asarray(node_table(graph, x, params)), 0
    bs = min(cfg.batch_size, pos_trn.shape[0])
    for epoch in range(cfg.max_epochs):
        order = rng.permutation(pos_trn.shape[0])
        losses = []
        for ib in range(min(cfg.batches_per_epoch, len(order) // bs or 1)):
            sel = order[ib * bs: (ib + 1) * bs]
            if sel.size == 0:
                break
            key, dkey = jax.random.split(key)
            params, opt_state, loss = step(
                graph, x, params, opt_state, plateau.lr, dkey,
                jnp.asarray(pos_trn[sel]), jnp.asarray(y_trn[sel]),
            )
            # the reference steps the scheduler on every batch (GNNEmb.py:139)
            plateau = plateau_step(plateau, loss, factor=0.7, min_lr=5e-5,
                                   patience=50)
            losses.append(float(loss))
        if epoch % cfg.eval_every == 0:
            score = binary_f1(np.asarray(val_logits(graph, x, params, pos_val)),
                              y_val)
            log(f"iter {epoch} loss {np.average(losses):.4f} score {score:.4f}")
            early += 1
            if score > best_score:
                best_score = score
                best_emb = np.asarray(node_table(graph, x, params))
                early = 0
            if early >= cfg.early_stop:
                break
        else:
            log(f"iter {epoch} loss {np.average(losses):.4f}")
    return best_score, best_emb


def pretrain(cfg: SSLConfig, log: Callable[[str], None] = print):
    """Repeats (GNNEmb.py:116-163): returns (mean - std of scores, best emb)."""
    base = load_dataset(cfg.dataset, np.random.default_rng(0), cfg.data_root)
    if cfg.feature == "deg":
        base.set_degree_feature()
    elif cfg.feature == "one":
        base.set_one_feature()
    elif cfg.feature == "nodeid":
        base.set_node_id_feature()
    else:
        raise NotImplementedError(cfg.feature)
    scores, emb = [], None
    for r in range(cfg.repeat):
        s, e = pretrain_once(cfg, base, seed=r, log=log)
        scores.append(s)
        emb = e  # reference keeps the last repeat's best table
    return float(np.average(scores) - np.std(scores)), emb


# The HPO space of GNNEmb.py:176-183.
SEARCH_SPACE = dict(
    conv_layer=[2, 3, 4, 5],
    dropout=[0.0, 0.1, 0.2, 0.3, 0.4, 0.5],
    aggr=["sum", "mean", "gcn"],
)


def search_space(trial_like):
    """The HPO space of GNNEmb.py:176-183, through a suggest callback."""
    return {
        name: trial_like(name, choices)
        for name, choices in SEARCH_SPACE.items()
    }


def run_hpo(
    cfg: SSLConfig,
    n_trials: int,
    save_fn: Callable[[np.ndarray], None],
    log: Callable[[str], None] = print,
    storage: Optional[str] = None,
    sampler: str = "tpe",
):
    """One optuna-API study path in every deployment (resumable sqlite
    storage, the contract of GNNEmb.py:194-199): the real optuna package
    when installed, else the in-repo sqlite shim (compat/optuna_lite.py)
    whose samplers draw each parameter as a pure function of (seed, trial
    number, name, history) — resume-deterministic by construction.

    ``n_trials`` is the TOTAL study budget: restored trials count against
    it and are never re-trained. NOTE this intentionally diverges from the
    reference script (GNNEmb.py study.optimize(obj, n_trials=optruns) with
    load_if_exists=True), where each invocation runs n_trials ADDITIONAL
    trials on a resumed study — total-budget makes ``--optruns N`` mean the
    same thing whether or not the study was interrupted; run again with a
    larger N to extend a finished study. ``sampler="random"`` always uses the
    in-repo shim even when optuna is installed — an explicit random request
    must behave identically in every deployment (and a resumed study must
    never switch samplers with the environment)."""
    if sampler not in ("tpe", "random"):
        raise ValueError(f"unknown sampler {sampler!r} (tpe | random)")
    best = {"score": -np.inf}

    def objective_with(params: dict) -> float:
        trial_cfg = dataclasses.replace(cfg, **params)
        score, emb = pretrain(trial_cfg, log=log)
        if score > best["score"]:
            best.update(score=score, params=params)
            save_fn(emb)
        return score

    sampler_obj = None  # backend default (real optuna: its own TPE)
    use_shim = sampler == "random"
    if not use_shim:
        try:
            import optuna as backend

            sampler_obj = backend.samplers.TPESampler(seed=0)
        except ImportError:
            use_shim = True
    if use_shim:
        from glass_tpu.compat import optuna_lite as backend

        sampler_obj = (backend.LiteTPESampler(seed=0) if sampler == "tpe"
                       else backend.LiteRandomSampler(seed=0))

    def obj(trial):
        params = search_space(
            lambda name, choices: trial.suggest_categorical(name, choices)
        )
        return objective_with(params)

    study = backend.create_study(
        direction="maximize",
        storage=storage,
        study_name=cfg.dataset,
        load_if_exists=storage is not None,
        sampler=sampler_obj,
    )
    done = [t for t in study.trials if t.value is not None]
    if done:
        top = max(done, key=lambda t: t.value)
        best.update(score=top.value, params=dict(top.params))
        log(f"resumed study: {len(done)} completed trials")
    remaining = max(0, n_trials - len(done))
    for _ in range(remaining):  # one trial per optimize: log params as drawn
        study.optimize(obj, n_trials=1)
        tr = study.trials[-1]
        log(f"trial {tr.number}: {tr.params} -> {tr.value:.4f}")
    # Guard on COMPLETED trials: a study holding only failed/pruned trials
    # has non-empty .trials but best_params raises (ADVICE r4).
    completed = [t for t in study.trials if t.value is not None]
    log(f"best params {study.best_params if completed else None}")
    log(f"best valf1 {best['score']}")
    return best
