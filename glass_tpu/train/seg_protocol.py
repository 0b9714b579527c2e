"""GNN-seg experiment protocol (reference: GNNSeg.py:283-345).

Differences from the GLASS protocol worth noting: 500 epochs max, eval every
5 epochs, the early-stop counter is *halved* on improvement and the run stops
when it exceeds 10; batch_size is the test-split size; plateau factor 0.7.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from glass_tpu.data.loaders import load_dataset, SYNTHETIC_DATASETS
from glass_tpu.data.seg import segregate
from glass_tpu.nn.seg import GSegGNN
from glass_tpu.train.loop import LOSSES
from glass_tpu.train.metrics import binary_f1, micro_f1
from glass_tpu.train.schedule import plateau_init, plateau_step

BEST_HYPERPARAMS = {  # reference: GNNSeg.py:348-389
    "density": dict(conv_layer=1, dropout=0.4, hidden_dim=16),
    "component": dict(conv_layer=1, dropout=0.0, hidden_dim=16),
    "coreness": dict(conv_layer=1, dropout=0.3, hidden_dim=16),
    "cut_ratio": dict(conv_layer=1, dropout=0.1, hidden_dim=4),
    "hpo_neuro": dict(conv_layer=1, dropout=0.4, hidden_dim=64),
    "ppi_bp": dict(conv_layer=8, dropout=0.4, hidden_dim=64),
    "hpo_metab": dict(conv_layer=1, dropout=0.1, hidden_dim=64),
    "em_user": dict(conv_layer=1, dropout=0.4, hidden_dim=64),
}


@dataclasses.dataclass
class SegConfig:
    dataset: str = "density"
    hidden_dim: int = 64
    conv_layer: int = 8
    dropout: float = 0.3
    lr: float = 1e-3
    repeat: int = 1
    max_epochs: int = 500
    data_root: Optional[str] = None


def run_seg_experiment(cfg: SegConfig, log: Callable[[str], None] = print):
    base = load_dataset(cfg.dataset, np.random.default_rng(0), cfg.data_root)
    feature = "one" if cfg.dataset in SYNTHETIC_DATASETS else "deg"
    conv = "gin" if cfg.dataset == "density" else "gcn"

    binary = base.binary
    out_ch = base.output_channels
    loss_fn = LOSSES["bce" if binary else "ce"]
    score_fn = binary_f1 if binary else micro_f1
    ydtype = np.float32 if binary else np.int64

    splits = segregate(base, feature)
    trn, val, tst = splits["train"], splits["valid"], splits["test"]
    batch_size = tst.y.shape[0]

    model = GSegGNN(
        hidden_channels=cfg.hidden_dim, output_channels=out_ch,
        num_layers=cfg.conv_layer, dropout=cfg.dropout, activation="elu",
        conv=conv,
    )
    tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

    def to_dev(d):
        return (jnp.asarray(d.adj_norm), jnp.asarray(d.adj_sum),
                jnp.asarray(d.feats), jnp.asarray(d.mask),
                jnp.asarray(d.y.astype(ydtype)))

    trn_d, val_d, tst_d = to_dev(trn), to_dev(val), to_dev(tst)

    # trn_d rides as an argument — closure-captured arrays inline into the
    # HLO as constants (see train/loop.py)
    @jax.jit
    def train_epoch(trn_d, params, opt_state, lr, rng, order):
        opt_state.hyperparams["learning_rate"] = lr
        nb = order.shape[0]

        def step(carry, idx):
            params, opt_state, rng = carry
            rng, dkey = jax.random.split(rng)
            an, asum, f, m, y = (a[idx] for a in trn_d)

            def loss_of(p):
                logits = model.apply(p, an, asum, f, m, training=True,
                                     rngs={"dropout": dkey})
                return loss_fn(logits, y)

            loss, grads = jax.value_and_grad(loss_of)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return (optax.apply_updates(params, updates), opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            step, (params, opt_state, rng), order
        )
        return params, opt_state, rng, losses.mean()

    @jax.jit
    def infer(params, an, asum, f, m):
        return model.apply(params, an, asum, f, m)

    def score(params, data):
        """Evaluates in |test|-sized batches like the reference's tloader
        (GNNSeg.py:290-292, batch_size=len(tst), shuffle=False): GraphNorm
        statistics couple the subgraphs *within* an eval batch, so batch
        boundaries are part of the protocol."""
        an, asum, f, m, y = data
        n = an.shape[0]
        outs = []
        for s in range(0, n, batch_size):
            sl = slice(s, min(s + batch_size, n))
            outs.append(np.asarray(infer(params, an[sl], asum[sl], f[sl], m[sl])))
        return score_fn(np.concatenate(outs, axis=0), np.asarray(y))

    outs = []
    for repeat in range(cfg.repeat):
        log(f"repeat {repeat}")
        rng = np.random.default_rng(repeat)
        key = jax.random.PRNGKey(repeat)
        params = model.init(jax.random.PRNGKey(repeat), *trn_d[:4])
        opt_state = tx.init(params)
        plateau = plateau_init(cfg.lr)

        n_trn = trn.y.shape[0]
        nb = max(n_trn // batch_size, 1)
        val_score = tst_score = 0.0
        early = 0.0
        for i in range(cfg.max_epochs):
            order = rng.permutation(n_trn)[: nb * min(batch_size, n_trn)]
            order = order.reshape(nb, -1)
            params, opt_state, key, loss = train_epoch(
                trn_d, params, opt_state, plateau.lr, key, jnp.asarray(order)
            )
            plateau = plateau_step(plateau, loss, factor=0.7, min_lr=5e-5)
            if i % 5 == 0:
                s = score(params, val_d)
                early += 1
                if s > val_score:
                    val_score = s
                    tst_score = score(params, tst_d)
                    log(f"iter {i} loss {float(loss):.4f} val {val_score:.4f} tst {tst_score:.4f}")
                    early /= 2
                elif s >= val_score - 1e-5:
                    probe = score(params, tst_d)
                    tst_score = max(probe, tst_score)
                    log(f"iter {i} loss {float(loss):.4f} val {val_score:.4f} tst {probe:.4f}")
                    early /= 2
                else:
                    log(f"iter {i} loss {float(loss):.4f} val {s:.4f} tst {score(params, tst_d):.4f}")
                if early > 10:
                    break
        log(f"end: val {val_score:.4f} tst {tst_score:.4f}")
        outs.append(tst_score)
    mean = float(np.average(outs))
    err = float(np.std(outs) / np.sqrt(len(outs)))
    log(f"tst scores {outs}")
    log(f"{mean} {err}")
    return outs, mean, err
