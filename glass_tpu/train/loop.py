"""Jitted whole-epoch training and evaluation.

TPU-first design: the reference iterates tiny subgraph mini-batches (batch
size 2-99) through a Python DataLoader, paying host->device dispatch per step
(reference: impl/train.py:4-34, impl/SubGDataset.py:38-96). Here an *entire
epoch* is one XLA program: the host supplies a (num_batches, batch) matrix of
subgraph indices, and a ``lax.scan`` performs, per step,

  gather pos/y  ->  zero-one labels (in-jit scatter-max)  ->  whole-graph
  GLASS forward  ->  loss  ->  grad  ->  adam update,

so the per-step Python/dispatch overhead that dominates at these batch sizes
disappears entirely. The learning rate is a traced scalar fed from the
functional ReduceLROnPlateau state (train/schedule.py) via
``optax.inject_hyperparams``.

Eval follows the same pattern: every split batch in one scan, logits sliced
on the host, metrics via sklearn (reference protocol, impl/train.py:20-34).
Right-padding of the last eval batch uses all(-1) pos rows, which contribute
nothing to the zero-one labels of their batch and pool to 0 — sliced off
before the metric.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp
import optax

from glass_tpu.ops.graph import Graph
from glass_tpu.ops.labeling import max_zero_one
from glass_tpu.train.schedule import PlateauState, plateau_init, plateau_step


def bce_with_logits(logits, y):
    """BCEWithLogitsLoss on flattened logits (reference: GLASSTest.py:57-58)."""
    logits = logits.astype(jnp.float32)  # mixed-precision: f32 loss
    return optax.sigmoid_binary_cross_entropy(logits.ravel(), y.ravel()).mean()


def ce_loss(logits, y):
    """CrossEntropyLoss (reference: GLASSTest.py:69)."""
    logits = logits.astype(jnp.float32)  # mixed-precision: f32 loss
    return optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()


LOSSES: dict[str, Callable] = {"bce": bce_with_logits, "ce": ce_loss}


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-3
    resi: float = 0.7  # plateau LR factor (reference: GLASSTest.py:214-216)
    min_lr: float = 5e-5
    batch_size: int = 64
    loss: str = "ce"  # "bce" | "ce"
    use_z: bool = True  # --use_maxzeroone
    plateau_patience: int = 10
    plateau_threshold: float = 1e-4
    # Custom node-labeling hook (the reference ZGDataloader's z_fn,
    # impl/SubGDataset.py:75-96): (pos, n_node) -> (n_node,) labels. None =
    # the zero-one MaxZOZ trick. Must be jit-traceable.
    z_fn: Optional[Callable] = None


class Trainer:
    """Owns the jitted epoch/eval programs for one (model, graph, x) triple.

    ``model`` is any flax module with signature
    ``apply(params, graph, x, pos, z, training=..., rngs=...) -> logits``
    (GLASS and EdgeGNN both satisfy it).
    """

    def __init__(
        self,
        model,
        graph: Graph,
        x: jnp.ndarray,
        cfg: TrainConfig,
        *,
        donate: bool = True,
    ):
        self.model = model
        self.graph = graph
        self.x = x
        self.cfg = cfg
        self.loss_fn = LOSSES[cfg.loss]
        self.tx = optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)

        # graph/x ride the jitted programs as ARGUMENTS (argnums 0-1), never
        # as closure captures: jax inlines closed-over arrays into the HLO as
        # literal constants, so a multi-MB edge list or Pallas layout would
        # bloat every compile (and overflow the remote-compile request limit
        # on tunneled TPUs — observed as HTTP 413 at hpo_metab scale).
        donate_argnums = (2, 3) if donate else ()
        self._epoch = jax.jit(self._epoch_impl, donate_argnums=donate_argnums)
        self._eval = jax.jit(self._eval_impl)

    # ------------------------------------------------------------------ init

    def init(self, seed: int, pos_example: jnp.ndarray):
        key = jax.random.PRNGKey(seed)
        z = max_zero_one(pos_example, self.graph.n_node) if self.cfg.use_z else None
        params = self.model.init(key, self.graph, self.x, pos_example, z)
        opt_state = self.tx.init(params)
        return params, opt_state, plateau_init(self.cfg.lr)

    # ----------------------------------------------------------------- train

    def _z(self, graph, pos):
        if not self.cfg.use_z:
            return None
        z_fn = self.cfg.z_fn or max_zero_one
        return z_fn(pos, graph.n_node)

    def _step_loss(self, params, graph, x, pos, y, dropout_key):
        z = self._z(graph, pos)
        logits = self.model.apply(
            params,
            graph,
            x,
            pos,
            z,
            training=True,
            rngs={"dropout": dropout_key},
        )
        return self.loss_fn(logits, y)

    def _epoch_impl(self, graph, x, params, opt_state, plateau, rng, pos_b, y_b):
        """One optimization epoch over pre-batched (nb, B, ...) arrays, with
        the plateau schedule advanced in-trace on the epoch's mean loss."""
        # feed the plateau-scheduled LR into the injected adam hyperparams
        opt_state.hyperparams["learning_rate"] = plateau.lr

        def step(carry, batch):
            params, opt_state, rng = carry
            pos, y = batch
            rng, dkey = jax.random.split(rng)
            loss, grads = jax.value_and_grad(self._step_loss)(
                params, graph, x, pos, y, dkey
            )
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, rng), loss

        (params, opt_state, rng), losses = jax.lax.scan(
            step, (params, opt_state, rng), (pos_b, y_b)
        )
        loss = losses.mean()
        plateau = plateau_step(
            plateau,
            loss,
            factor=self.cfg.resi,
            min_lr=self.cfg.min_lr,
            patience=self.cfg.plateau_patience,
            threshold=self.cfg.plateau_threshold,
        )
        return params, opt_state, plateau, rng, loss

    def train_epoch(self, params, opt_state, plateau: PlateauState, rng, pos_b, y_b):
        """Runs one epoch then advances the plateau scheduler on the epoch's
        mean train loss (reference: GLASSTest.py:223-225).

        One XLA dispatch; the returned loss is a *device* scalar, left
        unmaterialized so consecutive epochs pipeline on a remote accelerator
        (a host sync through the TPU tunnel costs ~27 ms — more than the
        18 ms compute of a density epoch). Callers format/float() it only
        when they actually log."""
        return self._epoch(self.graph, self.x, params, opt_state, plateau, rng,
                           pos_b, y_b)

    def _epochs_impl(self, graph, x, params, opt_state, plateau, rng, pos_bs, y_bs):
        """K epochs as ONE program: outer scan over epochs with the plateau
        schedule advanced in-scan (identical math to K train_epoch calls).
        Used before the protocol's eval gate opens, where nothing on the host
        needs to observe intermediate state — on a remote accelerator this
        removes K-1 dispatch round-trips."""

        def epoch(carry, batch):
            params, opt_state, plateau, rng = carry
            pos_b, y_b = batch
            opt_state.hyperparams["learning_rate"] = plateau.lr

            def step(c, b):
                params, opt_state, rng = c
                pos, y = b
                rng, dkey = jax.random.split(rng)
                loss, grads = jax.value_and_grad(self._step_loss)(
                    params, graph, x, pos, y, dkey
                )
                updates, opt_state = self.tx.update(grads, opt_state, params)
                return (optax.apply_updates(params, updates), opt_state, rng), loss

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

    def train_epochs(self, params, opt_state, plateau, rng, pos_bs, y_bs):
        """K epochs in one dispatch; pos_bs/y_bs: (K, nb, B, ...). Returns the
        per-epoch loss vector."""
        if not hasattr(self, "_epochs"):
            self._epochs = jax.jit(self._epochs_impl)
        params, opt_state, plateau, rng, losses = self._epochs(
            self.graph, self.x, params, opt_state, plateau, rng, pos_bs, y_bs
        )
        return params, opt_state, plateau, rng, np.asarray(losses)

    # ------------------------------------------------------------------ eval

    def _eval_impl(self, graph, x, params, pos_b):
        def step(_, pos):
            logits = self.model.apply(params, graph, x, pos, self._z(graph, pos))
            return None, logits

        _, logits = jax.lax.scan(step, None, pos_b)
        return logits  # (nb, B, C)

    def evaluate(self, params, pos_b: jnp.ndarray, n_real: int) -> np.ndarray:
        """Returns host logits for the first ``n_real`` samples."""
        logits = np.asarray(self._eval(self.graph, self.x, params, pos_b))
        return logits.reshape(-1, logits.shape[-1])[:n_real]

    def _eval_score_impl(self, graph, x, params, pos_b, y_pad, mask):
        from glass_tpu.train.metrics import device_metric_counts

        logits = self._eval_impl(graph, x, params, pos_b)
        return device_metric_counts(logits, y_pad, mask, self.cfg.loss == "bce")

    def evaluate_score(self, params, pos_b, y_pad, mask) -> float:
        """Micro-F1 with the counts computed inside the eval program: the
        per-epoch readback is ONE int32 (3,) vector instead of the (S, C)
        logits array, and the host float64 division makes the value EXACTLY
        the sklearn path's (test-pinned; reference metric semantics
        impl/metrics.py:5-20). ``y_pad``/``mask`` from metrics.pad_eval_labels."""
        from glass_tpu.train.metrics import score_from_counts

        if not hasattr(self, "_eval_score"):
            self._eval_score = jax.jit(self._eval_score_impl)
        counts = self._eval_score(
            self.graph, self.x, params, pos_b, jnp.asarray(y_pad),
            jnp.asarray(mask),
        )
        return score_from_counts(counts)


# --------------------------------------------------------------- batching


def make_train_batches(rng: np.random.Generator, pos: np.ndarray, y: np.ndarray, batch_size: int):
    """Shuffled, drop_last batching of the subgraph set (reference:
    GLASSTest.py:108-116 train loader with drop_last=True)."""
    n = pos.shape[0]
    nb = n // batch_size
    if nb == 0:
        raise ValueError(f"batch_size {batch_size} > split size {n}")
    perm = rng.permutation(n)[: nb * batch_size].reshape(nb, batch_size)
    return pos[perm], y[perm]


def make_eval_batches(
    pos: np.ndarray,
    y: np.ndarray,
    batch_size: int,
    rng: Optional[np.random.Generator] = None,
):
    """All samples, last batch right-padded with all(-1) pos rows (inert for
    labeling and pooling).

    When ``rng`` is given the samples are shuffled, matching the reference's
    eval loaders (GLASSTest.py:118-119, shuffle=True, drop_last=False): batch
    composition determines the zero-one labels, so shuffling changes the
    predictions — part of the protocol, not just an ordering detail. ``y`` is
    returned permuted identically."""
    n = pos.shape[0]
    if rng is not None:
        perm = rng.permutation(n)
        pos, y = pos[perm], y[perm]
    nb = -(-n // batch_size)
    pad = nb * batch_size - n
    pos_p = np.concatenate([pos, np.full((pad,) + pos.shape[1:], -1, dtype=pos.dtype)])
    return pos_p.reshape(nb, batch_size, -1), y, n
