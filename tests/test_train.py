"""Tests for the training harness: plateau scheduler parity with torch,
batching helpers, and a small end-to-end training run."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from glass_tpu.train.schedule import plateau_init, plateau_step
from glass_tpu.train.loop import (
    Trainer,
    TrainConfig,
    make_train_batches,
    make_eval_batches,
    bce_with_logits,
    ce_loss,
)
from glass_tpu.ops.graph import build_graph
from glass_tpu.nn.modules import GLASS


def test_plateau_matches_torch_scheduler(rng):
    """Feed an identical loss sequence to torch's ReduceLROnPlateau and our
    functional reimplementation; LR trajectories must match."""
    lr0, factor, min_lr = 0.01, 0.5, 5e-5
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([p], lr=lr0)
    scd = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, factor=factor, min_lr=min_lr)

    state = plateau_init(lr0)
    losses = list(1.0 - 0.01 * np.arange(20)) + [0.81] * 30 + [0.5] + [0.5] * 25
    for i, loss in enumerate(losses):
        scd.step(loss)
        state = plateau_step(state, loss, factor=factor, min_lr=min_lr)
        torch_lr = opt.param_groups[0]["lr"]
        assert np.isclose(float(state.lr), torch_lr, rtol=1e-6), (
            f"step {i}: ours {float(state.lr)} torch {torch_lr}"
        )


def test_plateau_min_lr():
    state = plateau_init(1e-4)
    for _ in range(100):
        state = plateau_step(state, 1.0, factor=0.1, min_lr=5e-5)
    assert float(state.lr) == pytest.approx(5e-5)


def test_losses_match_torch(rng):
    logits = rng.normal(size=(6, 3)).astype(np.float32)
    y_int = rng.integers(0, 3, size=6)
    ref_ce = torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(y_int))
    np.testing.assert_allclose(
        float(ce_loss(jnp.asarray(logits), jnp.asarray(y_int))),
        float(ref_ce), rtol=1e-5,
    )
    blogits = rng.normal(size=(6, 1)).astype(np.float32)
    by = rng.integers(0, 2, size=(6, 1)).astype(np.float32)
    ref_bce = torch.nn.BCEWithLogitsLoss()(
        torch.tensor(blogits).flatten(), torch.tensor(by).flatten()
    )
    np.testing.assert_allclose(
        float(bce_with_logits(jnp.asarray(blogits), jnp.asarray(by))),
        float(ref_bce), rtol=1e-5,
    )


def test_make_batches(rng):
    pos = np.arange(50).reshape(10, 5)
    y = np.arange(10)
    pb, yb = make_train_batches(rng, pos, y, 3)
    assert pb.shape == (3, 3, 5) and yb.shape == (3, 3)  # drop_last
    eb, ey, n = make_eval_batches(pos, y, 3)
    assert eb.shape == (4, 3, 5) and n == 10
    assert (eb.reshape(-1, 5)[10:] == -1).all()  # padding rows inert


def _toy_problem(rng, n=60, n_sub=40, sub_len=5):
    """Subgraph classification where the answer is linearly separable:
    class = 1 if the subgraph lives in the high-degree half."""
    half = n // 2
    # dense-ish half and sparse half
    e1 = rng.integers(0, half, size=(2, 300))
    e2 = rng.integers(half, n, size=(2, 100))
    ei = np.concatenate([e1, e2, e1[::-1], e2[::-1]], axis=1)
    pos = np.zeros((n_sub, sub_len), dtype=np.int64)
    y = np.zeros(n_sub, dtype=np.int64)
    for i in range(n_sub):
        if i % 2 == 0:
            pos[i] = rng.choice(half, size=sub_len, replace=False)
            y[i] = 0
        else:
            pos[i] = half + rng.choice(half, size=sub_len, replace=False)
            y[i] = 1
    return ei, n, pos, y


def test_trainer_end_to_end_loss_decreases(rng):
    ei, n, pos, y = _toy_problem(rng)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    model = GLASS(max_deg=1, hidden_channels=8, num_layers=2,
                  output_channels=(2,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.ones((n, 1), dtype=jnp.int32)
    cfg = TrainConfig(lr=1e-2, resi=0.7, batch_size=8, loss="ce", use_z=True)
    trainer = Trainer(model, g, x, cfg)
    params, opt_state, plateau = trainer.init(0, jnp.asarray(pos[:8]))
    key = jax.random.PRNGKey(0)

    losses = []
    for _ in range(30):
        pb, yb = make_train_batches(rng, pos, y, 8)
        params, opt_state, plateau, key, loss = trainer.train_epoch(
            params, opt_state, plateau, key, jnp.asarray(pb), jnp.asarray(yb)
        )
        losses.append(loss)
    assert np.mean(losses[-5:]) < losses[0], (
        f"loss did not decrease: {losses[0]} -> {np.mean(losses[-5:])}"
    )

    eb, _, n_real = make_eval_batches(pos, y, 8)
    logits = trainer.evaluate(params, jnp.asarray(eb), n_real)
    assert logits.shape == (40, 2)
    acc = (logits.argmax(1) == y).mean()
    assert acc > 0.8, f"toy accuracy {acc}"


def test_auroc_metric(rng):
    from glass_tpu.train.metrics import auroc
    from sklearn.metrics import roc_auc_score

    y = rng.integers(0, 2, size=50)
    pred = rng.normal(size=50)
    assert auroc(pred, y) == pytest.approx(roc_auc_score(y, pred))


def test_protocol_without_labeling_trick():
    """use_maxzeroone=False (plain GDataloader mode): z=None throughout."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=2,
        resi=0.9, feature="one", use_maxzeroone=False, repeat=1,
        max_epochs=18, spmm_mode="segment",
    )
    logs = []
    scores, mean, err = run_experiment(cfg, log=logs.append)
    assert 0.0 <= mean <= 1.0  # without labels density is near-chance; just run


def test_custom_z_fn_hook(rng):
    """TrainConfig.z_fn replaces the MaxZOZ labeling (the reference
    ZGDataloader z_fn extension point)."""
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.nn.modules import GLASS

    ei, n, pos, y = _toy_problem(rng)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    model = GLASS(max_deg=1, hidden_channels=8, num_layers=1,
                  output_channels=(2,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.ones((n, 1), dtype=jnp.int32)

    all_ones = lambda pos, n_node: jnp.ones(n_node, dtype=jnp.int32)
    cfg1 = TrainConfig(batch_size=8, loss="ce", use_z=True, z_fn=all_ones)
    cfg2 = TrainConfig(batch_size=8, loss="ce", use_z=True)
    t1, t2 = Trainer(model, g, x, cfg1), Trainer(model, g, x, cfg2)
    params, _, _ = t1.init(0, jnp.asarray(pos[:8]))
    eb, _, nr = make_eval_batches(pos, y, 8)
    l1 = t1.evaluate(params, jnp.asarray(eb), nr)
    l2 = t2.evaluate(params, jnp.asarray(eb), nr)
    assert not np.allclose(l1, l2)  # different labeling -> different logits


def test_trainer_eval_padding_does_not_leak(rng):
    """Eval padding rows must not change real samples' logits: compare a
    batch-size that divides the split exactly vs one that pads."""
    ei, n, pos, y = _toy_problem(rng)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    model = GLASS(max_deg=1, hidden_channels=8, num_layers=1,
                  output_channels=(2,), pools=("sum",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.ones((n, 1), dtype=jnp.int32)
    cfg = TrainConfig(batch_size=8, loss="ce", use_z=True)
    trainer = Trainer(model, g, x, cfg)
    params, _, _ = trainer.init(0, jnp.asarray(pos[:8]))

    eb1, _, n1 = make_eval_batches(pos, y, 8)   # 40 % 8 == 0, no padding
    eb2, _, n2 = make_eval_batches(pos, y, 16)  # pads last batch
    l1 = trainer.evaluate(params, jnp.asarray(eb1), n1)
    l2 = trainer.evaluate(params, jnp.asarray(eb2), n2)
    # padding alters z batch composition only through batch membership —
    # the real samples in the padded batch see identical z as long as padding
    # rows are inert; batches differ between the two layouts though, so only
    # compare the final batch where padding is present in eb2.
    np.testing.assert_allclose(l1[32:], l2[32:], rtol=1e-4, atol=1e-5)


def test_device_metric_counts_matches_sklearn(rng):
    """device_metric_counts + host float64 division == the sklearn metric
    path EXACTLY, on every task arity (VERDICT r4 item 5): multiclass argmax
    micro-F1 (= accuracy), binary single-logit, and multilabel k-hot — with
    right-padded batches masked out."""
    from glass_tpu.train.metrics import (
        binary_f1, micro_f1, device_metric_counts, score_from_counts,
        pad_eval_labels,
    )

    B = 8
    for n_real in (17, 24):  # padded and exact-multiple cases
        nb = -(-n_real // B)
        padlen = nb * B - n_real
        # multiclass (C=5)
        logits = rng.normal(size=(n_real, 5)).astype(np.float32)
        y = rng.integers(0, 5, size=n_real)
        want = micro_f1(logits, y)
        lp = np.concatenate([logits, np.zeros((padlen, 5), np.float32)])
        y_pad, mask = pad_eval_labels(y, nb, B)
        got = score_from_counts(device_metric_counts(
            jnp.asarray(lp.reshape(nb, B, 5)), jnp.asarray(y_pad),
            jnp.asarray(mask), binary=False,
        ))
        assert got == want, (got, want)
        # binary (C=1)
        logits1 = rng.normal(size=(n_real, 1)).astype(np.float32)
        y1 = rng.integers(0, 2, size=n_real).astype(np.float32)
        want = binary_f1(logits1, y1)
        lp = np.concatenate([logits1, np.zeros((padlen, 1), np.float32)])
        y_pad, mask = pad_eval_labels(y1, nb, B)
        got = score_from_counts(device_metric_counts(
            jnp.asarray(lp.reshape(nb, B, 1)), jnp.asarray(y_pad),
            jnp.asarray(mask), binary=True,
        ))
        assert got == want, (got, want)
        # multilabel (k-hot, C=4)
        logits4 = rng.normal(size=(n_real, 4)).astype(np.float32)
        y4 = rng.integers(0, 2, size=(n_real, 4)).astype(np.float32)
        want = binary_f1(logits4, y4)
        lp = np.concatenate([logits4, np.zeros((padlen, 4), np.float32)])
        y_pad, mask = pad_eval_labels(y4, nb, B)
        got = score_from_counts(device_metric_counts(
            jnp.asarray(lp.reshape(nb, B, 4)), jnp.asarray(y_pad),
            jnp.asarray(mask), binary=True,
        ))
        assert got == want, (got, want)


def test_trainer_evaluate_score_matches_host_path(rng):
    """Trainer.evaluate_score == score_fn(Trainer.evaluate(...)) on the same
    batches — the protocol's two eval paths are interchangeable."""
    from glass_tpu.train.metrics import micro_f1, pad_eval_labels

    ei, n, pos, y = _toy_problem(rng)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    model = GLASS(max_deg=1, hidden_channels=8, num_layers=2,
                  output_channels=(2,), pools=("mean",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    x = jnp.ones((n, 1), dtype=jnp.int32)
    cfg = TrainConfig(lr=1e-2, batch_size=8, loss="ce", use_z=True)
    trainer = Trainer(model, g, x, cfg)
    params, _, _ = trainer.init(0, jnp.asarray(pos[:8]))

    eb, y_p, n_real = make_eval_batches(pos, y, 8)
    want = micro_f1(trainer.evaluate(params, jnp.asarray(eb), n_real), y_p)
    y_pad, mask = pad_eval_labels(y_p, eb.shape[0], 8)
    got = trainer.evaluate_score(params, jnp.asarray(eb), y_pad, mask)
    assert got == want, (got, want)
