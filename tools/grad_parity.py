"""Single-step gradient parity: torch oracle vs flax trainer (VERDICT r3
item 1 — localize the coreness divergence).

tools/trajectory_diff.py shows the two frameworks' per-epoch losses split
chaotically after a few epochs even with identical weights and batches.
That is consistent with BOTH (a) a genuine training-semantics bug and (b)
pure float-accumulation chaos on equivalent math. This tool separates them:
with identical weights and ONE identical batch it compares

  1. the forward loss,
  2. every parameter-gradient leaf (max relative difference), and
  3. the parameter update after one optimizer step (Adam, identical hparams)

between the torch oracle (testing/oracle.py — activation-parity-gated
against the reference impl/models.py) and the flax training path
(train/loop.py::Trainer). Gradient agreement at float-noise level proves
the training semantics are equivalent and the trajectory split is chaotic
amplification; a systematically divergent leaf names the buggy operation.

Usage:
    python tools/grad_parity.py --dataset coreness [--steps 3]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import torch
import torch.nn.functional as F

import jax

jax.config.update("jax_platforms", "cpu")  # the ONLY reliable CPU override

import jax.numpy as jnp

from glass_tpu.data.loaders import load_dataset
from glass_tpu.ops.graph import build_graph
from glass_tpu.testing.oracle import make_oracle_modules
from glass_tpu.train.loop import Trainer, TrainConfig
from glass_tpu.train.protocol import ExperimentConfig, make_glass_model
from tools.oracle_baseline import CONFIGS, max_zoz
from tools.trajectory_diff import inject_torch_weights

TGLASS = make_oracle_modules()["TGLASS"]


def flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def rel_diff(a, b):
    den = max(np.abs(a).max(), np.abs(b).max(), 1e-12)
    return float(np.abs(a - b).max() / den)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="coreness")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--steps", type=int, default=3,
                    help="optimizer steps to compare (update drift growth)")
    args = ap.parse_args()

    cfg = dict(CONFIGS[args.dataset])
    cfg["dropout"] = 0.0  # dropout RNG can never match across frameworks

    rng = np.random.default_rng(args.seed)
    base = load_dataset(args.dataset, rng)
    base.set_one_feature()
    n = base.n_node
    binary = base.binary
    trn_pos, trn_y = base.get_split("train")

    torch.manual_seed(args.seed)
    tmodel = TGLASS(cfg, base.max_deg, base.output_channels)
    topt = torch.optim.Adam(tmodel.parameters(), lr=cfg["lr"])
    tx = torch.tensor(base.x.astype(np.int64))
    tei = torch.tensor(base.edge_index.astype(np.int64))
    tloss_fn = (
        (lambda p, t: F.binary_cross_entropy_with_logits(
            p.flatten(), t.flatten()))
        if binary else F.cross_entropy
    )

    ecfg = ExperimentConfig(
        dataset=args.dataset, pool=cfg["pool"], aggr=cfg["aggr"],
        hidden_dim=cfg["hidden_dim"], conv_layer=cfg["conv_layer"],
        dropout=0.0, lr=cfg["lr"], z_ratio=cfg["z_ratio"],
        batch_size=cfg["batch_size"], resi=cfg["resi"], spmm_mode="segment",
    )
    model = make_glass_model(ecfg, base, "segment")
    graph = build_graph(base.edge_index, base.edge_weight, n, cfg["aggr"],
                        materialize_dense=False)
    tcfg = TrainConfig(lr=cfg["lr"], resi=cfg["resi"],
                       batch_size=cfg["batch_size"],
                       loss="bce" if binary else "ce", use_z=True)
    x = jnp.asarray(base.x.astype(np.int32))
    trainer = Trainer(model, graph, x, tcfg, donate=False)
    bs = cfg["batch_size"]
    params, opt_state, plateau = trainer.init(
        args.seed, jnp.asarray(trn_pos[:bs]))
    params = inject_torch_weights(params, tmodel)

    ydt = np.float32 if binary else np.int64
    perm = np.random.default_rng(777).permutation(len(trn_pos))

    import optax

    opt = optax.adam(cfg["lr"], b1=0.9, b2=0.999, eps=1e-8)
    opt_state = opt.init(params)

    for step in range(args.steps):
        sel = perm[step * bs: (step + 1) * bs]
        pp = trn_pos[sel]
        yy = trn_y[sel].astype(ydt)

        # ---- torch: loss + grads
        tmodel.train()
        topt.zero_grad()
        tpp = torch.tensor(pp)
        out = tmodel(tx, tei, tpp, max_zoz(tpp, n))
        ty = torch.tensor(yy)
        tl = tloss_fn(out, ty.float() if binary else ty)
        tl.backward()
        tgrads = {nm: p.grad.detach().numpy().copy()
                  for nm, p in tmodel.named_parameters()}

        # ---- flax: loss + grads via the Trainer's own loss fn
        pos_j = jnp.asarray(pp)
        y_j = jnp.asarray(yy)
        floss, fgrads = jax.value_and_grad(trainer._step_loss)(
            params, graph, x, pos_j, y_j, jax.random.PRNGKey(0))
        fflat = flatten(fgrads["params"])

        print(f"step {step}: torch loss {float(tl):.8f}  "
              f"flax loss {float(floss):.8f}  "
              f"rel {abs(float(tl) - float(floss)) / abs(float(tl)):.2e}")

        # map torch named params onto flax leaves by injecting each grad
        # through the same converter used for the weights
        tgtree = flatten(inject_torch_weights(
            params, _GradProxy(tmodel))["params"])
        worst = []
        for k in sorted(fflat):
            if k not in tgtree:
                continue
            worst.append((rel_diff(fflat[k], tgtree[k]), k))
        worst.sort(reverse=True)
        for r, k in worst[:8]:
            print(f"    grad rel-diff {r:.3e}  {k}")
        print(f"    max grad rel-diff {worst[0][0]:.3e} over "
              f"{len(worst)} leaves")

        # ---- one optimizer step on both; compare updated params
        topt.step()
        upd, opt_state = opt.update(fgrads, opt_state, params)
        params = optax.apply_updates(params, upd)
        pflat = flatten(params["params"])
        ttree = flatten(inject_torch_weights(params, tmodel)["params"])
        wdiff = max(rel_diff(pflat[k], ttree[k]) for k in pflat)
        print(f"    post-step param rel-diff {wdiff:.3e}")


class _GradProxy:
    """Duck-types the oracle module tree but yields .grad instead of data,
    so inject_torch_weights' structure walk maps torch grads onto the flax
    param tree for leaf-by-leaf comparison."""

    def __init__(self, tmodel):
        self._t = tmodel

    @property
    def conv(self):
        return _Node(self._t.conv, grad=True)

    @property
    def pred(self):
        return _Node(self._t.pred, grad=True)


class _Node:
    def __init__(self, mod, grad):
        self._m = mod
        self._g = grad

    def flax_params(self):
        out = self._m.flax_params()

        # re-walk: flax_params returns tensors computed from parameters; for
        # Linear weights it returns p.weight.t() (a zero-copy view). Rebuild
        # the same structure from .grad by pairing each returned leaf with
        # the parameter it aliases (same storage pointer); a transposed view
        # is recognized by its reversed strides — shape comparison alone
        # fails on the square hidden x hidden conv kernels.
        def regrad(v):
            if isinstance(v, dict):
                return {k: regrad(x) for k, x in v.items()}
            for p in self._m.parameters():
                if v.data_ptr() != p.data_ptr():
                    continue
                g = p.grad
                if v.shape == p.shape and v.stride() == p.stride():
                    return g
                if (v.dim() == 2 and tuple(v.shape) == tuple(p.shape)[::-1]
                        and tuple(v.stride()) == tuple(p.stride())[::-1]):
                    return g.t()
                raise KeyError(f"unrecognized view transform for {p.shape}")
            raise KeyError("leaf does not alias a parameter")

        return regrad(out)

    @property
    def weight(self):
        return self._m.weight.grad

    @property
    def bias(self):
        return self._m.bias.grad


if __name__ == "__main__":
    main()
