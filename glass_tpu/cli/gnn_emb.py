"""SSL pretraining CLI — flag-compatible with the reference GNNEmb driver
(reference: GNNEmb.py:12-33 argparse surface).

Produces ``{path}/{name}_{hidden}.npz`` containing the best (N, hidden) node
embedding table under key 'embedding' (the contract GLASSTest loads through
``--use_nodeid``).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def build_arg_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="SSL node-embedding pretraining")
    parser.add_argument("--dataset", type=str, default="ppi_bp")
    parser.add_argument("--use_deg", action="store_true")
    parser.add_argument("--use_one", action="store_true")
    parser.add_argument("--use_nodeid", action="store_true")
    parser.add_argument("--repeat", type=int, default=1)
    # reference-compat no-op flags (GNNEmb.py:24-25)
    parser.add_argument("--test", action="store_true")
    parser.add_argument("--abl", action="store_true")
    parser.add_argument("--optruns", type=int, default=100)
    parser.add_argument("--path", type=str, default="Emb/")
    parser.add_argument("--name", type=str, default=None,
                        help="output / study name (default: dataset)")
    parser.add_argument("--device", type=int, default=0)
    parser.add_argument("--use_seed", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_epochs", type=int, default=100)
    parser.add_argument("--data_root", type=str, default=None)
    parser.add_argument("--sampler", type=str, default="tpe",
                        choices=["tpe", "random"],
                        help="no-optuna HPO sampler (train/tpe.py TPE or "
                             "seeded random search)")
    parser.add_argument("--spmm", type=str, default=None,
                        choices=["dense", "segment", "pallas"])
    parser.add_argument("--autotune", action="store_true",
                        help="calibrate the layout planner's cost model on "
                             "THIS accelerator before planning (fits once, "
                             "caches under ~/.cache/glass_tpu/, sets "
                             "GLASS_TPU_AUTOTUNE for the run)")
    parser.add_argument("--autotune_file", type=str, default=None,
                        help="calibration JSON path for --autotune (default "
                             "~/.cache/glass_tpu/autotune_<backend>.json)")
    return parser


def main(argv=None):
    args = build_arg_parser().parse_args(argv)

    import jax

    if args.device == -1:
        jax.config.update("jax_platforms", "cpu")

    if args.autotune:
        from glass_tpu.ops.autotune import ensure_autotune

        ensure_autotune(args.autotune_file)

    from glass_tpu.train.ssl import SSLConfig, run_hpo

    if args.use_one:
        feature = "one"
    elif args.use_deg:
        feature = "deg"
    else:
        feature = "nodeid"  # reference recipe: --use_nodeid (README:55-57)

    name = args.name or args.dataset
    out_dir = Path(args.path)
    out_dir.mkdir(parents=True, exist_ok=True)
    hidden = 64

    cfg = SSLConfig(
        dataset=args.dataset,
        feature=feature,
        hidden_dim=hidden,
        repeat=args.repeat,
        max_epochs=args.max_epochs,
        spmm_mode=args.spmm,
        data_root=args.data_root,
    )

    def save_fn(emb: np.ndarray):
        np.savez(out_dir / f"{name}_{hidden}.npz", embedding=emb)
        print(f"saved {out_dir / f'{name}_{hidden}.npz'}", flush=True)

    print(args)
    storage = f"sqlite:///{out_dir / (name + '.db')}"
    run_hpo(cfg, n_trials=args.optruns, save_fn=save_fn, storage=storage,
            sampler=args.sampler)


if __name__ == "__main__":
    main()
