"""Reproduce RESULTS.md in one command.

Runs the 10-repeat reference protocol on all bundled synthetic benchmarks
(GLASS and the GNN-seg baseline) and prints the summary table.

Usage: python tools/run_all.py [--repeat 10] [--cpu] [--seg]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

PAPER = {"density": 0.930, "cut_ratio": 0.935, "coreness": 0.840, "component": 1.000}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeat", type=int, default=10)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fastest for these graphs)")
    ap.add_argument("--seg", action="store_true", help="also run GNN-seg")
    ap.add_argument("--datasets", nargs="*",
                    default=["density", "cut_ratio", "coreness", "component"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from glass_tpu.cli.glass_test import load_config
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    rows = []
    for ds in args.datasets:
        params = load_config(ds, None)
        cfg = ExperimentConfig(dataset=ds, feature="one", use_maxzeroone=True,
                               repeat=args.repeat, **params)
        t0 = time.time()
        _, mean, err = run_experiment(cfg, log=lambda *_: None)
        rows.append((ds, mean, err, time.time() - t0))
        print(f"GLASS {ds}: {mean:.3f} ± {err:.3f} "
              f"(paper ≈{PAPER[ds]:.3f}) [{rows[-1][3]:.0f}s]", flush=True)

    if args.seg:
        from glass_tpu.train.seg_protocol import (
            BEST_HYPERPARAMS, SegConfig, run_seg_experiment,
        )

        for ds in args.datasets:
            bhp = BEST_HYPERPARAMS[ds]
            _, mean, err = run_seg_experiment(
                SegConfig(dataset=ds, conv_layer=bhp["conv_layer"],
                          dropout=bhp["dropout"], hidden_dim=bhp["hidden_dim"],
                          repeat=args.repeat),
                log=lambda *_: None,
            )
            print(f"GNN-seg {ds}: {mean:.3f} ± {err:.3f}", flush=True)

    # prefer the measured reference baseline (torch oracle trained with the
    # exact reference protocol, tools/oracle_baseline.py) over recalled
    # paper numbers when it's been produced
    measured = {}
    mpath = Path(__file__).parent.parent / "BASELINE_measured.json"
    if mpath.exists():
        import json

        measured = {k: v["mean"] for k, v in json.loads(mpath.read_text()).items()}

    print("\nsummary:")
    for ds, mean, err, dt in rows:
        base = measured.get(ds, PAPER[ds])
        src = "measured" if ds in measured else "paper"
        verdict = "beats" if mean > base + 0.005 else (
            "parity" if mean > base - 0.03 else "below")
        print(f"  {ds:10s} {mean:.3f} ± {err:.3f}  ({verdict} {src} {base:.3f})")


if __name__ == "__main__":
    main()
