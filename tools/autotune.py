"""Fit the block-sparse planner's cost model on the current accelerator.

Standalone wrapper around glass_tpu/ops/autotune.py (the CLIs expose the
same probe via ``--autotune``, which also caches the calibration under
~/.cache/glass_tpu/). See that module's docstring for the model and the
timing discipline.

    python tools/autotune.py --out autotune.json
    export GLASS_TPU_AUTOTUNE=$PWD/autotune.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="autotune.json")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--force_cpu", action="store_true",
                    help="fit interpret-mode numbers (testing only — they do "
                         "not describe any TPU)")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "tpu" and not args.force_cpu:
        raise SystemExit(
            "autotune must run on the TPU it calibrates (or pass --force_cpu "
            "to exercise the fitting path in interpret mode)"
        )

    from glass_tpu.ops.autotune import fit_cost_constants

    out = fit_cost_constants(iters=args.iters, hidden=args.hidden)
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    print(f"\nexport GLASS_TPU_AUTOTUNE={Path(args.out).resolve()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
