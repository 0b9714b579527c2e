"""Differential timing of the dense-MXU SpMM dtypes at real-world scale.

VERDICT r3 item 4: the planner routes the hpo regime (14,587 nodes, ~1.2%
dense, unstructured — datasets.py:127-229 scale) to the dense path, where
round 3 measured f32 at 1.19 ms (716 GB/s, bandwidth-optimal for f32). The
int8 row-quantized layout (ops/pallas_dense.py) halves bf16's bytes again;
this probe measures f32 / bf16 / int8 on the same graph with the timing
discipline CLAUDE.md mandates (in-jit lax.scan, scalar-readback sync,
differential long-vs-short scans to cancel the per-dispatch tunnel cost).

Usage: python tools/dense_probe.py [--n 14587] [--e 2600000] [--hidden 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=14587)
    ap.add_argument("--e", type=int, default=2_600_000,
                    help="directed edge count")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--iters", type=int, default=400)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.ops.spmm import spmm

    rng = np.random.default_rng(7)
    e = args.e // 2
    src = rng.integers(0, args.n, size=e)
    dst = rng.integers(0, args.n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    x = jnp.asarray(rng.normal(size=(args.n, args.hidden)).astype(np.float32))
    print(f"graph: {args.n} nodes, {ei.shape[1]} directed edges, "
          f"H={args.hidden}, backend {jax.default_backend()}", file=sys.stderr)

    def scan_time(g, iters):
        # graph is a jit ARGUMENT: closing over it would inline the dense
        # adjacency into the HLO as a literal constant (851 MB at f32) and
        # the tunnel's remote-compile endpoint rejects it — HTTP 413
        # (CLAUDE.md; observed building this probe)
        @jax.jit
        def many(g_, x0):
            def step(h, _):
                o = spmm(g_, h, "dense")
                return (o / (jnp.abs(o).max() + 1.0)).astype(x0.dtype), None

            h, _ = jax.lax.scan(step, x0, None, length=iters)
            return h

        def timed():
            t0 = time.perf_counter()
            float(jnp.ravel(many(g, x))[0])  # scalar readback — cannot lie
            return time.perf_counter() - t0

        timed()  # compile + warm
        return min(timed(), timed())

    results = {}
    for dd in ("f32", "bf16", "int8"):
        g = build_graph(ei, None, args.n, "gcn", materialize_dense=True,
                        materialize_bcsr=False, dense_dtype=dd)
        t_long = scan_time(g, args.iters)
        t_short = scan_time(g, args.iters // 4)
        per = (t_long - t_short) / (args.iters - args.iters // 4)
        layout = "dense_q" if g.dense_q is not None else f"dense {g.dense.dtype}"
        a_bytes = (args.n * args.n *
                   {"f32": 4, "bf16": 2, "int8": 1}[dd])
        results[dd] = per
        print(f"[{dd:4s}] {per * 1e6:8.1f} us/iter  "
              f"{ei.shape[1] / per / 1e9:6.2f} G edges/s  "
              f"{a_bytes / per / 1e9:6.0f} GB/s adj stream  ({layout})",
              file=sys.stderr)
    print(f"int8 speedup vs f32: {results['f32'] / results['int8']:.2f}x; "
          f"vs bf16: {results['bf16'] / results['int8']:.2f}x", file=sys.stderr)


if __name__ == "__main__":
    main()
