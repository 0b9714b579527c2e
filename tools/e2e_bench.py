"""End-to-end GLASS training-step throughput at production scale.

Measures the FULL training step (labeling -> trunk -> pool -> head -> loss ->
backward -> Adam) as the whole-epoch lax.scan program the protocol actually
runs, at em_user scale (57k nodes / 9M directed edges, the largest GLASS
dataset; reference: datasets.py + config/em_user.yml — gcn aggr, hidden 64,
1 conv layer, batch 6, size pool, dropout 0.5). Reports steps/s and
model-level edge-traversals/s (fwd+bwd) for the f32 and bf16-mixed-precision
activation streams.

Usage: python tools/e2e_bench.py [--steps 256] [--hidden 64] [--layers 1]
"""

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
    ap.add_argument("--steps", type=int, default=256, help="scan steps per dispatch")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=1)
    ap.add_argument("--batch", type=int, default=6)
    ap.add_argument("--sub_size", type=int, default=32)
    ap.add_argument("--dtypes", type=str, default="f32,bf16")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from bench import clustered_graph
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.train.loop import Trainer, TrainConfig

    ei, n = clustered_graph()
    print(f"graph: {n} nodes, {ei.shape[1]} directed edges; "
          f"hidden {args.hidden}, layers {args.layers}, batch {args.batch}, "
          f"backend {jax.default_backend()}", file=sys.stderr)

    rng = np.random.default_rng(0)
    graphs = {}  # per adjacency dtype (follows the activation stream)
    x = jnp.asarray(rng.integers(0, 16, size=(n, 1)).astype(np.int32))
    pos = np.stack([rng.choice(n, size=args.sub_size, replace=False)
                    for _ in range(args.batch * args.steps)])
    y = rng.integers(0, 2, size=args.batch * args.steps).astype(np.int64)
    pos_b = jnp.asarray(pos.reshape(args.steps, args.batch, args.sub_size))
    y_b = jnp.asarray(y.reshape(args.steps, args.batch))

    for dt in args.dtypes.split(","):
        # the adjacency dtype follows the activation stream (a bf16 model
        # over f32 slabs pays ~0.3 ms/step of pure extra slab bytes —
        # RESULTS.md round 4, the bench.py band-leg fix)
        adt = "f32" if dt in ("f32", "float32") else "bf16"
        if adt not in graphs:
            graphs[adt] = build_graph(ei, None, n, "gcn",
                                      materialize_dense=False,
                                      materialize_bcsr=True, dense_dtype=adt)
        graph = graphs[adt]
        model = GLASS(
            max_deg=16, hidden_channels=args.hidden, num_layers=args.layers,
            output_channels=(2,), pools=("size",), dropout=0.5,
            activation="elu", z_ratio=0.75, jk=True, spmm_mode="pallas",
            dtype=("bfloat16" if dt in ("bf16", "bfloat16") else None),
        )
        cfg = TrainConfig(lr=1e-3, batch_size=args.batch, loss="ce", use_z=True)
        tr = Trainer(model, graph, x, cfg, donate=False)
        params, opt_state, plateau = tr.init(0, pos_b[0])
        key = jax.random.PRNGKey(1)

        out = tr.train_epoch(params, opt_state, plateau, key, pos_b, y_b)
        float(out[-1])  # compile + warm (scalar readback = real completion)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            out = tr.train_epoch(params, opt_state, plateau, key, pos_b, y_b)
            float(out[-1])  # readback-sync: block_until_ready can lie (bench.py _sync)
            best = min(best, time.perf_counter() - t0)
        dt_step = best / args.steps
        # model-level edge traversals: fwd + bwd per conv layer
        eps = 2 * ei.shape[1] * args.layers / dt_step
        print(f"[{dt}] {dt_step * 1e3:.3f} ms/step = {1 / dt_step:.1f} steps/s"
              f" = {eps / 1e9:.2f} G model edge-traversals/s"
              f" (loss {float(out[-1]):.4f})", file=sys.stderr)


if __name__ == "__main__":
    main()
