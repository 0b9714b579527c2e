"""Multi-chip scaling-efficiency benchmark (BASELINE.md north star:
edges/s scaling efficiency at 1 chip vs N chips >= 80%).

Runs the sharded GLASS *whole-epoch* program (one dispatch for all steps —
VERDICT round-1 item 6: measure collectives, not per-batch dispatch) over a
('data' x 'graph') mesh for each requested graph-shard count and reports
edges/s and efficiency relative to 1 shard, with and without the halo-overlap
edge split. On real hardware the all-gather halo and psum ride ICI; on a
host-simulated CPU mesh (--force_cpu N) the numbers validate the program
structure (collective count/placement), not the interconnect.

Usage:
  python tools/scaling_bench.py                 # all local devices
  python tools/scaling_bench.py --force_cpu 8   # 8 virtual CPU devices
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _sync(a):
    """Force real completion via scalar readback; block_until_ready can
    resolve before execution through the remote-TPU tunnel (CLAUDE.md)."""
    import jax.numpy as jnp

    return float(jnp.ravel(a)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--force_cpu", type=int, default=0,
                    help="simulate this many CPU devices")
    ap.add_argument("--nodes", type=int, default=20000)
    ap.add_argument("--edges", type=int, default=200000)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.force_cpu)

    import jax.numpy as jnp
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.parallel.mesh import make_mesh
    from glass_tpu.parallel.partition import partition_graph
    from glass_tpu.parallel.train import ShardedTrainer
    from glass_tpu.train.loop import TrainConfig
    from glass_tpu.train.schedule import plateau_init

    rng = np.random.default_rng(0)
    n, e = args.nodes, args.edges
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    nb = args.steps
    pos_b = np.stack([
        np.stack([rng.choice(n, size=20, replace=False)
                  for _ in range(args.batch)])
        for _ in range(nb)
    ])
    y_b = rng.integers(0, 3, size=(nb, args.batch))
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)

    model = GLASS(max_deg=4, hidden_channels=args.hidden, num_layers=args.layers,
                  output_channels=(3,), pools=("size",), dropout=0.0,
                  activation="elu", z_ratio=0.8, jk=True)
    cfg = TrainConfig(lr=1e-3, batch_size=args.batch, loss="ce", use_z=True)

    n_dev = jax.device_count()
    shard_counts = [k for k in [1, 2, 4, 8, 16, 32] if k <= n_dev]
    results: dict = {}
    # ring: ppermute-ring halo exchange (ops.spmm.spmm_ring) instead of the
    # tiled all-gather — evaluated per VERDICT round-1 item 6
    for tag, overlap, ring in (("overlap", True, False),
                               ("no-overlap", False, False),
                               ("ring", True, True)):
        for k in shard_counts:
            mesh = make_mesh(graph_shards=k, data_shards=1,
                             devices=jax.devices()[:k])
            pg = partition_graph(ei, None, n, "gcn", k, overlap=overlap,
                                 ring=ring)
            tr = ShardedTrainer(model, pg, x, cfg, mesh)
            params, opt_state, plateau = tr.init(0, pos_b[0])
            key = jax.random.PRNGKey(0)
            # warm up / compile the epoch program. Sync by scalar readback,
            # not block_until_ready: through the remote-TPU tunnel the latter
            # can resolve before execution finishes (see CLAUDE.md), which
            # would make the efficiency table tunnel noise.
            out = tr.train_epoch(params, opt_state, plateau, key, pos_b, y_b)
            _sync(out[4])
            t0 = time.perf_counter()
            p, o, pl, key, loss = tr.train_epoch(params, opt_state, plateau,
                                                 key, pos_b, y_b)
            _sync(loss)
            dt = (time.perf_counter() - t0) / nb
            # per step: fwd+bwd edge traversals per conv layer (2x2e directed)
            edges_per_step = 2 * 2 * e * args.layers
            eps = edges_per_step / dt
            results[(tag, k)] = eps
            base = results.get((tag, 1), eps)
            eff = eps / (base * k)
            print(f"[{tag}] shards={k}: {dt * 1e3:.2f} ms/step, "
                  f"{eps / 1e6:.1f}M edges/s, efficiency vs 1-shard: "
                  f"{100 * eff:.0f}% (speedup {eps / base:.2f}x)",
                  file=sys.stderr, flush=True)

    best = max(shard_counts)
    print(json.dumps({
        "metric": "scaling_efficiency",
        "value": round(results[("overlap", best)] / (results[("overlap", 1)] * best), 3),
        "unit": f"fraction at {best} shards",
        "vs_baseline": round(results[("overlap", best)] / results[("overlap", 1)], 3),
    }))


if __name__ == "__main__":
    main()
