"""A/B: GSPMD auto-partitioned whole-graph SpMM vs the explicit shard_map path.

VERDICT r4 item 7: the protocol restricts ``sharding='auto'`` (GSPMD) to
``graph_shards == 1`` — node partitioning is the explicit shard_map path's
job. This experiment records WHY with numbers instead of leaving it a scope
choice: annotate the dense adjacency's row dim over 'graph' in a GSPMD jit
of the SAME whole-epoch program, let XLA partition the whole-graph SpMM on
a virtual mesh, and compare

  (a) the collectives XLA inserts (HLO op census),
  (b) whole-epoch step time (differential, 8 virtual CPU devices),
  (c) per-device adjacency bytes,

against the explicit ShardedTrainer (contiguous row blocks + tiled
all-gather halo) and the replicated-graph GSPMD DP mode (AutoTrainer,
what sharding='auto' actually ships).

Run:  python tools/gspmd_graph_ab.py  (forces 8 virtual CPU devices)
"""

from __future__ import annotations

import re
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, ".")

from glass_tpu.nn.modules import GLASS
from glass_tpu.ops.graph import build_graph
from glass_tpu.parallel.mesh import make_mesh
from glass_tpu.parallel.partition import partition_graph
from glass_tpu.parallel.train import ShardedTrainer
from glass_tpu.train.loop import Trainer, TrainConfig

N, E, BATCH, SUB, NB, HID, LAYERS = 2048, 40000, 8, 16, 16, 64, 2


def problem():
    rng = np.random.default_rng(0)
    src = rng.integers(0, N, size=E)
    dst = rng.integers(0, N, size=E)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    x = rng.integers(0, 5, size=(N, 1)).astype(np.int64)
    pos = np.stack([rng.choice(N, size=SUB, replace=False)
                    for _ in range(NB * BATCH)]).reshape(NB, BATCH, SUB)
    y = rng.integers(0, 3, size=(NB, BATCH))
    return ei, x, pos, y


def census(compiled_text: str) -> dict:
    ops = ("all-gather", "all-reduce", "reduce-scatter", "collective-permute",
           "all-to-all")
    return {op: len(re.findall(rf"\b{op}\b.*start|\b{op}\b\(", compiled_text))
            or len(re.findall(rf"{op}", compiled_text)) for op in ops}


def timed_epoch(fn, args, reps=3):
    out = fn(*args)
    float(np.asarray(out[-1]).ravel()[0])  # compile + sync
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(out[-1]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ei, x, pos, y = problem()
    model = GLASS(max_deg=4, hidden_channels=HID, num_layers=LAYERS,
                  output_channels=(3,), pools=("size",), dropout=0.1,
                  activation="elu", z_ratio=0.8, jk=True, spmm_mode="dense")
    cfg = TrainConfig(lr=1e-3, batch_size=BATCH, loss="ce", use_z=True)
    key = jax.random.PRNGKey(0)
    results = {}

    # ---- arm 1: explicit shard_map, graph sharded 8-way (dense row blocks)
    mesh_g = make_mesh(graph_shards=8, data_shards=1)
    pg = partition_graph(ei, None, N, "gcn", 8, materialize_dense=True)
    tr = ShardedTrainer(model, pg, x, cfg, mesh_g)
    params, opt, plat = tr.init(0, pos[0])
    t = timed_epoch(
        lambda *a: tr.train_epoch(*a)[-1:],
        (params, opt, plat, key, jnp.asarray(pos), jnp.asarray(y)),
    )
    hlo = tr._epoch.lower(
        params, opt, plat.lr, key, jnp.asarray(pos), jnp.asarray(y),
        tr.x_padded, *tr.gparts,
    ).compile().as_text()
    results["explicit shard_map (graph=8)"] = (
        t, census(hlo), pg.dense.nbytes // 8)

    # ---- arm 2: GSPMD, dense adjacency rows annotated over 'graph'
    graph = build_graph(ei, None, N, "gcn", materialize_dense=True)
    tr2 = Trainer(model, graph, jnp.asarray(x.astype(np.int32)), cfg,
                  donate=False)
    repl = NamedSharding(mesh_g, P())
    g_shardings = jax.tree_util.tree_map(lambda _: repl, graph)
    g_shardings = g_shardings.replace(
        dense=NamedSharding(mesh_g, P("graph", None)))
    epoch_gspmd = jax.jit(
        tr2._epoch_impl,
        in_shardings=(g_shardings, repl, repl, repl, repl, repl, repl, repl),
        out_shardings=(repl, repl, repl, repl, repl),
    )
    params2, opt2, plat2 = tr2.init(0, jnp.asarray(pos[0]))
    opt2.hyperparams["learning_rate"] = plat2.lr

    t = timed_epoch(
        lambda *a: epoch_gspmd(*a)[-1:],
        (graph, tr2.x, params2, opt2, plat2, key,
         jnp.asarray(pos), jnp.asarray(y)),
    )
    hlo = epoch_gspmd.lower(
        graph, tr2.x, params2, opt2, plat2, key,
        jnp.asarray(pos), jnp.asarray(y),
    ).compile().as_text()
    results["GSPMD dense rows over 'graph'"] = (
        t, census(hlo), graph.dense.nbytes // 8)

    # ---- arm 3: GSPMD DP, replicated graph (what sharding='auto' ships);
    # data axis carries the batch, so use the (1 graph x 8 data) mesh
    from glass_tpu.parallel.auto import AutoTrainer

    mesh_d = make_mesh(graph_shards=1, data_shards=8)
    tr3 = AutoTrainer(model, graph, jnp.asarray(x.astype(np.int32)), cfg,
                      mesh_d)
    params3, opt3, plat3 = tr3.init(0, jnp.asarray(pos[0]))
    t = timed_epoch(
        lambda *a: tr3.train_epoch(*a)[-1:],
        (params3, opt3, plat3, key, jnp.asarray(pos), jnp.asarray(y)),
    )
    opt3.hyperparams["learning_rate"] = plat3.lr
    hlo = tr3._epoch.lower(
        graph, tr3.x, params3, opt3, plat3, key,
        jnp.asarray(pos), jnp.asarray(y),
    ).compile().as_text()
    results["GSPMD DP, graph replicated"] = (t, census(hlo),
                                             graph.dense.nbytes)

    print(f"\n{NB}-batch epoch, n={N}, {ei.shape[1]} directed edges, "
          f"hidden={HID}, {LAYERS} layers, 8 virtual CPU devices")
    for name, (t, c, bytes_dev) in results.items():
        cs = ", ".join(f"{k}:{v}" for k, v in c.items() if v)
        print(f"  {name}: {t * 1e3:.1f} ms/epoch, adjacency/device "
              f"{bytes_dev / 1e6:.1f} MB, collectives [{cs or 'none'}]")


if __name__ == "__main__":
    main()
