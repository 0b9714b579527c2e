"""Multi-process (multi-host) smoke run: bootstrap + one sharded step/epoch.

SURVEY.md §2.4 names the multi-host runtime init (``jax.distributed.initialize``
per host) as a first-class component; the reference framework has no analogue
(its entire device story is a CUDA index, reference impl/config.py:3-19). This
module makes the bootstrap *executable and testable anywhere*:

- On a real TPU pod slice, run the normal CLIs with ``--coordinator`` /
  ``--num_processes`` / ``--process_id`` per host (or rely on jax's TPU
  autodetection by passing none of them) — the ('data','graph') mesh then
  spans all hosts' chips and the same shard_map programs run with
  cross-process ICI/DCN collectives.
- Off-TPU, ``python -m glass_tpu.parallel.multihost`` forms a real N-process
  jax cluster over CPU devices (gloo collectives) and runs one sharded train
  step + one whole-epoch scan, printing losses for parity checks. The
  two-process test in tests/test_parallel.py asserts these equal the
  single-process values to float tolerance.

The smoke problem is deliberately identical on every process (same seeds):
in multi-process jax, uncommitted host inputs passed to a jitted shard_map
program are valid exactly when every process supplies the same value — each
process contributes the shards its addressable devices own.
"""

from __future__ import annotations

import argparse

import numpy as np


def smoke_problem(seed: int = 0):
    """The deterministic toy problem every process builds identically."""
    rng = np.random.default_rng(seed)
    n, e = 64, 256
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    batch, sub_len = 4, 4
    pos = np.stack(
        [rng.choice(n, size=sub_len, replace=False) for _ in range(batch)]
    )
    y = rng.integers(0, 3, size=batch)
    x = rng.integers(0, 5, size=(n, 1)).astype(np.int64)
    return ei, n, x, pos, y


def run_smoke(graph_shards: int, data_shards: int, devices=None) -> dict:
    """One sharded train step + one whole-epoch scan on the smoke problem.

    Returns {'step_loss', 'epoch_loss'} as floats (both are replicated
    scalars, so they are readable on every process of a multi-process run).
    """
    import jax

    from glass_tpu.nn.modules import GLASS
    from glass_tpu.parallel.mesh import make_mesh
    from glass_tpu.parallel.partition import partition_graph
    from glass_tpu.parallel.train import ShardedTrainer
    from glass_tpu.train.loop import TrainConfig

    ei, n, x, pos, y = smoke_problem()
    model = GLASS(
        max_deg=4, hidden_channels=8, num_layers=2, output_channels=(3,),
        pools=("size",), dropout=0.1, activation="elu", z_ratio=0.8, jk=True,
    )
    cfg = TrainConfig(lr=1e-3, batch_size=pos.shape[0], loss="ce", use_z=True)
    mesh = make_mesh(graph_shards=graph_shards, data_shards=data_shards,
                     devices=devices)
    pg = partition_graph(ei, None, n, "gcn", graph_shards)
    trainer = ShardedTrainer(model, pg, x, cfg, mesh)
    params, opt_state, plateau = trainer.init(0, pos[: cfg.batch_size])
    params, opt_state, loss = trainer.train_step(
        params, opt_state, plateau.lr, jax.random.PRNGKey(0), pos, y
    )
    params, opt_state, plateau, _, epoch_loss = trainer.train_epoch(
        params, opt_state, plateau, jax.random.PRNGKey(1), pos[None], y[None]
    )
    return {"step_loss": float(loss), "epoch_loss": float(epoch_loss)}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--coordinator", type=str, default=None,
                    help="host:port of process 0 (None = jax autodetection)")
    ap.add_argument("--num_processes", type=int, default=None)
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--cpu_collectives", type=str, default=None,
                    choices=["gloo", "mpi"],
                    help="off-TPU: CPU cross-process collectives backend")
    ap.add_argument("--local_devices", type=int, default=None,
                    help="off-TPU: CPU device count for THIS process")
    ap.add_argument("--graph_shards", type=int, default=1)
    ap.add_argument("--data_shards", type=int, default=None)
    args = ap.parse_args(argv)

    from glass_tpu.parallel.mesh import initialize_distributed

    initialize_distributed(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
        cpu_collectives=args.cpu_collectives,
        local_cpu_devices=args.local_devices,
    )
    import jax

    pid = jax.process_index()
    print(f"[p{pid}] processes={jax.process_count()} "
          f"devices={jax.device_count()} local={jax.local_device_count()}",
          flush=True)
    out = run_smoke(args.graph_shards, args.data_shards)
    print(f"[p{pid}] step_loss={out['step_loss']:.10f} "
          f"epoch_loss={out['epoch_loss']:.10f}", flush=True)
    jax.distributed.shutdown()
    return out


if __name__ == "__main__":
    main()
