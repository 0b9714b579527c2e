"""Benchmark: SpMM training throughput on the current accelerator.

Prints ONE JSON line:
  {"metric": "spmm_edges_per_s", "value": N, "unit": "edges/s", "vs_baseline": R}

The measurement is the hot loop of GLASS training (SURVEY.md §3.1): repeated
whole-graph SpMM (A @ X, hidden=64) on the density-scale benchmark graph,
executed as a single jitted lax.scan so per-dispatch overhead (which would
dominate through a remote-TPU tunnel) is excluded — this is what the training
loop actually runs.

``vs_baseline`` is the speedup over the reference implementation's substrate
measured on this host: torch.sparse COO SpMM (the exact kernel the reference
calls at impl/models.py:164) on CPU, since the reference snapshot targets
CUDA but publishes no numbers and no GPU exists here (BASELINE.md).
"""

import json
import os
import sys
import time

import numpy as np

# Amortize TPU compiles across bench runs (first Mosaic/XLA compile through a
# remote-TPU tunnel can take minutes).
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def load_density_graph():
    """Bundled density graph (4,998 nodes / 59,924 directed edges), falling
    back to a random graph of identical scale if the data files are absent."""
    try:
        from glass_tpu.data.loaders import load_synthetic

        base = load_synthetic("density")
        return base.edge_index, base.n_node
    except FileNotFoundError:
        rng = np.random.default_rng(0)
        n, e = 4998, 29962
        src, dst = rng.integers(0, n, size=e), rng.integers(0, n, size=e)
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
        return ei, n


def bench_glass_tpu(ei, n, hidden=64, iters=200):
    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.ops.spmm import spmm

    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, hidden)).astype(np.float32))

    best = 0.0
    variants = [
        ("dense-f32", "f32", "dense"),
        ("dense-bf16", "bf16", "dense"),
        ("segment", "f32", "segment"),
    ]
    for name, ddtype, mode in variants:
        graph = build_graph(ei, None, n, "gcn", materialize_dense=True,
                            dense_dtype=ddtype)

        @jax.jit
        def many(x0, graph=graph, mode=mode):
            def step(h, _):
                return spmm(graph, h, mode), None

            h, _ = jax.lax.scan(step, x0, None, length=iters)
            return h

        many(x).block_until_ready()  # compile
        t0 = time.perf_counter()
        many(x).block_until_ready()
        dt = (time.perf_counter() - t0) / iters
        eps = graph.n_edge / dt
        print(f"  glass_tpu spmm[{name}]: {dt * 1e6:.1f} us/iter = {eps / 1e9:.3f} G edges/s",
              file=sys.stderr)
        best = max(best, eps)
    return best


def bench_torch_reference(ei, n, hidden=64, iters=20):
    """The reference substrate: torch.sparse COO SpMM on CPU."""
    import torch

    torch.set_num_threads(torch.get_num_threads())
    w = torch.ones(ei.shape[1])
    adj = torch.sparse_coo_tensor(torch.tensor(ei), w, size=(n, n)).coalesce()
    x = torch.randn(n, hidden)
    for _ in range(3):
        y = adj @ x
    t0 = time.perf_counter()
    for _ in range(iters):
        y = adj @ x
    dt = (time.perf_counter() - t0) / iters
    eps = ei.shape[1] / dt
    print(f"  torch-cpu sparse spmm: {dt * 1e6:.1f} us/iter = {eps / 1e9:.3f} G edges/s",
          file=sys.stderr)
    return eps


def main():
    ei, n = load_density_graph()
    print(f"graph: {n} nodes, {ei.shape[1]} directed edges", file=sys.stderr)
    ours = bench_glass_tpu(ei, n)
    theirs = bench_torch_reference(ei, n)
    print(json.dumps({
        "metric": "spmm_edges_per_s",
        "value": round(ours, 1),
        "unit": "edges/s",
        "vs_baseline": round(ours / theirs, 3),
    }))


if __name__ == "__main__":
    main()
