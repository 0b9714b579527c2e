"""Benchmark: SpMM training throughput on the current accelerator.

Prints ONE JSON line:
  {"metric": "spmm_edges_per_s", "value": N, "unit": "edges/s", "vs_baseline": R}

The measurement is the hot loop of GLASS training (SURVEY.md §3.1): repeated
whole-graph SpMM (A @ X, hidden=64), executed as a single jitted lax.scan so
per-dispatch overhead (which would dominate through a remote-TPU tunnel) is
excluded — this is what the training loop actually runs.

Two workloads:
- the bundled density benchmark graph (5k nodes, 60k directed edges — small
  and structure-free; the dense-MXU path wins there), reported to stderr;
- an em_user-scale community-structured graph (57k nodes, 9M directed edges,
  block-sparse after community ordering — the regime real-world graphs reach
  after the RCM pass in native/): the Pallas BCSR kernel's workload, and the
  headline number.

``vs_baseline`` is the speedup over the reference implementation's substrate
measured on the SAME graph on this host: torch.sparse COO SpMM (the exact
kernel the reference calls at impl/models.py:164) on CPU, since the reference
snapshot targets CUDA but publishes no numbers and no GPU exists here
(BASELINE.md).
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


def bench_glass_tpu(ei, n, hidden=64):
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

        def make(iters, graph=graph, mode=mode):
            @jax.jit
            def many(x0):
                def step(h, _):
                    return spmm(graph, h, mode), None

                h, _ = jax.lax.scan(step, x0, None, length=iters)
                return h

            return many

        dt = _diff_timed(make, (x,), 200, 800)
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


def _sync(a):
    """Force REAL completion by reading back one element. On some remote-TPU
    terminals ``block_until_ready`` resolves before the computation actually
    ran (observed after a terminal restart: a 10x8192^3 matmul "completed" in
    0.1 ms); a scalar readback cannot lie."""
    return float(a.ravel()[0])


def _timed(fn, *args):
    t0 = time.perf_counter()
    _sync(fn(*args))
    return time.perf_counter() - t0


def _diff_timed(make_fn, args, lo, hi, tries=3):
    """Per-iteration time via DIFFERENTIAL dispatch timing: build the scan at
    two lengths and divide the wall-clock delta by the iteration delta.

    Round-3 finding: a dispatch through the remote-TPU tunnel carries a
    ~27 ms floor (RTT + readback) regardless of compute, so total/iters at
    iters=100 inflates a 100 us kernel to ~370 us — every round-2 per-iter
    number carried that bias. The difference of two dispatch times cancels
    the floor exactly."""
    f_lo, f_hi = make_fn(lo), make_fn(hi)
    _sync(f_lo(*args))
    _sync(f_hi(*args))
    t_lo = min(_timed(f_lo, *args) for _ in range(tries))
    t_hi = min(_timed(f_hi, *args) for _ in range(tries))
    return max(t_hi - t_lo, 1e-9) / (hi - lo)


def clustered_graph(n_comm=448, csz=128, e=4500000, intra_frac=0.95):
    """em_user-scale synthetic with community structure (cross edges between
    chain-adjacent communities), standing in for an RCM-ordered real graph.
    A chain (no ring wraparound) is what RCM actually produces: a banded
    matrix profile with monotone window starts."""
    rng = np.random.default_rng(0)
    n = n_comm * csz
    intra = int(intra_frac * e)
    ci = rng.integers(0, n_comm, size=intra)
    src_i = ci * csz + rng.integers(0, csz, size=intra)
    dst_i = ci * csz + rng.integers(0, csz, size=intra)
    cx = rng.integers(0, n_comm - 1, size=e - intra)
    src_x = cx * csz + rng.integers(0, csz, size=e - intra)
    dst_x = (cx + 1) * csz + rng.integers(0, csz, size=e - intra)
    src = np.concatenate([src_i, src_x])
    dst = np.concatenate([dst_i, dst_x])
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])]), n


def _traffic_bytes(graph, hidden):
    """Modeled HBM bytes per forward SpMM on a block-sparse layout: the
    adjacency stream (slabs/blocks + scales + metadata, read once per
    iteration), the x panels the kernel DMAs (affine band: one contiguous
    panel per multi-group grid step; per-group windows otherwise; BCSR: one
    column block per stored block), and the f32 output write.

    A deliberately stable *model* for regression tracking, conservative by
    construction: it charges every x panel and the output write to HBM,
    while the compiler may keep the scan carry VMEM-resident (h = n*hidden*4
    fits v5e VMEM at bench scale), so derived roofline fractions CAN exceed
    1.0 — that reads as "the kernel beat the conservative traffic model",
    and a *drop* across rounds is the regression signal."""
    import jax

    adj_leaves = (graph.band if graph.band is not None else graph.bcsr)
    adj = sum(a.nbytes for a in jax.tree_util.tree_leaves(adj_leaves))
    if graph.band is not None:
        b = graph.band
        x_item = 4 if b.slabs.dtype == np.float32 else 2  # kernel x dtype
        if b.affine_stride is not None:
            # one contiguous panel covers a whole rps-group grid step
            panel_blocks = b.w_blocks + (b.rps - 1) * b.affine_stride
            xb = -(-b.n_groups // b.rps) * panel_blocks * 128 * hidden * x_item
        else:
            xb = b.n_groups * b.w_blocks * 128 * hidden * x_item
    else:
        c = graph.bcsr
        x_item = 4 if c.blocks.dtype == np.float32 else 2
        xb = c.nnz_blocks * 128 * hidden * x_item
    out = graph.band.n_node if graph.band is not None else graph.bcsr.n_node
    return adj + xb + out * hidden * 4


# The chip's measured HBM bandwidth span (tools/hbm_probe.py, RESULTS.md
# round 3: XLA copy 660 GB/s .. 2-stream Pallas DMA read 810 GB/s). Roofline
# fractions are computed against the 810 GB/s upper probe — conservative for
# utilization claims, and a stable denominator for regression tracking.
ROOFLINE_GBPS_SPAN = (660.0, 810.0)


def bench_bcsr_large(hidden=64):
    """Block-sparse kernel at em_user scale: f32 and bf16 forward, plus
    training (fwd + transposed-kernel bwd) throughput, all differentially
    timed (see _diff_timed). Returns the best forward edges/s as the
    headline."""
    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.ops.spmm import spmm

    ei, n = clustered_graph()
    print(f"clustered graph: {n} nodes, {ei.shape[1]} directed edges",
          file=sys.stderr)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(n, hidden)).astype(np.float32)
    )

    best = 0.0
    per_dtype = {}
    per_dtype_gbps = {}
    for ddtype in ("f32", "bf16", "int8"):
        graph = build_graph(ei, None, n, "gcn", materialize_dense=False,
                            materialize_bcsr=True, dense_dtype=ddtype)
        if graph.band is not None:
            b = graph.band
            print(f"  layout[{ddtype}]: banded slabs (rps={b.rps}, window="
                  f"{b.w_blocks} blocks, {b.n_groups} groups, affine="
                  f"({b.affine_stride},{b.affine_off}), "
                  f"{b.slabs.size * b.slabs.dtype.itemsize / 1e6:.0f} MB)",
                  file=sys.stderr)
        else:
            nnzb = graph.bcsr.nnz_blocks
            print(f"  layout[{ddtype}]: chunked bcsr, {nnzb} stored 128x128 "
                  f"blocks ({100 * nnzb / graph.bcsr.n_rb**2:.1f}%)",
                  file=sys.stderr)

        def make_fwd(iters, graph=graph):
            @jax.jit
            def many(x0):
                def step(h, _):
                    return spmm(graph, h, "pallas"), None

                h, _ = jax.lax.scan(step, x0, None, length=iters)
                return h

            return many

        dt = _diff_timed(make_fwd, (x,), 200, 800)
        eps = graph.n_edge / dt
        gbps = _traffic_bytes(graph, hidden) / dt / 1e9
        frac = gbps / ROOFLINE_GBPS_SPAN[1]
        print(f"  glass_tpu spmm[pallas-{ddtype}]: {dt * 1e6:.1f} us/iter"
              f" = {eps / 1e9:.3f} G edges/s = {gbps:.0f} GB/s eff"
              f" ({100 * frac:.0f}% of the {ROOFLINE_GBPS_SPAN[1]:.0f} GB/s"
              f" probe)", file=sys.stderr)
        if ddtype in ("f32", "bf16") and frac < 0.5:
            print(f"  WARNING: pallas-{ddtype} at {100 * frac:.0f}% of "
                  f"roofline — utilization regression (or tunnel weather; "
                  f"re-run to confirm)", file=sys.stderr)
        per_dtype[ddtype] = eps
        per_dtype_gbps[ddtype] = gbps
        best = max(best, eps)

        # training: fwd + bwd (dx = A^T @ g through the same kernel);
        # edges/s counts both traversals (VERDICT round-1 item 1)
        def make_grad(iters, graph=graph):
            @jax.jit
            def many(x0):
                def step(h, _):
                    # (.)**2 makes the cotangent depend on the forward
                    # output, so XLA cannot DCE the forward kernel
                    g = jax.grad(
                        lambda v: (spmm(graph, v, "pallas") ** 2).sum()
                    )(h)
                    return g, None

                h, _ = jax.lax.scan(step, x0, None, length=iters)
                return h

            return many

        dt = _diff_timed(make_grad, (x,), 100, 400)
        teps = 2 * graph.n_edge / dt
        print(f"  glass_tpu spmm[pallas-{ddtype}] fwd+bwd: "
              f"{dt * 1e6:.1f} us/iter = {teps / 1e9:.3f} G edges/s "
              f"({100 * teps / (2 * eps):.0f}% of fwd-only)", file=sys.stderr)
    return best, per_dtype, per_dtype_gbps, ei, n


def bench_e2e_training(ei, n, hidden=64, layers=1, batch=6, sub_size=32,
                       steps=512, dense=False, dense_dtype="f32",
                       model_dtype="bfloat16", tag="bf16"):
    """End-to-end GLASS training throughput: the whole-epoch lax.scan the
    protocol actually runs (labeling -> trunk -> pool -> head -> loss ->
    backward -> Adam). Two regimes (VERDICT r2 item 7a + r3 item 5):
    the 9M-edge band workload (dense=False) and the hpo-scale dense-MXU
    workload the real datasets occupy (dense=True).
    Returns (steps/s, model-level fwd+bwd edge-traversals/s)."""
    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.train.loop import Trainer, TrainConfig

    rng = np.random.default_rng(0)
    # the adjacency dtype follows the activation stream: a bf16 model over
    # f32 slabs paid ~0.3 ms/step of pure extra slab bytes (round 4)
    graph = build_graph(ei, None, n, "gcn", materialize_dense=dense,
                        materialize_bcsr=not dense, dense_dtype=dense_dtype)
    x = jnp.asarray(rng.integers(0, 16, size=(n, 1)).astype(np.int32))
    pos = np.stack([rng.choice(n, size=sub_size, replace=False)
                    for _ in range(batch * steps)])
    y = rng.integers(0, 2, size=batch * steps).astype(np.int64)
    pos_b = jnp.asarray(pos.reshape(steps, batch, sub_size))
    y_b = jnp.asarray(y.reshape(steps, batch))

    model = GLASS(max_deg=16, hidden_channels=hidden, num_layers=layers,
                  output_channels=(2,), pools=("size",), dropout=0.5,
                  activation="elu", z_ratio=0.75, jk=True,
                  spmm_mode=("dense" if dense else "pallas"),
                  dtype=(None if model_dtype in (None, "f32") else model_dtype))
    cfg = TrainConfig(lr=1e-3, batch_size=batch, loss="ce", use_z=True)
    tr = Trainer(model, graph, x, cfg, donate=False)
    params, opt_state, plateau = tr.init(0, pos_b[0])
    key = jax.random.PRNGKey(1)

    # differential over two epoch lengths (cancels the ~27 ms dispatch floor)
    lo = steps // 4

    def run_epoch(pb, yb):
        out = tr.train_epoch(params, opt_state, plateau, key, pb, yb)
        _sync(out[-1].reshape(1))
        return out

    out = run_epoch(pos_b[:lo], y_b[:lo])  # compile lo
    out = run_epoch(pos_b, y_b)  # compile hi
    t_lo = min(_timed(lambda: tr.train_epoch(
        params, opt_state, plateau, key, pos_b[:lo], y_b[:lo])[-1].reshape(1))
        for _ in range(2))
    t_hi = min(_timed(lambda: tr.train_epoch(
        params, opt_state, plateau, key, pos_b, y_b)[-1].reshape(1))
        for _ in range(2))
    dt = max(t_hi - t_lo, 1e-9) / (steps - lo)
    sps = 1.0 / dt
    eps = 2 * ei.shape[1] * layers / dt
    print(f"  e2e training (hidden {hidden}, {layers} layer, batch {batch}, "
          f"{tag}): {dt * 1e3:.3f} ms/step = {sps:.1f} steps/s = "
          f"{eps / 1e9:.2f} G model edge-traversals/s", file=sys.stderr)
    return sps, eps


def hpo_graph(n=14587, e_directed=2600000):
    """Unstructured random graph at the real-world (hpo_metab/hpo_neuro)
    scale: 14,587 nodes / ~2.6M directed edges, ~1.2% dense — the regime the
    auto planner routes to the dense-MXU path (reference datasets per
    SURVEY.md §2.6; loaders at /root/reference/datasets.py:127-229)."""
    rng = np.random.default_rng(7)
    e = e_directed // 2
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    return np.stack([np.concatenate([src, dst]),
                     np.concatenate([dst, src])]), n


def _tpu_reachable(timeout_s: float = 180.0) -> bool:
    """Probe device init in a subprocess with a hard timeout. The axon
    remote-TPU tunnel can become unresponsive (observed: jax.devices() hangs
    >20 min); without this guard the bench would hang forever at first
    device touch instead of falling back to CPU."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            timeout=timeout_s, capture_output=True, text=True,
        )
        return "ok" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main():
    import jax

    # read the *configured* platform (jax.default_backend() would itself
    # initialize the backend and hang on a dead tunnel)
    configured = (jax.config.jax_platforms or "").split(",")[0]
    if configured != "cpu" and not _tpu_reachable():
        print("TPU tunnel unresponsive — falling back to CPU "
              "(metric renamed; not comparable to TPU rounds)", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        # CPU: dense-MXU small workload only (the Pallas kernels would run
        # in interpret mode — meaningless to time)
        ei, n = load_density_graph()
        ours = bench_glass_tpu(ei, n)
        theirs = bench_torch_reference(ei, n)
        print(json.dumps({
            "metric": "spmm_edges_per_s_cpu_fallback",
            "value": round(ours, 1),
            "unit": "edges/s",
            "vs_baseline": round(ours / theirs, 3),
        }))
        return

    # small bundled graph: dense-MXU regime (diagnostics)
    ei, n = load_density_graph()
    print(f"density graph: {n} nodes, {ei.shape[1]} directed edges",
          file=sys.stderr)
    small_ours = bench_glass_tpu(ei, n)
    small_theirs = bench_torch_reference(ei, n)
    print(f"  density best vs torch-cpu: {small_ours / small_theirs:.1f}x",
          file=sys.stderr)

    # em_user-scale block-sparse graph: the Pallas BCSR regime (headline)
    ours, per_dtype, per_dtype_gbps, ei_big, n_big = bench_bcsr_large()
    theirs = bench_torch_reference(ei_big, n_big, iters=3)

    # end-to-end training leg on the same 9M-edge graph (VERDICT r2 item 7a);
    # bf16 slabs match the leg's bf16 activation stream
    e2e_sps, e2e_eps = bench_e2e_training(ei_big, n_big, dense_dtype="bf16")

    # hpo-scale dense-MXU regime: the layout the planner routes the real
    # datasets to (VERDICT r3 item 5 — both regimes must be driver-tracked)
    ei_hpo, n_hpo = hpo_graph()
    d_bf16_sps, _ = bench_e2e_training(
        ei_hpo, n_hpo, hidden=64, layers=2, batch=59, sub_size=16, steps=256,
        dense=True, dense_dtype="bf16", tag="dense bf16")
    d_int8_sps, _ = bench_e2e_training(
        ei_hpo, n_hpo, hidden=64, layers=2, batch=59, sub_size=16, steps=256,
        dense=True, dense_dtype="int8", tag="dense int8")

    print(json.dumps({
        "metric": "spmm_edges_per_s",
        "value": round(ours, 1),
        "unit": "edges/s",
        "vs_baseline": round(ours / theirs, 3),
        "e2e_train_steps_per_s": round(e2e_sps, 1),
        "e2e_train_edges_per_s": round(e2e_eps, 1),
        "e2e_dense_bf16_steps_per_s": round(d_bf16_sps, 1),
        "e2e_dense_int8_steps_per_s": round(d_int8_sps, 1),
        "per_dtype_edges_per_s": {k: round(v, 1) for k, v in per_dtype.items()},
        # modeled HBM traffic / measured time, vs the hbm_probe upper bound
        # (VERDICT r4 item 8: utilization regressions stay visible even when
        # absolute edges/s drift with tunnel weather)
        "per_dtype_effective_gbps": {
            k: round(v, 1) for k, v in per_dtype_gbps.items()
        },
        "per_dtype_frac_of_roofline": {
            k: round(v / ROOFLINE_GBPS_SPAN[1], 3)
            for k, v in per_dtype_gbps.items()
        },
        "roofline_gbps_span": list(ROOFLINE_GBPS_SPAN),
        "density_vs_torch_cpu": round(small_ours / small_theirs, 3),
    }))


if __name__ == "__main__":
    main()
