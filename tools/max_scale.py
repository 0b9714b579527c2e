"""Find the largest single-chip trainable graph (VERDICT r4 item 4).

The reference caps out where one GPU's whole-graph torch.sparse SpMM fits
(em_user scale, ~9M directed edges — impl/models.py:164); this probe walks a
clustered-graph ladder (the bench generator's community structure at growing
multiples of em_user scale) through the FULL training step — labeling,
GLASS trunk, pool, head, loss, backward, Adam — on the real chip, recording
at each rung:

- layout choice + host build time (planner, RCM-free: the generator is
  already band-ordered),
- device transfer + first-compile wall (through the remote tunnel this is
  dominated by the slab upload: ~minutes per 100 MB — an environment
  artifact, recorded separately from the chip math),
- training steps/s (differential over two scan lengths, scalar-readback
  synced),
- the HBM budget math (slabs + activations + optimizer state).

Each dispatch stays under ~1 min (the remote worker dies on minutes-long
single dispatches — CLAUDE.md); scan lengths shrink as steps grow.

Usage:
  python tools/max_scale.py --scales 1,4,10,20,40 [--hidden 64] [--remat]

One JSON line per rung to stdout; diagnostics to stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def clustered_graph(scale: float, base_comm=448, csz=128, base_e=4_500_000,
                    intra_frac=0.95):
    """The bench.py community generator at `scale` x em_user size (chain
    cross-links, band-ordered by construction)."""
    rng = np.random.default_rng(0)
    n_comm = int(base_comm * scale)
    e = int(base_e * scale)
    n = n_comm * csz
    intra = int(intra_frac * e)
    ci = rng.integers(0, n_comm, size=intra)
    src_i = (ci * csz + rng.integers(0, csz, size=intra)).astype(np.int64)
    dst_i = (ci * csz + rng.integers(0, csz, size=intra)).astype(np.int64)
    cx = rng.integers(0, n_comm - 1, size=e - intra)
    src_x = (cx * csz + rng.integers(0, csz, size=e - intra)).astype(np.int64)
    dst_x = ((cx + 1) * csz + rng.integers(0, csz, size=e - intra)).astype(np.int64)
    src = np.concatenate([src_i, src_x])
    dst = np.concatenate([dst_i, dst_x])
    return np.stack([np.concatenate([src, dst]),
                     np.concatenate([dst, src])]), n


def _sync(a):
    return float(np.asarray(a).ravel()[0])


def probe_scale(scale: float, hidden: int, steps_hi: int, batch=6,
                sub_size=32, layers=1, dense_dtype="int8"):
    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.train.loop import Trainer, TrainConfig

    rec = {"scale": scale}
    t0 = time.time()
    ei, n = clustered_graph(scale)
    rec["n_node"] = n
    rec["directed_edges"] = int(ei.shape[1])
    rec["t_generate_s"] = round(time.time() - t0, 1)
    print(f"[scale {scale}] {n} nodes, {ei.shape[1] / 1e6:.1f}M directed "
          f"edges (gen {rec['t_generate_s']} s)", file=sys.stderr, flush=True)

    t0 = time.time()
    graph = build_graph(ei, None, n, "gcn", materialize_dense=False,
                        materialize_bcsr=True, dense_dtype=dense_dtype)
    rec["t_layout_build_s"] = round(time.time() - t0, 1)
    if graph.band is not None:
        b = graph.band
        layout_bytes = int(b.slabs.size * b.slabs.dtype.itemsize)
        if b.row_scale is not None:
            layout_bytes += int(b.row_scale.size * b.row_scale.dtype.itemsize)
        rec["layout"] = (f"band(rps={b.rps}, w={b.w_blocks}, "
                         f"groups={b.n_groups}, affine="
                         f"{(b.affine_stride, b.affine_off)})")
    elif graph.bcsr is not None:
        c = graph.bcsr
        layout_bytes = int(c.blocks.size * c.blocks.dtype.itemsize)
        rec["layout"] = f"bcsr({c.nnz_blocks} blocks)"
    else:
        # planner disqualified every materialized layout (HBM cap,
        # GLASS_TPU_LAYOUT_BYTES_CAP_GIB) — the segment path still trains
        layout_bytes = 0
        rec["layout"] = "segment (stored layouts over the planner HBM cap)"
    rec["layout_mb"] = round(layout_bytes / 1e6, 1)
    print(f"[scale {scale}] layout {rec['layout']}: {rec['layout_mb']} MB, "
          f"built in {rec['t_layout_build_s']} s", file=sys.stderr, flush=True)

    # HBM budget math (f32 activations + adam moments on all params; x is
    # int32 ids; slabs as built). The trunk keeps ~4 (n, hidden) live rounds
    # through fwd+bwd per layer at jk=True (empirical from hbm profiles).
    act = n * hidden * 4
    rec["hbm_budget_mb"] = round(
        (layout_bytes + 6 * act + 3 * 4 * hidden * hidden) / 1e6, 1)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(0, 16, size=(n, 1)).astype(np.int32))
    pos_all = rng.integers(0, n, size=(steps_hi, batch, sub_size))
    y_all = rng.integers(0, 2, size=(steps_hi, batch)).astype(np.int64)
    spmm_mode = ("pallas" if (graph.band is not None or graph.bcsr is not None)
                 else "segment")
    model = GLASS(max_deg=16, hidden_channels=hidden, num_layers=layers,
                  output_channels=(2,), pools=("size",), dropout=0.5,
                  activation="elu", z_ratio=0.75, jk=True,
                  spmm_mode=spmm_mode, dtype="bfloat16")
    cfg = TrainConfig(lr=1e-3, batch_size=batch, loss="ce", use_z=True)
    tr = Trainer(model, graph, x, cfg, donate=False)
    params, opt_state, plateau = tr.init(0, jnp.asarray(pos_all[0]))
    key = jax.random.PRNGKey(1)
    lo = max(steps_hi // 4, 1)
    pos_b, y_b = jnp.asarray(pos_all), jnp.asarray(y_all)

    t0 = time.time()
    out = tr.train_epoch(params, opt_state, plateau, key, pos_b[:lo], y_b[:lo])
    _sync(out[-1])
    rec["t_first_dispatch_s"] = round(time.time() - t0, 1)  # transfer+compile
    print(f"[scale {scale}] first dispatch (transfer + compile): "
          f"{rec['t_first_dispatch_s']} s", file=sys.stderr, flush=True)
    out = tr.train_epoch(params, opt_state, plateau, key, pos_b, y_b)
    _sync(out[-1])

    def timed(pb, yb):
        t0 = time.perf_counter()
        o = tr.train_epoch(params, opt_state, plateau, key, pb, yb)
        _sync(o[-1])
        return time.perf_counter() - t0

    t_lo = min(timed(pos_b[:lo], y_b[:lo]) for _ in range(2))
    t_hi = min(timed(pos_b, y_b) for _ in range(2))
    dt = max(t_hi - t_lo, 1e-9) / (steps_hi - lo)
    rec["ms_per_step"] = round(dt * 1e3, 3)
    rec["steps_per_s"] = round(1.0 / dt, 1)
    rec["edges_per_s"] = round(2 * layers * ei.shape[1] / dt / 1e9, 2)
    print(f"[scale {scale}] {rec['ms_per_step']} ms/step = "
          f"{rec['steps_per_s']} steps/s = {rec['edges_per_s']} G model "
          f"edge-traversals/s", file=sys.stderr, flush=True)
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=str, default="1,4,10,20,40")
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--remat", action="store_true")
    args = ap.parse_args()
    if args.remat:
        os.environ["GLASS_TPU_REMAT"] = "1"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    for s in [float(t) for t in args.scales.split(",")]:
        # scan length shrinks with scale to keep every dispatch < ~1 min
        steps_hi = max(16, min(256, int(256 / s)))
        try:
            rec = probe_scale(s, args.hidden, steps_hi)
        except Exception as e:  # record the failing boundary, keep walking
            rec = {"scale": s, "failed": f"{type(e).__name__}: {e}"[:500]}
            print(f"[scale {s}] FAILED: {rec['failed']}", file=sys.stderr,
                  flush=True)
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
