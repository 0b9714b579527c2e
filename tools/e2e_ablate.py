"""Ablate the 9M-edge train step: which pieces cost what (VERDICT r2 item 2).

Differentially-timed (two scan lengths — cancels the ~27 ms tunnel dispatch
floor) whole-epoch Trainer runs at the bench workload, toggling dropout, the
zero-one labeling, and the compute dtype. The bf16-vs-f32 pair measures the
--compute_dtype speedup end-to-end.

Usage: python tools/e2e_ablate.py
"""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import clustered_graph, _sync, _timed
from glass_tpu.nn.modules import GLASS
from glass_tpu.ops.graph import build_graph
from glass_tpu.train.loop import Trainer, TrainConfig

ei, n = clustered_graph()
rng = np.random.default_rng(0)
graphs = {
    ddt: build_graph(ei, None, n, "gcn", materialize_dense=False,
                     materialize_bcsr=True, dense_dtype=ddt)
    for ddt in ("bf16", "f32", "int8")
}
x = jnp.asarray(rng.integers(0, 16, size=(n, 1)).astype(np.int32))
batch, sub, steps_hi = 6, 32, 512
pos = np.stack([rng.choice(n, size=sub, replace=False)
                for _ in range(batch * steps_hi)])
y = rng.integers(0, 2, size=batch * steps_hi).astype(np.int64)
pos_b = jnp.asarray(pos.reshape(steps_hi, batch, sub))
y_b = jnp.asarray(y.reshape(steps_hi, batch))
lo = steps_hi // 4


def bench_cfg(name, dropout, use_z, ddtype="bf16", dtype="bfloat16"):
    model = GLASS(max_deg=16, hidden_channels=64, num_layers=1,
                  output_channels=(2,), pools=("size",), dropout=dropout,
                  activation="elu", z_ratio=0.75, jk=True, spmm_mode="pallas",
                  dtype=dtype)
    cfg = TrainConfig(lr=1e-3, batch_size=batch, loss="ce", use_z=use_z)
    tr = Trainer(model, graphs[ddtype], x, cfg, donate=False)
    params, opt_state, plateau = tr.init(0, pos_b[0])
    key = jax.random.PRNGKey(1)

    def run(pb, yb):
        return tr.train_epoch(params, opt_state, plateau, key, pb,
                              yb)[-1].reshape(1)

    _sync(run(pos_b[:lo], y_b[:lo]))
    _sync(run(pos_b, y_b))
    t_lo = min(_timed(run, pos_b[:lo], y_b[:lo]) for _ in range(2))
    t_hi = min(_timed(run, pos_b, y_b) for _ in range(2))
    dt = (t_hi - t_lo) / (steps_hi - lo)
    print(f"{name:44s}: {dt * 1e3:7.3f} ms/step = {1 / dt:7.1f} steps/s",
          flush=True)
    return dt


full = bench_cfg("full (dropout .5, z, pallas, bf16)", 0.5, True)
bench_cfg("no dropout", 0.0, True)
bench_cfg("no z labeling", 0.5, False)
bench_cfg("no dropout + no z", 0.0, False)
f32 = bench_cfg("full, f32 end-to-end", 0.5, True, ddtype="f32", dtype=None)
bench_cfg("full, int8 slabs + bf16 body", 0.5, True, ddtype="int8")
print(f"# --compute_dtype bf16 e2e speedup vs f32: {f32 / full:.2f}x",
      flush=True)
