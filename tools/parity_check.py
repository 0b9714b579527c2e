"""Activation-parity harness: identical weights into the flax GLASS model
and the independent torch oracle; reports per-stage max abs diffs on a real
dataset (the BASELINE "match per-layer activations allclose" gate, run with
dropout off).

Usage: python tools/parity_check.py --dataset density [--aggr gcn] [--layers 2]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dataset", default="density")
    ap.add_argument("--aggr", default="gcn")
    ap.add_argument("--layers", type=int, default=2)
    ap.add_argument("--hidden", type=int, default=16)
    ap.add_argument("--pool", default="size")
    ap.add_argument("--z_ratio", type=float, default=0.8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tol", type=float, default=2e-3)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # f32-exact matmuls
    import jax.numpy as jnp
    import torch

    from glass_tpu.data.loaders import load_dataset
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.ops.labeling import max_zero_one
    from glass_tpu.nn.modules import GLASS
    from glass_tpu.testing import oracle

    rng = np.random.default_rng(0)
    base = load_dataset(args.dataset, rng)
    base.set_degree_feature()
    n = base.n_node
    graph = build_graph(base.edge_index, base.edge_weight, n, args.aggr,
                        materialize_dense=False)
    pos = base.pos[rng.permutation(base.pos.shape[0])[: args.batch]]
    x = jnp.asarray(base.x.astype(np.int32))
    z = max_zero_one(jnp.asarray(pos), n)

    model = GLASS(max_deg=base.max_deg, hidden_channels=args.hidden,
                  num_layers=args.layers, output_channels=(3,),
                  pools=(args.pool,), dropout=0.0, activation="elu",
                  z_ratio=args.z_ratio, jk=True)
    params = model.init(jax.random.PRNGKey(0), graph, x, jnp.asarray(pos), z)
    p = jax.tree.map(np.asarray, params["params"])

    # flax side: trunk + full model
    trunk_out = model.apply(params, graph, x, z, method=GLASS.node_emb)
    logits = model.apply(params, graph, x, jnp.asarray(pos), z)

    # oracle side
    adj = oracle.t_adj(base.edge_index, n, args.aggr)
    t_trunk = oracle.t_embzgconv(base.x[:, 0], np.asarray(z), adj, p["conv"],
                                 args.layers, args.z_ratio,
                                 torch.nn.functional.elu)
    t_logits = oracle.t_glass(base.x[:, 0], np.asarray(z), pos,
                              base.edge_index, n, args.aggr, p, args.layers,
                              args.z_ratio, args.pool)

    d_trunk = float(np.abs(np.asarray(trunk_out) - t_trunk.numpy()).max())
    d_logits = float(np.abs(np.asarray(logits) - t_logits.numpy()).max())
    scale = float(np.abs(t_logits.numpy()).max())
    print(f"dataset={args.dataset} aggr={args.aggr} layers={args.layers} "
          f"hidden={args.hidden} pool={args.pool}")
    print(f"trunk activations max|diff| = {d_trunk:.3e}")
    print(f"logits max|diff| = {d_logits:.3e} (scale {scale:.3f})")
    ok = d_trunk < args.tol and d_logits < args.tol * max(scale, 1.0)
    print("PARITY OK" if ok else "PARITY FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
