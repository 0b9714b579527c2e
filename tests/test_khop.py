"""k-hop extraction, self-loop graphs, and LP use_loop option."""

import numpy as np
import jax.numpy as jnp

from glass_tpu.data.khop import k_hop_subgraph
from glass_tpu.data.basegraph import BaseGraphData
from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.spmm import spmm


def path_graph(n):
    src = np.arange(n - 1)
    dst = np.arange(1, n)
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])


def test_k_hop_subgraph_hops():
    ei = path_graph(10)
    # hop=0: induced on seeds only
    nodes, sub, seed_pos, mask = k_hop_subgraph([3, 4], 0, ei, 10)
    np.testing.assert_array_equal(nodes, [3, 4])
    assert sub.shape[1] == 2  # 3-4 both directions
    np.testing.assert_array_equal(seed_pos, [0, 1])
    # hop=1 expands by one BFS level
    nodes, sub, seed_pos, _ = k_hop_subgraph([3], 1, ei, 10)
    np.testing.assert_array_equal(nodes, [2, 3, 4])
    assert sub.max() < 3  # relabeled
    # hop=2
    nodes, _, _, _ = k_hop_subgraph([3], 2, ei, 10)
    np.testing.assert_array_equal(nodes, [1, 2, 3, 4, 5])


def test_self_loop_graph_gcn():
    """PyG GCNConv default: loops added before sym-normalization."""
    ei = np.array([[0, 1], [1, 0]])
    g = build_graph(ei, None, 2, "gcn", materialize_dense=True, add_self_loops=True)
    # degrees with loops: [2, 2]; a[0,0] = 1/2, a[0,1] = 1/2
    d = np.asarray(g.dense)
    np.testing.assert_allclose(d, [[0.5, 0.5], [0.5, 0.5]], rtol=1e-6)
    out = np.asarray(spmm(g, jnp.asarray(np.eye(2, dtype=np.float32))))
    np.testing.assert_allclose(out, [[0.5, 0.5], [0.5, 0.5]], rtol=1e-5)


def test_lp_dataset_use_loop(rng):
    ei = np.array([[0, 1, 2, 2], [1, 0, 2, 1]])  # node 2 has a self loop
    base = BaseGraphData(
        x=np.zeros((3, 1), dtype=np.int64), edge_index=ei,
        edge_weight=np.ones(ei.shape[1], dtype=np.float32),
        pos=np.zeros((1, 2), dtype=np.int64), y=np.zeros(1),
        mask=np.zeros(1, dtype=np.int64),
    )
    pos, y = base.get_lp_dataset(rng, use_loop=True)
    # the loop block is the last n rows (this tiny graph has < e non-edges,
    # so fewer negatives precede it — same truncation as PyG)
    loops = pos[-3:]
    np.testing.assert_array_equal(loops, [[0, 0], [1, 1], [2, 2]])
    np.testing.assert_array_equal(y[-3:], [0.0, 0.0, 1.0])
