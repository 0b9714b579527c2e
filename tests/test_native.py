"""Native host-library tests: C++ results must match the numpy reference
paths bit-for-bit (CSR) or semantically (sampling, RCM)."""

import numpy as np
import pytest

from glass_tpu import native
from glass_tpu.ops.graph import normalized_edge_weight

pytestmark = pytest.mark.skipif(
    not native.is_available(), reason="native library not built (make -C native)"
)


def rand_graph(rng, n=100, e=400):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])]), n


@pytest.mark.parametrize("aggr", ["sum", "mean", "gcn"])
def test_build_csr_matches_numpy(rng, aggr):
    ei, n = rand_graph(rng)
    row, col, w = native.build_csr(ei, None, n, aggr)
    # numpy reference
    wn = normalized_edge_weight(ei, np.ones(ei.shape[1]), n, aggr)
    order = np.lexsort((ei[1], ei[0]))
    np.testing.assert_array_equal(row, ei[0][order])
    np.testing.assert_array_equal(col, ei[1][order])
    np.testing.assert_allclose(w, wn[order], rtol=1e-6)


def test_rcm_is_permutation_and_reduces_bandwidth(rng):
    # a path graph shuffled: RCM should recover near-optimal bandwidth
    n = 64
    ids = rng.permutation(n)
    src = ids[:-1]
    dst = ids[1:]
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    perm = native.rcm_ordering(ei, n)
    assert sorted(perm.tolist()) == list(range(n))
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    bw = np.abs(inv[ei[0]] - inv[ei[1]]).max()
    assert bw <= 2, f"RCM bandwidth {bw} on a path graph"


def test_negative_sample_validity(rng):
    ei, n = rand_graph(rng, n=50, e=100)
    neg = native.negative_sample(ei, n, 150, seed=7)
    assert neg.shape == (2, 150)
    existing = set(map(tuple, ei.T.tolist()))
    pairs = list(map(tuple, neg.T.tolist()))
    assert len(set(pairs)) == 150  # no duplicate negatives
    for a, b in pairs:
        assert a != b and (a, b) not in existing


def test_induced_subgraphs_matches_numpy(rng):
    ei, n = rand_graph(rng, n=30, e=60)
    pos = np.array([[0, 1, 2, 3, -1], [5, 6, 7, -1, -1]], dtype=np.int64)
    adj = native.induced_subgraph_adj(ei, n, pos)
    assert adj.shape == (2, 5, 5)
    ekeys = set(map(tuple, ei.T.tolist()))
    for s in range(2):
        nodes = pos[s][pos[s] >= 0]
        for j, u in enumerate(nodes):
            for jj, v in enumerate(nodes):
                expected = float((int(u), int(v)) in ekeys)
                # duplicate edges accumulate in both paths; our rand graph may
                # contain dups so compare >0 agreement
                assert (adj[s, j, jj] > 0) == (expected > 0)


def test_graph_build_native_equals_python(rng):
    """build_graph output must not depend on whether the native lib is used."""
    import glass_tpu.native as nat
    from glass_tpu.ops.graph import build_graph

    ei, n = rand_graph(rng)
    g1 = build_graph(ei, None, n, "gcn", materialize_dense=False)
    lib, searched = nat._LIB, nat._SEARCHED
    try:
        nat._LIB, nat._SEARCHED = None, True  # force numpy path
        g2 = build_graph(ei, None, n, "gcn", materialize_dense=False)
    finally:
        nat._LIB, nat._SEARCHED = lib, searched
    np.testing.assert_array_equal(np.asarray(g1.row), np.asarray(g2.row))
    np.testing.assert_array_equal(np.asarray(g1.col), np.asarray(g2.col))
    np.testing.assert_allclose(np.asarray(g1.weight), np.asarray(g2.weight), rtol=1e-6)


def test_band_fill_matches_numpy():
    """Native glass_band_fill == the numpy bincount slab fill (both
    accumulate in f64, sequential order -> identical f32 output)."""
    from glass_tpu import native
    from glass_tpu.ops.pallas_band import BLOCK

    if not native.is_available():
        import pytest

        pytest.skip("native lib unbuilt")
    rng = np.random.default_rng(0)
    n_g, rps, wb = 3, 2, 2
    e = 5000
    row = rng.integers(0, n_g * rps * BLOCK, size=e)
    clo = rng.integers(0, 3, size=n_g).astype(np.int32)
    g = (row // BLOCK) // rps
    col = clo[g] * BLOCK + rng.integers(0, wb * BLOCK, size=e)
    w = rng.normal(size=e)

    out = native.band_fill(row, col, w, rps, wb, clo, n_g)
    assert out is not None and out.shape == (n_g, rps * BLOCK, wb * BLOCK)

    lr = row - g * (rps * BLOCK)
    lc = col - clo[g].astype(np.int64) * BLOCK
    size = n_g * (rps * BLOCK) * (wb * BLOCK)
    flat = (g * (rps * BLOCK) + lr) * (wb * BLOCK) + lc
    ref = np.bincount(flat, weights=w, minlength=size).reshape(
        n_g, rps * BLOCK, wb * BLOCK
    ).astype(np.float32)
    np.testing.assert_array_equal(out, ref)

    # out-of-window edge -> error, not silent corruption
    bad_col = col.copy()
    bad_col[0] = clo[g[0]] * BLOCK + wb * BLOCK  # one past the window
    import pytest

    with pytest.raises(RuntimeError):
        native.band_fill(row, bad_col, w, rps, wb, clo, n_g)


def test_bcsr_fill_matches_numpy():
    """Native glass_bcsr_fill == the numpy bincount wide-chunk fill."""
    from glass_tpu import native

    if not native.is_available():
        import pytest

        pytest.skip("native lib unbuilt")
    rng = np.random.default_rng(1)
    CHUNK, B = 8, 128
    n_store = 4
    e = 4000
    e_dst = rng.integers(0, n_store * CHUNK, size=e)
    row = rng.integers(0, 10 * B, size=e)
    col = rng.integers(0, 10 * B, size=e)
    w = rng.normal(size=e)

    out = native.bcsr_fill(row, col, w, e_dst, CHUNK, n_store)
    assert out is not None and out.shape == (n_store, B, CHUNK * B)

    flat = ((e_dst // CHUNK) * (B * CHUNK * B) + (row % B) * (CHUNK * B)
            + (e_dst % CHUNK) * B + col % B)
    ref = np.bincount(flat, weights=w, minlength=n_store * B * CHUNK * B)\
        .reshape(n_store, B, CHUNK * B).astype(np.float32)
    np.testing.assert_array_equal(out, ref)
