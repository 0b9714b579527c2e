"""Banded-slab Pallas SpMM kernel tests (interpret mode on CPU; the same
kernel compiles via Mosaic on TPU — verified in the bench drive)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.spmm import spmm
from glass_tpu.ops.pallas_band import (
    BLOCK,
    band_spmm,
    band_stats,
    build_band,
)


def rand_graph(rng, n, e):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])


def chain_graph(rng, n_comm, csz, e, intra_frac=0.9):
    """Chain of communities (the RCM-ordered regime the kernel targets)."""
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


@pytest.mark.parametrize("rps", [1, 2, 4])
@pytest.mark.parametrize("n,e", [(300, 1500), (130, 200)])
def test_band_matches_dense(rng, n, e, rps):
    ei = rand_graph(rng, n, e)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    band = build_band(np.asarray(g.row), np.asarray(g.col),
                      np.asarray(g.weight), n, rps=rps)
    out = np.asarray(band_spmm(band, x, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_band_window_is_narrow_on_chain(rng):
    """On a community chain the window must cover only adjacent communities,
    not the whole matrix (the point of the layout)."""
    ei, n = chain_graph(rng, n_comm=8, csz=BLOCK, e=4000)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    w, clo, _, n_g = band_stats(np.asarray(g.row), np.asarray(g.col),
                                np.asarray(g.weight), n, rps=1)
    assert w <= 3  # {c-1, c, c+1}
    assert n_g == 8
    band = build_band(np.asarray(g.row), np.asarray(g.col),
                      np.asarray(g.weight), n, rps=2)
    assert band.w_blocks <= 4
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    out = np.asarray(band_spmm(band, x, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_band_window_clamped_at_right_edge(rng):
    """A window near the last column block is shifted left so the x DMA
    stays in bounds; results must be unaffected."""
    n = 4 * BLOCK
    # edges concentrated in the LAST community only
    ei = rand_graph(rng, BLOCK, 400) + 3 * BLOCK
    g = build_graph(ei, None, n, "sum", materialize_dense=True)
    band = build_band(np.asarray(g.row), np.asarray(g.col),
                      np.asarray(g.weight), n, rps=1)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    out = np.asarray(band_spmm(band, x, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[: 3 * BLOCK], 0.0)


def test_band_empty_rows(rng):
    """Row-block groups with no edges produce zero rows."""
    n = 6 * BLOCK
    ei = rand_graph(rng, BLOCK, 300)  # edges only in the first block
    g = build_graph(ei, None, n, "sum", materialize_dense=True)
    band = build_band(np.asarray(g.row), np.asarray(g.col),
                      np.asarray(g.weight), n, rps=2)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    out = np.asarray(band_spmm(band, x, interpret=True))
    ref = np.asarray(spmm(g, x, "dense"))
    np.testing.assert_allclose(out[BLOCK:], 0.0)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_band_gate_selects_band_on_chain(rng):
    """build_graph's auto gate must pick the banded layout for a community
    chain and keep chunked BCSR for graphs with no band structure."""
    ei, n = chain_graph(rng, n_comm=8, csz=BLOCK, e=6000)
    g = build_graph(ei, None, n, "gcn", materialize_dense=False,
                    materialize_bcsr=True)
    assert g.band is not None and g.bcsr is None
    assert g.band_t is g.band  # gcn is symmetric: shared arrays
    # scattered graph over many blocks with near-zero fill: every 128x128
    # block would hold ~1 edge, so the auto planner (now scoring segment and
    # dense candidates too) rightly declines any materialized layout — the
    # gather/segment path streams 1.2k edges in ~80 us, 30x under BCSR's
    # modeled per-chunk cost. Forcing bcsr still materializes it.
    rng2 = np.random.default_rng(3)
    n2 = 64 * BLOCK
    ei2 = rand_graph(rng2, n2, 600)
    g2 = build_graph(ei2, None, n2, "gcn", materialize_dense=False,
                     materialize_bcsr=True)
    assert g2.band is None and g2.bcsr is None and g2.dense is None
    g2f = build_graph(ei2, None, n2, "gcn", materialize_dense=False,
                      materialize_bcsr=True, sparse_layout="bcsr")
    assert g2f.bcsr is not None


def test_band_gradient_matches_dense(rng):
    """Training through the band path differentiates (custom VJP: A^T @ g),
    for both symmetric (shared layout) and asymmetric normalizations."""
    ei, n = chain_graph(rng, n_comm=4, csz=BLOCK, e=3000)
    x = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    for aggr in ("gcn", "mean"):
        g = build_graph(ei, None, n, aggr, materialize_dense=True,
                        materialize_bcsr=True, sparse_layout="band")
        assert g.band is not None
        if aggr == "mean":
            assert g.band_t is not g.band
        gp = jax.grad(lambda x: (spmm(g, x, "pallas") ** 2).sum())(x)
        gd = jax.grad(lambda x: (spmm(g, x, "dense") ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   rtol=1e-3, atol=1e-4)


def test_band_bf16(rng):
    """bf16 slabs: x carried in bf16, f32 accumulation; within bf16 rounding
    of the exact dense result."""
    ei, n = chain_graph(rng, n_comm=4, csz=BLOCK, e=3000)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True,
                    materialize_bcsr=True, sparse_layout="band",
                    dense_dtype="bf16")
    assert g.band.slabs.dtype == jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = np.asarray(spmm(build_graph(ei, None, n, "gcn",
                                      materialize_dense=True), x, "dense"))
    out = np.asarray(spmm(g, x, "pallas"))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


@pytest.mark.parametrize("stripes", [1, 2, 4])
def test_band_streamed_variants_match_dense(rng, stripes, monkeypatch):
    """The streamed-x variants (auto-pipelined slab at stripes=1, manual
    parallel-DMA slab otherwise) compute the same result as the
    whole-x-in-VMEM variant (forced via a tiny VMEM budget)."""
    import glass_tpu.ops.pallas_band as pb

    ei, n = chain_graph(rng, n_comm=6, csz=BLOCK, e=4000)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    band = build_band(np.asarray(g.row), np.asarray(g.col),
                      np.asarray(g.weight), n, rps=2)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    monkeypatch.setattr(pb, "_VMEM_BUDGET", 1)  # force the streamed paths
    pb.band_spmm.clear_cache()
    try:
        out = np.asarray(band_spmm(band, x, interpret=True, stripes=stripes))
    finally:
        pb.band_spmm.clear_cache()  # don't leak streamed traces
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def outlier_chain_graph(rng, n_comm=8, csz=BLOCK, e=4000, n_far=200):
    """Community chain plus a few far-off-band edges (the component-dataset
    profile: narrow median window, a handful of wide rows)."""
    ei, n = chain_graph(rng, n_comm, csz, e)
    src = rng.integers(0, csz, size=n_far)  # first community ...
    dst = (n_comm - 1) * csz + rng.integers(0, csz, size=n_far)  # ... to last
    far = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    return np.concatenate([ei, far], axis=1), n


def test_plan_windows_fixed_width(rng):
    """plan_windows picks the densest fixed-width window per group and its
    in_band mask covers exactly the edges inside the window."""
    from glass_tpu.ops.pallas_band import plan_windows

    ei, n = outlier_chain_graph(rng)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    r, c, w = np.asarray(g.row), np.asarray(g.col), np.asarray(g.weight)
    clo, in_band = plan_windows(r, c, w, n, rps=1, w=3)
    keep = w != 0
    cb = c // BLOCK
    grp = r // BLOCK
    expect = keep & (cb >= clo[grp]) & (cb < clo[grp] + 3)
    np.testing.assert_array_equal(in_band, expect)
    assert not in_band[~keep].any()
    # the chain mass (>= 90% of edges) stays in-band
    assert in_band.sum() >= 0.8 * keep.sum()


def test_hybrid_matches_dense_forward_and_grad(rng):
    """sparse_layout='hybrid': band + outlier BCSR summed == dense, and the
    custom VJPs compose (dx = A_band^T g + A_out^T g = A^T g)."""
    ei, n = outlier_chain_graph(rng)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    for aggr in ("gcn", "mean"):
        g = build_graph(ei, None, n, aggr, materialize_dense=True,
                        materialize_bcsr=True, sparse_layout="hybrid")
        assert g.band is not None and g.bcsr is not None
        if aggr == "gcn":
            assert g.band_t is g.band and g.bcsr_t is g.bcsr
        else:
            assert g.band_t is not g.band
        out = np.asarray(spmm(g, x, "pallas"))
        ref = np.asarray(spmm(g, x, "dense"))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)
        gp = jax.grad(lambda x: (spmm(g, x, "pallas") ** 2).sum())(x)
        gd = jax.grad(lambda x: (spmm(g, x, "dense") ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gd),
                                   rtol=1e-3, atol=1e-4)


def test_hybrid_band_carries_the_bulk(rng):
    """The hybrid split routes the chain mass through the band and only the
    far edges through BCSR (the point of the layout: the BCSR side stays a
    few blocks)."""
    ei, n = outlier_chain_graph(rng, n_comm=12, e=8000, n_far=150)
    g = build_graph(ei, None, n, "gcn", materialize_bcsr=True,
                    sparse_layout="hybrid")
    n_rb = -(-n // BLOCK)
    band_bytes = g.band.slabs.size
    bcsr_blocks = g.bcsr.blocks.shape[0]
    assert g.band.w_blocks < n_rb  # window did not blow up to full width
    assert bcsr_blocks * BLOCK * BLOCK < band_bytes  # residue is the minority


def test_band_nondivisible_rows_and_features(rng):
    """n_node not a multiple of 128*rps and H not a multiple of 128: padding
    rows/lanes must be inert and sliced off."""
    n = 3 * BLOCK + 37
    ei = rand_graph(rng, n, 2500)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    band = build_band(np.asarray(g.row), np.asarray(g.col),
                      np.asarray(g.weight), n, rps=2)
    x = jnp.asarray(rng.normal(size=(n, 19)).astype(np.float32))
    out = np.asarray(band_spmm(band, x, interpret=True))
    ref = np.asarray(spmm(g, x, "dense"))
    assert out.shape == (n, 19)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_asymmetric_infeasible_transpose_falls_back_to_bcsr():
    """A graph whose forward profile is banded but whose transpose's window
    spans every column block must NOT materialize a full-width transposed
    band (GB-scale slabs): build_graph falls back to BCSR for both
    directions. Regression: the feasibility check used to plan the transpose
    with forced 'band', which always returns band, making the fallback dead
    and the first backward pass OOM."""
    rng = np.random.default_rng(0)
    n = 200 * 128  # 200 column blocks: a full-width band is VMEM-infeasible
    src = np.arange(n)
    dst = 100 * 128 + rng.integers(0, 128, size=n)  # all into one block
    ei = np.stack([src, dst])
    g = build_graph(ei, None, n, "sum", materialize_dense=False,
                    materialize_bcsr=True)
    assert g.band is None and g.band_t is None
    assert g.bcsr is not None and g.bcsr_t is not None

    # and the planner itself: forward auto-plan may be band, transpose not
    from glass_tpu.ops.graph import _plan_block_sparse

    w = np.ones(n, dtype=np.float32)
    kind_t, _, _ = _plan_block_sparse(dst, src, w, n, "f32", None, "auto", False)
    assert kind_t != "band"


def _dense_of(r, c, w, nr, nc):
    d = np.zeros((nr, nc), np.float32)
    np.add.at(d, (np.asarray(r), np.asarray(c)), np.asarray(w))
    return d


def test_band_rectangular_matches_dense(rng):
    """Rectangular layouts (n_col != row count) — the per-shard forward
    layouts are local-rows x global-cols (parallel/partition.py)."""
    nr, nc, e = 300, 520, 4000
    r = rng.integers(0, nr, e)
    c = np.clip((r * nc // nr) + rng.integers(-60, 60, e), 0, nc - 1)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(nc, 48)).astype(np.float32))
    band = build_band(r, c, w, nr, rps=1, n_col=nc)
    out = np.asarray(band_spmm(band, x, interpret=True))
    assert out.shape == (nr, 48)
    np.testing.assert_allclose(out, _dense_of(r, c, w, nr, nc) @ np.asarray(x),
                               rtol=1e-4, atol=1e-4)


def test_band_trimmed_row_range_matches_dense(rng):
    """Row-range-trimmed layouts store only the occupied group range and
    scatter the computed rows back via the traced g_lo offset — the
    per-shard transposed layouts' storage/compute saving."""
    nr, nc, e = 1280, 520, 4000  # 10 row blocks, rps=2 -> 5 groups
    r = rng.integers(2 * 2 * BLOCK, 4 * 2 * BLOCK, e)  # groups [2, 4) only
    c = rng.integers(0, nc, e)
    w = rng.normal(size=e).astype(np.float32)
    x = jnp.asarray(rng.normal(size=(nc, 32)).astype(np.float32))
    band = build_band(r, c, w, nr, rps=2, n_col=nc, trim_groups=(2, 2))
    assert band.n_groups == 2 and band.total_groups == 5
    assert int(band.g_lo) == 2
    out = np.asarray(band_spmm(band, x, interpret=True))
    assert out.shape == (nr, 32)
    np.testing.assert_allclose(out, _dense_of(r, c, w, nr, nc) @ np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    # edges outside the trimmed range must be rejected, not silently dropped
    with pytest.raises(ValueError):
        build_band(np.array([0]), np.array([0]), np.array([1.0]), nr,
                   rps=2, n_col=nc, trim_groups=(2, 2))


def test_band_rectangular_gradient(rng):
    """dx through a rectangular fwd/trimmed bwd layout pair equals the dense
    A^T @ g (the sharded path's VJP structure, minus the collectives)."""
    from glass_tpu.ops.graph import Graph

    nr, nc, e = 256, 512, 3000
    r = rng.integers(0, nr, e)
    c = rng.integers(0, nc, e)
    w = rng.normal(size=e).astype(np.float32)
    fwd = build_band(r, c, w, nr, rps=1, n_col=nc)
    # transposed layout: nc rows x nr cols, trimmed to its occupied range
    g_all = (c // BLOCK) // 1
    trim = (int(g_all.min()), int(g_all.max() - g_all.min() + 1))
    bwd = build_band(c, r, w, nc, rps=1, n_col=nr, trim_groups=trim)
    graph = Graph(row=jnp.zeros(1, jnp.int32), col=jnp.zeros(1, jnp.int32),
                  weight=jnp.zeros(1), dense=None, n_node=nr, n_edge=e,
                  band=fwd, band_t=bwd)
    from glass_tpu.ops.pallas_band import spmm_band

    x = jnp.asarray(rng.normal(size=(nc, 24)).astype(np.float32))
    out = np.asarray(spmm_band(graph, x))
    d = _dense_of(r, c, w, nr, nc)
    np.testing.assert_allclose(out, d @ np.asarray(x), rtol=1e-4, atol=1e-4)
    grad = np.asarray(jax.grad(lambda v: (spmm_band(graph, v) ** 2).sum())(x))
    ref_grad = 2 * d.T @ (d @ np.asarray(x))
    np.testing.assert_allclose(grad, ref_grad, rtol=1e-3, atol=1e-3)


def test_band_multi_group_kernel_matches_dense(rng):
    """The gps>1 (multi-group slab block) kernel variant — the round-3
    roofline fix — must match the dense reference exactly. n=2048, rps=1
    gives n_g=16 groups, so _pick_gps selects a >1 divisor."""
    from glass_tpu.ops.pallas_band import (
        _pick_gps, _lane_pad, build_band, band_spmm, BLOCK,
    )

    n, e = 2048, 12000
    src = rng.integers(0, n, size=e)
    dst = np.clip(src + rng.integers(-150, 150, size=e), 0, n - 1)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    r, c, w = (np.asarray(a) for a in (g.row, g.col, g.weight))
    band = build_band(r, c, w, n, rps=1)
    h = 64
    slab_unit = band.rps * BLOCK * band.w_blocks * BLOCK * 4
    out_unit = band.rps * BLOCK * _lane_pad(h) * 4
    gps = _pick_gps(band.n_groups, 2 * slab_unit + 2 * out_unit,
                    band.n_cb * BLOCK * _lane_pad(h) * 4)
    assert gps > 1, f"expected a multi-group pick for n_g={band.n_groups}"
    x = rng.normal(size=(n, h)).astype(np.float32)
    out = np.asarray(band_spmm(band, jnp.asarray(x), interpret=True))
    ref = np.asarray(g.dense) @ x
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("rps,gps_expected_min", [(1, 2), (2, 1)])
def test_band_affine_kernel_matches_dense(rng, rps, gps_expected_min):
    """Affine (block-DIA) layout + static multi-group kernel vs dense,
    including the top-edge negative-off padding and bottom-edge window
    overhang the affine law produces."""
    from glass_tpu.ops.pallas_band import affine_fit, build_band, band_spmm

    n, e = 1920, 11000  # 15 row blocks — not a multiple of gps candidates
    src = rng.integers(0, n, size=e)
    dst = np.clip(src + rng.integers(-140, 140, size=e), 0, n - 1)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    r, c, w = (np.asarray(a) for a in (g.row, g.col, g.weight))
    fit = affine_fit(r, c, w, n, rps)
    assert fit is not None
    stride, off, w_aff = fit
    band = build_band(r, c, w, n, rps=rps, affine=fit)
    assert band.affine_stride == stride and band.affine_off == off
    x = rng.normal(size=(n, 48)).astype(np.float32)
    out = np.asarray(band_spmm(band, jnp.asarray(x), interpret=True))
    ref = np.asarray(g.dense) @ x
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_band_affine_differentiable(rng):
    """spmm_band through a Graph whose band layout is affine: forward and
    custom-VJP backward match the dense reference."""
    import jax
    from glass_tpu.ops.spmm import spmm

    n, e = 1536, 9000
    src = rng.integers(0, n, size=e)
    dst = np.clip(src + rng.integers(-120, 120, size=e), 0, n - 1)
    ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    g_dense = build_graph(ei, None, n, "gcn", materialize_dense=True)
    g_band = build_graph(ei, None, n, "gcn", materialize_dense=False,
                         materialize_bcsr=True, sparse_layout="band")
    if g_band.band is None or g_band.band.affine_stride is None:
        pytest.skip("planner did not pick an affine band for this graph")
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g_band, x, "pallas")),
        np.asarray(spmm(g_dense, x, "dense")), rtol=1e-4, atol=1e-4)
    gr_b = jax.grad(lambda v: (spmm(g_band, v, "pallas") ** 2).sum())(x)
    gr_d = jax.grad(lambda v: (spmm(g_dense, v, "dense") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gr_b), np.asarray(gr_d),
                               rtol=1e-3, atol=1e-3)


def test_int8_affine_band_matches_f32():
    """int8 slabs with per-output-row dequant scales: forward and gradient
    within quantization tolerance of the f32 layout (affine block-DIA only)."""
    from glass_tpu.ops.graph import build_graph
    from glass_tpu.ops.spmm import spmm

    rng = np.random.default_rng(0)
    n = 8 * BLOCK
    r = np.repeat(np.arange(n), 4)
    c = np.clip(r + rng.integers(-BLOCK, BLOCK, size=r.size), 0, n - 1)
    ei = np.concatenate([np.stack([r, c]), np.stack([c, r])], axis=1)
    g8 = build_graph(ei, None, n, "gcn", materialize_dense=False,
                     materialize_bcsr=True, sparse_layout="band",
                     dense_dtype="int8")
    g32 = build_graph(ei, None, n, "gcn", materialize_dense=False,
                      materialize_bcsr=True, sparse_layout="band")
    assert g8.band.slabs.dtype == jnp.int8
    assert g8.band.affine_stride is not None
    assert g8.band.row_scale is not None
    x = jnp.asarray(rng.random((n, 64)).astype(np.float32))
    o8 = np.asarray(spmm(g8, x, "band"))
    o32 = np.asarray(spmm(g32, x, "band"))
    assert np.abs(o8 - o32).max() / np.abs(o32).max() < 2e-2

    d8 = jax.grad(lambda x: (spmm(g8, x, "band") ** 2).sum())(x)
    d32 = jax.grad(lambda x: (spmm(g32, x, "band") ** 2).sum())(x)
    assert float(jnp.abs(d8 - d32).max() / jnp.abs(d32).max()) < 3e-2


def test_int8_per_group_layout_builds(rng):
    """int8 no longer requires the affine law (round 4): a per-group window
    layout quantizes with per-row scales and matches dense."""
    from glass_tpu.ops.pallas_band import band_spmm, build_band

    n = 4 * BLOCK
    r = np.arange(1, n)
    c = r - 1
    w = rng.random(r.size).astype(np.float32) + 0.5
    band = build_band(r, c, w, n, rps=1, dtype="int8")
    assert band.slabs.dtype == jnp.int8 and band.row_scale is not None
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    dense = np.zeros((n, n), np.float32)
    dense[r, c] = w
    out = np.asarray(band_spmm(band, x, interpret=True))
    ref = dense @ np.asarray(x)
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-2


# ---- affine-fit property tests off the happy path (real RCM profiles are
# not perfectly linear; the gate in ops/graph.py::_maybe_affine must reject
# inflating fits and keep the per-group result exact — int8 now serves the
# per-group kernels too)


def _piecewise_directed(rng, n):
    """Directed band whose window law JUMPS at half depth: rows in the top
    half sit on the main diagonal, rows in the bottom half on a far
    off-diagonal. Per-group windows stay narrow, but a single affine law
    must span the jump — guaranteed >1.5x inflation."""
    half = n // 2
    r1 = np.arange(half)
    c1 = np.clip(r1 + rng.integers(-48, 48, half), 0, n - 1)
    r2 = np.arange(half, n)
    c2 = np.clip(r2 - half + rng.integers(-48, 48, half), 0, n - 1)
    return np.stack([np.concatenate([r1, r2]), np.concatenate([c1, c2])])


def test_affine_gate_rejects_piecewise_profile(rng):
    """build_graph(sparse_layout='band') on a piecewise window law: the
    affine gate must reject (inflation >1.5x), fall back to the per-group
    window kernel, and still match dense — forward and gradient."""
    n = 16 * BLOCK
    ei = _piecewise_directed(rng, n)
    g = build_graph(ei, None, n, "sum", materialize_dense=False,
                    materialize_bcsr=True, sparse_layout="band")
    assert g.band is not None
    assert g.band.affine_stride is None  # gate rejected the inflating fit
    gd = build_graph(ei, None, n, "sum", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g, x, "band")),
        np.asarray(spmm(gd, x, "dense")), rtol=1e-4, atol=1e-4)
    gr_b = jax.grad(lambda v: (spmm(g, v, "band") ** 2).sum())(x)
    gr_d = jax.grad(lambda v: (spmm(gd, v, "dense") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gr_b), np.asarray(gr_d),
                               rtol=1e-3, atol=1e-3)


def test_affine_gate_reject_keeps_int8_per_group(rng):
    """dense_dtype='int8' on a gate-rejected profile: since round 4 int8
    serves the PER-GROUP window kernels too (output-row dequant outside the
    kernel), so the rejected affine fit degrades to int8 per-group slabs —
    not to bf16 — and stays within quantization tolerance of dense, forward
    and gradient."""
    n = 16 * BLOCK
    ei = _piecewise_directed(rng, n)
    g8 = build_graph(ei, None, n, "sum", materialize_dense=False,
                     materialize_bcsr=True, sparse_layout="band",
                     dense_dtype="int8")
    assert g8.band.affine_stride is None  # the gate still rejects the fit
    assert g8.band.slabs.dtype == jnp.int8
    assert g8.band.row_scale is not None
    gd = build_graph(ei, None, n, "sum", materialize_dense=True)
    x = jnp.asarray(rng.random((n, 32)).astype(np.float32))
    out = np.asarray(spmm(g8, x, "band"))
    ref = np.asarray(spmm(gd, x, "dense"))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-2
    g8g = jax.grad(lambda v: (spmm(g8, v, "band") ** 2).sum())(x)
    gdg = jax.grad(lambda v: (spmm(gd, v, "dense") ** 2).sum())(x)
    assert float(jnp.abs(g8g - gdg).max() / jnp.abs(gdg).max()) < 4e-2


def test_affine_gate_accepts_small_inflation(rng):
    """A linear law with one-block wobble: the affine fit inflates the
    window by ~1 block, inside the gate's max(wb+1, 1.5*wb) allowance —
    accepted, and the static kernel still matches dense."""
    n = 16 * BLOCK
    r = np.arange(n)
    wob = (np.sin(r / 97.0) * BLOCK * 0.6).astype(int)
    c = np.clip(r + wob + rng.integers(-16, 16, n), 0, n - 1)
    ei = np.stack([r, c])
    g = build_graph(ei, None, n, "sum", materialize_dense=False,
                    materialize_bcsr=True, sparse_layout="band")
    assert g.band.affine_stride is not None  # gate accepted
    gd = build_graph(ei, None, n, "sum", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(spmm(g, x, "band")),
        np.asarray(spmm(gd, x, "dense")), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("stride", [2, 3])
def test_affine_negative_offset_top_edge(rng, stride):
    """col ~ stride*row laws whose first groups' windows start left of
    column 0 (off < 0): the kernel pads x on the left instead of clamping,
    so the exact affine law holds at every stride."""
    from glass_tpu.ops.pallas_band import affine_fit, band_spmm

    n = 12 * BLOCK
    rows = np.arange(n // stride)
    cols = np.clip(stride * rows + rng.integers(-96, 32, rows.size),
                   0, n - 1)
    w = np.ones(rows.size, np.float32)
    fit = affine_fit(rows, cols, w, n, rps=1)
    assert fit is not None
    s, off, w_aff = fit
    assert s == stride
    assert off < 0  # the top-edge jitter pulls the first window left
    band = build_band(rows, cols, w, n, rps=1, affine=fit)
    dense = np.zeros((n, n), np.float32)
    np.add.at(dense, (rows, cols), w)
    x = rng.normal(size=(n, 32)).astype(np.float32)
    out = np.asarray(band_spmm(band, jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(out, dense @ x, rtol=1e-4, atol=1e-4)


def test_hybrid_int8_residue(rng):
    """dense_dtype='int8' on a hybrid split: BOTH parts go int8 (per-row
    scales in each layout — the band+residue add composes), and
    forward/grad stay within quantization tolerance of dense."""
    ei, n = outlier_chain_graph(rng)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True,
                    materialize_bcsr=True, sparse_layout="hybrid",
                    dense_dtype="int8")
    assert g.band is not None and g.bcsr is not None
    assert g.bcsr.blocks.dtype == jnp.int8
    assert g.bcsr.row_scale is not None
    assert g.band.slabs.dtype == jnp.int8
    assert g.band.row_scale is not None
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    out = np.asarray(spmm(g, x, "pallas"))
    ref = np.asarray(spmm(g, x, "dense"))
    scale = np.abs(ref).max()
    assert np.abs(out - ref).max() / scale < 2e-2
    gp = jax.grad(lambda v: (spmm(g, v, "pallas") ** 2).sum())(x)
    gd = jax.grad(lambda v: (spmm(g, v, "dense") ** 2).sum())(x)
    assert float(jnp.abs(gp - gd).max() / jnp.abs(gd).max()) < 4e-2


def test_int8_per_group_band_all_variants(rng):
    """int8 per-group band slabs across the kernel variants the dispatcher
    can pick (whole-x-VMEM and streamed; single- and multi-group): forward
    and custom-VJP gradient within quantization tolerance of dense."""
    import glass_tpu.ops.pallas_band as pb

    n = 8 * BLOCK
    r = np.arange(n)
    src = np.repeat(r, 6)
    dst = np.clip(src + rng.integers(-100, 100, size=src.size), 0, n - 1)
    ei = np.stack([src, dst])
    gd = build_graph(ei, None, n, "sum", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = np.asarray(spmm(gd, x, "dense"))
    refg = np.asarray(jax.grad(
        lambda v: (spmm(gd, v, "dense") ** 2).sum())(x))

    g = build_graph(ei, None, n, "sum", materialize_dense=False,
                    materialize_bcsr=True, sparse_layout="band",
                    dense_dtype="int8")
    band = g.band
    if band.affine_stride is not None:
        # force the per-group path too (this test targets those kernels)
        band = pb.build_band(np.asarray(g.row)[: g.n_edge],
                             np.asarray(g.col)[: g.n_edge],
                             np.asarray(g.weight)[: g.n_edge], n,
                             rps=band.rps, dtype="int8")
    assert band.slabs.dtype == jnp.int8 and band.affine_stride is None

    # whole-x path (fits VMEM at this size)
    out = np.asarray(pb.band_spmm(band, x, interpret=True))
    assert np.abs(out - ref).max() / np.abs(ref).max() < 2e-2

    # streamed path: monkeypatch-free forcing via a tiny VMEM budget is
    # covered elsewhere; here exercise the striped variant explicitly
    out_s = np.asarray(pb.band_spmm(band, x, interpret=True, stripes=2))
    assert np.abs(out_s - ref).max() / np.abs(ref).max() < 2e-2

    # custom VJP through the graph-level dispatch
    gg = jax.grad(lambda v: (spmm(g, v, "band") ** 2).sum())(x)
    assert float(jnp.abs(gg - refg).max() / np.abs(refg).max()) < 4e-2
