"""BCSR Pallas SpMM kernel tests (interpret mode on CPU; the same kernel
compiles via Mosaic on TPU — verified in the bench drive)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.ops.graph import build_graph
from glass_tpu.ops.spmm import spmm
from glass_tpu.ops.pallas_spmm import BCSR, build_bcsr, bcsr_spmm, BLOCK


def rand_graph(rng, n, e):
    src = rng.integers(0, n, size=e)
    dst = rng.integers(0, n, size=e)
    return np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])


@pytest.mark.parametrize("n,e", [(300, 1500), (130, 200)])
def test_bcsr_matches_dense(rng, n, e):
    ei = rand_graph(rng, n, e)
    g = build_graph(ei, None, n, "gcn", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 64)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    bcsr = build_bcsr(np.asarray(g.row), np.asarray(g.col), np.asarray(g.weight), n)
    out = np.asarray(bcsr_spmm(bcsr, x, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bcsr_skips_empty_blocks(rng):
    """A two-cluster graph has zero cross-blocks; BCSR must store only the
    nonzero ones and still compute exactly."""
    n = 4 * BLOCK
    half = n // 2
    e1 = rng.integers(0, half, size=(2, 600))
    e2 = rng.integers(half, n, size=(2, 600))
    ei = np.concatenate([e1, e2, e1[::-1], e2[::-1]], axis=1)
    g = build_graph(ei, None, n, "mean", materialize_dense=True)
    from glass_tpu.ops.pallas_spmm import CHUNK

    bcsr = build_bcsr(np.asarray(g.row), np.asarray(g.col), np.asarray(g.weight), n)
    assert bcsr.n_rb == 4
    # block-diagonal 2x2 + 2x2, no cross terms: <= 2 real blocks per row,
    # each row padded to one CHUNK-aligned run
    assert bcsr.nnz_blocks <= 4 * CHUNK
    nz = np.count_nonzero(np.asarray(bcsr.blocks, dtype=np.float32).sum((1, 2)))
    assert nz <= 8
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    out = np.asarray(bcsr_spmm(bcsr, x, interpret=True))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bcsr_empty_row_block(rng):
    """Row blocks with no edges at all must produce zero rows."""
    n = 3 * BLOCK
    # edges only among the first BLOCK nodes
    ei = rand_graph(rng, BLOCK, 200)
    g = build_graph(ei, None, n, "sum", materialize_dense=True)
    bcsr = build_bcsr(np.asarray(g.row), np.asarray(g.col), np.asarray(g.weight), n)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    out = np.asarray(bcsr_spmm(bcsr, x, interpret=True))
    np.testing.assert_allclose(out[BLOCK:], 0.0)
    ref = np.asarray(spmm(g, x, "dense"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bcsr_large_variant_matches(rng, monkeypatch):
    """The x-streaming (large-graph) kernel variant computes the same result
    as the in-VMEM variant (forced via a tiny VMEM threshold)."""
    import glass_tpu.ops.pallas_spmm as ps

    ei = rand_graph(rng, 300, 1200)
    g = build_graph(ei, None, 300, "gcn", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(300, 64)).astype(np.float32))
    ref = np.asarray(spmm(g, x, "dense"))
    bcsr = build_bcsr(np.asarray(g.row), np.asarray(g.col), np.asarray(g.weight), 300)
    monkeypatch.setattr(ps, "_X_VMEM_LIMIT_BYTES", 1)  # force large path
    ps.bcsr_spmm.clear_cache()  # earlier tests traced the small path for these shapes
    try:
        out = np.asarray(ps.bcsr_spmm(bcsr, x, interpret=True))
    finally:
        ps.bcsr_spmm.clear_cache()  # don't leak large-path traces to other tests
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spmm_pallas_gradient(rng):
    """Training through the pallas path must differentiate (custom VJP:
    A^T @ g): gradient matches the dense path's."""
    import jax

    ei = rand_graph(rng, 200, 600)
    g = build_graph(ei, None, 200, "mean", materialize_dense=True,
                    materialize_bcsr=True, sparse_layout="bcsr")
    x = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))

    def loss_pallas(x):
        return (spmm(g, x, "pallas") ** 2).sum()

    def loss_dense(x):
        return (spmm(g, x, "dense") ** 2).sum()

    gp = jax.grad(loss_pallas)(x)
    gd = jax.grad(loss_dense)(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), rtol=1e-3, atol=1e-4)


def test_bcsr_transpose_layout_sharing(rng):
    """Symmetric adjacencies (undirected 'sum'/'gcn') share one layout for
    forward and backward; asymmetric ('mean') get a real transpose."""
    ei = rand_graph(rng, 200, 600)
    g_sym = build_graph(ei, None, 200, "gcn", materialize_bcsr=True,
                        materialize_dense=False, sparse_layout="bcsr")
    assert g_sym.bcsr_t is g_sym.bcsr
    g_asym = build_graph(ei, None, 200, "mean", materialize_bcsr=True,
                         materialize_dense=False, sparse_layout="bcsr")
    assert g_asym.bcsr_t is not g_asym.bcsr
    # the transpose really is A^T: forward over bcsr_t == dense A^T @ x
    from glass_tpu.ops.pallas_spmm import bcsr_spmm as _spmm

    x = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    d = np.zeros((200, 200), np.float32)
    np.add.at(d, (np.asarray(g_asym.row), np.asarray(g_asym.col)),
              np.asarray(g_asym.weight))
    out_t = np.asarray(_spmm(g_asym.bcsr_t, x, interpret=True))
    np.testing.assert_allclose(out_t, d.T @ np.asarray(x), rtol=1e-4, atol=1e-5)


def test_spmm_pallas_gradient_symmetric(rng):
    """gcn (symmetric) gradient through the shared-layout backward."""
    ei = rand_graph(rng, 200, 600)
    g = build_graph(ei, None, 200, "gcn", materialize_dense=True,
                    materialize_bcsr=True, sparse_layout="bcsr")
    x = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    gp = jax.grad(lambda x: (spmm(g, x, "pallas") ** 2).sum())(x)
    gd = jax.grad(lambda x: (spmm(g, x, "dense") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), rtol=1e-3, atol=1e-4)


def test_spmm_pallas_gradient_fallback_cache(rng):
    """The no-prebuilt-layout path (host cache) also differentiates through
    the transposed-kernel backward."""
    ei = rand_graph(rng, 150, 400)
    g = build_graph(ei, None, 150, "mean", materialize_dense=True)
    assert g.bcsr is None
    x = jnp.asarray(rng.normal(size=(150, 8)).astype(np.float32))
    gp = jax.grad(lambda x: (spmm(g, x, "pallas") ** 2).sum())(x)
    gd = jax.grad(lambda x: (spmm(g, x, "dense") ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gd), rtol=1e-3, atol=1e-4)


def test_bcsr_bf16_blocks(rng):
    """bf16 block mode: x is carried in bf16, accumulation in f32; result
    within bf16 rounding of the f32 path."""
    ei = rand_graph(rng, 300, 1500)
    g = build_graph(ei, None, 300, "gcn", materialize_dense=True,
                    materialize_bcsr=True, dense_dtype="bf16",
                    sparse_layout="bcsr")
    assert g.bcsr.blocks.dtype == jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))
    ref = np.asarray(spmm(build_graph(ei, None, 300, "gcn",
                                      materialize_dense=True), x, "dense"))
    out = np.asarray(spmm(g, x, "pallas"))
    np.testing.assert_allclose(out, ref, rtol=0.05, atol=0.05)


def test_protocol_with_pallas_spmm_trains():
    """Regression: ExperimentConfig(spmm_mode='pallas') must train end to end
    (previously crashed with NotImplementedError in pallas_call's jvp)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    # batch_size 25 (not the config's 2) keeps this to ~5 interpret-mode
    # kernel steps per epoch: the regression is "trains at all", not speed
    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=25,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=2, spmm_mode="pallas",
    )
    scores, mean, err = run_experiment(cfg, log=lambda *_: None)
    assert 0.0 <= mean <= 1.0


def test_spmm_pallas_dispatch(rng):
    """spmm(graph, x, 'pallas') routes through the BCSR kernel."""
    ei = rand_graph(rng, 200, 600)
    g = build_graph(ei, None, 200, "gcn", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))
    out = np.asarray(spmm(g, x, "pallas"))
    ref = np.asarray(spmm(g, x, "dense"))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", ["scattered", "banded", "selfloops",
                                   "isolated", "duplicates", "asymmetric"])
def test_spmm_modes_differential_fuzz(shape):
    """Differential test across the whole SpMM surface: dense, segment, and
    every forced block-sparse layout must agree on graphs with awkward
    structure (self-loops, isolated nodes / empty rows, duplicate edges that
    accumulate, asymmetric patterns) — forward AND input gradient."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(shape.encode()))
    n = 300
    if shape == "banded":
        src = np.arange(n)
        dst = np.clip(src + rng.integers(-100, 100, size=n), 0, n - 1)
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    elif shape == "selfloops":
        src = np.arange(n)
        ei = np.stack([src, src])
    elif shape == "isolated":
        src = rng.integers(0, n // 3, size=400)  # 2/3 of nodes edge-free
        dst = rng.integers(0, n // 3, size=400)
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    elif shape == "duplicates":
        src = rng.integers(0, n, size=100)
        dst = rng.integers(0, n, size=100)
        src = np.concatenate([src, src, src])  # triplicated edges accumulate
        dst = np.concatenate([dst, dst, dst])
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    elif shape == "asymmetric":
        src = rng.integers(0, n, size=600)
        dst = rng.integers(0, n, size=600)
        ei = np.stack([src, dst])  # directed: A != A^T
    else:
        ei = rand_graph(rng, n, 900)

    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))

    def loss_of(g, mode):
        return lambda v: (spmm(g, v, mode) ** 2).sum()

    g_ref = build_graph(ei, None, n, "sum", materialize_dense=True)
    ref = np.asarray(spmm(g_ref, x, "dense"))
    ref_grad = np.asarray(jax.grad(loss_of(g_ref, "dense"))(x))

    variants = [(g_ref, "segment")]
    for layout in ("bcsr", "band", "hybrid"):
        try:
            g = build_graph(ei, None, n, "sum", materialize_dense=False,
                            materialize_bcsr=True, sparse_layout=layout)
        except (ValueError, NotImplementedError):
            continue  # layout not applicable to this pattern (e.g. hybrid
            # needs pattern symmetry) — the auto planner never forces it
        variants.append((g, "pallas"))
    g_auto = build_graph(ei, None, n, "sum", materialize_dense=False,
                         materialize_bcsr=True)
    variants.append((g_auto, "pallas"))

    for g, mode in variants:
        out = np.asarray(spmm(g, x, mode))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"{shape}/{mode} forward")
        grad = np.asarray(jax.grad(loss_of(g, mode))(x))
        np.testing.assert_allclose(grad, ref_grad, rtol=1e-4, atol=1e-3,
                                   err_msg=f"{shape}/{mode} grad")


def test_bcsr_int8_blocks_match_f32(rng):
    """int8 BCSR (per-row dequant scales in the layout): forward AND custom
    VJP within quantization tolerance of the f32 dense path; the transposed
    layout carries its own scales (asymmetric 'mean' normalization)."""
    for aggr in ("gcn", "mean", "sum"):
        ei = rand_graph(rng, 300, 1500)
        g8 = build_graph(ei, None, 300, "gcn" if aggr == "gcn" else aggr,
                         materialize_dense=False, materialize_bcsr=True,
                         dense_dtype="int8", sparse_layout="bcsr")
        assert g8.bcsr.blocks.dtype == jnp.int8
        assert g8.bcsr.row_scale is not None
        if aggr == "mean":
            assert g8.bcsr_t is not g8.bcsr  # own scales per direction
        gd = build_graph(ei, None, 300, aggr, materialize_dense=True)
        x = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32))
        ref = np.asarray(spmm(gd, x, "dense"))
        out = np.asarray(spmm(g8, x, "pallas"))
        scale = np.abs(ref).max()
        assert np.abs(out - ref).max() / scale < 2e-2, aggr
        d8 = jax.grad(lambda v: (spmm(g8, v, "pallas") ** 2).sum())(x)
        dd = jax.grad(lambda v: (spmm(gd, v, "dense") ** 2).sum())(x)
        rel = float(jnp.abs(d8 - dd).max() / jnp.abs(dd).max())
        assert rel < 4e-2, aggr


def test_bcsr_int8_empty_rows_and_padding(rng):
    """Rows with no edges and CHUNK padding blocks must stay inert under
    quantization (scale 1 on empty rows, zero blocks quantize to zero)."""
    n = 3 * BLOCK
    # only the middle block-row has edges
    src = BLOCK + rng.integers(0, BLOCK, size=400)
    dst = rng.integers(0, n, size=400)
    ei = np.stack([src, dst])
    g8 = build_graph(ei, None, n, "sum", materialize_dense=False,
                     materialize_bcsr=True, dense_dtype="int8",
                     sparse_layout="bcsr")
    assert g8.bcsr.blocks.dtype == jnp.int8
    gd = build_graph(ei, None, n, "sum", materialize_dense=True)
    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    ref = np.asarray(spmm(gd, x, "dense"))
    out = np.asarray(spmm(g8, x, "pallas"))
    assert np.abs(out[:BLOCK]).max() == 0  # empty rows exactly zero
    assert np.abs(out[2 * BLOCK:]).max() == 0
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_bcsr_int8_grad_bf16_primal(rng):
    """bf16 activation stream through the int8 BCSR VJP: cotangent must come
    back bf16 (mirrors the dense_q regression)."""
    ei = rand_graph(rng, 300, 1500)
    g8 = build_graph(ei, None, 300, "gcn", materialize_dense=False,
                     materialize_bcsr=True, dense_dtype="int8",
                     sparse_layout="bcsr")
    xb = jnp.asarray(rng.normal(size=(300, 32)).astype(np.float32)).astype(
        jnp.bfloat16)
    d = jax.grad(lambda v: (spmm(g8, v, "pallas").astype(jnp.float32) ** 2)
                 .sum())(xb)
    assert d.dtype == jnp.bfloat16


def test_protocol_with_int8_bcsr_trains():
    """--dense_dtype int8 + --sparse_layout bcsr trains end to end through
    the full protocol (the per-row-scale dequant rides the custom VJP in
    the whole-epoch scan)."""
    from glass_tpu.train.protocol import ExperimentConfig, run_experiment

    cfg = ExperimentConfig(
        dataset="density", pool="size", aggr="sum", hidden_dim=8,
        conv_layer=1, dropout=0.0, lr=1e-3, z_ratio=1.0, batch_size=25,
        resi=0.9, feature="one", use_maxzeroone=True, repeat=1,
        max_epochs=2, spmm_mode="pallas", sparse_layout="bcsr",
        dense_dtype="int8",
    )
    scores, mean, err = run_experiment(cfg, log=lambda *_: None)
    assert 0.0 <= mean <= 1.0


@pytest.mark.parametrize("shape", ["scattered", "banded", "selfloops",
                                   "isolated", "duplicates", "asymmetric"])
def test_spmm_int8_differential_fuzz(shape):
    """int8 counterpart of the mode fuzz: every forced int8 layout (bcsr /
    band / hybrid / dense_q) must stay within quantization tolerance of the
    f32 dense path on the same awkward patterns — forward AND gradient."""
    import zlib

    rng = np.random.default_rng(zlib.crc32(shape.encode()) ^ 0xABCD)
    n = 300
    if shape == "banded":
        src = np.arange(n)
        dst = np.clip(src + rng.integers(-100, 100, size=n), 0, n - 1)
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    elif shape == "selfloops":
        src = np.arange(n)
        ei = np.stack([src, src])
    elif shape == "isolated":
        src = rng.integers(0, n // 3, size=400)
        dst = rng.integers(0, n // 3, size=400)
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    elif shape == "duplicates":
        src = rng.integers(0, n, size=100)
        dst = rng.integers(0, n, size=100)
        src = np.concatenate([src, src, src])
        dst = np.concatenate([dst, dst, dst])
        ei = np.stack([np.concatenate([src, dst]), np.concatenate([dst, src])])
    elif shape == "asymmetric":
        src = rng.integers(0, n, size=600)
        dst = rng.integers(0, n, size=600)
        ei = np.stack([src, dst])
    else:
        ei = rand_graph(rng, n, 900)

    x = jnp.asarray(rng.normal(size=(n, 16)).astype(np.float32))
    g_ref = build_graph(ei, None, n, "sum", materialize_dense=True)
    ref = np.asarray(spmm(g_ref, x, "dense"))
    ref_grad = np.asarray(jax.grad(
        lambda v: (spmm(g_ref, v, "dense") ** 2).sum())(x))
    fscale = max(np.abs(ref).max(), 1e-6)
    gscale = max(np.abs(ref_grad).max(), 1e-6)

    variants = []
    for layout in ("bcsr", "band", "hybrid"):
        try:
            g = build_graph(ei, None, n, "sum", materialize_dense=False,
                            materialize_bcsr=True, sparse_layout=layout,
                            dense_dtype="int8")
        except (ValueError, NotImplementedError):
            continue
        variants.append((g, "pallas", layout))
    g_q = build_graph(ei, None, n, "sum", materialize_dense=True,
                      dense_dtype="int8")
    variants.append((g_q, "dense", "dense_q"))

    for g, mode, tag in variants:
        out = np.asarray(spmm(g, x, mode))
        assert np.abs(out - ref).max() / fscale < 2.5e-2, f"{shape}/{tag} fwd"
        grad = np.asarray(jax.grad(
            lambda v: (spmm(g, v, mode) ** 2).sum())(x))
        assert np.abs(grad - ref_grad).max() / gscale < 5e-2, \
            f"{shape}/{tag} grad"
