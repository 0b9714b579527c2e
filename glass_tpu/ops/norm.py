"""GraphNorm and GraphSizeNorm.

GraphNorm (Cai et al. 2020) as implemented by PyG 1.7.2, which the reference
uses everywhere with ``batch=None`` — i.e. the mean/variance statistics are
taken over *all* nodes of the big background graph (reference:
impl/models.py:141,165,201,249 and SURVEY.md §2.3). Exact formula parity
matters for activation-level golden tests:

    mean = mean_n(x)                       # per feature
    out  = x - mean * mean_scale           # learnable mean scale (alpha)
    var  = mean_n(out^2)                   # NOT re-centered
    y    = weight * out / sqrt(var + eps) + bias,   eps = 1e-5

These are plain VPU reductions; XLA fuses them into surrounding elementwise
work, so no custom kernel is needed.
"""

from __future__ import annotations

import jax.numpy as jnp


def graph_norm(
    x: jnp.ndarray,
    weight: jnp.ndarray,
    bias: jnp.ndarray,
    mean_scale: jnp.ndarray,
    eps: float = 1e-5,
    *,
    axis: str | None = None,
    node_mask: jnp.ndarray | None = None,
    n_total: int | None = None,
) -> jnp.ndarray:
    """Whole-graph GraphNorm (PyG 1.7.2 semantics with batch=None).

    When ``axis`` is given (inside shard_map over a node partition), the
    statistics are computed globally with a psum over the axis; ``node_mask``
    excludes padded rows of the local block and ``n_total`` is the global
    (real) node count. Identical numerics to the unsharded path up to float
    reduction order.
    """
    if axis is None:
        if x.dtype == jnp.bfloat16:
            # mixed-precision mode: read/write activations in bf16 (the op is
            # HBM-bound — half the bytes), but compute the statistics and the
            # normalization in f32 registers; the casts fuse into the passes.
            xf = x.astype(jnp.float32)
            mean = xf.mean(axis=0)
            out = xf - mean * mean_scale
            var = (out * out).mean(axis=0)
            y = weight * out / jnp.sqrt(var + eps) + bias
            return y.astype(jnp.bfloat16)
        mean = x.mean(axis=0)
        out = x - mean * mean_scale
        var = (out * out).mean(axis=0)
        return weight * out / jnp.sqrt(var + eps) + bias

    import jax

    assert n_total is not None
    in_dtype = x.dtype
    if in_dtype == jnp.bfloat16:
        x = x.astype(jnp.float32)  # f32 statistics/psums (see unsharded path)
    if node_mask is not None:
        xm = jnp.where(node_mask[:, None], x, 0.0)
    else:
        xm = x
    mean = jax.lax.psum(xm.sum(axis=0), axis) / n_total
    out = x - mean * mean_scale
    outm = jnp.where(node_mask[:, None], out, 0.0) if node_mask is not None else out
    var = jax.lax.psum((outm * outm).sum(axis=0), axis) / n_total
    y = weight * out / jnp.sqrt(var + eps) + bias
    return y.astype(in_dtype)


def graph_size_norm(x: jnp.ndarray, counts: jnp.ndarray) -> jnp.ndarray:
    """x_i / sqrt(|G_i|) given per-row subgraph sizes (PyG GraphSizeNorm).

    Reference: impl/models.py:310-319 (SizePool). In this framework the
    size pool is fused directly in ops.segment.pool_subgraphs; this exists for
    standalone use.
    """
    return x / jnp.sqrt(jnp.maximum(counts, 1.0))[:, None]
