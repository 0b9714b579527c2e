"""Shared constants/policies for the Pallas block-sparse kernels.

One definition each so the chunked-BCSR kernel (pallas_spmm.py), the
banded-slab kernel (pallas_band.py), and the layout planner (graph.py) cannot
drift — e.g. a precision-policy change applying to the forward kernel but not
the backward one would silently give the two passes different MXU precision.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 128x128 adjacency block edge shared by every Pallas layout (one MXU tile).
BLOCK = 128


def precision_for(block_dtype):
    """f32 blocks/slabs: full-precision MXU passes for parity with the dense
    path; bf16: fast one-pass mode."""
    return (
        jax.lax.Precision.HIGHEST
        if block_dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def zero_cotangent(a):
    """Zero cotangent with the dtype jax expects: float0 for integer primals,
    None for absent (None) pytree leaves."""
    if a is None:
        return None
    if jnp.issubdtype(a.dtype, jnp.inexact):
        return jnp.zeros_like(a)
    return np.zeros(a.shape, jax.dtypes.float0)
