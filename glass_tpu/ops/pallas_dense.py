"""int8 dense-adjacency SpMM Pallas kernel (the real-world regime).

The auto planner routes mid-scale unstructured graphs (the real GLASS
datasets: hpo ~14.6k nodes, ~1.5% dense after undirecting) to the dense-MXU
path, where the SpMM is HBM-bound on the adjacency bytes: measured on TPU
v5e at the hpo stand-in, dense f32 = 1.19 ms (716 GB/s — bandwidth-optimal
for f32), bf16 halves it. This kernel halves the bytes again with the same
per-output-row symmetric quantization as the int8 band slabs
(ops/pallas_band.py): A[i, :] ~= q[i, :] * scale[i], q int8 = round(A/scale),
scale = rowmax/127.

A plain ``jnp.dot(q.astype(bf16), x)`` would NOT help: XLA materializes the
bf16 convert to HBM before the matmul (read int8 + write bf16 + read bf16 —
more traffic than bf16 storage). The convert must happen in VMEM, so this
is a Pallas kernel: grid over row-block panels; each step DMAs one int8
panel (auto-pipelined), converts in VMEM, runs one MXU matmul against the
whole feature matrix x (resident in VMEM across steps — its block index
never changes, so Mosaic fetches it once), and scales the output rows.

Quantization error: |A - q*scale| <= scale/2 per entry, giving forward and
gradient within ~0.3% of f32 at GLASS scale (same bound as the band slabs,
tested). Opt-in via ``--dense_dtype int8``; parity mode stays f32.

Reference parity: computes the hot loop ``adj @ x`` (reference
impl/models.py:164) in the regime the real datasets occupy; quantized
storage is a performance specialization, not a semantic change.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental import pallas as pl

from glass_tpu.ops._pallas_common import BLOCK, zero_cotangent as _zero_cotangent


@struct.dataclass
class DenseQ:
    """Row-quantized dense adjacency.

    q:     (n_rp*BLOCK, n_cp*BLOCK) int8, zero-padded past (n_row, n_col).
    scale: (n_rp*BLOCK, BLOCK) f32 per-row dequant scale, replicated across
           the lane dim (Mosaic-friendly block shape, as the band kernel's
           row_scale).
    """

    q: jnp.ndarray
    scale: jnp.ndarray
    n_row: int = struct.field(pytree_node=False)
    n_col: int = struct.field(pytree_node=False)


def _pad_to(n: int) -> int:
    return -(-n // BLOCK) * BLOCK


def build_dense_q(dense: np.ndarray) -> DenseQ:
    """Quantizes a host-side f32 dense adjacency row-wise to int8."""
    dense = np.asarray(dense, dtype=np.float32)
    n_row, n_col = dense.shape
    rp, cp = _pad_to(n_row), _pad_to(n_col)
    smax = np.abs(dense).max(axis=1)
    scale = np.where(smax > 0, smax / 127.0, 1.0).astype(np.float32)
    q = np.zeros((rp, cp), dtype=np.int8)
    q[:n_row, :n_col] = np.round(dense / scale[:, None]).astype(np.int8)
    sc = np.zeros((rp, BLOCK), dtype=np.float32)
    sc[:n_row] = scale[:, None]
    return DenseQ(q=jnp.asarray(q), scale=jnp.asarray(sc),
                  n_row=n_row, n_col=n_col)


def dense_q_bytes(n_row: int, n_col: int) -> int:
    """Stored bytes of one direction's quantized layout (planner input)."""
    return _pad_to(n_row) * _pad_to(n_col) + _pad_to(n_row) * BLOCK * 4


def _kernel(q_ref, sc_ref, x_ref, out_ref):
    acc = jnp.dot(
        q_ref[...].astype(jnp.bfloat16),
        x_ref[...],
        preferred_element_type=jnp.float32,
    )
    out_ref[...] = acc * sc_ref[:, :1]


def _pick_rblk(n_cp: int, hp: int) -> int:
    """Largest row-panel height whose double-buffered int8 panel + resident
    x + output block fit the VMEM budget (shared with the band kernels)."""
    from glass_tpu.ops.pallas_band import _VMEM_BUDGET

    x_bytes = n_cp * hp * 2  # resident across steps (constant block index)
    for rblk in (8 * BLOCK, 4 * BLOCK, 2 * BLOCK, BLOCK):
        per = 2 * (rblk * n_cp + rblk * BLOCK * 4 + rblk * hp * 4)
        if x_bytes + per <= _VMEM_BUDGET:
            return rblk
    raise ValueError(
        f"int8 dense working set exceeds VMEM even at a one-block row panel "
        f"(n_cols_padded={n_cp}, hp={hp}): the graph is too large for the "
        "quantized dense path — use bf16 dense or a block-sparse layout"
    )


def dense_q_vmem_ok(n_row: int, n_col: int, hp: int = BLOCK) -> bool:
    """Build-time gate: can the kernel run this shape at all?"""
    try:
        _pick_rblk(_pad_to(n_col), max(hp, BLOCK))
        return True
    except ValueError:
        return False


def _matmul_hp(dq: DenseQ, x_pad: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    """One kernel launch over a lane-width-padded feature panel."""
    n_cp, hp = x_pad.shape
    rp = dq.q.shape[0]
    rblk = _pick_rblk(n_cp, hp)
    grid = (rp // rblk,) if rp % rblk == 0 else (-(-rp // rblk),)
    # pad q rows up to a grid multiple (zero rows produce zero outputs)
    q, sc = dq.q, dq.scale
    rp_g = grid[0] * rblk
    if rp_g != rp:
        q = jnp.pad(q, ((0, rp_g - rp), (0, 0)))
        sc = jnp.pad(sc, ((0, rp_g - rp), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((rp_g, hp), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((rblk, n_cp), lambda i: (i, 0)),
            pl.BlockSpec((rblk, BLOCK), lambda i: (i, 0)),
            pl.BlockSpec((n_cp, hp), lambda i: (0, 0)),  # resident
        ],
        out_specs=pl.BlockSpec((rblk, hp), lambda i: (i, 0)),
        interpret=interpret,
    )(q, sc, x_pad)
    return out


def _forward(dq: DenseQ, x: jnp.ndarray, interpret: bool) -> jnp.ndarray:
    n, h = x.shape
    n_cp = dq.q.shape[1]
    xb = x.astype(jnp.bfloat16)
    xb = jnp.pad(xb, ((0, n_cp - n), (0, 0)))
    # feature panels of <= 8*BLOCK lanes: keeps the resident x block inside
    # VMEM for wide JK concats; q is re-streamed per panel (h > 1024 never
    # happens at GLASS widths)
    hp_max = 8 * BLOCK
    outs = []
    for c0 in range(0, h, hp_max):
        panel = xb[:, c0: c0 + hp_max]
        ph = panel.shape[1]
        php = -(-ph // BLOCK) * BLOCK
        if php != ph:
            panel = jnp.pad(panel, ((0, 0), (0, php - ph)))
        outs.append(_matmul_hp(dq, panel, interpret)[: dq.n_row, :ph])
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def dense_q_spmm(dq: DenseQ, dq_t: DenseQ, x: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """out = A @ x through the int8 layout; dx = A^T @ g through ``dq_t``
    (the SAME object when A is symmetric — shared storage)."""
    return _forward(dq, x, interpret)


def _fwd(dq, dq_t, x, interpret):
    # empty array as a dtype carrier: residuals must be JAX types
    return _forward(dq, x, interpret), (dq, dq_t, jnp.zeros((0,), x.dtype))


def _bwd(interpret, res, g):
    dq, dq_t, x_proto = res
    # the kernel accumulates f32; the cotangent must match the primal x's
    # dtype (bf16 under --compute_dtype bf16) or JAX's transpose rules
    # reject the graph
    dx = _forward(dq_t, g, interpret).astype(x_proto.dtype)
    return (
        jax.tree_util.tree_map(_zero_cotangent, dq),
        jax.tree_util.tree_map(_zero_cotangent, dq_t),
        dx,
    )


dense_q_spmm.defvjp(_fwd, _bwd)
