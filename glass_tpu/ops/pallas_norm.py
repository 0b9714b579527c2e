"""Fused whole-graph GraphNorm (forward + backward) Pallas kernels.

Round-3 profiling (tools/body_profile.py, RESULTS.md) localized the
remaining e2e training cost to the unfused backward chain over (57k, 64-128)
activations: XLA runs each reduction-bearing op at a quasi-fixed ~130-190 us
on this chip while pure elementwise chains fuse to ~free — and a GLASS step
carries 3 GraphNorms (conv, embedding, JK), each a mean + variance reduction
forward and two more reductions backward. This module collapses each
GraphNorm to the minimum number of HBM passes:

forward  (exact PyG 1.7.2 formula, same as ops/norm.py):
  K1: col-sums  S1 = sum_n x                  -> mu = S1/N        (1 read)
  K2: col-sums  S2 = sum_n (x - alpha*mu)^2   -> var = S2/N       (1 read)
  K3: y = g * x + h, g = w*s, h = b - w*s*alpha*mu, s = rsqrt(var+eps)
      — ONE elementwise pass with two per-feature vectors (1 read + 1 write)

backward (custom VJP; residuals are x and the tiny per-feature stats):
  K4: R1 = sum_n dy, R2 = sum_n dy*(x - alpha*mu)     (1 fused read of dy,x)
  K5: dx = a*dy + c2*x + c1                           (1 read dy,x + 1 write)
  param grads from the same reductions, no extra passes:
      dw = s*R2,  db = R1,  dalpha = -w*mu*s*R1 + w*mu*mo*s^3*R2
  where mo = mean(x - alpha*mu) = mu*(1-alpha) and
      dx_j = w*s*dy_j - (w*alpha*s/N)*R1 - (w*s^3/N)*R2*(out_j - alpha*mo).

Row padding is masked inside the variance kernel (padded rows would
otherwise contribute (alpha*mu)^2); dy padding is zero so the backward
reductions are exact by construction.

Semantics are identical to ops/norm.py::graph_norm (the parity-gating
formula) up to float reduction order; tests compare both values and
jax.grad-vs-custom-VJP gradients. Sharded (psum) GraphNorm keeps the
unfused path in ops/norm.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from glass_tpu.ops._pallas_common import BLOCK

_PANEL = 1024  # rows per grid step (1024 x 128 f32 = 512 KiB per buffer)


def _pad_cols(h: int) -> int:
    return -(-h // BLOCK) * BLOCK


def _pads(x):
    n, h = x.shape
    npad = -(-n // _PANEL) * _PANEL
    hpad = _pad_cols(h)
    if npad != n or hpad != h:
        x = jnp.pad(x, ((0, npad - n), (0, hpad - h)))
    return x, npad, hpad


def _colsum_kernel(x_ref, o_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += x_ref[...].astype(jnp.float32).sum(axis=0, keepdims=True)


def _varsum_kernel(x_ref, am_ref, o_ref, *, n_real: int):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    rid = i * _PANEL + jax.lax.broadcasted_iota(
        jnp.int32, (x_ref.shape[0], 1), 0
    )
    d = x_ref[...].astype(jnp.float32) - am_ref[...]
    d = jnp.where(rid < n_real, d, 0.0)
    o_ref[...] += (d * d).sum(axis=0, keepdims=True)


def _affine_kernel(x_ref, g_ref, h_ref, o_ref):
    o_ref[...] = (
        x_ref[...].astype(jnp.float32) * g_ref[...] + h_ref[...]
    ).astype(o_ref.dtype)


def _bwd_reduce_kernel(dy_ref, x_ref, am_ref, r1_ref, r2_ref):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        r1_ref[...] = jnp.zeros_like(r1_ref)
        r2_ref[...] = jnp.zeros_like(r2_ref)

    dy = dy_ref[...].astype(jnp.float32)
    out = x_ref[...].astype(jnp.float32) - am_ref[...]
    r1_ref[...] += dy.sum(axis=0, keepdims=True)
    r2_ref[...] += (dy * out).sum(axis=0, keepdims=True)


def _bwd_dx_kernel(dy_ref, x_ref, a_ref, c2_ref, c1_ref, o_ref):
    o_ref[...] = (
        dy_ref[...].astype(jnp.float32) * a_ref[...]
        + x_ref[...].astype(jnp.float32) * c2_ref[...]
        + c1_ref[...]
    ).astype(o_ref.dtype)


def _rowvec(v, hpad):
    v = v.astype(jnp.float32).reshape(1, -1)
    if v.shape[1] != hpad:
        v = jnp.pad(v, ((0, 0), (0, hpad - v.shape[1])))
    return v


def _reduce_call(kernel, out_n, xp, *vecs, interpret, npad, hpad):
    grid = (npad // _PANEL,)
    in_specs = [pl.BlockSpec((_PANEL, hpad), lambda i: (i, 0))]
    in_specs += [pl.BlockSpec((1, hpad), lambda i: (0, 0))] * len(vecs)
    return pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((1, hpad), jnp.float32)] * out_n,
        grid=grid,
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, hpad), lambda i: (0, 0))] * out_n,
        interpret=interpret,
    )(xp, *vecs)


def _elementwise_call(kernel, arrays, vecs, out_dtype, interpret, npad, hpad):
    grid = (npad // _PANEL,)
    in_specs = [pl.BlockSpec((_PANEL, hpad), lambda i: (i, 0))] * len(arrays)
    in_specs += [pl.BlockSpec((1, hpad), lambda i: (0, 0))] * len(vecs)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((npad, hpad), out_dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((_PANEL, hpad), lambda i: (i, 0)),
        interpret=interpret,
    )(*arrays, *vecs)


def _stats(x, mean_scale, eps, interpret):
    """(mu, var, am) per feature via K1/K2 — the exact two-pass formula."""
    n, h = x.shape
    xp, npad, hpad = _pads(x)
    (s1,) = _reduce_call(_colsum_kernel, 1, xp,
                         interpret=interpret, npad=npad, hpad=hpad)
    mu = s1[0, :h] / n
    am = _rowvec(mean_scale * mu, hpad)
    (s2,) = _reduce_call(
        functools.partial(_varsum_kernel, n_real=n), 1, xp, am,
        interpret=interpret, npad=npad, hpad=hpad)
    var = s2[0, :h] / n
    return mu, var, am, xp, npad, hpad


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def fused_graph_norm(x, weight, bias, mean_scale, eps: float = 1e-5,
                     interpret: bool = False):
    """Drop-in fused equivalent of ops/norm.py::graph_norm (unsharded)."""
    y, _ = _fwd(x, weight, bias, mean_scale, eps, interpret)
    return y


def _fwd(x, weight, bias, mean_scale, eps, interpret):
    n, h = x.shape
    mu, var, am, xp, npad, hpad = _stats(x, mean_scale, eps, interpret)
    s = jax.lax.rsqrt(var + eps)
    g = weight * s
    hv = bias - g * mean_scale * mu
    y = _elementwise_call(
        _affine_kernel, [xp], [_rowvec(g, hpad), _rowvec(hv, hpad)],
        x.dtype, interpret, npad, hpad)[:n, :h]
    return y, (x, mu, var, weight, mean_scale)


def _bwd(eps, interpret, res, dy):
    x, mu, var, weight, mean_scale = res
    n, h = x.shape
    s = jax.lax.rsqrt(var + eps)
    xp, npad, hpad = _pads(x)
    dyp, _, _ = _pads(dy)
    am = _rowvec(mean_scale * mu, hpad)
    r1, r2 = _bwd_reduce_call(dyp, xp, am, interpret, npad, hpad)
    r1, r2 = r1[0, :h], r2[0, :h]
    mo = mu * (1.0 - mean_scale)  # mean(x - alpha*mu)
    w = weight.astype(jnp.float32)
    a = w * s
    c2 = -(w * s**3 / n) * r2
    # dx_j = a*dy_j - (w*alpha*s/n)*R1 - (w*s^3/n)*R2*(x_j - alpha*mu - alpha*mo)
    c1 = -(w * mean_scale * s / n) * r1 - c2 * (
        mean_scale * mu + mean_scale * mo)
    dx = _elementwise_call(
        _bwd_dx_kernel, [dyp, xp],
        [_rowvec(a, hpad), _rowvec(c2, hpad), _rowvec(c1, hpad)],
        x.dtype, interpret, npad, hpad)[:n, :h]
    dw = (s * r2).astype(weight.dtype)
    db = r1.astype(weight.dtype)
    dalpha = (-w * mu * s * r1 + w * mu * mo * s**3 * r2).astype(weight.dtype)
    return dx, dw, db, dalpha


def _bwd_reduce_call(dyp, xp, am, interpret, npad, hpad):
    grid = (npad // _PANEL,)
    return pl.pallas_call(
        _bwd_reduce_kernel,
        out_shape=[jax.ShapeDtypeStruct((1, hpad), jnp.float32)] * 2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_PANEL, hpad), lambda i: (i, 0)),
            pl.BlockSpec((_PANEL, hpad), lambda i: (i, 0)),
            pl.BlockSpec((1, hpad), lambda i: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((1, hpad), lambda i: (0, 0))] * 2,
        interpret=interpret,
    )(dyp, xp, am)


fused_graph_norm.defvjp(
    lambda x, w, b, a, eps, interpret: _fwd(x, w, b, a, eps, interpret),
    _bwd,
)
