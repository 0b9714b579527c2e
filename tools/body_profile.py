"""Micro-profile of the non-SpMM model body at production scale
(VERDICT r2 item 2). Times each op the GLASSConv layer body runs over
(N, H) = (57k, 64) arrays — matmuls, GraphNorm, dropout, masked mix,
activation — inside one jitted lax.scan with differential timing
(time(iters) - time(iters/4), scalar-readback sync), the methodology that
exposed the round-2 roofline error (tools/hbm_probe.py measured this chip
at ~670 GB/s, not 215).

Each op's achieved GB/s is reported against its minimal traffic, showing
which ops leave bandwidth on the table and what a fused kernel can save.

Usage: python tools/body_profile.py [--n 57344] [--h 64] [--iters 64]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _sync(a):
    return float(a.ravel()[0])


def _timed(fn, *args):
    t0 = time.perf_counter()
    _sync(fn(*args))
    return time.perf_counter() - t0


def scan_time(body, x, iters):
    """Differential in-scan per-iteration time of carry -> carry ``body``."""

    def make(n):
        @jax.jit
        def many(x0):
            def step(h, _):
                return body(h), None

            h, _ = jax.lax.scan(step, x0, None, length=n)
            return h

        return many

    lo, hi = max(iters // 4, 1), iters
    f_lo, f_hi = make(lo), make(hi)
    _sync(f_lo(x)), _sync(f_hi(x))
    return (min(_timed(f_hi, x) for _ in range(3))
            - min(_timed(f_lo, x) for _ in range(3))) / (hi - lo)


def report(name, dt, bytes_moved, flops=0):
    bw = bytes_moved / dt / 1e9
    fl = f"  {flops / dt / 1e12:6.1f} TFLOP/s" if flops else ""
    print(f"{name:34s}: {dt * 1e6:8.1f} us  {bw:7.1f} GB/s{fl}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=57344)
    ap.add_argument("--h", type=int, default=64)
    ap.add_argument("--iters", type=int, default=600)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()
    n, h = args.n, args.h
    dt_ = jnp.dtype(args.dtype)
    isz = dt_.itemsize
    rng = np.random.default_rng(0)

    x = jnp.asarray(rng.normal(size=(n, h)).astype(np.float32)).astype(dt_)
    w1 = jnp.asarray(rng.normal(size=(h, h)).astype(np.float32)).astype(dt_)
    w2 = jnp.asarray(rng.normal(size=(2 * h, h)).astype(np.float32)).astype(dt_)
    mask = jnp.asarray(rng.random(n).reshape(-1, 1) < 0.3)
    gamma = jnp.ones((h,), dt_)
    key = jax.random.PRNGKey(0)

    print(f"(N, H) = ({n}, {h}) {dt_.name}, backend {jax.default_backend()}",
          flush=True)
    nb = n * h * isz  # one array pass

    report("elementwise h+1 (r+w)",
           scan_time(lambda v: v + 1.0, x, args.iters), 2 * nb)
    report("matmul HxH (r+w)",
           scan_time(lambda v: v @ w1, x, args.iters), 2 * nb,
           flops=2 * n * h * h)
    # the dual trans pair as the layer runs it (XLA dot-merger target)
    report("dual matmul + mix (r+2w+2r+w)",
           scan_time(lambda v: jnp.where(mask, 0.8 * (v @ w1) + 0.2 * (v @ w1),
                                         0.2 * (v @ w1) + 0.8 * (v @ w1)),
                     x, args.iters), 2 * nb, flops=4 * n * h * h)
    report("mean over N",
           scan_time(lambda v: v + v.mean(axis=0, keepdims=True), x,
                     args.iters), 2 * nb)

    def graphnorm(v):
        mean = v.mean(axis=0, keepdims=True)
        out = v - mean * gamma
        var = (out * out).mean(axis=0, keepdims=True)
        return gamma * out * jax.lax.rsqrt(var + 1e-5) + gamma

    report("GraphNorm (3 reduction passes)",
           scan_time(graphnorm, x, args.iters), 2 * nb)
    report("dropout",
           scan_time(lambda v: jnp.where(
               jax.random.bernoulli(key, 0.5, v.shape), v / 0.5, 0.0),
               x, args.iters), 2 * nb)
    report("elu", scan_time(jax.nn.elu, x, args.iters), 2 * nb)
    report("masked mix (2 arrays in)",
           scan_time(lambda v: jnp.where(mask, 0.8 * v + 0.2 * v,
                                         0.2 * v + 0.8 * v), x, args.iters),
           2 * nb)

    def layer_body(v):
        """GLASSConv minus SpMM: dual trans + mix, norm, dropout, concat,
        dual comb + mix (the per-layer non-SpMM chain)."""
        x1 = jax.nn.elu(v @ w1)
        x0 = jax.nn.elu(v @ w1)
        m = jnp.where(mask, 0.8 * x1 + 0.2 * x0, 0.2 * x1 + 0.8 * x0)
        g = graphnorm(m)
        g = jnp.where(jax.random.bernoulli(key, 0.5, g.shape), g / 0.5, 0.0)
        cat = jnp.concatenate([g, v], axis=-1)
        c1 = cat @ w2
        c0 = cat @ w2
        return jnp.where(mask, 0.8 * c1 + 0.2 * c0, 0.2 * c1 + 0.8 * c0)

    report("full layer body (no SpMM)",
           scan_time(layer_body, x, args.iters), 2 * nb,
           flops=2 * n * (2 * h * h + 2 * 2 * h * h))

    def layer_fwd_bwd(v):
        return jax.grad(lambda u: layer_body(u).sum())(v)

    report("layer body fwd+bwd",
           scan_time(layer_fwd_bwd, x, args.iters), 2 * nb)


if __name__ == "__main__":
    main()
