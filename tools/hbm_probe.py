"""HBM bandwidth probes (VERDICT r2 item 1): settle whether this chip's
practical HBM read bandwidth is ~215 GB/s (round-2's axpy probe) or closer
to the ~819 GB/s v5e spec — the band kernel's headroom hangs on it.

Probes:

1. xla-copy:   out = x + 1.0 over a large f32 array inside a lax.scan
               (XLA fusion; counts read + write bytes).
2. dma-read:   Pallas kernel that streams a large HBM array into VMEM in
               fixed-size chunks with S parallel stripe DMAs per chunk on
               separate semaphores, double-buffered. Read bytes only. The
               repeat loop is a second *grid dimension* inside ONE kernel
               dispatch (a lax.scan over an invariant call could be hoisted),
               and timings are differential — time(iters) - time(iters/4) —
               so the ~20 ms tunnel dispatch overhead cancels.
               S in {1, 2, 4, 8}: if aggregate bandwidth scales with S, the
               round-2 215 GB/s ceiling was a single-stream artifact.
3. dma-read2:  same, but stripes read from S separate arrays (tests whether
               DMA channel assignment is per-buffer).

Usage: python tools/hbm_probe.py [--mb 512] [--iters 40]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 512  # f32 row width (4 lane tiles)
NBUF = 2


def _sync(a):
    return float(a.ravel()[0])


def _timed(fn, *args):
    t0 = time.perf_counter()
    _sync(fn(*args))
    return time.perf_counter() - t0


# ------------------------------------------------------------- probe 1: XLA


def xla_copy_probe(rows, iters):
    x = jnp.ones((rows, LANES), jnp.float32)

    def make(n):
        @jax.jit
        def many(x0):
            def step(h, _):
                return h + 1.0, None

            h, _ = jax.lax.scan(step, x0, None, length=n)
            return h

        return many

    lo, hi = iters // 4, iters
    f_lo, f_hi = make(lo), make(hi)
    _sync(f_lo(x)), _sync(f_hi(x))
    dt = (min(_timed(f_hi, x) for _ in range(3))
          - min(_timed(f_lo, x) for _ in range(3))) / (hi - lo)
    bw = 2 * rows * LANES * 4 / dt  # read + write
    print(f"xla-copy       : {dt * 1e6:9.1f} us/pass  {bw / 1e9:7.1f} GB/s "
          f"(read+write)", flush=True)
    return bw


# ---------------------------------------------------- probe 2: striped DMA


def _read_kernel(hbm_ref, out_ref, buf, sems, *, stripes, chunk_rows,
                 n_steps, iters):
    it = pl.program_id(0)
    i = pl.program_id(1)
    rows = chunk_rows // stripes

    def dma(c, s):
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            hbm_ref.at[pl.ds(c * chunk_rows + s * rows, rows), :],
            buf.at[slot, pl.ds(s * rows, rows), :],
            sems.at[slot, s],
        )

    @pl.when(jnp.logical_and(it == 0, i == 0))
    def _():
        for s in range(stripes):
            dma(0, s).start()

    # prefetch the next chunk (wrapping around per outer repeat)
    nxt = jax.lax.rem(i + 1, n_steps)

    @pl.when(jnp.logical_not(jnp.logical_and(it == iters - 1, i == n_steps - 1)))
    def _():
        for s in range(stripes):
            dma(nxt, s).start()

    for s in range(stripes):
        dma(i, s).wait()
    # touch the buffer so nothing is elided; negligible compute
    out_ref[...] = buf[jax.lax.rem(i, NBUF), :8, :128]


def _make_read_call(x_shape, stripes, chunk_rows, n_steps, iters):
    kernel = functools.partial(
        _read_kernel, stripes=stripes, chunk_rows=chunk_rows,
        n_steps=n_steps, iters=iters,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_steps * 8, 128), jnp.float32),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(iters, n_steps),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((8, 128), lambda it, i: (i, 0)),
            scratch_shapes=[
                pltpu.VMEM((NBUF, chunk_rows, LANES), jnp.float32),
                pltpu.SemaphoreType.DMA((NBUF, stripes)),
            ],
        ),
    )


def dma_read_probe(rows, iters, stripes, chunk_rows=2048):
    n_steps = rows // chunk_rows
    assert n_steps % NBUF == 0
    x = jnp.ones((rows, LANES), jnp.float32)
    lo, hi = max(iters // 4, 1), iters

    f_lo = jax.jit(_make_read_call(x.shape, stripes, chunk_rows, n_steps, lo))
    f_hi = jax.jit(_make_read_call(x.shape, stripes, chunk_rows, n_steps, hi))
    _sync(f_lo(x)), _sync(f_hi(x))
    dt = (min(_timed(f_hi, x) for _ in range(3))
          - min(_timed(f_lo, x) for _ in range(3))) / (hi - lo)
    bw = rows * LANES * 4 / dt
    print(f"dma-read  S={stripes}: {dt * 1e6:9.1f} us/pass  {bw / 1e9:7.1f} GB/s "
          f"(read only, {n_steps} steps x {chunk_rows * LANES * 4 // 1024} KiB)",
          flush=True)
    return bw


# ------------------------------------- probe 3: stripes on separate arrays


def _read2_kernel(*refs, stripes, chunk_rows, n_steps, iters):
    hbm = refs[:stripes]
    out_ref = refs[stripes]
    buf = refs[stripes + 1]
    sems = refs[stripes + 2]
    it = pl.program_id(0)
    i = pl.program_id(1)
    rows = chunk_rows // stripes

    def dma(c, s):
        slot = jax.lax.rem(c, NBUF)
        return pltpu.make_async_copy(
            hbm[s].at[pl.ds(c * rows, rows), :],
            buf.at[slot, pl.ds(s * rows, rows), :],
            sems.at[slot, s],
        )

    @pl.when(jnp.logical_and(it == 0, i == 0))
    def _():
        for s in range(stripes):
            dma(0, s).start()

    nxt = jax.lax.rem(i + 1, n_steps)

    @pl.when(jnp.logical_not(jnp.logical_and(it == iters - 1, i == n_steps - 1)))
    def _():
        for s in range(stripes):
            dma(nxt, s).start()

    for s in range(stripes):
        dma(i, s).wait()
    out_ref[...] = buf[jax.lax.rem(i, NBUF), :8, :128]


def dma_read2_probe(rows, iters, stripes, chunk_rows=2048):
    n_steps = rows // chunk_rows
    assert n_steps % NBUF == 0
    per_rows = n_steps * (chunk_rows // stripes)
    xs = [jnp.ones((per_rows, LANES), jnp.float32) for _ in range(stripes)]

    def make(it):
        kernel = functools.partial(
            _read2_kernel, stripes=stripes, chunk_rows=chunk_rows,
            n_steps=n_steps, iters=it,
        )
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((n_steps * 8, 128), jnp.float32),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(it, n_steps),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * stripes,
                out_specs=pl.BlockSpec((8, 128), lambda it_, i: (i, 0)),
                scratch_shapes=[
                    pltpu.VMEM((NBUF, chunk_rows, LANES), jnp.float32),
                    pltpu.SemaphoreType.DMA((NBUF, stripes)),
                ],
            ),
        )

    lo, hi = max(iters // 4, 1), iters
    f_lo, f_hi = jax.jit(make(lo)), jax.jit(make(hi))
    _sync(f_lo(*xs)), _sync(f_hi(*xs))
    dt = (min(_timed(f_hi, *xs) for _ in range(3))
          - min(_timed(f_lo, *xs) for _ in range(3))) / (hi - lo)
    bw = rows * LANES * 4 / dt
    print(f"dma-read2 S={stripes}: {dt * 1e6:9.1f} us/pass  {bw / 1e9:7.1f} GB/s "
          f"(read only, {stripes} arrays)", flush=True)
    return bw


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mb", type=int, default=512)
    ap.add_argument("--iters", type=int, default=40)
    ap.add_argument("--chunk_rows", type=int, default=2048)
    ap.add_argument("--probes", type=str, default="xla,dma,dma2")
    args = ap.parse_args()

    rows = args.mb * 1024 * 1024 // (LANES * 4)
    rows -= rows % (8 * args.chunk_rows)
    probes = args.probes.split(",")
    print(f"array: {rows}x{LANES} f32 = {rows * LANES * 4 / 2**20:.0f} MiB, "
          f"backend {jax.default_backend()}", flush=True)

    if "xla" in probes:
        xla_copy_probe(rows, args.iters)
    if "dma" in probes:
        for s in (1, 2, 4, 8):
            dma_read_probe(rows, args.iters, s, args.chunk_rows)
    if "dma2" in probes:
        for s in (2, 4):
            dma_read2_probe(rows, args.iters, s, args.chunk_rows)


if __name__ == "__main__":
    main()
