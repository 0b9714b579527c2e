"""Fit the block-sparse planner's cost model on the current accelerator.

The layout planner (ops/graph.py::_plan_block_sparse) ranks band / chunked-
BCSR / hybrid candidates with a linear cost model

    t = n_steps * step_cost + streamed_bytes / stream_bps

whose default constants were fitted on TPU v5e. On a different TPU
generation the per-step fixed cost and effective DMA stream rate differ,
which can flip layout choices. This tool measures both kernels at several
configurations on the *current* chip, least-squares-fits the constants, and
writes a calibration JSON; point GLASS_TPU_AUTOTUNE at it to make the
planner use the fitted values (explicit opt-in — without the env var,
planning is deterministic across machines).

    python tools/autotune.py --out autotune.json
    export GLASS_TPU_AUTOTUNE=$PWD/autotune.json

Timing discipline (CLAUDE.md): every measurement is a long jitted
``lax.scan`` (one dispatch amortizes the remote-tunnel round-trip) synced by
scalar readback — ``block_until_ready`` can resolve before execution through
the axon tunnel.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/glass_tpu_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def _banded_graph(n_blocks: int, width: int, per_block: int, rng):
    """COO of a banded pattern: each 128-row block keeps ``per_block`` edges
    within ``width`` column blocks of the diagonal."""
    from glass_tpu.ops._pallas_common import BLOCK

    n = n_blocks * BLOCK
    rows, cols = [], []
    for b in range(n_blocks):
        r = b * BLOCK + rng.integers(0, BLOCK, size=per_block)
        c0 = max(0, min(b - width // 2, n_blocks - width)) * BLOCK
        c = c0 + rng.integers(0, width * BLOCK, size=per_block)
        rows.append(r)
        cols.append(c)
    return np.concatenate(rows), np.concatenate(cols), n


def _measure(fn, x, iters: int) -> float:
    """Steady-state seconds per iteration of ``fn`` inside one jitted scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def many(x0):
        def step(h, _):
            return fn(h)[: x0.shape[0]].astype(x0.dtype), None

        h, _ = jax.lax.scan(step, x0, None, length=iters)
        return h

    def timed():
        t0 = time.perf_counter()
        float(jnp.ravel(many(x))[0])  # scalar readback: cannot lie
        return time.perf_counter() - t0

    timed()  # compile + warm
    return min(timed(), timed()) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default="autotune.json")
    ap.add_argument("--iters", type=int, default=100)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--force_cpu", action="store_true",
                    help="fit interpret-mode numbers (testing only — they do "
                         "not describe any TPU)")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    if jax.default_backend() != "tpu" and not args.force_cpu:
        raise SystemExit(
            "autotune must run on the TPU it calibrates (or pass --force_cpu "
            "to exercise the fitting path in interpret mode)"
        )

    import jax.numpy as jnp
    from glass_tpu.ops._pallas_common import BLOCK
    from glass_tpu.ops.pallas_band import band_spmm, build_band
    from glass_tpu.ops.pallas_spmm import bcsr_spmm, build_bcsr

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)

    # Band: configs spanning step counts and slab bytes so the two model
    # terms are separable in the least-squares fit.
    rows_m, steps_m, bytes_m, times_m = [], [], [], []
    for n_blocks, width, per_block, rps in (
        (64, 4, 4000, 1),
        (64, 4, 4000, 8),
        (128, 8, 8000, 2),
        (128, 2, 2000, 1),
    ):
        r, c, n = _banded_graph(n_blocks, width, per_block, rng)
        w = np.ones(r.size, np.float32)
        band = build_band(r, c, w, n, rps=rps)
        x = jnp.asarray(rng.normal(size=(n, args.hidden)).astype(np.float32))
        dt = _measure(lambda v, b=band: band_spmm(b, v, interpret=interpret),
                      x, args.iters)
        n_g = band.n_groups
        nbytes = band.slabs.size * band.slabs.dtype.itemsize
        steps_m.append(n_g)
        bytes_m.append(nbytes)
        times_m.append(dt)
        print(f"  band n_blocks={n_blocks} w={width} rps={rps}: "
              f"{n_g} steps, {nbytes / 1e6:.1f} MB, {dt * 1e6:.1f} us/iter",
              file=sys.stderr)

    a = np.stack([np.asarray(steps_m, float), np.asarray(bytes_m, float)], 1)
    coef, *_ = np.linalg.lstsq(a, np.asarray(times_m), rcond=None)
    # Sanity-gate the fit: on a noisy run the two terms can come out
    # collinear or negative, which would silently misrank every
    # GLASS_TPU_AUTOTUNE-enabled layout decision. Refuse to write garbage.
    if coef[0] <= 0 or coef[1] <= 0:
        raise SystemExit(
            f"autotune fit is non-physical (step_cost={coef[0]:.3e} s, "
            f"byte_cost={coef[1]:.3e} s/B) — measurements too noisy; re-run "
            "(and check the tunnel-timing caveats in CLAUDE.md)"
        )
    band_step_s = float(coef[0])
    stream_bps = float(1.0 / coef[1])
    on_tpu = jax.default_backend() == "tpu"
    if on_tpu and not (1e-8 <= band_step_s <= 1e-3 and 1e9 <= stream_bps <= 1e13):
        # interpret-mode (--force_cpu) numbers are orders of magnitude off
        # by design; plausibility-gate real-TPU fits only
        raise SystemExit(
            f"autotune fit out of plausible range (step {band_step_s:.3e} s, "
            f"stream {stream_bps:.3e} B/s) — refusing to write"
        )

    # BCSR: same pattern family; reuse the fitted stream rate, solve the
    # per-chunk cost from the residual.
    bcsr_steps, bcsr_bytes, bcsr_times = [], [], []
    for n_blocks, width, per_block in ((64, 4, 4000), (128, 8, 8000)):
        r, c, n = _banded_graph(n_blocks, width, per_block, rng)
        w = np.ones(r.size, np.float32)
        bcsr = build_bcsr(r, c, w, n)
        x = jnp.asarray(rng.normal(size=(n, args.hidden)).astype(np.float32))
        dt = _measure(lambda v, b=bcsr: bcsr_spmm(b, v, interpret=interpret),
                      x, args.iters)
        n_chunks = int(bcsr.chunk_start.shape[0])
        nbytes = bcsr.blocks.size * bcsr.blocks.dtype.itemsize
        bcsr_steps.append(n_chunks)
        bcsr_bytes.append(nbytes)
        bcsr_times.append(dt)
        print(f"  bcsr n_blocks={n_blocks} w={width}: {n_chunks} chunks, "
              f"{nbytes / 1e6:.1f} MB, {dt * 1e6:.1f} us/iter", file=sys.stderr)

    resid = np.asarray(bcsr_times) - np.asarray(bcsr_bytes) / stream_bps
    bcsr_step_s = float((resid / np.asarray(bcsr_steps)).mean())
    if on_tpu and not 1e-8 <= bcsr_step_s <= 1e-3:
        raise SystemExit(
            f"autotune BCSR fit out of plausible range ({bcsr_step_s:.3e} s "
            "per chunk) — refusing to write"
        )
    # interpret mode (--force_cpu): the band-fitted stream rate can
    # overshoot BCSR's byte cost, leaving a negative residual — clamp, the
    # numbers are for pipeline testing only
    bcsr_step_s = max(bcsr_step_s, 1e-8)

    out = {
        "band_step_cost_s": band_step_s,
        "bcsr_step_cost_s": bcsr_step_s,
        "stream_bps": stream_bps,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "hidden": args.hidden,
    }
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    print(f"\nexport GLASS_TPU_AUTOTUNE={Path(args.out).resolve()}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
