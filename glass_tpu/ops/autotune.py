"""On-chip calibration of the layout planner's cost model.

The planner (ops/graph.py::_plan_block_sparse) ranks band / chunked-BCSR /
hybrid layouts with ``t = n_steps * step_cost + streamed_bytes /
stream_bps``, whose default constants were fitted on TPU v5e. Other TPU
generations have different per-step fixed costs and DMA stream rates, which
can flip borderline layout choices. This module measures both kernels on
the *current* accelerator, least-squares-fits the constants, and writes a
calibration JSON that ``GLASS_TPU_AUTOTUNE`` points the planner at.

Two entry points:

- :func:`fit_cost_constants` — run the probe, return the fitted dict
  (raises on non-physical or implausible fits rather than writing garbage).
- :func:`ensure_autotune` — the CLI ``--autotune`` flag's implementation:
  reuse an existing calibration file for this backend if present, else run
  the probe once and save it; either way set ``GLASS_TPU_AUTOTUNE`` for the
  process so every subsequent ``build_graph`` plan uses the fitted values.

``tools/autotune.py`` is the standalone wrapper around the same probe.

Timing discipline (CLAUDE.md): every measurement is a long jitted
``lax.scan`` (one dispatch amortizes the remote-tunnel round-trip) synced
by scalar readback — ``block_until_ready`` can resolve before execution
through the axon tunnel.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np


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


def fit_cost_constants(iters: int = 100, hidden: int = 64,
                       log=lambda s: print(s, file=sys.stderr)) -> dict:
    """Measure the band and chunked-BCSR kernels on the current jax backend
    and fit the planner's three cost constants. Returns the calibration
    dict; raises SystemExit on non-physical fits (noisy measurements)."""
    import jax
    import jax.numpy as jnp
    from glass_tpu.ops.pallas_band import band_spmm, build_band
    from glass_tpu.ops.pallas_spmm import bcsr_spmm, build_bcsr

    interpret = jax.default_backend() != "tpu"
    rng = np.random.default_rng(0)

    # Band: configs spanning step counts and slab bytes so the two model
    # terms are separable in the least-squares fit.
    steps_m, bytes_m, times_m = [], [], []
    for n_blocks, width, per_block, rps in (
        (64, 4, 4000, 1),
        (64, 4, 4000, 8),
        (128, 8, 8000, 2),
        (128, 2, 2000, 1),
    ):
        r, c, n = _banded_graph(n_blocks, width, per_block, rng)
        w = np.ones(r.size, np.float32)
        band = build_band(r, c, w, n, rps=rps)
        x = jnp.asarray(rng.normal(size=(n, hidden)).astype(np.float32))
        dt = _measure(lambda v, b=band: band_spmm(b, v, interpret=interpret),
                      x, iters)
        n_g = band.n_groups
        nbytes = band.slabs.size * band.slabs.dtype.itemsize
        steps_m.append(n_g)
        bytes_m.append(nbytes)
        times_m.append(dt)
        log(f"  band n_blocks={n_blocks} w={width} rps={rps}: "
            f"{n_g} steps, {nbytes / 1e6:.1f} MB, {dt * 1e6:.1f} us/iter")

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
        # interpret-mode numbers are orders of magnitude off by design;
        # plausibility-gate real-TPU fits only
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
        x = jnp.asarray(rng.normal(size=(n, hidden)).astype(np.float32))
        dt = _measure(lambda v, b=bcsr: bcsr_spmm(b, v, interpret=interpret),
                      x, iters)
        n_chunks = int(bcsr.chunk_start.shape[0])
        nbytes = bcsr.blocks.size * bcsr.blocks.dtype.itemsize
        bcsr_steps.append(n_chunks)
        bcsr_bytes.append(nbytes)
        bcsr_times.append(dt)
        log(f"  bcsr n_blocks={n_blocks} w={width}: {n_chunks} chunks, "
            f"{nbytes / 1e6:.1f} MB, {dt * 1e6:.1f} us/iter")

    resid = np.asarray(bcsr_times) - np.asarray(bcsr_bytes) / stream_bps
    bcsr_step_s = float((resid / np.asarray(bcsr_steps)).mean())
    if on_tpu and not 1e-8 <= bcsr_step_s <= 1e-3:
        raise SystemExit(
            f"autotune BCSR fit out of plausible range ({bcsr_step_s:.3e} s "
            "per chunk) — refusing to write"
        )
    # interpret mode: the band-fitted stream rate can overshoot BCSR's byte
    # cost, leaving a negative residual — clamp, the numbers are for
    # pipeline testing only
    bcsr_step_s = max(bcsr_step_s, 1e-8)

    return {
        "band_step_cost_s": band_step_s,
        "bcsr_step_cost_s": bcsr_step_s,
        "stream_bps": stream_bps,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "hidden": hidden,
    }


def default_autotune_path() -> Path:
    import jax

    cache = Path(os.environ.get("XDG_CACHE_HOME", Path.home() / ".cache"))
    return cache / "glass_tpu" / f"autotune_{jax.default_backend()}.json"


def ensure_autotune(path: str | None = None, iters: int = 100,
                    hidden: int = 64, refit: bool = False) -> str:
    """CLI ``--autotune`` behavior: reuse (or fit once and save) a planner
    calibration for the current backend, then export GLASS_TPU_AUTOTUNE so
    every subsequent layout plan in this process uses it. Returns the file
    path. The probe costs ~1-2 min on a cold TPU (Pallas compiles dominate;
    JAX_COMPILATION_CACHE_DIR makes reruns seconds)."""
    p = Path(path) if path else default_autotune_path()
    if refit or not p.exists():
        fitted = fit_cost_constants(iters=iters, hidden=hidden)
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(fitted, indent=2) + "\n")
        print(f"autotune: fitted and saved {p}: {fitted}", flush=True)
    else:
        print(f"autotune: using existing calibration {p}", flush=True)
    os.environ["GLASS_TPU_AUTOTUNE"] = str(p)
    return str(p)
