"""Hardware-RNG dropout.

flax's ``nn.Dropout`` draws its mask with jax's default threefry PRNG, which
is a *software* generator: at the model-body scale this framework runs
((N, H) = (57k, 64) per call, 4+ calls per training step) the bit generation
alone costs ~70 us/call on TPU vs ~6 us for any other elementwise op
(tools/body_profile.py), making dropout the single most expensive non-SpMM
op in the training step (~1 ms/step of 2.7 — tools/e2e_ablate).

TPUs have a hardware RNG instruction exposed through XLA's RngBitGenerator
('rbg'). This module keeps nn.Dropout's exact semantics — same keep
probability, inverted scaling, the 'dropout' rng collection, ``deterministic``
flag — but draws the mask bits via the rbg generator seeded from the usual
threefry stream key, so determinism-given-key holds on a fixed
backend/compiler: XLA documents RngBitGenerator output as potentially
changing across backends and compiler versions (unlike threefry), so
kill-and-resume bit-equivalence is guaranteed only when resuming on the
same backend and compiler — harmless for dropout masks, which are never
bit-compared across systems.

The keep decision is ``bits >= rate * 2^32`` on uniform uint32 bits, i.e.
P(keep) = 1 - rate exactly, matching ``random.bernoulli(key, 1 - rate)``
in distribution (the stream differs — dropout streams are never
bit-compared across frameworks anyway, SURVEY.md §7.3).

Reference dropout sites: impl/models.py:166 (in-conv), :250,:259 (trunk).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def rbg_bernoulli_keep(key, rate: float, shape) -> jnp.ndarray:
    """Boolean keep-mask with P(keep) = 1 - rate from the hardware RNG.

    ``key``: a threefry PRNGKey (typed or raw uint32[2]); it is widened to
    the rbg generator's 128-bit key.
    """
    kd = jax.random.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    k4 = jnp.concatenate([kd, kd]).astype(jnp.uint32)
    rkey = jax.random.wrap_key_data(k4, impl="rbg")
    bits = jax.random.bits(rkey, shape, dtype=jnp.uint32)
    # ceil(rate * 2^32) as the threshold keeps P exactly 1 - rate
    thresh = jnp.uint32(min(int(rate * 4294967296.0 + 0.999999), 4294967295))
    return bits >= thresh


class HWDropout(nn.Module):
    """Drop-in replacement for ``nn.Dropout`` using the TPU hardware RNG."""

    rate: float

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        if self.rate == 1.0:
            return jnp.zeros_like(x)
        key = self.make_rng("dropout")
        keep = rbg_bernoulli_keep(key, self.rate, x.shape)
        return jnp.where(keep, x / (1.0 - self.rate), jnp.zeros_like(x))
