"""Parameter initializers with torch-parity distributions.

The reference's accuracy numbers are sensitive to init at the tiny hidden
sizes it uses (hidden_dim 8-64), so we match torch's *distributions* (exact
RNG streams cannot and need not match across frameworks — SURVEY.md §7.3):

- ``nn.Linear.reset_parameters``: weight ~ kaiming_uniform(a=sqrt(5)) which
  reduces to U(-1/sqrt(fan_in), 1/sqrt(fan_in)); bias ~ same bound.
- ``nn.Embedding``: N(0, 1).
- PyG ``GraphNorm``: weight=1, bias=0, mean_scale=1.
"""

from __future__ import annotations

import numpy as np
import jax


def torch_linear_kernel_init(key, shape, dtype=jax.numpy.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); shape is (fan_in, features)."""
    fan_in = shape[0]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def make_torch_bias_init(fan_in: int):
    """torch Linear bias init needs fan_in, which flax doesn't pass to bias
    initializers — close over it."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jax.numpy.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_embedding_init(key, shape, dtype=jax.numpy.float32):
    """torch nn.Embedding default: N(0, 1)."""
    return jax.random.normal(key, shape, dtype)
