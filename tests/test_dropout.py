"""HWDropout (hardware-RNG dropout): nn.Dropout-equivalent semantics.

Reference dropout sites: impl/models.py:166,250,259 (torch F.dropout =
inverted dropout, P(keep) = 1 - rate, kept values scaled by 1/(1-rate)).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from glass_tpu.nn.dropout import HWDropout, rbg_bernoulli_keep


def test_keep_probability_and_scaling():
    m = HWDropout(0.3)
    x = jnp.ones((4000, 64))
    y = np.asarray(
        m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)})
    )
    keep = (y != 0).mean()
    assert abs(keep - 0.7) < 0.01
    assert np.allclose(y[y != 0], 1.0 / 0.7, rtol=1e-6)


def test_deterministic_given_key_and_distinct_across_keys():
    m = HWDropout(0.5)
    x = jnp.ones((256, 8))
    y0 = np.asarray(
        m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)})
    )
    y1 = np.asarray(
        m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(7)})
    )
    y2 = np.asarray(
        m.apply({}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(8)})
    )
    assert (y0 == y1).all()
    assert (y0 != y2).any()


def test_eval_mode_and_rate_edge_cases():
    x = jnp.arange(32.0).reshape(8, 4)
    assert (np.asarray(HWDropout(0.5).apply({}, x, deterministic=True)) == np.asarray(x)).all()
    assert (
        np.asarray(
            HWDropout(0.0).apply(
                {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(0)}
            )
        )
        == np.asarray(x)
    ).all()


def test_grad_flows_through_kept_elements_only():
    m = HWDropout(0.5)
    x = jnp.ones((512,))

    def f(x):
        return m.apply(
            {}, x, deterministic=False, rngs={"dropout": jax.random.PRNGKey(3)}
        ).sum()

    g = np.asarray(jax.grad(f)(x))
    assert set(np.round(np.unique(g), 5)) == {0.0, 2.0}


@pytest.mark.parametrize("rate", [0.05, 0.5, 0.9])
def test_threshold_matches_rate(rate):
    keep = np.asarray(
        rbg_bernoulli_keep(jax.random.PRNGKey(1), rate, (200_000,))
    )
    assert abs(keep.mean() - (1 - rate)) < 5e-3
