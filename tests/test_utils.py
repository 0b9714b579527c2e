"""Checkpoint and profiling utility tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from glass_tpu.utils.checkpoint import save_checkpoint, load_checkpoint
from glass_tpu.utils.profiling import StepMeter, nan_check_mode


def test_checkpoint_roundtrip(tmp_path, rng):
    tree = {
        "params": {
            "a": jnp.asarray(rng.normal(size=(3, 4)).astype(np.float32)),
            "nested": {"b": jnp.arange(5)},
        }
    }
    p = tmp_path / "ckpt.npz"
    save_checkpoint(p, tree)
    like = jax.tree.map(jnp.zeros_like, tree)
    back = load_checkpoint(p, like)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_shape_mismatch_raises(tmp_path):
    save_checkpoint(tmp_path / "c.npz", {"w": jnp.zeros((2, 2))})
    with pytest.raises(ValueError, match="shape"):
        load_checkpoint(tmp_path / "c.npz", {"w": jnp.zeros((3, 3))})


def test_checkpoint_missing_key_raises(tmp_path):
    save_checkpoint(tmp_path / "c.npz", {"w": jnp.zeros(2)})
    with pytest.raises(KeyError):
        load_checkpoint(tmp_path / "c.npz", {"w": jnp.zeros(2), "v": jnp.zeros(1)})


def test_step_meter():
    m = StepMeter(edges_per_step=100, subgraphs_per_step=4)
    m.start()
    for _ in range(5):
        m.tick()
    assert m.steps == 5
    assert m.edges_per_s > 0
    assert "steps/s" in m.summary()


def test_nan_check_mode_catches():
    with pytest.raises(FloatingPointError):
        with nan_check_mode():
            jax.jit(lambda x: jnp.log(x))(jnp.asarray(-1.0)).block_until_ready()
    # mode restored
    assert not jax.config.jax_debug_nans
