"""Checkpoint/resume (SURVEY.md §5): orbax pytree round-trip, step dirs."""

import jax
import jax.numpy as jnp
import numpy as np

from eov_tpu.utils.checkpoint import latest_step_dir, load_pytree, save_pytree


def test_pytree_roundtrip(tmp_path):
    tree = {
        "params": {"w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4)},
        "step": jnp.asarray(7, jnp.int32),
    }
    path = str(tmp_path / "ckpt")
    save_pytree(path, tree)
    restored = load_pytree(path)
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.asarray(tree["params"]["w"])
    )
    assert int(restored["step"]) == 7


def test_roundtrip_with_template_preserves_dtype(tmp_path):
    tree = {"b": jnp.ones((4,), jnp.bfloat16)}
    path = str(tmp_path / "ckpt2")
    save_pytree(path, tree)
    restored = load_pytree(path, template=jax.tree.map(jnp.zeros_like, tree))
    assert restored["b"].dtype == jnp.bfloat16


def test_latest_step_dir(tmp_path):
    assert latest_step_dir(str(tmp_path / "missing")) is None
    for s in (1, 10, 2):
        (tmp_path / f"step_{s}").mkdir()
    (tmp_path / "not_a_step").mkdir()
    assert latest_step_dir(str(tmp_path)).endswith("step_10")
