"""Parity: Pallas stem maxpool kernel vs the lax.reduce_window reference.

SURVEY.md §4.2-style kernel parity (interpret mode here; compiled-on-
hardware in tests/test_tpu_hardware.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eov_tpu.ops.pallas_pool import maxpool_3x3_s2_nonneg


def _ref_pool(x):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )


@pytest.mark.parametrize(
    "shape", [(2, 112, 112, 64), (1, 8, 16, 8), (3, 56, 112, 32)]
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_maxpool_kernel_matches_reduce_window(shape, dtype):
    rng = np.random.default_rng(0)
    # Post-ReLU-like input: non-negative, with exact zeros (the padding
    # equivalence relies on >= 0; zeros exercise the tie case).
    x = jnp.asarray(
        np.maximum(rng.normal(size=shape), 0.0).astype(np.float32)
    ).astype(dtype)
    got = maxpool_3x3_s2_nonneg(x, interpret=True)
    want = _ref_pool(x)
    assert got.shape == want.shape == (
        shape[0], shape[1] // 2, shape[2] // 2, shape[3]
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_maxpool_kernel_rejects_odd_hw():
    x = jnp.zeros((1, 7, 8, 4))
    with pytest.raises(ValueError, match="even H/W"):
        maxpool_3x3_s2_nonneg(x, interpret=True)


def test_folded_apply_pallas_pool_parity():
    """folded_feature_apply(pallas_pool=True) == the reduce_window path
    (interpret mode; the kernel swap must not change features at all)."""
    import jax

    from eov_tpu.models import ResNet50
    from eov_tpu.models.folded_infer import folded_feature_apply
    from eov_tpu.models.resnet import fold_batchnorm

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    want = folded_feature_apply(
        folded, x, dtype=jnp.float32, fused_stages=(1,), interpret=True
    )
    got = folded_feature_apply(
        folded, x, dtype=jnp.float32, fused_stages=(1,), pallas_pool=True,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
