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


@pytest.mark.parametrize("group", [1, 2])
def test_pool_in_stack_matches_pool_then_stack(group):
    """fused_pool_bottleneck_stack == maxpool -> fused_bottleneck_stack
    bit-exactly (interpret mode), grouped and ungrouped."""
    from eov_tpu.ops.pallas_bottleneck import (
        fused_bottleneck_stack, fused_pool_bottleneck_stack,
    )

    rng = np.random.default_rng(2)
    n, h2, w2, cin, cmid, cout = 2, 16, 16, 8, 8, 32
    x = jnp.asarray(
        np.maximum(rng.normal(size=(n, h2, w2, cin)), 0.0).astype(np.float32)
    )

    def blk(ci, proj):
        b = {
            "w1": jnp.asarray(rng.normal(size=(ci, cmid)).astype(np.float32)),
            "b1": jnp.asarray(rng.normal(size=(1, cmid)).astype(np.float32)),
            "w2": jnp.asarray(
                rng.normal(size=(9, cmid, cmid)).astype(np.float32) * 0.1
            ),
            "b2": jnp.asarray(rng.normal(size=(1, cmid)).astype(np.float32)),
            "w3": jnp.asarray(rng.normal(size=(cmid, cout)).astype(np.float32)),
            "b3": jnp.asarray(rng.normal(size=(1, cout)).astype(np.float32)),
        }
        if proj:
            b["wd"] = jnp.asarray(
                rng.normal(size=(ci, cout)).astype(np.float32)
            )
            b["bd"] = jnp.asarray(rng.normal(size=(1, cout)).astype(np.float32))
        return b

    blocks = [blk(cin, True), blk(cout, False)]
    pooled = _ref_pool(x)
    h, w = h2 // 2, w2 // 2
    want = fused_bottleneck_stack(
        pooled.reshape(n, h * w, cin), blocks, h=h, w=w, group=group,
        interpret=True,
    )
    got = fused_pool_bottleneck_stack(x, blocks, group=group, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_folded_apply_pool_in_stack_parity():
    """folded_feature_apply(pallas_pool='fused') == the reduce_window path
    (interpret mode; whole-model surface)."""
    import jax

    from eov_tpu.models import ResNet50
    from eov_tpu.models.folded_infer import folded_feature_apply
    from eov_tpu.models.resnet import fold_batchnorm

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    want = folded_feature_apply(
        folded, x, dtype=jnp.float32, fused_stages=(1,), interpret=True
    )
    got = folded_feature_apply(
        folded, x, dtype=jnp.float32, fused_stages=(1,),
        pallas_pool="fused", interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


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


def test_folded_apply_fused_pool_requires_stage1():
    """pallas_pool='fused' promises the pool inside the stage-1 stack
    kernel; without stage 1 fused it must refuse loudly instead of
    silently running the standalone kernel under the 'fused' label
    (review r3 — the standalone pool is a recorded throughput
    regression)."""
    import jax

    from eov_tpu.models import ResNet50
    from eov_tpu.models.folded_infer import folded_feature_apply
    from eov_tpu.models.resnet import fold_batchnorm

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    folded = fold_batchnorm(variables)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    with pytest.raises(ValueError, match="requires stage 1"):
        folded_feature_apply(
            folded, x, dtype=jnp.float32, fused_stages=(2,),
            pallas_pool="fused", interpret=True,
        )
