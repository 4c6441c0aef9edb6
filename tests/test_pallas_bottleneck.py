"""Parity tests for the VMEM-resident fused bottleneck stack.

Semantics chain: ops/pallas_bottleneck.py (interpret mode here; compiled on
hardware in test_tpu_hardware.py) == models/folded_infer.py XLA blocks ==
the flax folded forward (models/resnet.py) — the production inference
program (SURVEY.md §3.1 hot loop, VERDICT r1 next-round #2).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eov_tpu.models import ResNet50
from eov_tpu.models.resnet import fold_batchnorm, feature_apply
from eov_tpu.models.folded_infer import folded_feature_apply
from eov_tpu.ops.pallas_bottleneck import fused_bottleneck_stack


def _mk_blocks(rng, cin, cmid, cout, n_blocks):
    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)

    blocks = []
    for bi in range(n_blocks):
        ci = cin if bi == 0 else cout
        b = {"w1": mk((ci, cmid)), "b1": mk((1, cmid)),
             "w2": mk((9, cmid, cmid)), "b2": mk((1, cmid)),
             "w3": mk((cmid, cout)), "b3": mk((1, cout))}
        if bi == 0 and ci != cout:
            b["wd"] = mk((ci, cout))
            b["bd"] = mk((1, cout))
        blocks.append(b)
    return blocks


def _ref_stack(x, blocks):
    """XLA reference of the same stack (NHWC convs)."""
    for b in blocks:
        cmid = b["w2"].shape[-1]
        y = jnp.maximum(jnp.einsum("nhwc,cd->nhwd", x, b["w1"]) + b["b1"][0], 0)
        k = b["w2"].reshape(3, 3, cmid, cmid)
        y = jax.lax.conv_general_dilated(
            y, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jnp.maximum(y + b["b2"][0], 0)
        y = jnp.einsum("nhwc,cd->nhwd", y, b["w3"]) + b["b3"][0]
        r = (jnp.einsum("nhwc,cd->nhwd", x, b["wd"]) + b["bd"][0]
             if "wd" in b else x)
        x = jnp.maximum(y + r, 0)
    return x


@pytest.mark.parametrize("h,w", [(6, 10), (5, 7), (8, 8)])
def test_kernel_matches_xla_reference(h, w):
    """Edge columns/rows (the flat-shift wrap masks) across odd shapes."""
    rng = np.random.default_rng(0)
    n, cin, cmid, cout = 2, 24, 16, 32
    blocks = _mk_blocks(rng, cin, cmid, cout, 3)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
    want = np.asarray(_ref_stack(x, blocks))
    got = np.asarray(
        fused_bottleneck_stack(
            x.reshape(n, h * w, cin), blocks, h=h, w=w, interpret=True
        )
    ).reshape(n, h, w, cout)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def folded50():
    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))
    )
    return fold_batchnorm(variables)


def test_folded_infer_unfused_matches_flax(folded50):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(feature_apply(folded50, x, dtype=jnp.float32,
                                    folded=True))
    got = np.asarray(folded_feature_apply(folded50, x, dtype=jnp.float32,
                                          fused_stages=()))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_folded_infer_all_stages_fused_matches_flax(folded50):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(feature_apply(folded50, x, dtype=jnp.float32,
                                    folded=True))
    got = np.asarray(folded_feature_apply(
        folded50, x, dtype=jnp.float32, fused_stages=(1, 2, 3, 4),
        interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_extract_config_fused_stages_end_to_end(folded50):
    """The production surface: make_feature_fn(fused_stages=(1,)) equals the
    default program on the same uint8 frames (CPU interpret mode)."""
    from eov_tpu.extract import ExtractConfig, make_feature_fn

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    frames = jnp.asarray(
        np.random.default_rng(3).integers(0, 256, (2, 3, 56, 72, 3),
                                          dtype=np.uint8)
    )
    base = dict(num_segments=3, scale_size=56, crop_size=48,
                compute_dtype="float32")
    f_ref = make_feature_fn(variables, ExtractConfig(**base))
    f_fus = make_feature_fn(
        variables, ExtractConfig(fused_stages=(1, 2), **base)
    )
    a, b = np.asarray(f_ref(frames)), np.asarray(f_fus(frames))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_fused_bf16_close_to_xla_bf16(folded50):
    """The production dtype: bf16 activations through the fused stack stay
    within bf16 rounding of the XLA bf16 program."""
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 64, 64, 3)).astype(np.float32))
    want = np.asarray(feature_apply(folded50, x, dtype=jnp.bfloat16,
                                    folded=True))
    got = np.asarray(folded_feature_apply(
        folded50, x, dtype=jnp.bfloat16, fused_stages=(1,), interpret=True
    ))
    scale = np.abs(want).max() + 1e-9
    assert np.abs(got - want).max() / scale < 1.5e-2
    gn = got / np.linalg.norm(got, axis=1, keepdims=True)
    wn = want / np.linalg.norm(want, axis=1, keepdims=True)
    assert np.sum(gn * wn, axis=1).min() > 0.9999


@pytest.mark.parametrize("group", [2, 4])
def test_grouped_kernel_bit_identical_to_group1(group):
    """group > 1 interleaves independent per-image chains — the math per
    image is unchanged, so results must be bit-identical to group=1 (and
    to the XLA reference within tolerance)."""
    rng = np.random.default_rng(5)
    n, h, w, cin, cmid, cout = 4, 6, 10, 24, 16, 32
    blocks = _mk_blocks(rng, cin, cmid, cout, 2)
    x = jnp.asarray(rng.standard_normal((n, h, w, cin)).astype(np.float32))
    flat = x.reshape(n, h * w, cin)
    base = np.asarray(
        fused_bottleneck_stack(flat, blocks, h=h, w=w, interpret=True)
    )
    got = np.asarray(
        fused_bottleneck_stack(
            flat, blocks, h=h, w=w, group=group, interpret=True
        )
    )
    np.testing.assert_array_equal(got, base)
    want = np.asarray(_ref_stack(x, blocks))
    np.testing.assert_allclose(
        got.reshape(n, h, w, cout), want, rtol=1e-5, atol=1e-5
    )


def test_grouped_kernel_non_divisible_degrades():
    """N not divisible by group falls back to group=1 (same results)."""
    rng = np.random.default_rng(6)
    n, h, w, cin, cmid, cout = 3, 5, 7, 16, 8, 16
    blocks = _mk_blocks(rng, cin, cmid, cout, 1)
    x = jnp.asarray(
        rng.standard_normal((n, h * w, cin)).astype(np.float32)
    )
    base = np.asarray(
        fused_bottleneck_stack(x, blocks, h=h, w=w, interpret=True)
    )
    got = np.asarray(
        fused_bottleneck_stack(x, blocks, h=h, w=w, group=2, interpret=True)
    )
    np.testing.assert_array_equal(got, base)


def test_folded_infer_fused_generalizes_to_resnet101():
    """The fusion path is arch-generic over bottleneck families: resnet101's
    stage 1 (3 blocks, same shapes as resnet50) through the fused stack
    equals its flax folded forward."""
    from eov_tpu.models import get_arch

    model = get_arch("resnet101")[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 48, 48, 3)))
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((1, 48, 48, 3)).astype(np.float32))
    want = np.asarray(feature_apply(folded, x, arch="resnet101",
                                    dtype=jnp.float32, folded=True))
    got = np.asarray(folded_feature_apply(
        folded, x, arch="resnet101", dtype=jnp.float32,
        fused_stages=(1,), fused_group=2, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_bottleneck_block_missing_w3_fails_loudly():
    """A bottleneck block missing BOTH w3 and b3 must KeyError, not be
    silently reclassified as a basic block (review r3: that shortened the
    flat param list by two entries and walked the positional ref stream
    into the out/scratch refs)."""
    rng = np.random.default_rng(12)
    blocks = _mk_blocks(rng, 16, 4, 16, 2)
    del blocks[1]["w3"], blocks[1]["b3"]
    x = jnp.zeros((1, 35, 16), jnp.float32)
    with pytest.raises(KeyError, match="w3"):
        fused_bottleneck_stack(x, blocks, h=5, w=7, interpret=True)
