"""Parity tests for the VMEM-resident fused BASIC-block stack (r3).

Same semantics chain as the bottleneck stack tests: the Pallas kernel
(interpret mode here, compiled on hardware in test_tpu_hardware.py) ==
models/folded_infer.py XLA basic blocks == the flax folded forward for
resnet18/34 (SURVEY.md §2a C4 family breadth).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eov_tpu.models import get_arch
from eov_tpu.models.folded_infer import folded_feature_apply
from eov_tpu.models.resnet import feature_apply, fold_batchnorm
from eov_tpu.ops.pallas_bottleneck import fused_basic_stack


def _mk_blocks(rng, c, n_blocks):
    def mk(shape):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 0.1)

    return [
        {"w1": mk((9, c, c)), "b1": mk((1, c)),
         "w2": mk((9, c, c)), "b2": mk((1, c))}
        for _ in range(n_blocks)
    ]


def _ref_stack(x, blocks):
    """XLA reference of the same basic stack (NHWC convs)."""
    for b in blocks:
        c = b["w1"].shape[-1]
        k1 = b["w1"].reshape(3, 3, c, c)
        k2 = b["w2"].reshape(3, 3, c, c)
        y = jax.lax.conv_general_dilated(
            x, k1, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jnp.maximum(y + b["b1"][0], 0)
        y = jax.lax.conv_general_dilated(
            y, k2, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = jnp.maximum(y + b["b2"][0] + x, 0)
    return x


@pytest.mark.parametrize("h,w", [(6, 10), (5, 7), (8, 8)])
def test_basic_kernel_matches_xla_reference(h, w):
    rng = np.random.default_rng(0)
    n, c = 2, 24
    blocks = _mk_blocks(rng, c, 2)
    x = jnp.asarray(rng.standard_normal((n, h, w, c)).astype(np.float32))
    want = np.asarray(_ref_stack(x, blocks))
    got = np.asarray(
        fused_basic_stack(
            x.reshape(n, h * w, c), blocks, h=h, w=w, interpret=True
        )
    ).reshape(n, h, w, c)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_basic_grouped_bit_identical_to_group1():
    rng = np.random.default_rng(1)
    n, h, w, c = 4, 6, 10, 16
    blocks = _mk_blocks(rng, c, 2)
    x = jnp.asarray(
        rng.standard_normal((n, h * w, c)).astype(np.float32)
    )
    base = np.asarray(fused_basic_stack(x, blocks, h=h, w=w, interpret=True))
    got = np.asarray(
        fused_basic_stack(x, blocks, h=h, w=w, group=2, interpret=True)
    )
    np.testing.assert_array_equal(got, base)


@pytest.mark.parametrize("arch", ["resnet18", "resnet34"])
def test_folded_infer_basic_all_stages_fused_matches_flax(arch):
    model = get_arch(arch)[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 48, 48, 3)))
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 48, 48, 3)).astype(np.float32))
    want = np.asarray(feature_apply(folded, x, arch=arch,
                                    dtype=jnp.float32, folded=True))
    got_unfused = np.asarray(folded_feature_apply(
        folded, x, arch=arch, dtype=jnp.float32, fused_stages=()
    ))
    np.testing.assert_allclose(got_unfused, want, rtol=1e-5, atol=1e-5)
    got = np.asarray(folded_feature_apply(
        folded, x, arch=arch, dtype=jnp.float32,
        fused_stages=(1, 2, 3, 4), fused_group=2, interpret=True,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_extract_fused_stages_end_to_end_resnet18():
    """make_feature_fn with an explicit fused-stage spec on a basic arch
    equals the default program (the CLI's --arch resnet18 --fused-stages 1
    surface)."""
    from eov_tpu.extract import ExtractConfig, make_feature_fn

    model = get_arch("resnet18")[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(4), jnp.zeros((1, 48, 48, 3)))
    frames = jnp.asarray(
        np.random.default_rng(5).integers(0, 256, (2, 3, 56, 72, 3),
                                          dtype=np.uint8)
    )
    base = dict(num_segments=3, scale_size=56, crop_size=48,
                compute_dtype="float32", arch="resnet18")
    f_ref = make_feature_fn(variables, ExtractConfig(**base))
    f_fus = make_feature_fn(
        variables, ExtractConfig(fused_stages=(1, 2), **base)
    )
    a, b = np.asarray(f_ref(frames)), np.asarray(f_fus(frames))
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


def test_pack_basic_rejects_projection_and_widening():
    from eov_tpu.ops.pallas_bottleneck import pack_basic_params

    with pytest.raises(ValueError, match="projection"):
        pack_basic_params({"downsample_conv": {}, "conv1": {}, "conv2": {}})
    bad = {
        "conv1": {"kernel": jnp.zeros((3, 3, 16, 32))},
        "conv2": {"kernel": jnp.zeros((3, 3, 32, 32))},
        "bn1": {"bias": jnp.zeros(32)},
        "bn2": {"bias": jnp.zeros(32)},
    }
    with pytest.raises(ValueError, match="Cin == Cout"):
        pack_basic_params(bad)


def test_incomplete_block_dict_fails_loudly():
    """A block missing a required kernel param must KeyError at flatten
    time — the kernels consume refs positionally, so a silently shortened
    param list would walk into the out/scratch refs."""
    rng = np.random.default_rng(9)
    blocks = _mk_blocks(rng, 16, 1)
    del blocks[0]["b2"]
    x = jnp.zeros((1, 35, 16), jnp.float32)
    with pytest.raises(KeyError, match="b2"):
        fused_basic_stack(x, blocks, h=5, w=7, interpret=True)


def test_basic_stack_rejects_stray_bottleneck_keys():
    """The basic chain consumes exactly 4 refs per block; stray bottleneck
    or projection keys must KeyError at flatten time, not desync the
    positional ref walk (review r3: kind is declared by the caller, never
    inferred from which keys happen to be present)."""
    rng = np.random.default_rng(11)
    blocks = _mk_blocks(rng, 16, 2)
    blocks[1]["w3"] = blocks[1]["w1"]  # e.g. a mispacked bottleneck block
    x = jnp.zeros((1, 35, 16), jnp.float32)
    with pytest.raises(KeyError, match="non-basic"):
        fused_basic_stack(x, blocks, h=5, w=7, interpret=True)
