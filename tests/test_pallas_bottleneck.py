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


# ---- int8 fused stack (ops/pallas_bottleneck_int8.py, r5) ----------------
#
# Semantics reference: models/quant_infer.py's XLA conv walk (_qconv) —
# the measured +17.8% int8 production path. The kernel mirrors its
# dequant/requant chain op for op (module doc). The int32 accumulations
# are order-independent-exact; the f32 dequant/bias chain is the same
# expression on both sides but XLA's FMA-contraction decisions differ
# between the kernel's jit and the eager reference (~2 f32 ULPs measured),
# so parity is tight-tolerance, not bitwise; grouped-vs-g1 IS bitwise.

from eov_tpu.ops.pallas_bottleneck_int8 import (  # noqa: E402
    fused_bottleneck_stack_int8, pack_bottleneck_params_int8,
)


def _mk_qblocks(rng, cin, cmid, cout, n_blocks):
    """Random int8 weights + random positive scales, kernel layout."""
    def wq(shape):
        return jnp.asarray(rng.integers(-127, 128, shape, dtype=np.int8))

    def sc(c):
        return jnp.asarray(
            rng.uniform(1e-3, 2e-2, (1, c)).astype(np.float32))

    def inv():
        return jnp.asarray(
            rng.uniform(0.5, 4.0, (1, 1)).astype(np.float32))

    def bias(c):
        return jnp.asarray(
            (rng.standard_normal((1, c)) * 0.2).astype(np.float32))

    blocks = []
    for bi in range(n_blocks):
        ci = cin if bi == 0 else cout
        b = {"w1": wq((ci, cmid)), "s1": sc(cmid), "q1": inv(),
             "b1": bias(cmid),
             "w2": wq((9, cmid, cmid)), "s2": sc(cmid), "q2": inv(),
             "b2": bias(cmid),
             "w3": wq((cmid, cout)), "s3": sc(cout), "q3": inv(),
             "b3": bias(cout)}
        if bi == 0 and ci != cout:
            b.update({"wd": wq((ci, cout)), "sd": sc(cout), "qd": inv(),
                      "bd": bias(cout)})
        blocks.append(b)
    return blocks


def _qref_stack(x, blocks, dtype):
    """XLA mirror of quant_infer._qconv over the same stack (NHWC)."""
    def quant(v, inv_a):
        return jnp.clip(
            jnp.round(v.astype(jnp.float32) * inv_a[0, 0]), -127.0, 127.0
        ).astype(jnp.int8)

    def deq(acc, scale):
        return (acc.astype(jnp.float32) * scale[0]).astype(dtype)

    x = x.astype(dtype)
    for b in blocks:
        cmid = b["w2"].shape[-1]
        xq = quant(x, b["q1"])
        a1 = jnp.einsum("nhwc,cd->nhwd", xq.astype(jnp.int32),
                        b["w1"].astype(jnp.int32))
        y1 = jnp.maximum(deq(a1, b["s1"]) + b["b1"][0].astype(dtype), 0)
        y1q = quant(y1, b["q2"])
        a2 = jax.lax.conv_general_dilated(
            y1q, b["w2"].reshape(3, 3, cmid, cmid), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y2 = jnp.maximum(deq(a2, b["s2"]) + b["b2"][0].astype(dtype), 0)
        a3 = jnp.einsum("nhwc,cd->nhwd", quant(y2, b["q3"]).astype(jnp.int32),
                        b["w3"].astype(jnp.int32))
        y3 = deq(a3, b["s3"]) + b["b3"][0].astype(dtype)
        if "wd" in b:
            ad = jnp.einsum("nhwc,cd->nhwd",
                            quant(x, b["qd"]).astype(jnp.int32),
                            b["wd"].astype(jnp.int32))
            r = deq(ad, b["sd"]) + b["bd"][0].astype(dtype)
        else:
            r = x
        x = jnp.maximum(y3 + r, 0).astype(dtype)
    return x


@pytest.mark.parametrize("h,w", [(6, 10), (5, 7)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_int8_kernel_matches_quant_walk(h, w, dtype):
    """Edge masks, requant chains, projection residual — exact equality."""
    rng = np.random.default_rng(20)
    n, cin, cmid, cout = 2, 24, 16, 32
    blocks = _mk_qblocks(rng, cin, cmid, cout, 3)
    x = jnp.asarray(
        (rng.standard_normal((n, h, w, cin)) * 0.5).astype(np.float32))
    want = np.asarray(_qref_stack(x, blocks, dtype), np.float32)
    got = np.asarray(
        fused_bottleneck_stack_int8(
            x.astype(dtype).reshape(n, h * w, cin), blocks, h=h, w=w,
            interpret=True,
        ), np.float32,
    ).reshape(n, h, w, cout)
    # f32: ~2-ULP FMA-contraction slack; bf16: one mantissa LSB. A ULP at
    # the f32 dequant can flip a downstream round() to the neighboring
    # int8 code — allow that quantization-grid step on a few elements.
    rtol = 1e-5 if dtype == jnp.float32 else 1e-2
    scale = float(np.max(np.abs(want)))
    close = np.isclose(got, want, rtol=rtol, atol=rtol * scale)
    assert close.mean() > 0.999, (1 - close.mean(), np.abs(got - want).max())
    np.testing.assert_allclose(got, want, rtol=0.05, atol=0.05 * scale)


@pytest.mark.parametrize("group", [2, 4])
def test_int8_grouped_bit_identical_to_group1(group):
    rng = np.random.default_rng(21)
    n, h, w, cin, cmid, cout = 4, 6, 10, 24, 16, 32
    blocks = _mk_qblocks(rng, cin, cmid, cout, 2)
    x = jnp.asarray(
        (rng.standard_normal((n, h * w, cin)) * 0.5).astype(np.float32))
    g1 = np.asarray(fused_bottleneck_stack_int8(
        x, blocks, h=h, w=w, group=1, interpret=True))
    gk = np.asarray(fused_bottleneck_stack_int8(
        x, blocks, h=h, w=w, group=group, interpret=True))
    np.testing.assert_array_equal(g1, gk)


def test_quant_apply_fused_stage1_matches_unfused():
    """Full int8 forward: fused_stages=(1,) == the XLA walk — stem,
    maxpool, stages 2-4, and GAP are shared code; stage 1 swaps the conv
    walk for the kernel (pack_bottleneck_params_int8 wiring). Tolerance
    per the FMA-contraction note above, plus the repo's per-clip cosine
    rail on the final features."""
    from eov_tpu.models.quant_infer import (
        calibrate_and_quantize, quant_feature_apply,
    )

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3))
    )
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(22)
    frames = jnp.asarray(
        (rng.standard_normal((2, 64, 64, 3)) * 0.7).astype(np.float32))
    qvars = calibrate_and_quantize(folded, frames, arch="resnet50")
    want = np.asarray(quant_feature_apply(
        qvars, frames, arch="resnet50", dtype=jnp.float32))
    got = np.asarray(quant_feature_apply(
        qvars, frames, arch="resnet50", dtype=jnp.float32,
        fused_stages=(1,), fused_group=2, interpret=True))
    scale = float(np.max(np.abs(want)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * scale)
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1))
    assert cos.min() >= 0.999999, cos


def test_int8_fused_stages_refusals():
    from eov_tpu.models.quant_infer import quant_feature_apply

    with pytest.raises(ValueError, match=r"\(1,\) only"):
        quant_feature_apply(
            {"params": {}}, jnp.zeros((1, 64, 64, 3)),
            arch="resnet50", fused_stages=(1, 2), interpret=True)
    with pytest.raises(ValueError, match="bottleneck archs only"):
        quant_feature_apply(
            {"params": {}}, jnp.zeros((1, 64, 64, 3)),
            arch="resnet18", fused_stages=(1,), interpret=True)
