"""On-hardware validation — runs ONLY with EOV_TEST_TPU=1 on a real TPU.

The CPU suite validates semantics; these tests re-validate the behaviors
that interpret/CPU mode provably cannot (this round's findings, see
DESIGN.md §8 and BASELINE.md):

* Mosaic has no direct u8->f32 cast (the Pallas crop kernel's int32 detour
  must stay exact on hardware);
* default-precision MXU matmuls truncate f32 inputs (resize + matcher
  HIGHEST-precision paths must hold their parity bounds on hardware);
* the tunnel's block_until_ready is not a reliable fence (these tests sync
  via host reads only).

Run: EOV_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -q
(compiles are minutes-slow over the axon tunnel; keep shapes small).
"""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("EOV_TEST_TPU"), reason="EOV_TEST_TPU=1 required"
)


@pytest.fixture(scope="module")
def tpu_backend():
    import jax

    if jax.default_backend() not in ("tpu",):
        pytest.skip("no TPU backend")
    return jax.default_backend()


@requires_tpu
def test_pallas_crop_exact_on_hardware(tpu_backend):
    import jax.numpy as jnp

    from eov_tpu.ops import preprocess
    from eov_tpu.ops.pallas_preprocess import crop_normalize

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (2, 64, 80, 3), dtype=np.uint8)
    got = np.asarray(
        crop_normalize(jnp.asarray(frames), crop=48, dtype=jnp.float32)
    )
    want = np.asarray(
        preprocess.normalize(
            preprocess.center_crop(jnp.asarray(frames, jnp.float32), 48)
        )
    )
    np.testing.assert_array_equal(got, want)


@requires_tpu
def test_pallas_matcher_full_precision_on_hardware(tpu_backend):
    import jax.numpy as jnp

    from eov_tpu.ops import similarity
    from eov_tpu.ops.pallas_similarity import episode_class_scores

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(4, 5, 256)).astype(np.float32))
    s = jnp.asarray(rng.normal(size=(4, 5, 3, 256)).astype(np.float32))
    mask = jnp.ones((4, 5, 3), jnp.float32)
    for metric in ("cosine", "euclidean"):
        got = np.asarray(episode_class_scores(q, s, mask, metric=metric))
        want = np.asarray(
            similarity.fused_class_scores(q, s, mask, metric=metric)
        )
        rel = np.abs(got - want).max() / (np.abs(want).max() + 1e-9)
        assert rel < 1e-5, (metric, rel)
        assert (got.argmax(-1) == want.argmax(-1)).all()


@requires_tpu
def test_f32_resize_pil_parity_on_hardware(tpu_backend):
    import jax.numpy as jnp
    from PIL import Image

    from eov_tpu.ops import resize as rz

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (93, 121, 3), dtype=np.uint8)
    got = np.asarray(rz.resize_hw(jnp.asarray(img, jnp.float32), 64, 83))
    ref = np.stack(
        [
            np.asarray(
                Image.fromarray(img[:, :, c]).resize((83, 64), Image.BILINEAR),
                np.float32,
            )
            for c in range(3)
        ],
        -1,
    )
    assert np.abs(got - ref).max() <= 1.0  # <= 1 uint8 LSB


@requires_tpu
def test_eval_matchers_agree_on_hardware(tpu_backend):
    import dataclasses

    import jax.numpy as jnp

    from eov_tpu.eval import EvalConfig, FeatureTable, evaluate

    rng = np.random.default_rng(0)
    protos = rng.normal(size=(12, 1, 256))
    feats = (protos + 0.8 * rng.normal(size=(12, 10, 256))).astype(np.float32)
    table = FeatureTable(jnp.asarray(feats), jnp.full((12,), 10, jnp.int32))
    cfg = EvalConfig(n_way=5, n_query=3, n_episodes=64, seed=3)
    rx = evaluate(table, dataclasses.replace(cfg, matcher="xla"))
    rp = evaluate(table, dataclasses.replace(cfg, matcher="pallas"))
    np.testing.assert_array_equal(rx.per_episode, rp.per_episode)


@requires_tpu
def test_fused_feature_program_pallas_vs_xla_on_hardware(tpu_backend):
    """The production program (Pallas crop + BN-folded bf16 backbone) agrees
    with its pure-XLA twin end to end on hardware (small shapes)."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.extract import ExtractConfig, make_feature_fn
    from eov_tpu.models import ResNet50

    params = ResNet50(dtype=jnp.bfloat16).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    frames = jnp.asarray(
        np.random.default_rng(0).integers(
            0, 256, (2, 3, 64, 80, 3), dtype=np.uint8
        )
    )
    base = dict(num_segments=3, scale_size=64, crop_size=48)
    f_pallas = make_feature_fn(
        params, ExtractConfig(pallas_crop=True, **base)
    )
    f_xla = make_feature_fn(
        params, ExtractConfig(pallas_crop=False, **base)
    )
    a = np.asarray(f_pallas(frames))
    b = np.asarray(f_xla(frames))
    scale = np.abs(b).max() + 1e-9
    # The kernel's normalize affine runs in f32 (cast-on-store) while the
    # XLA path normalizes in bf16, so backbone inputs differ by bf16 input
    # rounding; through ~50 bf16 layers that measures ~3e-3 relative.
    assert np.abs(a - b).max() / scale < 1.5e-2
    # Feature direction must be essentially identical (what eval consumes).
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    assert np.sum(an * bn, axis=1).min() > 0.99999


@requires_tpu
def test_fused_bottleneck_stack_on_hardware(tpu_backend):
    """The VMEM-resident bottleneck stack compiles under Mosaic and matches
    the XLA folded blocks on hardware (small shapes; f32 for tight bounds,
    bf16 for the production dtype)."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.models import ResNet50
    from eov_tpu.models.folded_infer import folded_feature_apply
    from eov_tpu.models.resnet import feature_apply, fold_batchnorm

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 48, 48, 3))
    )
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 48, 48, 3)).astype(np.float32))

    want32 = np.asarray(feature_apply(folded, x, dtype=jnp.float32,
                                      folded=True))
    got32 = np.asarray(folded_feature_apply(
        folded, x, dtype=jnp.float32, fused_stages=(1, 2)
    ))
    scale = np.abs(want32).max() + 1e-9
    assert np.abs(got32 - want32).max() / scale < 1e-3

    want16 = np.asarray(feature_apply(folded, x, dtype=jnp.bfloat16,
                                      folded=True))
    got16 = np.asarray(folded_feature_apply(
        folded, x, dtype=jnp.bfloat16, fused_stages=(1,)
    ))
    scale = np.abs(want16).max() + 1e-9
    assert np.abs(got16 - want16).max() / scale < 1.5e-2
    gn = got16 / np.linalg.norm(got16, axis=1, keepdims=True)
    wn = want16 / np.linalg.norm(want16, axis=1, keepdims=True)
    assert np.sum(gn * wn, axis=1).min() > 0.9999


@requires_tpu
def test_grouped_fused_bottleneck_on_hardware(tpu_backend):
    """fused_group=2 (the production default) compiles under Mosaic with the
    raised scoped-VMEM cap and is bit-identical to group=1 on hardware."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.ops.pallas_bottleneck import fused_bottleneck_stack

    rng = np.random.default_rng(1)
    n, h, w, cin, cmid, cout = 4, 8, 16, 128, 128, 256

    def mk(shape):
        return jnp.asarray(
            (rng.standard_normal(shape) * 0.1).astype(np.float32)
        ).astype(jnp.bfloat16)

    blocks = []
    for bi in range(2):
        ci = cin if bi == 0 else cout
        b = {"w1": mk((ci, cmid)),
             "b1": jnp.asarray(rng.standard_normal((1, cmid)).astype(np.float32)),
             "w2": mk((9, cmid, cmid)),
             "b2": jnp.asarray(rng.standard_normal((1, cmid)).astype(np.float32)),
             "w3": mk((cmid, cout)),
             "b3": jnp.asarray(rng.standard_normal((1, cout)).astype(np.float32))}
        if bi == 0:
            b["wd"] = mk((ci, cout))
            b["bd"] = jnp.asarray(
                rng.standard_normal((1, cout)).astype(np.float32)
            )
        blocks.append(b)
    x = mk((n, h * w, cin))
    base = np.asarray(
        fused_bottleneck_stack(x, blocks, h=h, w=w).astype(jnp.float32)
    )
    got = np.asarray(
        fused_bottleneck_stack(x, blocks, h=h, w=w, group=2).astype(
            jnp.float32
        )
    )
    np.testing.assert_array_equal(got, base)


@requires_tpu
def test_train_fused_stack_fwd_bwd_on_hardware(tpu_backend):
    """Compiled train-mode fused stack (ops/pallas_bottleneck_train.py):
    forward and the custom backward (dx + all conv wgrads) match the JAX
    reference on the real chip. Mosaic-compiled vs interpret divergence is
    exactly what this guards (CLAUDE.md: always hardware-test kernels)."""
    import jax.numpy as jnp

    import eov_tpu.ops.pallas_bottleneck_train as bt

    rng = np.random.default_rng(11)
    h, w, cin, cmid, cout = 8, 16, 128, 64, 128

    def mk(ci, proj):
        b = {"w1": rng.normal(0, .1, (ci, cmid)),
             "w2": rng.normal(0, .1, (9, cmid, cmid)),
             "w3": rng.normal(0, .1, (cmid, cout)),
             "s1": rng.normal(1, .05, cmid), "b1": rng.normal(0, .05, cmid),
             "s2": rng.normal(1, .05, cmid), "b2": rng.normal(0, .05, cmid),
             "s3": rng.normal(1, .05, cout), "b3": rng.normal(0, .05, cout)}
        if proj:
            b["wd"] = rng.normal(0, .1, (ci, cout))
            b["sd"] = rng.normal(1, .05, cout)
            b["bd"] = rng.normal(0, .05, cout)
        return {k: jnp.asarray(v, jnp.float32) for k, v in b.items()}

    blocks = [mk(cin, True), mk(cout, False)]
    x = jnp.asarray(
        rng.normal(0, 1, (4, h * w, cin)).astype(np.float32)
    )
    dy = jnp.asarray(
        rng.normal(0, 1, (4, h * w, cout)).astype(np.float32)
    )

    yp = np.asarray(bt._fwd_pallas(
        x, blocks, h=h, w=w, dtype=jnp.bfloat16, interpret=False
    ))
    yr = np.asarray(bt._stack_forward_ref(
        x, blocks, h=h, w=w, dtype=jnp.bfloat16
    ))
    assert np.abs(yp - yr).max() / (np.abs(yr).max() + 1e-9) < 2e-2

    dxp, dwsp = bt._bwd_pallas(
        x, blocks, dy, h=h, w=w, dtype=jnp.bfloat16, interpret=False
    )
    dxr, dwsr = bt._bwd_ref(x, blocks, dy, h=h, w=w, dtype=jnp.bfloat16)
    assert (np.abs(np.asarray(dxp) - np.asarray(dxr)).max()
            / (np.abs(np.asarray(dxr)).max() + 1e-9)) < 2e-2
    for i, (r, p_) in enumerate(zip(dwsr, dwsp)):
        for k in r:
            a, b_ = np.asarray(r[k]), np.asarray(p_[k])
            rel = np.abs(a - b_).max() / (np.abs(a).max() + 1e-9)
            assert rel < 3e-2, (i, k, rel)


@requires_tpu
def test_pool_in_stack_on_hardware(tpu_backend):
    """ops/pallas_bottleneck.py fused_pool_bottleneck_stack compiles under
    Mosaic (the (H, W)->P sublane-tile merge reshape is the risky op) and
    equals maxpool -> fused_bottleneck_stack on hardware."""
    import jax.numpy as jnp

    from eov_tpu.ops.pallas_bottleneck import (
        fused_bottleneck_stack, fused_pool_bottleneck_stack,
    )

    rng = np.random.default_rng(5)
    n, h2, w2, cin, cmid, cout = 2, 16, 16, 64, 64, 128
    x = jnp.asarray(
        np.maximum(rng.normal(size=(n, h2, w2, cin)), 0.0).astype(np.float32)
    ).astype(jnp.bfloat16)

    def blk(ci, proj):
        b = {
            "w1": jnp.asarray(rng.normal(size=(ci, cmid)).astype(np.float32)),
            "b1": jnp.asarray(rng.normal(size=(1, cmid)).astype(np.float32)),
            "w2": jnp.asarray(
                rng.normal(size=(9, cmid, cmid)).astype(np.float32) * 0.1
            ),
            "b2": jnp.asarray(rng.normal(size=(1, cmid)).astype(np.float32)),
            "w3": jnp.asarray(
                rng.normal(size=(cmid, cout)).astype(np.float32)
            ),
            "b3": jnp.asarray(rng.normal(size=(1, cout)).astype(np.float32)),
        }
        if proj:
            b["wd"] = jnp.asarray(
                rng.normal(size=(ci, cout)).astype(np.float32)
            )
            b["bd"] = jnp.asarray(
                rng.normal(size=(1, cout)).astype(np.float32)
            )
        return b

    blocks = [blk(cin, True), blk(cout, False)]
    import jax

    pooled = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    h, w = h2 // 2, w2 // 2
    for group in (1, 2):
        want = np.asarray(fused_bottleneck_stack(
            pooled.reshape(n, h * w, cin), blocks, h=h, w=w, group=group,
        ).astype(jnp.float32))
        got = np.asarray(fused_pool_bottleneck_stack(
            x, blocks, group=group,
        ).astype(jnp.float32))
        np.testing.assert_array_equal(got, want)


@requires_tpu
def test_pallas_maxpool_on_hardware(tpu_backend):
    """ops/pallas_pool.py: the lane-folded stem maxpool kernel compiles
    under Mosaic (strided leading-dim indexing + sublane concat) and is
    bit-identical to reduce_window on hardware, f32 and bf16."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.ops.pallas_pool import maxpool_3x3_s2_nonneg

    rng = np.random.default_rng(3)
    for dtype in (jnp.float32, jnp.bfloat16):
        x = jnp.asarray(
            np.maximum(rng.normal(size=(2, 16, 24, 64)), 0.0)
            .astype(np.float32)
        ).astype(dtype)
        got = np.asarray(maxpool_3x3_s2_nonneg(x))
        want = np.asarray(jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
            [(0, 0), (1, 1), (1, 1), (0, 0)],
        ))
        np.testing.assert_array_equal(got, want)


@requires_tpu
def test_fused_basic_stack_on_hardware(tpu_backend):
    """The basic-block (resnet18/34) fused stack compiles under Mosaic and
    matches the XLA folded blocks on hardware — f32 tight, bf16 at the
    production-dtype bound; grouped == ungrouped bit-identical (r3)."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.models import get_arch
    from eov_tpu.models.folded_infer import folded_feature_apply
    from eov_tpu.models.resnet import feature_apply, fold_batchnorm

    model = get_arch("resnet18")[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(6), jnp.zeros((1, 48, 48, 3)))
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((2, 48, 48, 3)).astype(np.float32))

    want32 = np.asarray(feature_apply(folded, x, arch="resnet18",
                                      dtype=jnp.float32, folded=True))
    got32 = np.asarray(folded_feature_apply(
        folded, x, arch="resnet18", dtype=jnp.float32, fused_stages=(1, 2)
    ))
    scale = np.abs(want32).max() + 1e-9
    assert np.abs(got32 - want32).max() / scale < 1e-3

    got32_g2 = np.asarray(folded_feature_apply(
        folded, x, arch="resnet18", dtype=jnp.float32, fused_stages=(1, 2),
        fused_group=2,
    ))
    np.testing.assert_array_equal(got32_g2, got32)

    want16 = np.asarray(feature_apply(folded, x, arch="resnet18",
                                      dtype=jnp.bfloat16, folded=True))
    got16 = np.asarray(folded_feature_apply(
        folded, x, arch="resnet18", dtype=jnp.bfloat16, fused_stages=(1,)
    ))
    scale = np.abs(want16).max() + 1e-9
    assert np.abs(got16 - want16).max() / scale < 1.5e-2


@requires_tpu
def test_quant_int8_forward_on_hardware(tpu_backend):
    """The int8 MXU conv walk (models/quant_infer.py) compiles and holds
    its cosine bound vs the f32 folded forward on real hardware — the CPU
    suite cannot prove XLA:TPU's s8xs8->s32 conv lowering behaves."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.models import get_arch
    from eov_tpu.models.folded_infer import folded_feature_apply
    from eov_tpu.models.quant_infer import (
        calibrate_and_quantize, quant_feature_apply,
    )
    from eov_tpu.models.resnet import fold_batchnorm

    model = get_arch("resnet18")[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3)))
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(7)
    x = jnp.asarray(
        rng.uniform(-2.5, 2.5, (2, 4, 64, 64, 3)).astype(np.float32)
    )

    ref = np.asarray(folded_feature_apply(
        folded, x, arch="resnet18", dtype=jnp.float32, fused_stages=()
    ), dtype=np.float64)
    qvars = calibrate_and_quantize(
        folded, x.reshape((-1,) + x.shape[-3:]), arch="resnet18"
    )
    got = np.asarray(quant_feature_apply(
        qvars, x, arch="resnet18", dtype=jnp.float32
    ), dtype=np.float64)
    cos = (got * ref).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(ref, axis=-1)
    )
    assert cos.min() >= 0.99, cos


@requires_tpu
def test_quant_int8_fused_stage1_on_hardware(tpu_backend):
    """The int8 fused stage-1 stack (ops/pallas_bottleneck_int8.py)
    compiles through Mosaic ON HARDWARE (interpret mode proves nothing —
    the u8-cast and i8-muli gaps were both hardware-only) and matches the
    int8 XLA conv walk it rewrites. Equality here is tight-tolerance: the
    int32 accumulations are exact, the f32 dequant chain differs only by
    FMA-contraction ULPs (see tests/test_pallas_bottleneck.py)."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.models import get_arch
    from eov_tpu.models.quant_infer import (
        calibrate_and_quantize, quant_feature_apply,
    )
    from eov_tpu.models.resnet import fold_batchnorm

    model = get_arch("resnet50")[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 3)))
    folded = fold_batchnorm(variables)
    rng = np.random.default_rng(9)
    x = jnp.asarray(
        rng.uniform(-2.5, 2.5, (2, 4, 64, 64, 3)).astype(np.float32)
    )
    qvars = calibrate_and_quantize(
        folded, x.reshape((-1,) + x.shape[-3:]), arch="resnet50"
    )
    want = np.asarray(quant_feature_apply(
        qvars, x, arch="resnet50", dtype=jnp.float32
    ), dtype=np.float64)
    got = np.asarray(quant_feature_apply(
        qvars, x, arch="resnet50", dtype=jnp.float32,
        fused_stages=(1,), fused_group=2,
    ), dtype=np.float64)
    scale = float(np.max(np.abs(want)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3 * scale)
    cos = (got * want).sum(-1) / (
        np.linalg.norm(got, axis=-1) * np.linalg.norm(want, axis=-1)
    )
    assert cos.min() >= 0.999999, cos


@requires_tpu
def test_sharded_quant_int8_featurizer_on_hardware(tpu_backend):
    """Pod-scale int8 extraction's program object (shard_map-wrapped int8
    conv walk + frame-axis psum consensus, parallel/sharded.py) lowers and
    executes on real TPU, matching the single-chip quantized program. A
    1-device ('data','frame') mesh exercises the identical trace; the
    multi-device numerics are proven on the virtual CPU mesh
    (tests/test_parallel.py::test_sharded_quant_int8_matches_single_device)."""
    import jax
    import jax.numpy as jnp

    from eov_tpu.extract import (
        ExtractConfig, make_feature_fn, quant_calibration,
    )
    from eov_tpu.models import get_arch
    from eov_tpu.parallel import make_mesh
    from eov_tpu.parallel.sharded import make_sharded_feature_fn

    model = get_arch("resnet18")[0](dtype=jnp.float32)
    variables = model.init(jax.random.PRNGKey(9), jnp.zeros((1, 64, 64, 3)))
    cfg = ExtractConfig(
        num_segments=2, arch="resnet18", scale_size=36, crop_size=32,
        compute_dtype="float32", quant="int8", quant_calib_clips=2,
    )
    act_max = quant_calibration(variables, cfg)
    rng = np.random.default_rng(9)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, 2, 40, 48, 3), dtype=np.uint8)
    )
    want = np.asarray(make_feature_fn(variables, cfg, act_max=act_max)(frames))
    mesh = make_mesh(1, 1, devices=jax.devices()[:1])
    got = np.asarray(make_sharded_feature_fn(
        variables, mesh, scale_size=36, crop_size=32,
        compute_dtype=jnp.float32, arch="resnet18",
        quant="int8", act_max=act_max,
    )(frames))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
