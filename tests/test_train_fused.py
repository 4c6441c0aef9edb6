"""Fused-stage-1 TRAIN path: custom-VJP correctness + integration parity.

Covers ops/pallas_bottleneck_train.py (reference impls, Pallas kernels in
interpret mode) and the train.py wiring (models/fused_train.py stem/tail
against the monolithic flax model). Hardware compilation of the kernels is
covered in tests/test_tpu_hardware.py.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import eov_tpu.ops.pallas_bottleneck_train as bt
from eov_tpu import train as tr


def _mk_block(rng, cin, cmid, cout, proj):
    b = {
        "w1": rng.normal(0, 0.2, (cin, cmid)),
        "w2": rng.normal(0, 0.2, (9, cmid, cmid)),
        "w3": rng.normal(0, 0.2, (cmid, cout)),
        "s1": rng.normal(1, 0.1, cmid), "b1": rng.normal(0, 0.1, cmid),
        "s2": rng.normal(1, 0.1, cmid), "b2": rng.normal(0, 0.1, cmid),
        "s3": rng.normal(1, 0.1, cout), "b3": rng.normal(0, 0.1, cout),
    }
    if proj:
        b["wd"] = rng.normal(0, 0.2, (cin, cout))
        b["sd"] = rng.normal(1, 0.1, cout)
        b["bd"] = rng.normal(0, 0.1, cout)
    return {k: jnp.asarray(v, jnp.float32) for k, v in b.items()}


def _fixture(seed=0, n=3, h=6, w=7, cin=16, cmid=8, cout=32):
    rng = np.random.default_rng(seed)
    blocks = [
        _mk_block(rng, cin, cmid, cout, True),
        _mk_block(rng, cout, cmid, cout, False),
    ]
    x = jnp.asarray(rng.normal(0, 1, (n, h * w, cin)).astype(np.float32))
    dy = jnp.asarray(rng.normal(0, 1, (n, h * w, cout)).astype(np.float32))
    return x, dy, blocks, h, w


def test_custom_bwd_matches_autodiff_exactly():
    """The hand-derived backward == jax.grad of the reference forward
    (f32): dx and every conv-kernel grad bit-comparable; frozen affines
    get zeros."""
    x, _, blocks, h, w = _fixture()

    def loss_ref(x, blocks):
        y = bt._stack_forward_ref(x, blocks, h=h, w=w, dtype=jnp.float32)
        return jnp.sum(jnp.sin(y))

    def loss_cust(x, blocks):
        y = bt.bottleneck_stack_train(
            x, blocks, h, w, "float32", False, False
        )
        return jnp.sum(jnp.sin(y))

    gr = jax.grad(loss_ref, argnums=(0, 1))(x, blocks)
    gc = jax.grad(loss_cust, argnums=(0, 1))(x, blocks)
    np.testing.assert_allclose(np.asarray(gr[0]), np.asarray(gc[0]),
                               rtol=1e-5, atol=1e-5)
    for br, bc in zip(gr[1], gc[1]):
        for k in ("w1", "w2", "w3", "wd"):
            if k in br:
                np.testing.assert_allclose(
                    np.asarray(br[k]), np.asarray(bc[k]),
                    rtol=1e-5, atol=1e-5, err_msg=k,
                )
        for k in ("s1", "b1", "s3", "b3"):
            assert not np.asarray(bc[k]).any(), f"{k} must be zero (frozen)"


def test_pallas_kernels_match_reference_interpret():
    """Forward and backward Pallas kernels == the JAX reference impls
    (interpret mode, f32)."""
    x, dy, blocks, h, w = _fixture(seed=1)
    yr = bt._stack_forward_ref(x, blocks, h=h, w=w, dtype=jnp.float32)
    yp = bt._fwd_pallas(x, blocks, h=h, w=w, dtype=jnp.float32,
                        interpret=True)
    np.testing.assert_allclose(np.asarray(yr), np.asarray(yp),
                               rtol=1e-5, atol=1e-5)

    dxr, dwsr = bt._bwd_ref(x, blocks, dy, h=h, w=w, dtype=jnp.float32)
    dxp, dwsp = bt._bwd_pallas(x, blocks, dy, h=h, w=w, dtype=jnp.float32,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(dxr), np.asarray(dxp),
                               rtol=1e-5, atol=1e-5)
    for i, (r, p_) in enumerate(zip(dwsr, dwsp)):
        for k in r:
            np.testing.assert_allclose(
                np.asarray(r[k]), np.asarray(p_[k]),
                rtol=1e-4, atol=1e-4, err_msg=f"block{i}.{k}",
            )


def test_reference_forward_matches_flax_block():
    """_stack_forward_ref == the flax Bottleneck chain with frozen BN, so
    the oracle itself is anchored to the production model (f32)."""
    import flax.linen as nn

    from eov_tpu.models.resnet import Bottleneck

    rng = np.random.default_rng(3)
    h = w = 8
    x_map = jnp.asarray(
        rng.normal(0, 1, (2, h, w, 16)).astype(np.float32)
    )

    conv = lambda *a, **kw: nn.Conv(  # noqa: E731
        *a, use_bias=False, dtype=jnp.float32, param_dtype=jnp.float32,
        **kw,
    )
    norm = lambda **kw: nn.BatchNorm(  # noqa: E731
        momentum=0.9, epsilon=1e-5, dtype=jnp.float32,
        use_running_average=True, **kw,
    )

    class TwoBlocks(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Bottleneck(filters=4, strides=1, conv=conv, norm=norm,
                           name="layer1_0")(x)
            return Bottleneck(filters=4, strides=1, conv=conv, norm=norm,
                              name="layer1_1")(x)

    m = TwoBlocks()
    variables = m.init(jax.random.PRNGKey(0), x_map)
    # randomize stats/affines so the affine path is non-trivial
    variables = jax.tree.map(
        lambda a: jnp.asarray(
            rng.normal(0.5, 0.3, a.shape).astype(np.float32) ** 2 + 0.1
        )
        if a.ndim == 1 else a,
        variables,
    )
    want = m.apply(variables, x_map)

    blocks = [
        bt.pack_train_block(
            variables["params"][f"layer1_{j}"],
            variables["batch_stats"][f"layer1_{j}"],
        )
        for j in range(2)
    ]
    got = bt.bottleneck_stack_train(
        x_map.reshape(2, h * w, 16), blocks, h, w, "float32", False, False
    ).reshape(2, h, w, -1)
    np.testing.assert_allclose(np.asarray(want), np.asarray(got),
                               rtol=2e-4, atol=2e-4)


def _train_fixture(arch="resnet50"):
    base = dict(num_classes=4, num_segments=2, batch_clips=2,
                compute_dtype="float32", scale_size=36, crop_size=32,
                dropout=0.0, partial_bn=True, lr=0.01, arch=arch)
    cfg_ref = tr.TrainConfig(fused_stage1="off", **base)
    cfg_fus = tr.TrainConfig(fused_stage1="on", **base)
    state = tr.create_train_state(
        cfg_ref, jax.random.PRNGKey(0), sample_hw=(32, 32)
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, 2, 40, 48, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(np.array([1, 3], np.int32))
    return cfg_ref, cfg_fus, state, frames, labels


def test_fused_train_step_matches_monolith():
    """Full train step through stem -> fused stack -> tail == the
    monolithic flax apply: loss, updated params, and batch_stats (the
    stem's bn1 is the only mutating collection entry)."""
    cfg_ref, cfg_fus, state, frames, labels = _train_fixture()
    step_ref = tr.make_train_step(cfg_ref, donate=False)
    step_fus = tr.make_train_step(cfg_fus, donate=False)
    s1, s2 = state, state
    for i in range(3):
        key = jax.random.PRNGKey(7 + i)
        s1, m1 = step_ref(s1, frames, labels, key)
        s2, m2 = step_fus(s2, frames, labels, key)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4, i
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
    )))
    assert mx < 1e-4, f"param divergence {mx}"
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5
        ),
        s1.batch_stats, s2.batch_stats,
    )
    # bn1 stats actually updated (train-mode stem BN)
    assert not np.allclose(
        np.asarray(s2.batch_stats["bn1"]["mean"]),
        np.asarray(state.batch_stats["bn1"]["mean"]),
    )


def test_fused_stage2_tail_matches_monolith():
    """stem -> fused stage1 -> XLA layer2_0 -> fused stage2 tail -> tail
    == monolith (f32, 3 steps)."""
    cfg_ref, cfg_fus, state, frames, labels = _train_fixture()
    cfg_fus2 = dataclasses.replace(cfg_fus, fused_stage2="on")
    step_ref = tr.make_train_step(cfg_ref, donate=False)
    step_fus = tr.make_train_step(cfg_fus2, donate=False)
    s1, s2 = state, state
    for i in range(3):
        key = jax.random.PRNGKey(21 + i)
        s1, m1 = step_ref(s1, frames, labels, key)
        s2, m2 = step_fus(s2, frames, labels, key)
        assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4, i
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
    )))
    assert mx < 1e-4, f"param divergence {mx}"


def test_fused_stage2_requires_stage1():
    with pytest.raises(ValueError, match="fused_stage1"):
        tr.make_train_step(tr.TrainConfig(
            partial_bn=True, fused_stage1="off", fused_stage2="on",
        ))


def test_fused_train_step_with_dropout_and_bf16_smoke():
    """The production dtype/dropout combination runs and learns (exact
    parity is f32-only: dropout rng paths and bf16 rounding differ)."""
    cfg = tr.TrainConfig(
        num_classes=4, num_segments=2, batch_clips=2,
        compute_dtype="bfloat16", scale_size=36, crop_size=32,
        dropout=0.5, partial_bn=True, lr=0.01, fused_stage1="on",
    )
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(32, 32))
    step = tr.make_train_step(cfg, donate=False)
    rng = np.random.default_rng(1)
    frames = jnp.asarray(
        rng.integers(0, 256, (2, 2, 40, 48, 3), dtype=np.uint8)
    )
    labels = jnp.asarray(np.array([0, 2], np.int32))
    losses = []
    key = jax.random.PRNGKey(5)
    for i in range(5):
        key, sub = jax.random.split(key)
        state, m = step(state, frames, labels, sub)
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


def test_fused_requires_partial_bn():
    with pytest.raises(ValueError, match="partial_bn"):
        tr.make_train_step(
            tr.TrainConfig(partial_bn=False, fused_stage1="on"),
        )


def test_fused_requires_bottleneck_arch():
    """Basic-block archs have no bottleneck stacks to fuse: 'auto'
    resolves off silently, 'on' refuses loudly (r3 family-generic
    TrainConfig.arch)."""
    with pytest.raises(ValueError, match="bottleneck"):
        tr.make_train_step(
            tr.TrainConfig(arch="resnet18", fused_stage1="on"),
        )
    # auto on a basic arch builds the plain path without error
    tr.make_train_step(
        tr.TrainConfig(arch="resnet34", num_classes=4, num_segments=2,
                       batch_clips=2, scale_size=36, crop_size=32),
        donate=False,
    )


def test_fused_train_step_matches_monolith_resnet101():
    """The fused stacks are stage-depth generic (r3): resnet101 shares
    resnet50's stage-1/2 geometry, only depths differ — fused step ==
    monolith on the 101 family member too (f32, stage-2 tail engaged)."""
    cfg_ref, cfg_fus, state, frames, labels = _train_fixture("resnet101")
    cfg_fus = dataclasses.replace(cfg_fus, fused_stage2="on")
    step_ref = tr.make_train_step(cfg_ref, donate=False)
    step_fus = tr.make_train_step(cfg_fus, donate=False)
    s1, m1 = step_ref(state, frames, labels, jax.random.PRNGKey(5))
    s2, m2 = step_fus(state, frames, labels, jax.random.PRNGKey(5))
    assert abs(float(m1["loss"]) - float(m2["loss"])) < 1e-4
    mx = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), s1.params, s2.params
    )))
    assert mx < 1e-4, f"param divergence {mx}"


def test_maxpool_vjp_matches_autodiff_bitwise():
    """ops/pool.maxpool_3x3_s2_vjp: forward == nn.max_pool bit-for-bit and
    the custom one-hot backward == jax.grad of the reference pool —
    including TIE routing (first maximal element in row-major window
    order), exercised by post-relu-style inputs with many exact zeros and
    by quantized values that collide inside windows (r4, VERDICT #1b)."""
    import flax.linen as nn

    from eov_tpu.ops.pool import maxpool_3x3_s2_vjp

    def ref(x):
        return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

    rng = np.random.default_rng(0)
    cases = [
        # post-relu style: ~half zeros, heavy ties
        np.maximum(rng.normal(0, 1, (2, 12, 16, 8)), 0).astype(np.float32),
        # quantized: in-window value collisions beyond zero
        (rng.integers(0, 4, (2, 10, 10, 4))).astype(np.float32),
        # all-zero: every window ties everywhere
        np.zeros((1, 8, 8, 3), np.float32),
        # odd spatial size
        np.maximum(rng.normal(0, 1, (2, 11, 13, 4)), 0).astype(np.float32),
    ]
    for x_np in cases:
        x = jnp.asarray(x_np)
        y_ref, y_new = ref(x), maxpool_3x3_s2_vjp(x)
        np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_new))
        ct = jnp.asarray(
            rng.normal(0, 1, y_ref.shape).astype(np.float32)
        )
        g_ref = np.asarray(jax.grad(lambda v: (ref(v) * ct).sum())(x))
        g_new = np.asarray(
            jax.grad(lambda v: (maxpool_3x3_s2_vjp(v) * ct).sum())(x)
        )
        # Routing must be IDENTICAL (same tie winner in every window) —
        # the nonzero pattern proves it; values may differ in the last
        # ulp where a position sums cotangents from multiple windows in
        # a different order than select_and_scatter.
        np.testing.assert_array_equal(g_ref != 0, g_new != 0)
        np.testing.assert_allclose(g_ref, g_new, rtol=1e-6, atol=1e-7)


def test_stem_s2d_conv_matches_plain_fwd_and_grads():
    """models/fused_train._S2DConv1 (s2d rewrite with the ORIGINAL 7x7
    params, r4 VERDICT #1a): same function of (x, params) as the plain
    stem conv — forward and parameter/input gradients agree up to conv
    accumulation order (f32 tolerance), and the param tree layout is
    identical (['conv1']['kernel'] at [7,7,3,64])."""
    from eov_tpu.models.fused_train import ResNetStem

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (2, 16, 16, 3)).astype(np.float32))
    plain = ResNetStem(dtype=jnp.float32, s2d=False)
    s2d = ResNetStem(dtype=jnp.float32, s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x, train=False)
    assert v["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)
    v2 = s2d.init(jax.random.PRNGKey(0), x, train=False)
    assert v2["params"]["conv1"]["kernel"].shape == (7, 7, 3, 64)

    def loss(mod):
        def f(params, x):
            out = mod.apply(
                {"params": params, "batch_stats": v["batch_stats"]},
                x, train=False,
            )
            return (out * out).sum()
        return f

    y1 = plain.apply(v, x, train=False)
    y2 = s2d.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(loss(plain))(v["params"], x)
    g2 = jax.grad(loss(s2d))(v["params"], x)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        ), g1, g2,
    )


def test_train_step_s2d_and_pool_vjp_match_baseline():
    """Full fused train steps with stem_s2d='on' and pool_vjp='on' track
    the baseline fused step: same losses and same params after 3 steps
    (f32, tolerance for conv accumulation order)."""
    cfg_ref, cfg_fus, state, frames, labels = _train_fixture()
    base = dataclasses.replace(cfg_fus, stem_s2d="off", pool_vjp="off")
    variants = {
        "s2d": dataclasses.replace(cfg_fus, stem_s2d="on", pool_vjp="off"),
        "pool": dataclasses.replace(cfg_fus, stem_s2d="off", pool_vjp="on"),
        "both": dataclasses.replace(cfg_fus, stem_s2d="on", pool_vjp="on"),
    }
    step0 = tr.make_train_step(base, donate=False)
    s0 = state
    losses0 = []
    for i in range(3):
        s0, m = step0(s0, frames, labels, jax.random.PRNGKey(40 + i))
        losses0.append(float(m["loss"]))
    for name, cfg in variants.items():
        sv = state
        step = tr.make_train_step(cfg, donate=False)
        for i in range(3):
            sv, m = step(sv, frames, labels, jax.random.PRNGKey(40 + i))
            assert abs(float(m["loss"]) - losses0[i]) < 1e-4, (name, i)
        mx = max(jax.tree.leaves(jax.tree.map(
            lambda a, b: float(jnp.abs(a - b).max()), s0.params, sv.params
        )))
        assert mx < 1e-4, (name, mx)


def test_stem_s2d_and_pool_vjp_require_fused_path():
    for kw in ({"stem_s2d": "on"}, {"pool_vjp": "on"}):
        with pytest.raises(ValueError, match="fused stem path"):
            tr.make_train_step(
                tr.TrainConfig(partial_bn=True, fused_stage1="off", **kw),
                donate=False,
            )
