"""Multi-chip paths on the virtual 8-device CPU mesh (SURVEY.md §4.5).

Asserts sharded == single-device numerics and that the pjit train step
executes with real shardings (grad/BN collectives inserted by XLA).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from eov_tpu.parallel import make_mesh, DATA_AXIS, FRAME_AXIS
from eov_tpu.parallel import sharded
from eov_tpu import train as eov_train


@pytest.fixture(scope="module")
def devices8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices (conftest sets XLA_FLAGS)")
    return jax.devices()[:8]


@pytest.fixture(scope="module")
def small_params():
    from eov_tpu.models import ResNet50

    model = ResNet50(dtype=jnp.float32)
    return model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))


def test_mesh_shapes(devices8):
    mesh = make_mesh(4, 2, devices=devices8)
    assert mesh.shape == {DATA_AXIS: 4, FRAME_AXIS: 2}
    with pytest.raises(ValueError):
        make_mesh(8, 3, devices=devices8)


def test_sharded_features_match_single_device(devices8, small_params):
    # 8 clips x 4 segments sharded over data=4, frame=2 must equal the
    # unsharded computation exactly (mean-pool is order-independent here).
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, 4, 40, 48, 3), dtype=np.uint8)

    mesh = make_mesh(4, 2, devices=devices8)
    fn = sharded.make_sharded_feature_fn(
        small_params, mesh, scale_size=36, crop_size=32,
        compute_dtype=jnp.float32,
    )
    got = np.asarray(fn(jnp.asarray(frames)))

    from eov_tpu.ops import preprocess
    from eov_tpu.models import resnet50_feature_apply

    x = preprocess.preprocess_eval(
        jnp.asarray(frames), scale_size=36, crop_size=32, dtype=jnp.float32
    )
    feats = resnet50_feature_apply(small_params, x, dtype=jnp.float32)
    want = np.asarray(jnp.mean(feats, axis=1))
    assert got.shape == want.shape == (8, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_features_fused_stages_match_default(devices8, small_params):
    # The pod extract path with the Pallas fused bottleneck stack (stage 1,
    # interpret mode on this CPU mesh) must equal the unfused sharded
    # program — the kernel is pure per-device compute under shard_map.
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, (8, 4, 40, 48, 3), dtype=np.uint8)
    mesh = make_mesh(4, 2, devices=devices8)
    kw = dict(scale_size=36, crop_size=32, compute_dtype=jnp.float32)
    want = np.asarray(
        sharded.make_sharded_feature_fn(small_params, mesh, **kw)(
            jnp.asarray(frames)
        )
    )
    got = np.asarray(
        sharded.make_sharded_feature_fn(
            small_params, mesh, fused_stages=(1,), **kw
        )(jnp.asarray(frames))
    )
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_sharded_quant_int8_matches_single_device(devices8, small_params):
    # Pod-scale int8 extraction (r5): the sharded featurizer under
    # quant='int8' must reproduce the single-chip quantized program
    # (extract.make_feature_fn) given the SAME calibration scales — the
    # quantized tree is pure local compute, so only the frame-axis psum
    # mean differs structurally.
    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (8, 4, 40, 48, 3), dtype=np.uint8)
    mesh = make_mesh(4, 2, devices=devices8)

    from eov_tpu.extract import (
        ExtractConfig, make_feature_fn, quant_calibration,
    )

    cfg = ExtractConfig(
        num_segments=4, scale_size=36, crop_size=32,
        compute_dtype="float32", quant="int8", quant_calib_clips=2,
    )
    act_max = quant_calibration(small_params, cfg)
    want = np.asarray(
        make_feature_fn(small_params, cfg, act_max=act_max)(
            jnp.asarray(frames)
        )
    )
    got = np.asarray(
        sharded.make_sharded_feature_fn(
            small_params, mesh, scale_size=36, crop_size=32,
            compute_dtype=jnp.float32, quant="int8", act_max=act_max,
        )(jnp.asarray(frames))
    )
    assert got.shape == want.shape == (8, 2048)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    # Local calibration is refused: every process must quantize with
    # identical scales, so the scales arrive pre-computed or not at all.
    with pytest.raises(ValueError, match="act_max"):
        sharded.make_sharded_feature_fn(small_params, mesh, quant="int8")


def test_resolve_fused_stages_auto_semantics():
    from eov_tpu.extract import resolve_fused_stages

    # "auto" engages only on TPU backends (this suite runs on CPU).
    assert resolve_fused_stages("auto", folded=True, arch="resnet50") == ()
    # "auto" never engages for basic archs — the r3 basic-stack measurement
    # was a recorded negative (BASELINE.md: 2498 vs 3908 on resnet18).
    assert resolve_fused_stages("auto", folded=True, arch="resnet18") == ()
    # Explicit requests are honored everywhere (interpret mode off-TPU),
    # both families (r3: the basic stack exists, parity-tested)...
    assert resolve_fused_stages((1, 2), folded=True, arch="resnet50") == (1, 2)
    assert resolve_fused_stages((1,), folded=True, arch="resnet18") == (1,)
    # ...but fusion always needs folded BN.
    assert resolve_fused_stages((1,), folded=False, arch="resnet50") == ()
    assert resolve_fused_stages((), folded=True, arch="resnet50") == ()


def test_sharded_eval_step_runs_and_is_deterministic(devices8):
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.standard_normal((10, 6, 64)).astype(np.float32))
    counts = jnp.full((10,), 6, jnp.int32)
    mesh = make_mesh(8, 1, devices=devices8)
    step = sharded.make_sharded_eval_step(
        mesh, n_way=5, k_shot=1, n_query=2, episodes_per_step=32
    )
    key = jax.random.PRNGKey(0)
    acc1 = np.asarray(step(key, jnp.int32(0), feats, counts))
    acc2 = np.asarray(step(key, jnp.int32(0), feats, counts))
    assert acc1.shape == (32,)
    np.testing.assert_array_equal(acc1, acc2)
    assert ((acc1 >= 0) & (acc1 <= 1)).all()


def test_sharded_eval_rejects_indivisible():
    mesh = make_mesh(2, 1, devices=jax.devices()[:2])
    with pytest.raises(ValueError):
        sharded.make_sharded_eval_step(
            mesh, n_way=5, k_shot=1, n_query=1, episodes_per_step=33
        )


def test_train_step_dp_runs_and_learns(devices8):
    cfg = eov_train.TrainConfig(
        num_classes=4, num_segments=2, batch_clips=8,
        lr=0.01, compute_dtype="float32", scale_size=36, crop_size=32,
    )
    mesh = make_mesh(4, 2, devices=devices8)
    state = eov_train.create_train_state(
        cfg, jax.random.PRNGKey(0), sample_hw=(32, 32)
    )
    step = eov_train.make_train_step(cfg, mesh)

    rng = np.random.default_rng(0)
    # Class-colored frames: trivially learnable.
    labels_np = rng.integers(0, 4, size=8)
    frames = np.zeros((8, 2, 40, 48, 3), np.uint8)
    for i, l in enumerate(labels_np):
        frames[i, ..., l % 3] = 60 * (l + 1)
    frames_j = jnp.asarray(frames)
    labels_j = jnp.asarray(labels_np.astype(np.int32))

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(8):
        key, sub = jax.random.split(key)
        state, m = step(state, frames_j, labels_j, sub)
        losses.append(float(m["loss"]))
    assert int(state.step) == 8
    # SGD on a fresh net overshoots on step 1-2; require recovery + descent.
    assert losses[-1] < max(losses[:3]), losses
    assert all(np.isfinite(losses)), losses


def test_partial_bn_freezes_deep_stats():
    """TSN partialBN (C12): only the stem BN updates stats during finetune."""
    import numpy as np

    from eov_tpu import train as tr

    cfg = tr.TrainConfig(
        num_classes=4, num_segments=2, batch_clips=2,
        compute_dtype="float32", scale_size=36, crop_size=32,
        partial_bn=True, dropout=0.5,
    )
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0), sample_hw=(32, 32))
    step = tr.make_train_step(cfg)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (2, 2, 40, 48, 3), dtype=np.uint8))
    labels = jnp.asarray(np.array([0, 1], np.int32))
    old = jax.tree.map(np.asarray, state.batch_stats)
    state2, _ = step(state, frames, labels, jax.random.PRNGKey(1))
    new = jax.tree.map(np.asarray, state2.batch_stats)
    assert np.abs(old["bn1"]["mean"] - new["bn1"]["mean"]).max() > 0
    assert (
        np.abs(
            old["layer4_2"]["bn3"]["mean"] - new["layer4_2"]["bn3"]["mean"]
        ).max()
        == 0
    )


def test_partial_bn_freezes_affines_and_tsn_decay_policy():
    """TSN get_optim_policies (ADVICE r1): frozen BN scale/bias get NO
    updates at all (grads masked to zero), and weight decay applies to
    conv/fc kernels only — never to biases or BN affines."""
    from eov_tpu import train as tr

    cfg = tr.TrainConfig(
        num_classes=4, num_segments=2, batch_clips=2,
        compute_dtype="float32", scale_size=36, crop_size=32,
        partial_bn=True, lr=0.1, weight_decay=0.01,
    )
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(32, 32))
    tx = tr._make_tx(cfg)

    # With zero grads the only update source is weight decay: kernels decay
    # by -lr*wd*w, everything else must be exactly zero.
    zero_grads = jax.tree.map(jnp.zeros_like, state.params)
    updates, _ = tx.update(zero_grads, tx.init(state.params), state.params)
    assert np.abs(np.asarray(updates["conv1"]["kernel"])).max() > 0
    assert np.abs(np.asarray(updates["fc"]["kernel"])).max() > 0
    assert np.abs(np.asarray(updates["fc"]["bias"])).max() == 0
    assert np.abs(np.asarray(updates["bn1"]["scale"])).max() == 0
    assert np.abs(np.asarray(updates["layer4_2"]["bn3"]["scale"])).max() == 0

    # A real step: deep BN affines frozen, the stem bn1 still trains.
    step = tr.make_train_step(cfg, donate=False)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (2, 2, 40, 48, 3),
                                      dtype=np.uint8))
    labels = jnp.asarray(np.array([0, 1], np.int32))
    s2, _ = step(state, frames, labels, jax.random.PRNGKey(1))
    old_p = jax.tree.map(np.asarray, state.params)
    new_p = jax.tree.map(np.asarray, s2.params)
    np.testing.assert_array_equal(
        old_p["layer4_2"]["bn3"]["scale"], new_p["layer4_2"]["bn3"]["scale"]
    )
    np.testing.assert_array_equal(
        old_p["layer1_0"]["bn1"]["bias"], new_p["layer1_0"]["bn1"]["bias"]
    )
    assert np.abs(old_p["bn1"]["scale"] - new_p["bn1"]["scale"]).max() > 0


def test_multichip_extract_end_to_end_with_padded_tail(
    devices8, small_params, tmp_path
):
    """Config-5 wiring: sharded extraction over a mesh, tail batch padded.

    10 clips through batch_clips=4 on a data=4 mesh leaves a tail of 2 that
    pad_batches must pad (shard_map needs divisible batches); results must
    equal the single-device pipeline for every real clip.
    """
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.data.store import FeatureStore
    from eov_tpu.extract import ExtractConfig, extract_features, make_feature_fn

    ds = SyntheticVideoDataset(n_classes=5, clips_per_class=2, seed=1,
                               height=40, width=48)
    assert len(ds.records) == 10
    mesh = make_mesh(4, 2, devices=devices8)
    cfg = ExtractConfig(
        num_segments=4, batch_clips=4, scale_size=36, crop_size=32,
        compute_dtype="float32", deterministic=True, pad_batches=True,
    )
    fn = sharded.make_sharded_feature_fn(
        small_params, mesh, scale_size=36, crop_size=32,
        compute_dtype=jnp.float32,
    )
    store = FeatureStore(str(tmp_path / "mc"), class_names=ds.class_names)
    stats = extract_features(ds, small_params, store, cfg, feature_fn=fn)
    assert stats["extracted"] == 10 and stats["failed"] == 0

    ref_cfg = ExtractConfig(
        num_segments=4, batch_clips=4, scale_size=36, crop_size=32,
        compute_dtype="float32", deterministic=True, fold_bn=True,
    )
    ref_store = FeatureStore(str(tmp_path / "ref"), class_names=ds.class_names)
    extract_features(ds, small_params, ref_store, ref_cfg)
    t1, t2 = store.to_table(), ref_store.to_table()
    np.testing.assert_allclose(
        np.asarray(t1.features), np.asarray(t2.features), rtol=1e-4, atol=1e-5
    )


def test_distributed_helpers_single_process(devices8):
    """SURVEY.md §4.5: the DCN wiring degrades gracefully at process_count=1
    — record sharding is the identity and per-host batches lift to global
    arrays sharded over 'data'."""
    from eov_tpu.parallel import distributed as dist

    dist.initialize()  # single-process no-op
    records = list(range(10))
    assert dist.process_record_shard(records) == records
    assert dist.process_record_shard(records, process_index=1,
                                     process_count=4) == [1, 5, 9]

    mesh = make_mesh(8, 1, devices=devices8)
    host = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    arr = dist.host_batch_to_global(mesh, host)
    assert arr.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(arr), host)
    assert len(arr.sharding.device_set) == 8


def test_sharded_embodied_eval_matches_single_device(devices8):
    """C9 x multichip: the canonical ordinal protocol (episodes.py) makes
    the 8-device sharded embodied eval match single-device eval.eval_step
    bit-identically — mesh size is not part of the episode randomness."""
    from eov_tpu import eval as ev

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(6, 5, 64)).astype(np.float32))
    counts = jnp.full((6,), 5, jnp.int32)
    vfeats = jnp.asarray(rng.normal(size=(6, 3, 64)).astype(np.float32))
    vcounts = jnp.asarray([3, 3, 0, 2, 3, 1], jnp.int32)

    mesh8 = make_mesh(8, 1, devices=devices8)
    step8 = sharded.make_sharded_eval_step(
        mesh8, n_way=3, k_shot=1, n_query=2, episodes_per_step=16,
        embodied=True,
    )
    acc8 = np.asarray(step8(jax.random.PRNGKey(5), jnp.int32(0), feats,
                            counts, vfeats, vcounts))
    assert acc8.shape == (16,)

    ref = np.asarray(ev.eval_step(
        jax.random.PRNGKey(5), jnp.int32(0), feats, counts,
        vfeats, vcounts, n_way=3, k_shot=1, n_query=2, n_step=16,
        metric="cosine", fusion="max",
    ))
    np.testing.assert_allclose(acc8, ref, atol=1e-6)


def test_remat_train_step_matches_exact():
    """remat=True (jax.checkpoint per block) is numerically identical."""
    from eov_tpu import train as tr

    base = dict(num_classes=4, num_segments=2, batch_clips=2,
                compute_dtype="float32", scale_size=36, crop_size=32,
                dropout=0.0)
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.integers(0, 256, (2, 2, 40, 48, 3),
                                      dtype=np.uint8))
    labels = jnp.asarray(np.array([0, 1], np.int32))
    kernels = {}
    for remat in (False, True):
        cfg = tr.TrainConfig(remat=remat, **base)
        state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                      sample_hw=(32, 32))
        step = tr.make_train_step(cfg, donate=False)
        s2, _ = step(state, frames, labels, jax.random.PRNGKey(1))
        kernels[remat] = np.asarray(s2.params["conv1"]["kernel"])
    np.testing.assert_allclose(kernels[False], kernels[True], atol=1e-6)


def test_evaluate_classifier_protocol():
    """C12 train->test cycle: evaluate_classifier runs the deterministic
    center-sample consensus protocol (learning itself is covered by
    test_train_step_dp_runs_and_learns and the CLI drives)."""
    from eov_tpu import train as tr
    from eov_tpu.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=4, seed=0,
                               height=48, width=64)
    cfg = tr.TrainConfig(
        num_classes=3, num_segments=2, batch_clips=4,
        compute_dtype="float32", scale_size=40, crop_size=36,
    )
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(36, 36))
    m1 = tr.evaluate_classifier(state, cfg, ds)
    m2 = tr.evaluate_classifier(state, cfg, ds, batch_clips=5)
    assert m1["n"] == m2["n"] == 12
    assert 0.0 <= m1["top1"] <= 1.0
    # Deterministic protocol: batch packing must not change the result.
    assert m1["top1"] == m2["top1"]


def test_evaluate_sharded_protocol(devices8):
    """evaluate_sharded: full protocol over the mesh — deterministic,
    exact episode count with a non-divisible tail, embodied supported."""
    from eov_tpu.eval import EvalConfig, FeatureTable
    from eov_tpu.parallel.sharded import evaluate_sharded

    rng = np.random.default_rng(0)
    protos = rng.standard_normal((8, 1, 32)).astype(np.float32)
    feats = (protos + 0.5 * rng.standard_normal((8, 6, 32))).astype(np.float32)
    table = FeatureTable(jnp.asarray(feats), jnp.full((8,), 6, jnp.int32))
    mesh = make_mesh(8, 1, devices=devices8)
    cfg = EvalConfig(n_way=4, n_query=1, n_episodes=50, episodes_per_step=16,
                     seed=9)
    r1 = evaluate_sharded(table, cfg, mesh)
    r2 = evaluate_sharded(table, cfg, mesh)
    assert len(r1.per_episode) == 50
    assert r1.mean_acc == r2.mean_acc

    virt = FeatureTable(jnp.asarray(np.repeat(protos, 2, 1)),
                        jnp.full((8,), 2, jnp.int32))
    import dataclasses
    re = evaluate_sharded(
        table, dataclasses.replace(cfg, embodied=True), mesh, virtual=virt
    )
    assert re.mean_acc >= r1.mean_acc  # clean prototypes can only help


def test_canonical_episode_protocol_invariant_to_execution_config(devices8):
    """VERDICT r2 #1: the 600-episode set is a pure function of (seed,
    protocol config). evaluate and evaluate_sharded must return
    BIT-IDENTICAL per_episode vectors for the same seed — across different
    episodes_per_step values, mesh sizes, and single- vs multi-chip."""
    import dataclasses

    from eov_tpu.eval import EvalConfig, FeatureTable, evaluate
    from eov_tpu.parallel.sharded import evaluate_sharded

    rng = np.random.default_rng(3)
    protos = rng.standard_normal((8, 1, 32)).astype(np.float32)
    feats = (protos + 0.9 * rng.standard_normal((8, 6, 32))).astype(np.float32)
    table = FeatureTable(jnp.asarray(feats), jnp.full((8,), 6, jnp.int32))
    cfg = EvalConfig(n_way=4, n_query=1, n_episodes=50, episodes_per_step=16,
                     seed=9)

    ref = evaluate(table, cfg)
    # Same protocol, different step batching (incl. a non-divisible tail).
    for eps in (8, 25, 64):
        r = evaluate(table, dataclasses.replace(cfg, episodes_per_step=eps))
        np.testing.assert_array_equal(r.per_episode, ref.per_episode)

    # Sharded over 8 and over 2 devices; also a different episodes_per_step.
    for n_dev, eps in ((8, 16), (2, 16), (8, 32)):
        mesh = make_mesh(n_dev, 1, devices=jax.devices()[:n_dev])
        r = evaluate_sharded(
            table, dataclasses.replace(cfg, episodes_per_step=eps), mesh
        )
        np.testing.assert_array_equal(r.per_episode, ref.per_episode)


def test_evaluate_sharded_eligibility_guard_and_matcher_warning():
    """evaluate_sharded mirrors evaluate()'s host-side guards: too few
    eligible classes refuses (inside jit the sampler would silently score
    invalid slots), and an explicit matcher='pallas' warns that the
    sharded step runs the XLA matcher."""
    import dataclasses
    import warnings

    import pytest

    from eov_tpu import eval as eov_eval
    from eov_tpu.parallel.sharded import evaluate_sharded

    mesh = make_mesh()
    table = eov_eval.FeatureTable(
        jnp.asarray(np.random.default_rng(0).standard_normal((6, 3, 16)),
                    jnp.float32),
        jnp.asarray([3, 3, 1, 0, 0, 0], jnp.int32),  # only 2 eligible @ k+q=2
    )
    cfg = eov_eval.EvalConfig(n_way=5, n_episodes=16, episodes_per_step=8)
    with pytest.raises(ValueError, match="not sampleable"):
        evaluate_sharded(table, cfg, mesh)

    ok = eov_eval.FeatureTable(
        jnp.asarray(np.random.default_rng(0).standard_normal((6, 3, 16)),
                    jnp.float32),
        jnp.full((6,), 3, jnp.int32),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        evaluate_sharded(ok, dataclasses.replace(cfg, matcher="pallas"), mesh)
    assert any("sharded" in str(x.message) for x in w)


def test_evaluate_sharded_embodied_guards():
    """evaluate_sharded mirrors evaluate()'s embodied guards too: a
    real/virtual feature-dim mismatch (stores extracted with different
    backbones) refuses with the friendly message instead of an opaque XLA
    shape error at trace time inside shard_map, and embodied without a
    virtual table refuses up front."""
    import pytest

    from eov_tpu import eval as eov_eval
    from eov_tpu.parallel.sharded import evaluate_sharded

    mesh = make_mesh()
    table = eov_eval.FeatureTable(
        jnp.ones((6, 3, 64), jnp.float32), jnp.full((6,), 3, jnp.int32)
    )
    virt32 = eov_eval.FeatureTable(
        jnp.ones((6, 2, 32), jnp.float32), jnp.full((6,), 2, jnp.int32)
    )
    cfg = eov_eval.EvalConfig(n_way=4, n_episodes=16, episodes_per_step=8,
                              embodied=True)
    with pytest.raises(ValueError, match="different backbones"):
        evaluate_sharded(table, cfg, mesh, virtual=virt32)
    with pytest.raises(ValueError, match="requires a virtual"):
        evaluate_sharded(table, cfg, mesh)
    # Matching dims pass the guard and run.
    virt64 = eov_eval.FeatureTable(
        jnp.ones((6, 2, 64), jnp.float32), jnp.full((6,), 2, jnp.int32)
    )
    res = evaluate_sharded(table, cfg, mesh, virtual=virt64)
    assert len(res.per_episode) == 16
