"""Post-training int8 inference path (models/quant_infer.py).

Capability row: SURVEY.md §2a C4 on BASELINE.json:5's throughput axis
(VERDICT r4 weak #5 — the int8 MXU axis). Accuracy is bounded the way every
program rewrite in this repo is: per-clip feature cosine vs the float path
PLUS the paired episode-accuracy delta on the canonical protocol. The
hardware twin (real MXU int8 convs) lives in tests/test_tpu_hardware.py.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eov_tpu import extract
from eov_tpu.extract import ExtractConfig, make_feature_fn
from eov_tpu.models import get_arch
from eov_tpu.models.quant_infer import (
    calibrate_act_max,
    calibrate_and_quantize,
    quant_feature_apply,
    quantize_variables,
    synthetic_calib_frames,
)
from eov_tpu.models.resnet import fold_batchnorm

ARCH = "resnet18"
HW = (64, 64)


@pytest.fixture(scope="module")
def params():
    return get_arch(ARCH)[0](dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, *HW, 3))
    )


def _cfg(**kw):
    base = dict(
        num_segments=4, arch=ARCH, scale_size=64, crop_size=64,
        batch_clips=4, compute_dtype="float32", pallas_crop=False,
        fused_stages=(), deterministic=True, quant_calib_clips=4,
    )
    base.update(kw)
    return ExtractConfig(**base)


def _frames(n=2, k=4, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (n, k, *HW, 3), dtype=np.uint8)


def test_quantized_tree_structure(params):
    folded = fold_batchnorm(params)
    calib = synthetic_calib_frames(2, 4, *HW).astype(np.float32) / 255.0
    act_max = calibrate_act_max(folded, jnp.asarray(calib), arch=ARCH)
    # One tap per conv site, all finite and positive.
    assert "conv1" in act_max and "layer1_0/conv1" in act_max
    for v in act_max.values():
        assert np.isfinite(float(v)) and float(v) > 0
    q = quantize_variables(folded, act_max)["params"]
    m = q["layer1_0"]["conv1"]
    assert m["kernel_q"].dtype == jnp.int8
    assert m["w_scale"].shape == (m["kernel_q"].shape[-1],)
    assert m["a_scale"].shape == ()
    # Biases pass through in float.
    assert q["bn1"]["bias"].dtype == jnp.float32
    # Round-trip of the quantized kernel is within one quantization step.
    k = np.asarray(fold_batchnorm(params)["params"]["layer1_0"]["conv1"]["kernel"])
    kq = np.asarray(m["kernel_q"]).astype(np.float32) * np.asarray(m["w_scale"])
    assert np.max(np.abs(k - kq)) <= np.max(np.asarray(m["w_scale"])) * 0.5 + 1e-7


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return (a * b).sum(-1) / (
        np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    )


def test_quant_features_close_to_float(params):
    """Direct forward: int8 features vs the f32 folded forward, per clip."""
    folded = fold_batchnorm(params)
    frames_u8 = _frames()
    x = jnp.asarray(frames_u8).astype(jnp.float32) / 255.0  # any float input
    from eov_tpu.models.folded_infer import folded_feature_apply

    ref = folded_feature_apply(
        folded, x, arch=ARCH, dtype=jnp.float32, fused_stages=()
    )
    qvars = calibrate_and_quantize(folded, x.reshape((-1,) + x.shape[-3:]),
                                   arch=ARCH)
    got = quant_feature_apply(qvars, x, arch=ARCH, dtype=jnp.float32)
    assert got.shape == ref.shape
    cos = _cosine(got, ref)
    assert cos.min() >= 0.99, cos


def test_make_feature_fn_quant_path(params):
    """The wired extract path: cfg.quant='int8' (calibration on synthetic
    fixtures) stays cosine-close to the production float path on u8 input."""
    frames_u8 = _frames(n=3)
    ref = np.asarray(make_feature_fn(params, _cfg())(frames_u8))
    got = np.asarray(make_feature_fn(params, _cfg(quant="int8"))(frames_u8))
    cos = _cosine(got, ref)
    assert cos.min() >= 0.99, cos


def test_paired_episode_accuracy_delta(params, tmp_path):
    """Canonical-protocol paired delta: the same episode sequence scored on
    an int8-extracted store vs the float store (SURVEY.md §2a C10 rail)."""
    from eov_tpu import eval as eov_eval
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.data.store import FeatureStore

    ds = SyntheticVideoDataset(
        n_classes=6, clips_per_class=4, height=64, width=80, seed=0, name="q"
    )
    accs = {}
    for tag in ("f32", "int8"):
        store = FeatureStore(str(tmp_path / tag), class_names=ds.class_names)
        cfg = _cfg(quant=None if tag == "f32" else "int8", scale_size=64,
                   crop_size=64, batch_clips=8)
        extract.extract_features(ds, params, store, cfg)
        table = store.to_table()
        res = eov_eval.evaluate(
            eov_eval.FeatureTable(jnp.asarray(table.features),
                                  jnp.asarray(table.counts)),
            eov_eval.EvalConfig(n_way=5, k_shot=1, n_query=2,
                                n_episodes=64, episodes_per_step=32),
        )
        accs[tag] = res
    # Paired (same ordinals -> same episode sequence): the int8 rewrite must
    # stay well inside the 0.5%-class budget at this scale; allow a couple of
    # flipped borderline queries out of 64 episodes x 10 queries.
    delta = abs(accs["int8"].mean_acc - accs["f32"].mean_acc)
    assert delta <= 0.02, (accs["f32"].mean_acc, accs["int8"].mean_acc)
    per_ep = np.abs(accs["int8"].per_episode - accs["f32"].per_episode)
    assert per_ep.mean() <= 0.02


def test_quant_refusals(params):
    with pytest.raises(ValueError, match="only implemented scheme"):
        make_feature_fn(params, _cfg(quant="int4"))
    with pytest.raises(ValueError, match="s2d"):
        make_feature_fn(params, _cfg(quant="int8", stem_s2d=True))
    with pytest.raises(ValueError, match="fold_bn"):
        make_feature_fn(params, _cfg(quant="int8", fold_bn=False))
    # Pre-folded params (no batch_stats) refuse too — calibration composes
    # with fold_batchnorm, which needs the raw tree.
    folded = fold_batchnorm(params)
    with pytest.raises(ValueError, match="batch_stats"):
        make_feature_fn(folded, _cfg(quant="int8"))


def test_quant_pallas_pool_warns_fused_stages_refuse(params):
    """pallas_pool cannot wear an int8 label (warned + ignored: the int8
    forward has no Pallas pool entry); explicit fused_stages under quant
    either routes the int8 stage-1 stack (bottleneck archs, (1,) only —
    r5) or refuses at config time — never a silent drop."""
    import logging

    frames_u8 = _frames()
    logger = logging.getLogger("eov.extract")
    records = []
    h = logging.Handler()
    h.emit = records.append
    logger.addHandler(h)
    try:
        fn = make_feature_fn(params, _cfg(quant="int8", pallas_pool=True))
    finally:
        logger.removeHandler(h)
    assert any("ignored" in r.getMessage() for r in records)
    ref = np.asarray(make_feature_fn(params, _cfg())(frames_u8))
    got = np.asarray(fn(frames_u8))
    assert _cosine(got, ref).min() >= 0.99
    # ARCH here is resnet18 (basic): explicit stage-1 fusion refuses.
    with pytest.raises(ValueError, match="bottleneck archs only"):
        make_feature_fn(params, _cfg(quant="int8", fused_stages=(1,)))
    with pytest.raises(ValueError, match=r"\(1,\) only"):
        make_feature_fn(params, _cfg(quant="int8", fused_stages=(1, 2)))


def test_quant_fused_stage1_extract_wiring():
    """make_feature_fn with quant='int8' + explicit fused_stages=(1,)
    (bottleneck arch) routes stage 1 through the int8 Pallas stack and
    matches the int8 XLA walk (interpret on CPU; compiled twin in
    tests/test_tpu_hardware.py)."""
    params50 = get_arch("resnet50")[0](dtype=jnp.float32).init(
        jax.random.PRNGKey(2), jnp.zeros((1, *HW, 3))
    )
    frames_u8 = _frames(n=2)
    base = _cfg(quant="int8", arch="resnet50")
    want = np.asarray(make_feature_fn(params50, base)(frames_u8))
    got = np.asarray(make_feature_fn(
        params50,
        dataclasses.replace(base, fused_stages=(1,), fused_group=2),
    )(frames_u8))
    # On the real u8 path an FMA-ULP difference can flip a requant round()
    # to the neighboring int8 code, which then propagates — the two int8
    # programs are cosine-equivalent (measured ~0.99998 at this scale),
    # not bitwise. The paired episode-accuracy rail (same protocol as the
    # int8-vs-f32 one) is the deployment-level guarantee.
    assert _cosine(got, want).min() >= 0.9999


def test_quant_calibration_scales_roundtrip_and_dataset_mode(params, tmp_path):
    """r5 review fix: calibration scales are first-class provenance.
    quant_calibration(synthetic) reproduces make_feature_fn's internal
    scales bitwise through the float/JSON round trip; 'dataset' mode
    calibrates on the target clips (different scales) and a query run
    passing the STORE's recorded scales reproduces the store's features
    bitwise — the classify contract."""
    from eov_tpu import extract as ex
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.data.store import FeatureStore, MemoryFeatureStore

    cfg = _cfg(quant="int8")
    frames_u8 = _frames(n=2)

    # Synthetic scales: explicit == internal, bitwise, incl. JSON floats.
    act = ex.quant_calibration(params, cfg)
    assert act and all(isinstance(v, float) for v in act.values())
    import json as _json

    act_json = _json.loads(_json.dumps(act))
    a = np.asarray(make_feature_fn(params, cfg)(frames_u8))
    b = np.asarray(make_feature_fn(params, cfg, act_max=act_json)(frames_u8))
    np.testing.assert_array_equal(a, b)

    # Dataset calibration: real-frame scales differ from synthetic ones.
    ds = SyntheticVideoDataset(
        n_classes=4, clips_per_class=2, height=64, width=80, seed=3,
        name="qc",
    )
    dcfg = dataclasses.replace(cfg, quant_calib="dataset")
    act_ds = ex.quant_calibration(params, dcfg, ds)
    assert act_ds.keys() == act.keys()
    assert any(abs(act_ds[k] - act[k]) > 1e-9 for k in act)
    with pytest.raises(ValueError, match="needs the extraction dataset"):
        ex.quant_calibration(params, dcfg, None)

    # Store records the scales; a query run passing them reproduces the
    # store's features bitwise (what classify does).
    store = FeatureStore(str(tmp_path / "s"), class_names=ds.class_names,
                         quant="int8")
    store.set_quant_calib(act_ds)
    extract.extract_features(ds, params, store, dcfg, act_max=act_ds)
    got_back = FeatureStore(str(tmp_path / "s")).quant_calib()
    assert got_back == {k: float(v) for k, v in act_ds.items()}
    mem = MemoryFeatureStore(class_names=ds.class_names)
    extract.extract_features(ds, params, mem, dcfg, act_max=got_back)
    a, b = store.load_all(), mem.load_all()
    assert a.keys() == b.keys()
    for vid in a:
        np.testing.assert_array_equal(a[vid][0], b[vid][0])
    # Without the scales the query program is a DIFFERENT quantization
    # (synthetic-calibrated) — the exact drift the provenance prevents.
    mem2 = MemoryFeatureStore(class_names=ds.class_names)
    extract.extract_features(ds, params, mem2, dcfg_nocal := dataclasses.
                             replace(dcfg, quant_calib="synthetic"))
    assert any(
        not np.array_equal(a[vid][0], mem2.load_all()[vid][0]) for vid in a
    ), dcfg_nocal

    # Wrong-arch scales fail with the cause named, not a bare KeyError.
    with pytest.raises(ValueError, match="different --arch"):
        make_feature_fn(
            get_arch("resnet34")[0](dtype=jnp.float32).init(
                jax.random.PRNGKey(1), jnp.zeros((1, *HW, 3))
            ),
            dataclasses.replace(cfg, arch="resnet34"),
            act_max={"conv1": 1.0},
        )
