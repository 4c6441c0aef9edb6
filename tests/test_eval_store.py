"""Eval harness + feature store + synthetic end-to-end slice (SURVEY.md §4.4).

The featurizer here is a cheap downsample-projection (not ResNet) so the
full pipeline — fixtures -> extract -> store -> episodes -> matcher -> CI —
runs in seconds on 1 CPU core; ResNet-featured E2E lives in test_e2e.py.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from eov_tpu import eval as eov_eval
from eov_tpu import extract
from eov_tpu.data.datasets import SyntheticVideoDataset
from eov_tpu.data.store import FeatureStore
from eov_tpu.embodied import align_virtual_bank


@jax.jit
def _cheap_feature_fn(frames_u8):
    # [B, K, H, W, 3] -> [B, D]: spatial mean over coarse cells, K-mean.
    x = frames_u8.astype(jnp.float32) / 255.0
    b, k, h, w, c = x.shape
    # 16x20 cell grid: fine enough to resolve the class gratings' spatial
    # frequencies (8x8 aliases them together).
    x = x.reshape(b, k, 16, h // 16, 20, w // 20, c).mean(axis=(3, 5))
    return x.mean(axis=1).reshape(b, -1)


def _extract_to_store(tmp_path, name="s", n_classes=6, clips=6, seed=0,
                      fault=0.0):
    ds = SyntheticVideoDataset(
        n_classes=n_classes, clips_per_class=clips, height=64, width=80,
        seed=seed, name=name,
    )
    store = FeatureStore(str(tmp_path / name), class_names=ds.class_names)
    cfg = extract.ExtractConfig(
        num_segments=4, batch_clips=8, deterministic=True, fault_inject=fault
    )
    stats = extract.extract_features(
        ds, None, store, cfg, feature_fn=_cheap_feature_fn
    )
    return ds, store, stats


def test_extract_and_store_roundtrip(tmp_path):
    ds, store, stats = _extract_to_store(tmp_path)
    assert stats["extracted"] == len(ds.records)
    table = store.to_table()
    assert table.features.shape[0] == 6
    assert int(np.asarray(table.counts).sum()) == len(ds.records)


def test_memory_store_matches_disk_store(tmp_path):
    """extract_features into a MemoryFeatureStore (the classify query path,
    r5 — no tempdir round trip) is bit-identical to the disk store."""
    from eov_tpu.data.store import MemoryFeatureStore

    ds, disk, _ = _extract_to_store(tmp_path, name="m")
    mem = MemoryFeatureStore(class_names=ds.class_names)
    extract.extract_features(
        ds, None, mem,
        extract.ExtractConfig(num_segments=4, deterministic=True),
        feature_fn=_cheap_feature_fn,
    )
    a, b = disk.load_all(), mem.load_all()
    assert a.keys() == b.keys()
    for vid in a:
        np.testing.assert_array_equal(a[vid][0], b[vid][0])
        assert a[vid][1] == b[vid][1]
    t1, t2 = disk.to_table(), mem.to_table()
    np.testing.assert_array_equal(
        np.asarray(t1.features), np.asarray(t2.features))
    np.testing.assert_array_equal(
        np.asarray(t1.counts), np.asarray(t2.counts))


def test_extract_resume_skips_done(tmp_path):
    ds, store, stats = _extract_to_store(tmp_path, name="r")
    # Re-open the store and re-run: everything already durable.
    store2 = FeatureStore(str(tmp_path / "r"))
    stats2 = extract.extract_features(
        ds, None, store2,
        extract.ExtractConfig(num_segments=4, deterministic=True),
        feature_fn=_cheap_feature_fn,
    )
    assert stats2["extracted"] == 0
    assert stats2["skipped_done"] == len(ds.records)


def test_pooled_buffer_ring_recycles(tmp_path):
    """The host input-buffer ring must actually cycle: once the first two
    overlapped batches' buffers materialize and seed it, get_batch receives
    a preallocated out= buffer, so first-touch page faults are paid ~twice
    per run, not per batch (the r3 ring was dead — never seeded)."""
    ds = SyntheticVideoDataset(
        n_classes=4, clips_per_class=6, height=64, width=80, seed=0,
        name="ring",
    )
    outs = []

    class Pooled:
        records = ds.records
        class_names = ds.class_names

        def get_frames(self, rec, idx):
            return ds.get_frames(rec, idx)

        def get_batch(self, records, idx, out=None):
            outs.append(out is not None)
            arrs = np.stack([
                ds.get_frames(r, i) for r, i in zip(records, idx)
            ])
            if out is not None:
                out[...] = arrs
                return out
            return arrs

    store = FeatureStore(str(tmp_path / "ring"), class_names=ds.class_names)
    cfg = extract.ExtractConfig(num_segments=4, batch_clips=8)
    stats = extract.extract_features(
        Pooled(), None, store, cfg, feature_fn=_cheap_feature_fn
    )
    assert stats["extracted"] == 24
    # 3 batches of 8: the ring is necessarily empty for the first two
    # (their buffers are still in flight — overlap depth 2), stocked after.
    assert outs == [False, False, True]


def test_buffer_ring_capped_per_shape(tmp_path):
    """_HOST_BUFS retains at most _HOST_BUFS_CAP buffers per batch shape,
    so a long-lived process cycling through datasets can't accumulate
    unbounded dead host memory (review r3)."""
    shape = (9, 9, 9)  # synthetic key, never collides with real batches
    extract._HOST_BUFS.pop(shape, None)
    for _ in range(extract._HOST_BUFS_CAP + 3):
        extract._put_buf(np.zeros(shape, np.uint8))
    assert len(extract._HOST_BUFS[shape]) == extract._HOST_BUFS_CAP
    # take/put round-trips reuse the same storage
    b = extract._take_buf(shape)
    assert b is not None and b.shape == shape
    extract._put_buf(b)
    assert len(extract._HOST_BUFS[shape]) == extract._HOST_BUFS_CAP
    extract._HOST_BUFS.pop(shape, None)


def test_pooled_outless_get_batch_supported(tmp_path):
    """A custom get_batch WITHOUT out= still runs pooled — support is
    decided by signature introspection, never by probing with a call
    (review r3: except TypeError masked real errors)."""
    ds = SyntheticVideoDataset(
        n_classes=2, clips_per_class=4, height=64, width=80, seed=0,
        name="ol",
    )
    calls = []

    class Outless:
        records = ds.records
        class_names = ds.class_names

        def get_frames(self, rec, idx):
            return ds.get_frames(rec, idx)

        def get_batch(self, records, idx):  # no out kwarg
            calls.append(len(records))
            return np.stack([
                ds.get_frames(r, i) for r, i in zip(records, idx)
            ])

    store = FeatureStore(str(tmp_path / "ol"), class_names=ds.class_names)
    cfg = extract.ExtractConfig(num_segments=4, batch_clips=4)
    stats = extract.extract_features(
        Outless(), None, store, cfg, feature_fn=_cheap_feature_fn
    )
    assert stats["extracted"] == 8 and stats["failed"] == 0
    assert calls == [4, 4]  # pooled path ran, exactly once per batch


def test_pooled_internal_typeerror_surfaces(tmp_path, caplog):
    """A TypeError raised INSIDE an out-accepting get_batch must surface
    as the loud pooled-decode warning + per-record fallback, not be
    silently retried as an out-less call (review r3)."""
    ds = SyntheticVideoDataset(
        n_classes=2, clips_per_class=3, height=64, width=80, seed=0,
        name="bug",
    )

    class Buggy:
        records = ds.records
        class_names = ds.class_names

        def get_frames(self, rec, idx):
            return ds.get_frames(rec, idx)

        def get_batch(self, records, idx, out=None):
            raise TypeError("internal argtype bug")

    store = FeatureStore(str(tmp_path / "bug"), class_names=ds.class_names)
    cfg = extract.ExtractConfig(num_segments=4, batch_clips=3)
    with caplog.at_level("WARNING", logger="eov.extract"):
        stats = extract.extract_features(
            Buggy(), None, store, cfg, feature_fn=_cheap_feature_fn
        )
    assert stats["extracted"] == 6  # per-record fallback preserved the run
    assert any("internal argtype bug" in r.message for r in caplog.records)


def test_fault_injection_skips_and_continues(tmp_path):
    ds, store, stats = _extract_to_store(tmp_path, name="f", fault=0.3)
    assert stats["failed"] > 0
    assert stats["extracted"] == len(ds.records) - stats["failed"]
    # Failed clips are absent, not corrupt.
    table = store.to_table()
    assert int(np.asarray(table.counts).sum()) == stats["extracted"]


def test_eval_separable_features_high_accuracy(tmp_path):
    # Synthetic classes are separable under the cheap featurizer -> the
    # full episodic protocol should score near-perfect, far above 1/N chance.
    _, store, _ = _extract_to_store(tmp_path, name="e", n_classes=8, clips=8)
    table = store.to_table()
    cfg = eov_eval.EvalConfig(n_way=5, n_episodes=120, episodes_per_step=40,
                              n_query=2, seed=3)
    res = eov_eval.evaluate(table, cfg)
    assert res.per_episode.shape == (120,)
    assert res.mean_acc > 0.9, res
    assert 0 <= res.ci95 < 0.2
    # Determinism of the protocol.
    res2 = eov_eval.evaluate(table, cfg)
    np.testing.assert_array_equal(res.per_episode, res2.per_episode)


def test_store_float16_dtype_roundtrip_and_eval_parity(tmp_path):
    """float16 store option (pod store-IO halving): shards shrink ~2x,
    reads upcast to f32, reopen inherits the dtype, mixing dtypes raises,
    and the episodic protocol scores IDENTICALLY to the f32 store — the
    ≤2^-11 relative rounding is far inside the matcher's margins (the
    0.5% budget, BASELINE.json:5)."""
    import glob
    import os

    ds = SyntheticVideoDataset(n_classes=8, clips_per_class=8, height=64,
                               width=80, seed=0, name="h")
    cfg = extract.ExtractConfig(num_segments=4, batch_clips=8,
                                deterministic=True)
    stores = {}
    for dt in ("float32", "float16"):
        st = FeatureStore(str(tmp_path / dt), class_names=ds.class_names,
                          dtype=dt)
        extract.extract_features(ds, None, st, cfg,
                                 feature_fn=_cheap_feature_fn)
        stores[dt] = st

    def shard_bytes(root):
        return sum(os.path.getsize(p)
                   for p in glob.glob(os.path.join(root, "shard_*.npz")))

    assert shard_bytes(stores["float16"].root) < 0.6 * shard_bytes(
        stores["float32"].root)

    data16 = stores["float16"].load_all()
    data32 = stores["float32"].load_all()
    for vid, (f32, label) in data32.items():
        f16, label16 = data16[vid]
        assert f16.dtype == np.float32 and label16 == label  # upcast on read
        np.testing.assert_allclose(f16, f32, rtol=2e-3, atol=1e-4)

    # Reopen inherits float16; an explicit contradiction refuses.
    assert FeatureStore(str(tmp_path / "float16")).dtype == np.float16
    with pytest.raises(ValueError, match="one dtype per store"):
        FeatureStore(str(tmp_path / "float16"), dtype="float32")

    ecfg = eov_eval.EvalConfig(n_way=5, n_episodes=120, episodes_per_step=40,
                               n_query=2, seed=3)
    res32 = eov_eval.evaluate(stores["float32"].to_table(), ecfg)
    res16 = eov_eval.evaluate(stores["float16"].to_table(), ecfg)
    np.testing.assert_array_equal(res32.per_episode, res16.per_episode)


def test_eval_random_features_chance_accuracy(tmp_path):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((10, 6, 32)).astype(np.float32))
    counts = jnp.full((10,), 6, jnp.int32)
    table = eov_eval.FeatureTable(feats, counts)
    cfg = eov_eval.EvalConfig(n_way=5, n_episodes=200, episodes_per_step=50,
                              n_query=1, seed=0)
    res = eov_eval.evaluate(table, cfg)
    assert abs(res.mean_acc - 0.2) < 0.08, res  # 5-way chance = 0.2


def test_embodied_virtual_bank_improves_separation(tmp_path):
    # Real table gets noisy features; virtual bank gets clean class means.
    # Embodied union-max should beat plain 1-shot on the same episodes.
    rng = np.random.default_rng(1)
    c, m, d = 8, 6, 16
    protos = rng.standard_normal((c, 1, d)).astype(np.float32) * 3
    real = protos + rng.standard_normal((c, m, d)).astype(np.float32) * 3.5
    table = eov_eval.FeatureTable(
        jnp.asarray(real), jnp.full((c,), m, jnp.int32)
    )
    virt = eov_eval.FeatureTable(
        jnp.asarray(np.repeat(protos, 2, axis=1)), jnp.full((c,), 2, jnp.int32)
    )
    names = [f"k_{i}" for i in range(c)]
    bank = align_virtual_bank(names, names, virt)
    cfg = eov_eval.EvalConfig(n_way=5, n_episodes=150, episodes_per_step=50,
                              n_query=2, seed=5)
    plain = eov_eval.evaluate(table, cfg)
    emb = eov_eval.evaluate(
        table, eov_eval.EvalConfig(**{**cfg.__dict__, "embodied": True}),
        virtual=bank,
    )
    assert emb.mean_acc > plain.mean_acc + 0.05, (plain, emb)


def test_align_virtual_bank_name_normalization():
    vt = eov_eval.FeatureTable(
        jnp.ones((2, 3, 4)), jnp.asarray([3, 2], jnp.int32)
    )
    bank = align_virtual_bank(
        ["High Jump", "push_ups", "NoMatch"],
        ["HighJump", "PushUps"],
        vt,
    )
    counts = np.asarray(bank.counts)
    np.testing.assert_array_equal(counts, [3, 2, 0])
    with pytest.raises(KeyError):
        align_virtual_bank(["zzz"], ["HighJump"], vt, strict=True)


def test_align_virtual_bank_total_mismatch_refuses():
    """Per-class misses degrade gracefully (count 0), but a TOTAL mismatch
    means embodied eval would silently report plain numbers under the
    embodied label (numeric fallback names were exactly this failure) —
    it must refuse even without strict=True. An empty real-name list
    refuses too (a [0, V, D] bank would clamp-gather garbage in jit)."""
    vt = eov_eval.FeatureTable(
        jnp.ones((2, 3, 4)), jnp.asarray([3, 2], jnp.int32)
    )
    with pytest.raises(ValueError, match="ANY real class"):
        align_virtual_bank(["0", "1", "2"], ["HighJump", "PushUps"], vt)
    with pytest.raises(ValueError, match="no class names"):
        align_virtual_bank([], ["HighJump"], vt)


def test_align_virtual_bank_all_zero_counts_refuses():
    """The other route to silently-plain embodied eval: every name aligns
    but every aligned class contributes 0 virtual clips (an empty or
    filtered-out virtual extraction). The eval mask would zero every
    virtual member — refuse instead of reporting plain numbers under the
    embodied label."""
    vt = eov_eval.FeatureTable(
        jnp.ones((2, 3, 4)), jnp.zeros((2,), jnp.int32)
    )
    with pytest.raises(ValueError, match="0 clips for every"):
        align_virtual_bank(["HighJump", "PushUps"],
                           ["HighJump", "PushUps"], vt)


def test_extract_mixed_resolution_dataset(tmp_path):
    """Raw framedir datasets have per-video resolutions; extraction must
    group by shape (one device batch per resolution), not crash on stack."""
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.extract import ExtractConfig, extract_features

    a = SyntheticVideoDataset(n_classes=2, clips_per_class=2, seed=0,
                              height=60, width=80, name="ra")
    b = SyntheticVideoDataset(n_classes=2, clips_per_class=2, seed=1,
                              height=80, width=60, name="rb")

    class Mixed:
        records = a.records + b.records
        class_names = ["c0", "c1"]

        def get_frames(self, rec, idx):
            return (a if rec.video_id.startswith("ra") else b).get_frames(
                rec, idx
            )

    def cheap_fn(frames):
        # Resolution-independent featurizer (mean color per segment).
        return jnp.mean(
            jnp.asarray(frames, jnp.float32), axis=(1, 2, 3)
        )

    store = FeatureStore(str(tmp_path / "mix"), class_names=["c0", "c1"])
    cfg = ExtractConfig(num_segments=3, batch_clips=4, deterministic=True)
    stats = extract_features(Mixed(), None, store, cfg, feature_fn=cheap_fn)
    assert stats["extracted"] == 8 and stats["failed"] == 0
    assert len(store.done_ids()) == 8


def test_embodied_rejects_mismatched_feature_dims():
    table = eov_eval.FeatureTable(
        jnp.ones((4, 3, 64)), jnp.full((4,), 3, jnp.int32)
    )
    virt = eov_eval.FeatureTable(
        jnp.ones((4, 2, 32)), jnp.full((4,), 2, jnp.int32)
    )
    with pytest.raises(ValueError, match="different backbones"):
        eov_eval.evaluate(
            table,
            eov_eval.EvalConfig(n_way=2, n_episodes=4, episodes_per_step=4,
                                embodied=True),
            virtual=virt,
        )


def test_eval_tail_step_single_compile(tmp_path):
    """Non-divisible n_episodes pads the tail step: ONE trace, full count.

    A second trace of eval_step is a 20-40 min compile on the tunneled dev
    chip (VERDICT r1 weak #5); evaluate() must reuse the padded-step program
    exactly like evaluate_sharded does.
    """
    ds, store, _ = _extract_to_store(tmp_path, name="tc")
    table = store.to_table()
    eov_eval.eval_step.clear_cache()
    cfg = eov_eval.EvalConfig(n_way=3, n_episodes=10, episodes_per_step=4)
    res = eov_eval.evaluate(table, cfg)
    assert len(res.per_episode) == 10
    assert eov_eval.eval_step._cache_size() == 1
    # Episode prefix is stable: extending n_episodes never changes the
    # episodes already scored (same per-step keys, host-side truncation).
    res8 = eov_eval.evaluate(table, dataclasses_replace(cfg, n_episodes=8))
    np.testing.assert_array_equal(res8.per_episode, res.per_episode[:8])


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


def test_pallas_matcher_request_warns_when_unavailable(tmp_path):
    """matcher='pallas' off-TPU must warn, not silently give XLA numbers."""
    ds, store, _ = _extract_to_store(tmp_path, name="pw")
    table = store.to_table()
    cfg = eov_eval.EvalConfig(
        n_way=3, n_episodes=4, episodes_per_step=4, matcher="pallas"
    )
    if jax.default_backend() == "tpu":
        pytest.skip("pallas matcher is honored on TPU")
    with pytest.warns(RuntimeWarning, match="pallas"):
        res = eov_eval.evaluate(table, cfg)
    assert len(res.per_episode) == 4


def test_eval_5shot_protocol(tmp_path):
    """k_shot=5 with prototype-mean fusion (the kinetics_5shot preset's
    protocol) runs end to end, is deterministic, and beats 1-shot on a
    noisy-but-separable table (more supports -> better prototypes)."""
    rng = np.random.default_rng(9)
    n_cls, clips, d = 8, 12, 32
    means = rng.standard_normal((n_cls, 1, d)).astype(np.float32)
    feats = means + 1.9 * rng.standard_normal(
        (n_cls, clips, d)
    ).astype(np.float32)
    table = eov_eval.FeatureTable(
        jnp.asarray(feats), jnp.full((n_cls,), clips, jnp.int32)
    )
    base = dict(n_way=5, n_episodes=200, episodes_per_step=50, n_query=2,
                seed=11, fusion="mean")
    res5 = eov_eval.evaluate(
        table, eov_eval.EvalConfig(k_shot=5, **base)
    )
    res1 = eov_eval.evaluate(
        table, eov_eval.EvalConfig(k_shot=1, **base)
    )
    assert res5.per_episode.shape == (200,)
    assert res5.mean_acc > res1.mean_acc, (res5.mean_acc, res1.mean_acc)
    res5b = eov_eval.evaluate(table, eov_eval.EvalConfig(k_shot=5, **base))
    np.testing.assert_array_equal(res5.per_episode, res5b.per_episode)


def test_kinetics_5shot_preset_protocol_shape():
    from eov_tpu.config import get_preset

    p = get_preset("kinetics_5shot")
    assert p.eval.k_shot == 5 and p.eval.n_way == 5
    assert p.eval.n_episodes == 600 and p.eval.fusion == "mean"


def test_long_protocol_10k_episodes(tmp_path):
    """OPEN-2 coverage: the CMN-lineage 10k-episode protocol runs as one
    compiled program (padded tail steps) and its first 600 episodes are
    bit-identical to the 600-episode protocol's — the canonical ordinal
    sampling makes episode count a pure suffix extension."""
    rng = np.random.default_rng(4)
    feats = jnp.asarray(rng.standard_normal((8, 4, 16)).astype(np.float32))
    table = eov_eval.FeatureTable(feats, jnp.full((8,), 4, jnp.int32))
    from eov_tpu.config import get_preset

    cfg = get_preset("kinetics_10k").eval
    assert cfg.n_episodes == 10_000
    long = eov_eval.evaluate(table, cfg)
    assert long.per_episode.shape == (10_000,)
    short = eov_eval.evaluate(
        table, eov_eval.EvalConfig(**{**cfg.__dict__, "n_episodes": 600})
    )
    np.testing.assert_array_equal(long.per_episode[:600], short.per_episode)


def test_buffer_ring_evicts_lru_shapes():
    """_HOST_BUFS is LRU-bounded across shapes: a process cycling through
    many batch shapes (resolution buckets, tail batches) retains at most
    _HOST_BUFS_SHAPES stacks, least-recently-used evicted first
    (review r3: the per-shape cap alone left one stack per shape ever
    seen)."""
    cap = extract._HOST_BUFS_SHAPES
    marks = [(7, 7, i) for i in range(cap + 2)]  # synthetic, non-colliding
    for s in marks:
        extract._HOST_BUFS.pop(s, None)
    try:
        for s in marks[:cap]:
            extract._put_buf(np.zeros(s, np.uint8))
        # Touch the oldest so it becomes most-recent.
        assert extract._take_buf(marks[0]) is not None
        extract._put_buf(np.zeros(marks[0], np.uint8))
        # Two new shapes evict the now-least-recent marks[1], marks[2].
        extract._put_buf(np.zeros(marks[cap], np.uint8))
        extract._put_buf(np.zeros(marks[cap + 1], np.uint8))
        assert marks[0] in extract._HOST_BUFS
        assert marks[1] not in extract._HOST_BUFS
        assert marks[2] not in extract._HOST_BUFS
        assert marks[cap] in extract._HOST_BUFS
        assert marks[cap + 1] in extract._HOST_BUFS
        assert len(extract._HOST_BUFS) <= cap
    finally:
        for s in marks:
            extract._HOST_BUFS.pop(s, None)


class _Uninspectable:
    """Callable whose signature cannot be introspected (stands in for a C
    callable): inspect.signature raises ValueError."""

    def __init__(self, fn):
        self._fn = fn

    @property
    def __signature__(self):
        raise ValueError("no signature")

    def __call__(self, *a, **k):
        return self._fn(*a, **k)


def test_pooled_probe_settles_outless(tmp_path, caplog):
    """An un-introspectable get_batch that rejects out= loses only the
    probe attempt: the same batch is retried out-less and the out-less
    form is pinned for the rest of the run — the pooled fast path is
    never permanently lost to the per-record fallback (review r3)."""
    ds = SyntheticVideoDataset(
        n_classes=2, clips_per_class=4, height=64, width=80, seed=0,
        name="probe",
    )
    pooled_calls = []

    def _outless_get_batch(records, idx):
        pooled_calls.append(len(records))
        return np.stack([
            ds.get_frames(r, i) for r, i in zip(records, idx)
        ])

    class Probe:
        records = ds.records
        class_names = ds.class_names
        get_batch = _Uninspectable(_outless_get_batch)

        def get_frames(self, rec, idx):
            return ds.get_frames(rec, idx)

    from eov_tpu.data.datasets import get_batch_accepts_out
    assert get_batch_accepts_out(Probe.get_batch) is None

    store = FeatureStore(str(tmp_path / "probe"), class_names=ds.class_names)
    cfg = extract.ExtractConfig(num_segments=4, batch_clips=4)
    with caplog.at_level("INFO", logger="eov.extract"):
        stats = extract.extract_features(
            Probe(), None, store, cfg, feature_fn=_cheap_feature_fn
        )
    assert stats["extracted"] == 8 and stats["failed"] == 0
    assert pooled_calls == [4, 4]  # pooled ran once per batch, no fallback
    assert any("settling" in r.message for r in caplog.records)


def test_pooled_probe_settles_through_class_filter(tmp_path, caplog):
    """The class-filtered view over an un-introspectable out-less
    get_batch must let extract's OWN probe-and-settle run: first pooled
    call probes out=, settles out-less (logged), and the pooled fast path
    holds for the rest of the run with no dead ring traffic (review r3 —
    a wrapper that settled internally kept an out-accepting signature, so
    extract cycled ring buffers the wrapper discarded every batch)."""
    from eov_tpu.data.class_splits import filter_dataset_by_classes
    from eov_tpu.data.datasets import get_batch_accepts_out

    ds = SyntheticVideoDataset(
        n_classes=3, clips_per_class=4, height=64, width=80, seed=0,
        name="fprobe",
    )
    pooled_calls = []

    def _outless_get_batch(records, idx):
        pooled_calls.append(len(records))
        return np.stack([
            ds.get_frames(r, i) for r, i in zip(records, idx)
        ])

    class Base:
        records = ds.records
        class_names = ds.class_names
        get_batch = _Uninspectable(_outless_get_batch)

        def get_frames(self, rec, idx):
            return ds.get_frames(rec, idx)

    keep = ds.class_names[:2]
    filt = filter_dataset_by_classes(Base(), keep)
    assert get_batch_accepts_out(filt.get_batch) is None  # unknown mirrored

    store = FeatureStore(str(tmp_path / "fprobe"), class_names=keep)
    cfg = extract.ExtractConfig(num_segments=4, batch_clips=4)
    with caplog.at_level("INFO", logger="eov.extract"):
        stats = extract.extract_features(
            filt, None, store, cfg, feature_fn=_cheap_feature_fn
        )
    assert stats["extracted"] == 8 and stats["failed"] == 0
    assert pooled_calls == [4, 4]  # pooled once per batch, no fallback
    assert any("settling" in r.message for r in caplog.records)


def test_fused_pool_without_stage1_fails_at_config_time():
    """pallas_pool='fused' without stage 1 in the resolved fused stages
    must raise in make_feature_fn — at config time — not at trace time on
    the first batch after decode/setup (review r3)."""
    import jax

    from eov_tpu.models import ResNet50

    variables = ResNet50(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    cfg = extract.ExtractConfig(
        num_segments=2, fused_stages=(2,), pallas_pool="fused",
    )
    with pytest.raises(ValueError, match="requires stage 1"):
        extract.make_feature_fn(variables, cfg)


def test_fused_pool_on_basic_arch_fails_at_config_time():
    """A BASIC arch with explicit fused_stages=(1,) passes the stage check
    but pool-fusion only exists in the bottleneck stack — must refuse in
    make_feature_fn, not at trace time on the first batch (ADVICE r3)."""
    import jax

    from eov_tpu.models import ResNet18

    variables = ResNet18(dtype=jnp.float32).init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
    )
    cfg = extract.ExtractConfig(
        arch="resnet18", num_segments=2, fused_stages=(1,),
        pallas_pool="fused",
    )
    with pytest.raises(ValueError, match="bottleneck archs only"):
        extract.make_feature_fn(variables, cfg)


def test_buffer_ring_drops_emptied_shape_stacks():
    """A shape whose buffers are all checked out must not occupy an LRU
    slot and evict shapes that still hold stock (ADVICE r3): taking the
    last buffer removes the entry; returning one recreates it."""
    with extract._HOST_BUFS_LOCK:
        extract._HOST_BUFS.clear()
    bufs = [np.zeros((2, 3), np.uint8) for _ in range(2)]
    for b in bufs:
        extract._put_buf(b)
    live = np.zeros((4, 5), np.uint8)
    extract._put_buf(live)
    # Check out everything of the first shape — its entry must vanish.
    assert extract._take_buf((2, 3)) is not None
    assert extract._take_buf((2, 3)) is not None
    with extract._HOST_BUFS_LOCK:
        assert (2, 3) not in extract._HOST_BUFS
        assert (4, 5) in extract._HOST_BUFS
    # Churn through _HOST_BUFS_SHAPES fresh shapes: the live stock shape
    # is evicted only by genuinely newer NON-EMPTY stacks, never by the
    # emptied one.
    assert extract._take_buf((2, 3)) is None
    extract._put_buf(bufs[0])  # entry recreated on return
    with extract._HOST_BUFS_LOCK:
        assert (2, 3) in extract._HOST_BUFS
        extract._HOST_BUFS.clear()


def test_buffer_ring_concurrent_take_put_invariants():
    """The ring's lock must hold its invariants under concurrent extracts:
    per-shape stacks never exceed _HOST_BUFS_CAP, the shape table never
    exceeds _HOST_BUFS_SHAPES, and no take/put ever throws while threads
    hammer overlapping shape sets (the LRU eviction mutates the
    OrderedDict the takers are reading)."""
    import threading

    shapes = [(5, 5, i) for i in range(extract._HOST_BUFS_SHAPES + 2)]
    for s in shapes:
        extract._HOST_BUFS.pop(s, None)
    errors = []

    def worker(tid):
        try:
            for i in range(400):
                s = shapes[(tid + i) % len(shapes)]
                buf = extract._take_buf(s)
                if buf is None:
                    buf = np.zeros(s, np.uint8)
                extract._put_buf(buf)
        except Exception as e:  # noqa: BLE001 — the test IS the catch
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(t,)) for t in range(4)]
    try:
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert not errors, errors
        with extract._HOST_BUFS_LOCK:
            assert len(extract._HOST_BUFS) <= extract._HOST_BUFS_SHAPES
            for stack in extract._HOST_BUFS.values():
                assert len(stack) <= extract._HOST_BUFS_CAP
    finally:
        for s in shapes:
            extract._HOST_BUFS.pop(s, None)


def test_store_quant_provenance_semantics(tmp_path):
    """r5 precision provenance (data/store.py): declared quant round-trips
    through the manifest, a silent reader inherits it, an agnostic open
    stays unknown, and a contradicting declaration refuses."""
    from eov_tpu.data.store import FeatureStore

    root = str(tmp_path / "q")
    s = FeatureStore(root, class_names=["a"], process_index=0, quant="int8")
    s.put("v0", np.ones(4, np.float32), 0)
    s.flush()
    assert s.recorded_quant() == ("int8", True)

    # Agnostic re-open (read side, importers): provenance visible, inherited.
    r = FeatureStore(root, process_index=0)
    assert r.recorded_quant() == ("int8", True)
    assert r.summary()["quant"] == "int8"

    # Contradicting declaration refuses; 'off'/None both mean the float path.
    import pytest

    with pytest.raises(ValueError, match="one extraction precision"):
        FeatureStore(root, process_index=0, quant=None)
    with pytest.raises(ValueError, match="one extraction precision"):
        FeatureStore(root, process_index=0, quant="off")

    # A store that never declared stays unknown and reports it.
    root2 = str(tmp_path / "u")
    u = FeatureStore(root2, class_names=["a"], process_index=0)
    u.put("v0", np.ones(4, np.float32), 0)
    u.flush()
    assert u.recorded_quant() == (None, False)
    assert u.summary()["quant"] == "unknown"

    # Declaring the float path is distinct from unknown.
    root3 = str(tmp_path / "f")
    f = FeatureStore(root3, class_names=["a"], process_index=0, quant=None)
    assert f.recorded_quant() == (None, True)
    assert f.summary()["quant"] == "off"


def test_store_quant_declaration_cannot_vouch_retroactively(tmp_path, caplog):
    """Declaring a precision onto a NON-EMPTY unknown-provenance store
    (pre-r5 / imported) must not stamp it: the pre-existing clips were not
    produced by this writer, so the store stays unknown (classify keeps
    warning) and a warning is logged — resume keeps working (r5 review)."""
    import logging

    from eov_tpu.data.store import FeatureStore

    root = str(tmp_path / "legacy")
    s = FeatureStore(root, class_names=["a"], process_index=0)
    s.put("v0", np.ones(4, np.float32), 0)
    s.flush()
    assert s.recorded_quant() == (None, False)

    with caplog.at_level(logging.WARNING, logger="eov.store"):
        r = FeatureStore(root, process_index=0, quant="int8")
    assert any("cannot vouch retroactively" in m for m in caplog.messages)
    assert r.recorded_quant() == (None, False)  # still unknown
    r.put("v1", np.ones(4, np.float32), 0)
    r.flush()  # resume-style append still works
    assert FeatureStore(root, process_index=0).recorded_quant() == (
        None, False)
