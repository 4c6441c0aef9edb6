"""VideoFileDataset: extraction directly from source video files (C14).

Reference capability (SURVEY.md §2a C14, §2b N4): the reference stages an
offline ffmpeg video->frame-folder pass before anything runs; the build
reads source videos directly (cv2's bundled ffmpeg — this env has no
system ffmpeg) for extraction and for one-step packing to EOVC. Covered:
directory-layout discovery, exact sequential-grab frame indexing,
broken-metadata tail padding, the extract pipeline over it, and
pack_eovc --dataset videodir round-trip.
"""

import os

import numpy as np
import pytest

from eov_tpu.data.datasets import VideoFileDataset

cv2 = pytest.importorskip("cv2")


def _write_video(path, n_frames, h=48, w=64, value_step=16):
    wr = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (w, h))
    if not wr.isOpened():
        pytest.skip("cv2.VideoWriter cannot encode mp4 on this box")
    for t in range(n_frames):
        wr.write(np.full((h, w, 3), (t * value_step) % 240, np.uint8))
    wr.release()


@pytest.fixture()
def video_root(tmp_path):
    root = tmp_path / "videos"
    for c, n_clips in (("class_a", 2), ("class_b", 2)):
        os.makedirs(root / c)
        for j in range(n_clips):
            _write_video(str(root / c / f"v{j}.mp4"), 12 + 3 * j)
    return str(root)


def test_discovery_and_exact_frame_indexing(video_root):
    ds = VideoFileDataset(video_root)
    assert ds.class_names == ["class_a", "class_b"]
    assert len(ds.records) == 4
    assert {r.label for r in ds.records} == {0, 1}
    rec = next(r for r in ds.records if r.video_id.endswith("v1.mp4"))
    assert rec.num_frames == 15

    idx = np.array([0, 7, 14])
    frames = ds.get_frames(rec, idx)
    assert frames.shape == (3, 48, 64, 3) and frames.dtype == np.uint8
    # Frame t is a solid (t*16)%240 image; mp4v is lossy, so compare means
    # with a generous-but-discriminating tolerance (steps are 16 apart).
    means = frames.reshape(3, -1).mean(axis=1)
    np.testing.assert_allclose(means, [(int(i) * 16) % 240 for i in idx],
                               atol=6)
    # Deterministic re-read.
    np.testing.assert_array_equal(frames, ds.get_frames(rec, idx))


def test_metadata_overcount_pads_tail(video_root, caplog):
    import logging

    ds = VideoFileDataset(video_root)
    rec = ds.records[0]
    # Force an overcounted record (broken container metadata).
    import dataclasses

    bad = dataclasses.replace(rec, num_frames=rec.num_frames + 5)
    idx = np.array([0, rec.num_frames - 1, rec.num_frames + 3])
    with caplog.at_level(logging.WARNING, logger="eov.data"):
        frames = ds.get_frames(bad, idx)
    assert frames.shape[0] == 3
    assert "padding tail" in caplog.text
    # The unreadable index repeats the last decodable frame.
    np.testing.assert_array_equal(frames[2], frames[1])


def test_extract_pipeline_over_videos(video_root):
    import jax.numpy as jnp

    from eov_tpu.data.store import FeatureStore
    from eov_tpu.extract import ExtractConfig, extract_features

    ds = VideoFileDataset(video_root)
    store = FeatureStore(os.path.join(video_root, "..", "feats"),
                         class_names=list(ds.class_names))

    def cheap_feature_fn(frames_u8):
        x = frames_u8.astype(jnp.float32)
        return x.mean(axis=(1, 2, 3, 4))[:, None] * jnp.ones((1, 8))

    cfg = ExtractConfig(num_segments=4, batch_clips=2, deterministic=True)
    stats = extract_features(ds, None, store, cfg,
                             feature_fn=cheap_feature_fn)
    assert stats["extracted"] == 4 and stats["failed"] == 0
    table = store.to_table(n_classes=2)
    assert table.features.shape[0] == 2
    assert [int(c) for c in table.counts] == [2, 2]


def test_pack_eovc_from_videodir_roundtrip(video_root, tmp_path):
    from eov_tpu.data.datasets import EovcVideoDataset
    from eov_tpu.tools import pack_eovc

    out = str(tmp_path / "packed.eovc")
    rc = pack_eovc.main([
        "--out", out, "--dataset", "videodir", "--root", video_root,
        "--short-side", "32", "--codec", "raw",
    ])
    assert rc == 0
    src = VideoFileDataset(video_root)
    packed = EovcVideoDataset(out)
    assert len(packed.records) == len(src.records) == 4
    by_id = {r.video_id: r for r in packed.records}
    for r in src.records:
        assert by_id[r.video_id].num_frames == r.num_frames
        assert by_id[r.video_id].label == r.label
    # Pixel path: packed frames are the short-side-32 resize of the source.
    from eov_tpu.tools.pack_eovc import resize_short_side_np

    rec = src.records[0]
    idx = np.array([0, 5])
    want = resize_short_side_np(src.get_frames(rec, idx), 32)
    got = packed.get_frames(by_id[rec.video_id], idx)
    np.testing.assert_array_equal(got, want)


def test_only_classes_restricts_discovery_and_probing(video_root):
    ds = VideoFileDataset(video_root, only_classes=["class_b"])
    assert ds.class_names == ["class_b"]
    assert len(ds.records) == 2 and {r.label for r in ds.records} == {0}


def test_only_classes_mismatch_raises(video_root):
    with pytest.raises(FileNotFoundError, match="requested classes"):
        VideoFileDataset(video_root, only_classes=["Class_A"])  # wrong case


def test_labeled_run_over_flat_root_raises(tmp_path):
    """A labeled run (--class-split) against a root with NO class
    subdirectories must raise, not fall through to the flat-root
    deployment branch where every file becomes pseudo-class 'unknown'
    label 0 (review r3)."""
    (tmp_path / "a.avi").write_bytes(b"\x00")
    with pytest.raises(FileNotFoundError, match="no class subdirectories"):
        VideoFileDataset(str(tmp_path), only_classes=["class_a"])


def test_pooled_get_batch_matches_per_record(video_root):
    """Threaded pooled decode == per-record get_frames exactly (r4,
    VERDICT r3 #2): same bytes, out= writes rows in place, worker errors
    surface, mixed resolutions refuse instead of mis-stacking."""
    ds = VideoFileDataset(video_root)
    recs = ds.records
    idx = np.stack([
        np.linspace(0, r.num_frames - 1, 4).astype(np.int32) for r in recs
    ])
    want = np.stack([ds.get_frames(r, i) for r, i in zip(recs, idx)])

    got = ds.get_batch(recs, idx)
    np.testing.assert_array_equal(want, got)

    out = np.zeros_like(want)
    got2 = ds.get_batch(recs, idx, out=out)
    assert got2 is out
    np.testing.assert_array_equal(want, out)

    # Forced single-worker path is the same code; parity there too.
    os.environ["EOV_VIDEODIR_THREADS"] = "1"
    try:
        np.testing.assert_array_equal(want, ds.get_batch(recs, idx))
    finally:
        del os.environ["EOV_VIDEODIR_THREADS"]

    # extract.py's pooled fast path picks it up end to end.
    from eov_tpu.data.datasets import get_batch_accepts_out

    assert get_batch_accepts_out(ds.get_batch) is True


def test_pooled_get_batch_mixed_resolution_raises(tmp_path):
    root = tmp_path / "videos"
    os.makedirs(root / "c")
    _write_video(str(root / "c" / "a.mp4"), 6, h=48, w=64)
    _write_video(str(root / "c" / "b.mp4"), 6, h=32, w=48)
    ds = VideoFileDataset(str(root))
    idx = np.zeros((2, 2), np.int32)
    with pytest.raises(ValueError, match="mixed frame resolutions"):
        ds.get_batch(ds.records, idx)
    # With out=, the mismatching worker refuses with the buffer message.
    out = np.zeros((2, 2, 48, 64, 3), np.uint8)
    with pytest.raises(ValueError, match="out buffer mismatch"):
        ds.get_batch(ds.records, idx, out=out)
