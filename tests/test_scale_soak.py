"""Scale soak: store/manifest/extract integrity at thousands of clips
(VERDICT r3 #5 — SURVEY.md §5 failure/recovery at pod scale).

The claims the r1–r3 toy-size tests left unbounded:
  - a run SIGKILLed mid-extraction resumes to a complete, correct store
    (no shard overwrite, no manifest corruption, no lost/duplicated clips)
  - host RSS stays bounded while extracting (the store streams shards;
    nothing accumulates past flush_every)
  - manifest rewrite and reopen/done_ids stay cheap at size

Default size is 2,000 clips (~10 s); EOV_SOAK_CLIPS=10000 is the
pod-scale artifact recorded in BASELINE.md (r4).
"""

from __future__ import annotations

import json
import os
import resource
import signal
import subprocess
import sys
import time

import numpy as np

from tests.soak_worker import SoakDataset, expected_feature, run

N_CLIPS = int(os.environ.get("EOV_SOAK_CLIPS", "2000"))
FLUSH_EVERY = 128


def test_soak_kill_resume_and_bounds(tmp_path):
    root = str(tmp_path / "store")

    # --- phase 1: a real process, really killed mid-run -------------------
    env = dict(os.environ, PYTHONPATH="/root/repo", JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(os.path.dirname(__file__),
                                      "soak_worker.py"),
         root, str(N_CLIPS), str(FLUSH_EVERY)],
        env=env, cwd="/root/repo",
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    # Kill once at least two durable flushes happened (and well before the
    # end): the manifest then has real content and a shard may be mid-write.
    manifest = os.path.join(root, "manifest.json")
    deadline = time.time() + 120
    while time.time() < deadline:
        if proc.poll() is not None:
            raise AssertionError(
                "worker finished before the kill — raise N_CLIPS"
            )
        if os.path.exists(manifest):
            with open(manifest) as f:
                try:
                    done = len(json.load(f).get("videos", {}))
                except json.JSONDecodeError:
                    done = 0  # caught between mkstemp and replace — fine
            if done >= 2 * FLUSH_EVERY:
                break
        time.sleep(0.02)
    else:
        raise AssertionError("worker never reached two flushes")
    proc.send_signal(signal.SIGKILL)
    proc.wait()

    # --- phase 2: resume in-process, with RSS + timing bounds -------------
    from eov_tpu.data.store import FeatureStore

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
    t0 = time.perf_counter()
    store = FeatureStore(root, process_index=0)
    done_before = len(store.done_ids())
    reopen_s = time.perf_counter() - t0
    assert 0 < done_before < N_CLIPS, done_before

    t0 = time.perf_counter()
    stats = run(root, N_CLIPS, FLUSH_EVERY)
    resume_s = time.perf_counter() - t0
    assert stats["skipped_done"] == done_before
    assert stats["extracted"] == N_CLIPS - done_before
    assert stats["failed"] == 0

    # --- integrity at size -------------------------------------------------
    store = FeatureStore(root, process_index=0)
    t0 = time.perf_counter()
    videos = store._merged_videos()
    merge_s = time.perf_counter() - t0
    assert len(videos) == N_CLIPS  # every clip exactly once
    shards = {m["shard"] for m in videos.values()}
    for s in shards:  # every referenced shard durable on disk
        assert os.path.exists(os.path.join(root, s)), s
    # The killed run's shards and the resume's shards never collide.
    assert len(shards) >= 2

    # Spot-check features across both writers' eras (content-addressed).
    data = store.load_all()
    ds = SoakDataset(N_CLIPS)
    idx = np.linspace(0, N_CLIPS - 1, 50).astype(int)
    for i in idx:
        vid = ds.records[i].video_id
        feat, label = data[vid]
        np.testing.assert_allclose(feat, expected_feature(vid), atol=0.51)
        assert label == i % len(ds.class_names)

    # --- bounds (loose, but they catch O(N) blowups) -----------------------
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    rss_growth_mb = (rss1 - rss0) / 1024
    # Features are ~N*D*4 B (~2.5 MB at 10k); load_all above holds one full
    # copy. Anything near the raw-frames volume (N*K*H*W*3 ~ 150 MB at
    # 10k) would mean batches are being retained.
    assert rss_growth_mb < 400, rss_growth_mb
    assert reopen_s < 5.0, reopen_s
    assert merge_s < 5.0, merge_s

    print(json.dumps({
        "soak_clips": N_CLIPS,
        "done_at_kill": done_before,
        "resume_wall_s": round(resume_s, 2),
        "clips_per_sec_resume": round((N_CLIPS - done_before) / resume_s, 1),
        "reopen_done_ids_s": round(reopen_s, 4),
        "manifest_merge_s": round(merge_s, 4),
        "rss_growth_mb": round(rss_growth_mb, 1),
        "shards": len(shards),
    }))
