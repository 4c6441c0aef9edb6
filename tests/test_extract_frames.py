"""Offline video->frames tool (tools/extract_frames.py — SURVEY C14/N4).

Round-trip: synthetic MJPG videos -> cv2.VideoCapture decode -> frame
folders + TSN split list -> FrameFolderDataset -> the extraction CLI's
dataset surface. JPEG/MJPG are lossy so pixel checks are tolerance-based;
structure checks (counts, layout, split) are exact.
"""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from eov_tpu.tools import extract_frames as ef  # noqa: E402


def _write_video(path, n_frames, h, w, seed):
    rng = np.random.default_rng(seed)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (w, h))
    assert vw.isOpened()
    truth = []
    for i in range(n_frames):
        # Smooth content (MJPG-friendly): constant tiles per frame.
        img = np.full((h, w, 3), 0, np.uint8)
        img[:, :, 0] = 40 + 12 * i
        img[:, :, 1] = rng.integers(60, 200)
        img[h // 2 :, :, 2] = 180
        truth.append(img.copy())
        vw.write(img[:, :, ::-1])  # tool decodes BGR->RGB; write RGB->BGR
    vw.release()
    return np.stack(truth)


def test_video_roundtrip_to_framefolder(tmp_path):
    vids = tmp_path / "vids"
    out = tmp_path / "frames"
    truths = {}
    for cls, n in [("classA", 6), ("classB", 9)]:
        os.makedirs(vids / cls)
        truths[cls] = _write_video(
            str(vids / cls / f"{cls}_clip0.avi"), n, 48, 64, seed=len(cls)
        )

    res = ef.extract_all(str(vids), str(out))
    assert res["failed"] == 0
    assert res["extracted"] == 2
    assert res["classes"] == ["classA", "classB"]
    split = sorted(res["split"])
    assert split == [("classA/classA_clip0", 6, 0),
                     ("classB/classB_clip0", 9, 1)]

    # TSN 1-based layout, loadable by FrameFolderDataset.
    assert (out / "classA" / "classA_clip0" / "img_00001.jpg").exists()
    from eov_tpu.data.datasets import FrameFolderDataset

    ds = FrameFolderDataset(str(out), split, res["classes"])
    rec = next(r for r in ds.records if r.video_id == "classB/classB_clip0")
    frames = ds.get_frames(rec, np.array([0, 4, 8]))
    assert frames.shape == (3, 48, 64, 3)
    want = truths["classB"][[0, 4, 8]]
    # Two lossy hops (MJPG then JPEG) on smooth content.
    assert np.mean(np.abs(frames.astype(int) - want.astype(int))) < 6


def test_short_side_resize_and_subsample(tmp_path):
    vids = tmp_path / "vids"
    os.makedirs(vids / "c")
    _write_video(str(vids / "c" / "v.avi"), 10, 48, 64, seed=0)
    out = tmp_path / "frames"
    res = ef.extract_all(str(vids), str(out), short_side=24, every=2,
                         max_frames=4)
    ((vid, n, label),) = res["split"]
    assert (vid, n, label) == ("c/v", 4, 0)
    from PIL import Image

    with Image.open(out / "c" / "v" / "img_00001.jpg") as im:
        assert im.size == (32, 24)  # (w, h): short side 48 -> 24, 64 -> 32


def test_decode_failure_is_skipped_not_fatal(tmp_path):
    vids = tmp_path / "vids"
    os.makedirs(vids / "c")
    _write_video(str(vids / "c" / "good.avi"), 3, 32, 32, seed=1)
    (vids / "c" / "corrupt.mp4").write_bytes(b"not a video at all")
    res = ef.extract_all(str(vids), str(tmp_path / "frames"))
    assert res["extracted"] == 1
    assert res["failed"] == 1


def test_cli_main_writes_split_and_classes(tmp_path):
    vids = tmp_path / "vids"
    os.makedirs(vids / "c")
    _write_video(str(vids / "c" / "v.avi"), 5, 32, 32, seed=2)
    out = tmp_path / "frames"
    rc = ef.main(["--videos", str(vids), "--out", str(out)])
    assert rc == 0
    from eov_tpu.data.datasets import load_split_txt

    assert load_split_txt(str(out / "split_all.txt")) == [("c/v", 5, 0)]
    assert (out / "classes.txt").read_text().strip() == "c"
