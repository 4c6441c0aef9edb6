"""C11 split metadata: generation determinism, validation, video filtering."""

import os

import pytest

from eov_tpu.data import class_splits as cs


def test_ucf101_class_list_canonical():
    names = cs.load_class_list(
        os.path.join(cs.SPLITS_DIR, "ucf101_classes.txt")
    )
    assert len(names) == 101
    assert len(set(names)) == 101
    assert names == sorted(names)  # official classInd order = ASCII sort


def test_checked_in_ucf101_split_valid_and_regenerable():
    doc = cs.load_class_split(
        os.path.join(cs.SPLITS_DIR, "ucf101_oneshot.json")
    )
    sp = doc["class_splits"]
    assert (len(sp["train"]), len(sp["val"]), len(sp["test"])) == (70, 10, 21)
    # Regenerating from the class list reproduces the document exactly.
    names = cs.load_class_list(
        os.path.join(cs.SPLITS_DIR, "ucf101_classes.txt")
    )
    regen = cs.make_class_split(
        names, 70, 10, 21, seed=0, protocol=doc["protocol"]
    )
    assert regen["class_splits"] == sp


def test_make_class_split_order_invariant_and_disjoint():
    names = [f"c{i:02d}" for i in range(20)]
    a = cs.make_class_split(names, 10, 4, 6, seed=3)
    b = cs.make_class_split(list(reversed(names)), 10, 4, 6, seed=3)
    assert a["class_splits"] == b["class_splits"]
    all_classes = sum(a["class_splits"].values(), [])
    assert sorted(all_classes) == sorted(names)


def test_load_rejects_overlap(tmp_path):
    bad = {
        "protocol": "x",
        "class_splits": {"train": ["a", "b"], "test": ["b", "c"]},
    }
    p = tmp_path / "bad.json"
    cs.save_class_split(str(p), bad)
    with pytest.raises(ValueError, match="multiple splits"):
        cs.load_class_split(str(p))


def test_filter_split_by_classes_relabels_densely():
    class_names = ["alpha", "beta", "gamma", "delta"]
    split = [(f"v{i}", 30 + i, i % 4) for i in range(12)]
    out, kept = cs.filter_split_by_classes(
        split, class_names, keep=["delta", "beta"]
    )
    assert kept == ["beta", "delta"]
    assert {l for _, _, l in out} == {0, 1}
    # beta (old label 1) -> 0, delta (old 3) -> 1; counts preserved.
    assert len(out) == 6
    for p, n, l in out:
        old = int(p[1:]) % 4
        assert l == {1: 0, 3: 1}[old]


def test_filter_dataset_by_classes_wrapper():
    """Generic class-filter view works over any VideoDataset (eovc/synthetic
    path of the CLI --class-split flag)."""
    import numpy as np

    from eov_tpu.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_classes=4, clips_per_class=2, seed=0,
                               height=40, width=48)
    keep = [ds.class_names[3], ds.class_names[1]]
    f = cs.filter_dataset_by_classes(ds, keep)
    assert f.class_names == sorted(keep)
    assert len(f.records) == 4
    assert {r.label for r in f.records} == {0, 1}
    # frames still load through the relabeled records
    r = f.records[0]
    frames = f.get_frames(r, np.array([0, 1]))
    assert frames.shape == (2, 40, 48, 3)


def test_filter_dataset_pooled_get_batch_mirrors_base():
    """The wrapper's pooled fast path must match what the base actually
    offers: no get_batch -> no attribute (extract.py feature-detects with
    hasattr, and a raising method = a failed pooled attempt + warning per
    batch); out-less base -> out-less wrapper signature (extract.py
    introspects for `out=`, and advertising it over an out-less base
    TypeErrors every pooled call); out-accepting base -> out passes through.
    """
    import inspect

    import numpy as np

    from eov_tpu.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=2, seed=0,
                               height=40, width=48)
    keep = ds.class_names[:2]

    # 1. Base without get_batch (SyntheticVideoDataset): hidden.
    assert not hasattr(ds, "get_batch")
    assert not hasattr(cs.filter_dataset_by_classes(ds, keep), "get_batch")

    calls = {}

    # 2. Out-less base: wrapper signature must not advertise out.
    class OutLess:
        class_names = ds.class_names
        records = ds.records
        get_frames = ds.get_frames

        def get_batch(self, records, indices):
            calls["outless"] = True
            return np.zeros((len(records), 2, 4, 4, 3), np.uint8)

    w = cs.filter_dataset_by_classes(OutLess(), keep)
    sig = inspect.signature(w.get_batch).parameters
    assert "out" not in sig
    w.get_batch(w.records[:1], np.zeros((1, 2), np.int64))
    assert calls["outless"]

    # 3. Out-accepting base: out passes through.
    class WithOut:
        class_names = ds.class_names
        records = ds.records
        get_frames = ds.get_frames

        def get_batch(self, records, indices, out=None):
            calls["out"] = out
            return out

    w = cs.filter_dataset_by_classes(WithOut(), keep)
    assert "out" in inspect.signature(w.get_batch).parameters
    buf = np.zeros((1, 2, 4, 4, 3), np.uint8)
    w.get_batch(w.records[:1], np.zeros((1, 2), np.int64), out=buf)
    assert calls["out"] is buf


def test_cli_presets_and_class_split_parse(capsys):
    """CLI surface: presets listing and class-split filtered synthetic load."""
    import json
    import os

    from eov_tpu import cli
    from eov_tpu.data import class_splits as _cs

    assert cli.main(["presets"]) == 0
    out = capsys.readouterr().out
    for name in ("episode_cpu", "ucf101_600", "kinetics_embodied",
                 "tpu_batched", "pod_extract"):
        assert name in out

    # parse + dataset load path of --class-split over synthetic
    doc = {"protocol": "t", "class_splits": {
        "train": ["synthetic_class_000"],
        "test": ["synthetic_class_001", "synthetic_class_002"]}}
    path = "/tmp/_cli_csplit.json"
    _cs.save_class_split(path, doc)
    ap_args = [
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--class-split", f"{path}:test",
    ]

    class NS:  # argparse-shaped shim for _load_dataset
        dataset = "synthetic"
        synthetic_classes = 3
        synthetic_clips = 2
        seed = 0
        synthetic_virtual = False
        class_split = f"{path}:test"
        root = split = None

    ds = cli._load_dataset(NS())
    assert ds.class_names == ["synthetic_class_001", "synthetic_class_002"]
    assert len(ds.records) == 4
    os.remove(path)


def test_cli_help_parses_for_every_subcommand(capsys):
    """argparse wiring: --help must succeed for each subcommand."""
    import pytest as _pytest

    from eov_tpu import cli

    for sub in ("extract", "eval", "episode", "train", "test", "fixtures",
                "bench", "presets"):
        with _pytest.raises(SystemExit) as e:
            cli.main([sub, "--help"])
        assert e.value.code == 0
        capsys.readouterr()


def test_make_splits_tool_and_cmn_dropin(tmp_path, monkeypatch, capsys):
    """The C11 regeneration tool end to end, including the turnkey CMN
    drop-in (VERDICT r1 #9): placing kinetics100_cmn_classes.txt makes the
    tool emit the 64/12/24 CMN-shape split; without it, only UCF101."""
    import shutil

    from eov_tpu.data import class_splits as cs
    from eov_tpu.tools import make_splits

    d = tmp_path / "splits"
    d.mkdir()
    shutil.copy(
        os.path.join(cs.SPLITS_DIR, "ucf101_classes.txt"),
        d / "ucf101_classes.txt",
    )
    monkeypatch.setattr(cs, "SPLITS_DIR", str(d))
    make_splits.main()
    assert (d / "ucf101_oneshot.json").exists()
    assert not (d / "kinetics100_cmn.json").exists()

    # Drop in a stand-in class list (the published CMN names slot in the
    # same way) and re-run: the CMN-protocol split appears.
    (d / "kinetics100_cmn_classes.txt").write_text(
        "".join(f"class_{i:03d}\n" for i in range(100))
    )
    make_splits.main()
    split = cs.load_class_split(str(d / "kinetics100_cmn.json"))
    sizes = {k: len(v) for k, v in split["class_splits"].items()}
    assert sizes == {"train": 64, "val": 12, "test": 24}
    assert split["protocol"] == "kinetics100_cmn_64_12_24"
    # Deterministic: regenerating produces identical bytes.
    first = (d / "kinetics100_cmn.json").read_bytes()
    make_splits.main()
    assert (d / "kinetics100_cmn.json").read_bytes() == first


def test_filter_dataset_unknown_base_mirrors_unknown():
    """An un-introspectable base get_batch (C callable) must stay
    un-introspectable through the filtered view, so the consumer applies
    its own probe-and-settle policy to the wrapper exactly as it would to
    the base (review r3 — settling inside the wrapper mis-settled on
    genuine TypeErrors and, over a settled-out-less base, kept an
    out-accepting signature that made extract cycle dead ring buffers
    every batch). The extract-level integration is
    test_eval_store.test_pooled_probe_settles_through_class_filter."""
    import numpy as np

    from eov_tpu.data.datasets import (SyntheticVideoDataset,
                                       get_batch_accepts_out)

    ds = SyntheticVideoDataset(n_classes=3, clips_per_class=2, seed=0,
                               height=40, width=48)
    keep = ds.class_names[:2]
    calls = []

    def _outless(records, indices):
        calls.append(len(records))
        return np.zeros((len(records), 2, 4, 4, 3), np.uint8)

    class _Uninspectable:
        def __init__(self, fn):
            self._fn = fn

        @property
        def __signature__(self):
            raise ValueError("no signature")

        def __call__(self, *a, **k):
            return self._fn(*a, **k)

    class Base:
        class_names = ds.class_names
        records = ds.records
        get_frames = ds.get_frames
        get_batch = _Uninspectable(_outless)

    w = cs.filter_dataset_by_classes(Base(), keep)
    assert get_batch_accepts_out(w.get_batch) is None  # unknown mirrored
    idx = np.zeros((1, 2), np.int64)
    w.get_batch(w.records[:1], idx)  # out-less passes straight through
    assert calls == [1]
    buf = np.zeros((1, 2, 4, 4, 3), np.uint8)
    with pytest.raises(TypeError):  # the probe rejection reaches the
        w.get_batch(w.records[:1], idx, out=buf)  # consumer, who settles
