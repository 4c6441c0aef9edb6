"""Meta-val one-shot model selection during finetuning (C12 + C7-C10).

Reference capability (SURVEY.md §2a C12, §3.5): the reference lineage
finetunes the backbone on the META-TRAIN classes and selects the checkpoint
by episodic one-shot accuracy on the disjoint META-VAL classes before
reporting meta-test. Covered here: `train.one_shot_validate` (full
extract->table->evaluate chain on the current train state, deterministic),
the CLI's `--val-class-split` per-epoch validation + `best.json` recording,
and `--select best` checkpoint resolution on `test`.
"""

import json
import os

import jax
import numpy as np

from eov_tpu import cli
from eov_tpu import train as tr
from eov_tpu.data.datasets import SyntheticVideoDataset


def _tiny_cfg(**kw):
    base = dict(num_classes=6, arch="resnet18", num_segments=2,
                batch_clips=4, compute_dtype="float32", scale_size=36,
                crop_size=32, dropout=0.0)
    base.update(kw)
    return tr.TrainConfig(**base)


def test_one_shot_validate_deterministic_and_seeded():
    cfg = _tiny_cfg()
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0),
                                  sample_hw=(32, 32))
    ds = SyntheticVideoDataset(n_classes=6, clips_per_class=2, seed=3,
                               height=40, width=48)
    r1 = tr.one_shot_validate(state, cfg, ds, n_way=5, n_episodes=30,
                              num_segments=2, seed=7)
    r2 = tr.one_shot_validate(state, cfg, ds, n_way=5, n_episodes=30,
                              num_segments=2, seed=7)
    assert r1.per_episode.shape == (30,)
    np.testing.assert_array_equal(r1.per_episode, r2.per_episode)
    assert 0.0 <= r1.mean_acc <= 1.0 and r1.ci95 >= 0.0
    # A different protocol seed samples different episodes (the canonical
    # ordinal protocol is a pure function of (seed, config)).
    r3 = tr.one_shot_validate(state, cfg, ds, n_way=5, n_episodes=30,
                              num_segments=2, seed=8)
    assert not np.array_equal(r1.per_episode, r3.per_episode)


def _write_split(tmp_path):
    names = [f"synthetic_class_{c:03d}" for c in range(10)]
    doc = {"protocol": "test-meta",
           "class_splits": {"train": names[:5], "val": names[5:]}}
    p = tmp_path / "meta_split.json"
    p.write_text(json.dumps(doc))
    return str(p)


def test_cli_train_meta_val_selection_then_test_best(tmp_path, capsys):
    spec = _write_split(tmp_path)
    out_dir = str(tmp_path / "run")
    metrics = str(tmp_path / "metrics.jsonl")
    common = [
        "--platform", "cpu", "--dataset", "synthetic",
        "--synthetic-classes", "10", "--synthetic-clips", "2",
        "--arch", "resnet18", "--batch", "4", "--num-segments", "2",
        "--scale-size", "36", "--crop-size", "32",
    ]
    rc = cli.main([
        "train", *common,
        "--class-split", spec + ":train",
        "--val-class-split", spec,  # bare spec must default to ':val'
        "--epochs", "2",
        "--val-segments", "2", "--val-episodes", "20", "--val-n-way", "4",
        "--out", out_dir, "--metrics", metrics,
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "meta-val one-shot" in out

    # One val row per epoch; best.json points at the argmax epoch.
    rows = [json.loads(ln) for ln in open(metrics)]
    val_rows = sorted((r for r in rows if r["event"] == "val"),
                      key=lambda r: r["epoch"])
    assert [r["epoch"] for r in val_rows] == [0, 1]
    assert all(r["n_episodes"] == 20 for r in val_rows)
    with open(os.path.join(out_dir, "best.json")) as f:
        best = json.load(f)
    best_row = max(val_rows, key=lambda r: r["val_acc"])
    # max() takes the first maximum, matching the strict '>' improvement
    # rule in the CLI (earlier epoch wins ties).
    assert best["epoch"] == best_row["epoch"]
    assert best["val_acc"] == best_row["val_acc"]
    assert best["dir"] == f"step_{best['epoch']}"
    assert os.path.isdir(os.path.join(out_dir, best["dir"]))

    # `test --select best` resolves and evaluates the recorded checkpoint.
    rc = cli.main([
        "test", *common,
        "--class-split", spec + ":train",
        "--params", out_dir, "--select", "best",
    ])
    out = capsys.readouterr().out
    assert rc == 0, out
    m = json.loads(out.strip().splitlines()[-1])
    assert 0.0 <= m["top1"] <= 1.0 and m["n"] == 10


def test_cli_select_best_without_validation_refuses(tmp_path, capsys):
    spec = _write_split(tmp_path)
    out_dir = str(tmp_path / "run_noval")
    common = [
        "--platform", "cpu", "--dataset", "synthetic",
        "--synthetic-classes", "10", "--synthetic-clips", "2",
        "--arch", "resnet18", "--batch", "4", "--num-segments", "2",
        "--scale-size", "36", "--crop-size", "32",
        "--class-split", spec + ":train",
    ]
    rc = cli.main(["train", *common, "--epochs", "1", "--out", out_dir])
    capsys.readouterr()
    assert rc == 0
    import pytest

    with pytest.raises(SystemExit, match="best.json"):
        cli.main(["test", *common, "--params", out_dir, "--select", "best"])


def test_val_split_spec_defaults_partition_to_val():
    """--val-class-split must default the partition to 'val' for both the
    bare and trailing-colon spellings — either would otherwise hit
    _load_dataset's bare-part default of 'test' and silently select models
    on the meta-TEST classes (review r3)."""
    from eov_tpu.cli import _val_split_spec

    assert _val_split_spec("s.json") == "s.json:val"
    assert _val_split_spec("s.json:") == "s.json:val"
    assert _val_split_spec("s.json:val") == "s.json:val"
    assert _val_split_spec("s.json:train") == "s.json:train"
