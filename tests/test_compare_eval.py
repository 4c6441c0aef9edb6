"""Paired episode-level eval comparison (C9/C10 analysis surface).

The reference's headline claim is an accuracy DELTA (embodied vs plain);
the r3 canonical ordinal protocol makes two same-seed/same-protocol runs
over one store score the IDENTICAL episode sequence, so
`eval --per-episode-out` + `tools/compare_eval.py` support a paired
comparison. Covered: the CLI dump, pairing stats, and the identity guards
(seed/protocol/counts must match; classifier-side fields may differ).
"""

import json

import numpy as np
import pytest

from eov_tpu import cli
from eov_tpu.data.store import FeatureStore
from eov_tpu.tools import compare_eval


def _make_store(tmp_path, seed=0):
    rng = np.random.default_rng(seed)
    names = [f"c{i:02d}" for i in range(6)]
    store = FeatureStore(str(tmp_path / "feats"), class_names=names)
    for c in range(6):
        for j in range(4):
            store.put(f"v_{c}_{j}", rng.normal(size=32).astype(np.float32), c)
    store.flush()
    return str(tmp_path / "feats")


def _eval(capsys, store, out, *extra):
    rc = cli.main([
        "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--store", store, "--per-episode-out", out, *extra,
    ])
    assert rc == 0, capsys.readouterr().out
    capsys.readouterr()


def test_per_episode_dump_and_paired_compare(tmp_path, capsys):
    store = _make_store(tmp_path)
    a, b = str(tmp_path / "cos.json"), str(tmp_path / "euc.json")
    _eval(capsys, store, a, "--metric", "cosine")
    _eval(capsys, store, b, "--metric", "euclidean")

    with open(a) as f:
        da = json.load(f)
    assert len(da["per_episode"]) == da["config"]["n_episodes"] == 30
    assert np.isclose(np.mean(da["per_episode"]), da["mean_acc"])

    rc = compare_eval.main([a, b])
    out = capsys.readouterr().out
    assert rc == 0
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n_episodes"] == 30
    assert stats["wins"] + stats["losses"] + stats["ties"] == 30
    assert np.isclose(stats["mean_diff"], stats["mean_a"] - stats["mean_b"])
    assert stats["variant_a"]["metric"] == "cosine"
    assert stats["variant_b"]["metric"] == "euclidean"

    # Self-comparison: the same run is episode-for-episode identical.
    rc = compare_eval.main([a, a])
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert stats["ties"] == 30 and stats["mean_diff"] == 0.0
    assert not stats["significant"]


def test_compare_refuses_different_episode_sets(tmp_path, capsys):
    store = _make_store(tmp_path)
    a, b = str(tmp_path / "s0.json"), str(tmp_path / "s1.json")
    _eval(capsys, store, a, "--seed", "0")
    _eval(capsys, store, b, "--seed", "1")
    rc = compare_eval.main([a, b])
    err = capsys.readouterr().err
    assert rc == 2 and "seed" in err

    # Mismatched per-class counts (different store) refuse too.
    with open(a) as f:
        da = json.load(f)
    db = json.loads(json.dumps(da))
    db["counts"][0] += 1
    with pytest.raises(ValueError, match="counts differ"):
        compare_eval.compare(da, db)

    # Episode-count mismatch with matching protocol fields is impossible
    # from the CLI, but a truncated dump must not silently zip-pair.
    db = json.loads(json.dumps(da))
    db["per_episode"] = db["per_episode"][:-1]
    with pytest.raises(ValueError, match="episode count"):
        compare_eval.compare(da, db)
