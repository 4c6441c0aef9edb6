"""`eov store-info` — merged FeatureStore summary (C6 ops tooling)."""

import json

import numpy as np

from eov_tpu import cli
from eov_tpu.data.store import FeatureStore


def test_store_info_merged_multiwriter(tmp_path, capsys):
    root = str(tmp_path / "feats")
    names = ["a", "b", "c"]
    # Two writers (pod-style), float16, class c left empty.
    for pi, cls in ((0, 0), (1, 1)):
        store = FeatureStore(root, class_names=names, process_index=pi,
                             dtype="float16")
        for j in range(2 + pi):
            store.put(f"p{pi}_v{j}", np.ones(16, np.float32), cls)
        store.flush()

    rc = cli.main(["store-info", "--store", root])
    out = capsys.readouterr().out
    assert rc == 0
    info = json.loads(out.strip())
    assert info["clips"] == 5
    assert info["classes"] == 3
    assert info["feature_dim"] == 16
    assert info["dtype"] == "float16"
    assert info["writers"] >= 2
    assert info["shards"] == 2
    assert info["bytes"] > 0
    assert info["empty_classes"] == 1
    assert info["clips_per_class_min"] == 0
    assert info["clips_per_class_max"] == 3


def test_store_info_refuses_missing_path(tmp_path, capsys):
    import os

    import pytest

    missing = str(tmp_path / "nope")
    with pytest.raises(SystemExit, match="no feature store"):
        cli.main(["store-info", "--store", missing])
    assert not os.path.exists(missing)  # read-only: nothing created
    capsys.readouterr()
