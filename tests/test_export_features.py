"""tools/export_features: FeatureStore -> reference-era cache layouts.

The inverse migration direction of SURVEY.md §2a C6: features extracted
here must be consumable by reference-lineage analysis scripts (per-video
.npy) and external notebooks (.npz + labels sidecar). The strongest check
is the round trip: export -> import_features reproduces the identical
table the original store evaluates.
"""

import json
import os

import numpy as np
import pytest

from eov_tpu.data.store import FeatureStore
from eov_tpu.tools.export_features import export_store, main
from eov_tpu.tools.import_features import import_cache

CLASSES = ["ApplyLipstick", "HighJump", "PushUps"]


def _make_store(root, class_names=CLASSES, dtype=None):
    store = FeatureStore(str(root), class_names=class_names,
                         process_index=0, dtype=dtype)
    rng = np.random.default_rng(7)
    for ci in range(3):
        for i in range(4):
            store.put(f"v{ci}_{i}", rng.normal(size=(32,)).astype(np.float32),
                      ci)
    store.flush()
    return store


def test_tree_export_roundtrips_through_import(tmp_path):
    _make_store(tmp_path / "store")
    summary = export_store(str(tmp_path / "store"), str(tmp_path / "tree"))
    assert summary == {"clips": 12, "classes": 3, "format": "tree",
                       "out": str(tmp_path / "tree")}
    # Layout is the reference's class tree.
    assert sorted(os.listdir(tmp_path / "tree")) == CLASSES
    assert os.path.exists(tmp_path / "tree" / "HighJump" / "v1_0.npy")
    # Round trip: importing the export reproduces the identical table.
    import_cache(str(tmp_path / "tree"), str(tmp_path / "store2"),
                 class_names=CLASSES)
    a = FeatureStore(str(tmp_path / "store"), process_index=0).load_all()
    b = FeatureStore(str(tmp_path / "store2"), process_index=0).load_all()
    assert a.keys() == b.keys()
    for vid in a:
        np.testing.assert_array_equal(a[vid][0], b[vid][0])
        assert a[vid][1] == b[vid][1]
    # Non-empty output dir refuses.
    with pytest.raises(ValueError, match="not empty"):
        export_store(str(tmp_path / "store"), str(tmp_path / "tree"))


def test_npz_export_carries_labels_sidecar(tmp_path):
    _make_store(tmp_path / "store", dtype="float16")
    out = str(tmp_path / "feats.npz")
    rc = main(["--store", str(tmp_path / "store"), "--out", out,
               "--format", "npz"])
    assert rc == 0
    with np.load(out) as z:
        assert len(z.files) == 12
        assert z["v2_3"].dtype == np.float32  # f16 store exports upcast
    with open(str(tmp_path / "feats.labels.json")) as f:
        labels = json.load(f)
    assert labels["v2_3"] == {"label": 2, "class_name": "PushUps"}


def test_tree_export_refuses_mangled_id_collision(tmp_path):
    # 'a/b' and 'a_b' both mangle to 'a_b.npy' — a silent last-wins write
    # would drop one clip from the "bit-exact" round trip. Refused instead,
    # before anything is written.
    store = FeatureStore(str(tmp_path / "store"), class_names=CLASSES,
                         process_index=0)
    f = np.ones((8,), np.float32)
    store.put("a/b", f, 0)
    store.put("a_b", 2 * f, 0)
    store.flush()
    with pytest.raises(ValueError, match="both map to"):
        export_store(str(tmp_path / "store"), str(tmp_path / "tree"))
    assert not os.path.exists(tmp_path / "tree" / CLASSES[0])
    # Same ids in different classes don't collide (distinct dirs).
    store2 = FeatureStore(str(tmp_path / "s2"), class_names=CLASSES,
                          process_index=0)
    store2.put("a/b", f, 0)
    store2.put("a_b", 2 * f, 1)
    store2.flush()
    summary = export_store(str(tmp_path / "s2"), str(tmp_path / "t2"))
    assert summary["clips"] == 2


def test_nameless_store_exports_numeric_tree(tmp_path):
    _make_store(tmp_path / "store", class_names=None)
    export_store(str(tmp_path / "store"), str(tmp_path / "tree"))
    assert sorted(os.listdir(tmp_path / "tree")) == [
        "class_000", "class_001", "class_002"]
    # Empty store refuses via the CLI error path.
    FeatureStore(str(tmp_path / "empty"), process_index=0)
    rc = main(["--store", str(tmp_path / "empty"),
               "--out", str(tmp_path / "t2")])
    assert rc == 2
