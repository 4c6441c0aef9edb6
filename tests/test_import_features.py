"""tools/import_features: reference-era feature caches -> FeatureStore.

Covers SURVEY.md §2a C6's migration side: the reference saves per-video
.npy features or one pickled dict [CANON]; a switching user must be able to
run `eov eval` on that cache without re-extracting. Each canonical layout
round-trips into a store whose table evaluates, and every ambiguity path
refuses with a named fix instead of importing wrong labels.
"""

import os
import pickle

import numpy as np
import pytest

from eov_tpu.data.store import FeatureStore
from eov_tpu.eval import EvalConfig, evaluate
from eov_tpu.tools.import_features import import_cache, main

CLASSES = ["ApplyLipstick", "HighJump", "PushUps"]


def _feat(ci, i, d=16):
    rng = np.random.default_rng(100 * ci + i)
    f = rng.normal(size=(d,)).astype(np.float32)
    f[ci] += 12.0  # classes separable so eval accuracy is meaningful
    return f


def _write_class_tree(root):
    for ci, c in enumerate(CLASSES):
        os.makedirs(os.path.join(root, c))
        for i in range(4):
            np.save(os.path.join(root, c, f"v{ci}{i:02d}.npy"), _feat(ci, i))


def test_class_tree_import_and_eval(tmp_path):
    src = tmp_path / "cache"
    _write_class_tree(str(src))
    summary = import_cache(str(src), str(tmp_path / "store"))
    assert summary["clips"] == 12 and summary["classes"] == 3
    store = FeatureStore(str(tmp_path / "store"), process_index=0)
    assert store.class_names == CLASSES  # sorted dir order == sorted names
    res = evaluate(store.to_table(),
                   EvalConfig(n_way=3, n_episodes=32, episodes_per_step=8))
    assert res.mean_acc > 0.9  # separable features classify


def test_class_tree_respects_explicit_class_order(tmp_path):
    src = tmp_path / "cache"
    _write_class_tree(str(src))
    order = ["PushUps", "ApplyLipstick", "HighJump"]
    import_cache(str(src), str(tmp_path / "store"), class_names=order)
    store = FeatureStore(str(tmp_path / "store"), process_index=0)
    assert store.class_names == order
    data = store.load_all()
    # v000 lives under ApplyLipstick -> label 1 in the explicit order.
    assert data["v000"][1] == 1
    with pytest.raises(ValueError, match="missing cache classes"):
        import_cache(str(src), str(tmp_path / "s2"),
                     class_names=["PushUps", "HighJump"])


def test_flat_dir_needs_split_and_maps_labels(tmp_path):
    src = tmp_path / "flat"
    os.makedirs(src)
    for ci in range(3):
        for i in range(2):
            np.save(str(src / f"vid_{ci}_{i}.npy"), _feat(ci, i))
    with pytest.raises(ValueError, match="--split"):
        import_cache(str(src), str(tmp_path / "s0"))
    split = tmp_path / "list.txt"
    split.write_text("".join(
        f"some/dir/vid_{ci}_{i} 30 {ci}\n" for ci in range(3) for i in range(2)
    ))
    summary = import_cache(str(src), str(tmp_path / "store"),
                           split=str(split))
    assert summary["clips"] == 6 and summary["clips_per_class_min"] == 2
    data = FeatureStore(str(tmp_path / "store"), process_index=0).load_all()
    assert data["vid_2_1"][1] == 2
    # An id absent from the split refuses (never silently dropped/guessed).
    np.save(str(src / "stray.npy"), _feat(0, 9))
    with pytest.raises(ValueError, match="not in the split"):
        import_cache(str(src), str(tmp_path / "s1"), split=str(split))


def test_dict_caches_both_keyings(tmp_path):
    # Class-keyed npz: {class: [N, D]} needs no split.
    by_class = {c: np.stack([_feat(ci, i) for i in range(3)])
                for ci, c in enumerate(CLASSES)}
    npz = tmp_path / "byclass.npz"
    np.savez(str(npz), **by_class)
    summary = import_cache(str(npz), str(tmp_path / "sc"))
    assert summary["clips"] == 9 and summary["classes"] == 3

    # Vid-keyed pickle needs --allow-pickle AND a split.
    by_vid = {f"v{ci}_{i}": _feat(ci, i)
              for ci in range(3) for i in range(2)}
    pkl = tmp_path / "byvid.pkl"
    with open(pkl, "wb") as f:
        pickle.dump(by_vid, f)
    with pytest.raises(ValueError, match="allow-pickle"):
        import_cache(str(pkl), str(tmp_path / "sv0"), split="x")
    split = tmp_path / "list.txt"
    split.write_text("".join(
        f"v{ci}_{i} 30 {ci}\n" for ci in range(3) for i in range(2)))
    summary = import_cache(str(pkl), str(tmp_path / "sv"),
                           split=str(split), allow_pickle=True)
    assert summary["clips"] == 6
    # With --split, 2-D values are NOT misread as class-keyed: they refuse
    # as non-1-D per-video features (mean-pool first), not import K clips.
    with open(pkl, "wb") as f:
        pickle.dump({"v0_0": np.stack([_feat(0, 0), _feat(0, 1)])}, f)
    split.write_text("v0_0 30 0\n")
    with pytest.raises(ValueError, match="1-D"):
        import_cache(str(pkl), str(tmp_path / "sv2"),
                     split=str(split), allow_pickle=True)


def test_torch_pt_caches_both_keyings_and_trust_gate(tmp_path):
    torch = pytest.importorskip("torch")
    # Vid-keyed tensor dict loads via torch's restricted unpickler
    # (weights_only=True) — no trust flag needed. Split lines carry the
    # lineage's real '.avi' paths, which must normalize to the cache ids.
    by_vid = {f"v{ci}_{i}": torch.from_numpy(_feat(ci, i))
              for ci in range(3) for i in range(2)}
    pt = tmp_path / "byvid.pt"
    torch.save(by_vid, str(pt))
    split = tmp_path / "list.txt"
    split.write_text("".join(
        f"Class{ci}/v{ci}_{i}.avi 30 {ci}\n"
        for ci in range(3) for i in range(2)))
    summary = import_cache(str(pt), str(tmp_path / "sv"), split=str(split))
    assert summary["clips"] == 6
    data = FeatureStore(str(tmp_path / "sv"), process_index=0).load_all()
    np.testing.assert_allclose(data["v2_1"][0], _feat(2, 1), rtol=1e-6)
    assert data["v2_1"][1] == 2

    # Class-keyed .pth of [N, D] tensors needs no split.
    by_class = {
        c: torch.from_numpy(np.stack([_feat(ci, i) for i in range(3)]))
        for ci, c in enumerate(CLASSES)}
    pth = tmp_path / "byclass.pth"
    torch.save(by_class, str(pth))
    summary = import_cache(str(pth), str(tmp_path / "sc"))
    assert summary["clips"] == 9 and summary["classes"] == 3

    # A payload the restricted unpickler rejects (numpy values) is gated
    # behind --allow-pickle, then imports identically.
    np_vid = {f"v{ci}_{i}": _feat(ci, i) for ci in range(3) for i in range(2)}
    ptn = tmp_path / "np.pt"
    torch.save(np_vid, str(ptn))
    with pytest.raises(ValueError, match="allow-pickle"):
        import_cache(str(ptn), str(tmp_path / "sn0"), split=str(split))
    summary = import_cache(str(ptn), str(tmp_path / "sn"), split=str(split),
                           allow_pickle=True)
    assert summary["clips"] == 6


def test_split_media_extensions_match_flat_npy_ids(tmp_path):
    # Real TSN split lists reference source videos ('Class/v_x.avi'); the
    # flat cache holds 'v_x.npy'. Both normalize to the same id.
    src = tmp_path / "flat"
    os.makedirs(src)
    for ci in range(2):
        np.save(str(src / f"v_{ci}.npy"), _feat(ci, 0))
    split = tmp_path / "list.txt"
    split.write_text("A/v_0.avi 30 0\nB/v_1.mp4 30 1\n")
    summary = import_cache(str(src), str(tmp_path / "s"), split=str(split))
    assert summary["clips"] == 2
    data = FeatureStore(str(tmp_path / "s"), process_index=0).load_all()
    assert data["v_1"][1] == 1


def test_duplicate_video_ids_refuse(tmp_path):
    # Same basename under two class dirs: last-wins would silently import
    # one clip with the other's label.
    src = tmp_path / "cache"
    _write_class_tree(str(src))
    np.save(str(src / CLASSES[1] / "v000.npy"), _feat(1, 0))
    with pytest.raises(ValueError, match="more than once"):
        import_cache(str(src), str(tmp_path / "s0"))


def test_validation_failure_leaves_no_partial_store(tmp_path):
    # All features validate BEFORE the store is created: a bad clip past
    # the first flush must not leave a partial, valid-looking store that a
    # retry then refuses on.
    src = tmp_path / "cache"
    _write_class_tree(str(src))
    np.save(str(src / CLASSES[2] / "zz_last.npy"), np.ones((8,), np.float32))
    with pytest.raises(ValueError, match="dim mismatch"):
        import_cache(str(src), str(tmp_path / "s0"))
    assert not os.path.exists(str(tmp_path / "s0" / "manifest.json"))
    os.remove(str(src / CLASSES[2] / "zz_last.npy"))
    assert import_cache(str(src), str(tmp_path / "s0"))["clips"] == 12


def test_refusals_dim_mismatch_existing_store_mixed_layout(tmp_path):
    src = tmp_path / "cache"
    _write_class_tree(str(src))
    np.save(str(src / CLASSES[0] / "odd.npy"),
            np.ones((8,), np.float32))  # 8-d vs 16-d
    with pytest.raises(ValueError, match="dim mismatch"):
        import_cache(str(src), str(tmp_path / "s0"))
    os.remove(str(src / CLASSES[0] / "odd.npy"))
    # Mixed tree + flat layout refuses.
    np.save(str(src / "top.npy"), _feat(0, 0))
    with pytest.raises(ValueError, match="mixes"):
        import_cache(str(src), str(tmp_path / "s1"))
    os.remove(str(src / "top.npy"))
    # Existing store refuses (no silent provenance mixing).
    import_cache(str(src), str(tmp_path / "store"))
    with pytest.raises(ValueError, match="already exists"):
        import_cache(str(src), str(tmp_path / "store"))


def test_cli_main_and_f16_roundtrip(tmp_path, capsys):
    src = tmp_path / "cache"
    _write_class_tree(str(src))
    rc = main(["--src", str(src), "--store", str(tmp_path / "store"),
               "--store-dtype", "float16"])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"clips": 12' in out and '"dtype": "float16"' in out
    # Imported f16 store reads back as f32 and matches the source features.
    data = FeatureStore(str(tmp_path / "store"), process_index=0).load_all()
    np.testing.assert_allclose(
        data["v000"][0], _feat(0, 0), rtol=2e-3, atol=2e-3)
    rc = main(["--src", str(tmp_path / "nothere"),
               "--store", str(tmp_path / "s2")])
    assert rc == 2  # clean error path, no traceback


def test_dict_keys_with_media_extensions_match_split(tmp_path):
    """A dict cache keyed by source FILENAMES ('Class/v_x.avi') must match
    the same split list a flat dir would (r5 review fix: keys are
    normalized through _basename_id exactly like split-line ids — before,
    every such key failed the split match)."""
    by_vid = {f"Cls{ci}/v_{ci}_{i}.avi": _feat(ci, i)
              for ci in range(2) for i in range(2)}
    npz = tmp_path / "byvid.npz"
    np.savez(str(npz), **by_vid)
    split = tmp_path / "list.txt"
    split.write_text("".join(
        f"Cls{ci}/v_{ci}_{i}.avi 30 {ci}\n"
        for ci in range(2) for i in range(2)))
    summary = import_cache(str(npz), str(tmp_path / "s"), split=str(split))
    assert summary["clips"] == 4 and summary["classes"] == 2
    data = FeatureStore(str(tmp_path / "s"), process_index=0).load_all()
    assert data["v_1_0"][1] == 1
    # Normalization cannot silently merge: two keys stripping to one id
    # hit the duplicate refusal, not last-wins.
    np.savez(str(tmp_path / "dup.npz"),
             **{"A/v_0.avi": _feat(0, 0), "B/v_0.mp4": _feat(1, 0)})
    split.write_text("A/v_0.avi 30 0\nB/v_0.mp4 30 0\n")
    with pytest.raises(ValueError, match="more than once"):
        import_cache(str(tmp_path / "dup.npz"), str(tmp_path / "s2"),
                     split=str(split))


def test_import_quant_provenance_declaration(tmp_path):
    # r5: --quant declares the cache's KNOWN extraction precision so the
    # imported store carries provenance; the default makes no claim and
    # the store stays provenance-unknown (downstream warns, not vouches).
    src = tmp_path / "cache"
    _write_class_tree(str(src))

    summary = import_cache(str(src), str(tmp_path / "plain"))
    assert summary["quant"] == "unknown"
    store = FeatureStore(str(tmp_path / "plain"), process_index=0)
    assert store.recorded_quant() == (None, False)

    summary = import_cache(str(src), str(tmp_path / "q8"), quant="int8")
    assert summary["quant"] == "int8"
    store = FeatureStore(str(tmp_path / "q8"), process_index=0)
    assert store.recorded_quant() == ("int8", True)

    # "off" is a positive claim too: the float forward, recorded as such.
    summary = import_cache(str(src), str(tmp_path / "f32"), quant="off")
    assert summary["quant"] == "off"
    store = FeatureStore(str(tmp_path / "f32"), process_index=0)
    assert store.recorded_quant() == (None, True)

    # CLI flag drives the same path.
    rc = main(["--src", str(src), "--store", str(tmp_path / "cli_q8"),
               "--quant", "int8"])
    assert rc == 0
    store = FeatureStore(str(tmp_path / "cli_q8"), process_index=0)
    assert store.recorded_quant() == ("int8", True)
