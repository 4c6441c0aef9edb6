"""In-process CLI coverage (reference component C13, SURVEY.md §2a).

PARITY.md's C13 row was previously backed only by the verify-skill drive;
these tests make the CLI surface part of the suite: extract -> eval
round-trip on the synthetic smoke preset (including the r3 --store-dtype
flag), plus the presets listing. Subcommands run in-process via
cli.main(argv) — conftest already pins the CPU platform.
"""

import json

import numpy as np
import pytest

from eov_tpu import cli


def _run(capsys, argv):
    rc = cli.main(argv)
    out = capsys.readouterr().out
    assert rc == 0, out
    return out


@pytest.mark.parametrize("store_dtype", ["float32", "float16"])
def test_cli_extract_then_eval_roundtrip(tmp_path, capsys, store_dtype):
    store = str(tmp_path / f"feats_{store_dtype}")
    out = _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "4",
        "--synthetic-clips", "3", "--arch", "resnet18",
        "--store", store, "--store-dtype", store_dtype,
    ])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["extracted"] == 12 and stats["failed"] == 0

    out = _run(capsys, [
        "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--store", store,
    ])
    # Reference-format final line: "... accuracy: XX.XX% ± Y.YY%" — parse
    # the two numbers back out and sanity-check the protocol ran.
    line = [ln for ln in out.strip().splitlines() if "%" in ln][-1]
    acc, ci = (float(tok.rstrip("%")) for tok in
               line.replace("±", " ").split() if tok.rstrip("%")
               .replace(".", "", 1).isdigit())
    assert 0.0 <= acc <= 100.0 and 0.0 <= ci < 50.0


def test_cli_eval_accuracy_identical_across_store_dtypes(
    tmp_path, capsys
):
    """float16 features must not move the reported accuracy (C6 r3 —
    matcher margins ≫ f16 rounding on the synthetic protocol)."""
    lines = {}
    for dt in ("float32", "float16"):
        store = str(tmp_path / dt)
        _run(capsys, [
            "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--dataset", "synthetic", "--synthetic-classes", "4",
            "--synthetic-clips", "3", "--arch", "resnet18",
            "--store", store, "--store-dtype", dt,
        ])
        out = _run(capsys, [
            "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--store", store,
        ])
        lines[dt] = [ln for ln in out.strip().splitlines() if "%" in ln][-1]
    assert lines["float32"] == lines["float16"], lines


def test_cli_presets_lists_baseline_configs(capsys):
    out = _run(capsys, ["presets"])
    for name in ("synthetic_smoke", "kinetics_5shot"):
        assert name in out


def test_cli_train_multichip_single_controller(tmp_path, capsys):
    """`train --multichip` on the in-process 8-device mesh (single
    controller): distributed.initialize is a no-op, the mesh spans the
    virtual devices, the batch rounds to the data axis, and the epoch
    runs pjit DP end to end."""
    out_dir = str(tmp_path / "run")
    out = _run(capsys, [
        "train", "--platform", "cpu", "--dataset", "synthetic",
        "--synthetic-classes", "3", "--synthetic-clips", "4",
        "--arch", "resnet18", "--epochs", "1", "--batch", "8",
        "--num-segments", "2", "--scale-size", "36", "--crop-size", "32",
        "--multichip", "--out", out_dir,
    ])
    assert "epoch 0" in out
    import os

    assert os.path.isdir(os.path.join(out_dir, "step_0"))


def test_cli_embodied_roundtrip_paired_compare(tmp_path, capsys):
    """Full CLI embodied round trip (C9 + the paper's headline delta,
    VERDICT r3 #7): extract a real and a virtual store (virtual uses the
    UnrealAction-style display names, exercising name-normalized bank
    alignment), eval plain and --embodied over the SAME canonical episode
    set, then compare_eval computes the paired delta."""
    real = str(tmp_path / "real")
    virt = str(tmp_path / "virt")
    for store, extra in ((real, []), (virt, ["--synthetic-virtual"])):
        _run(capsys, [
            "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--dataset", "synthetic", "--synthetic-classes", "4",
            "--synthetic-clips", "3", "--arch", "resnet18",
            "--store", store, *extra,
        ])

    plain = str(tmp_path / "plain.json")
    emb = str(tmp_path / "emb.json")
    _run(capsys, [
        "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--store", real, "--per-episode-out", plain,
    ])
    _run(capsys, [
        "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--store", real, "--embodied", "--virtual-store", virt,
        "--per-episode-out", emb,
    ])

    from eov_tpu.tools import compare_eval

    rc = compare_eval.main([emb, plain])
    out = capsys.readouterr().out
    assert rc == 0
    stats = json.loads(out.strip().splitlines()[-1])
    # The paired identity held (same seed/protocol/counts) and the variant
    # axis is what differs.
    assert stats["n_episodes"] > 0
    assert stats["variant_a"]["embodied"] and not stats["variant_b"]["embodied"]
    assert stats["wins"] + stats["losses"] + stats["ties"] == stats["n_episodes"]

    # Missing --virtual-store must refuse up front, not mid-eval.
    with pytest.raises(SystemExit):
        cli.main([
            "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--store", real, "--embodied",
        ])
    capsys.readouterr()


def test_cli_jpeg_scale_denom_accuracy_delta_zero(tmp_path, capsys):
    """DCT-scaled decode as a feed lever (VERDICT r3 #3): features from
    the SAME jpeg shard decoded full vs at 1/2, evaluated on the identical
    canonical episode set — the paired accuracy delta must be zero on the
    synthetic protocol (pixel deltas of the scaled IDCT are far below the
    matcher's margins)."""
    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.runtime.native import native_available
    from eov_tpu.tools.pack_eovc import pack

    if not native_available():
        pytest.skip("native toolchain unavailable")
    ds = SyntheticVideoDataset(
        n_classes=4, clips_per_class=3, height=128, width=160,
        min_frames=8, max_frames=12, seed=3,
    )
    shard = str(tmp_path / "hi.jpeg.eovc")
    pack(ds, shard, storage_short_side=128, codec="jpeg")

    outs = {}
    for denom in (1, 2):
        store = str(tmp_path / f"feats_d{denom}")
        _run(capsys, [
            "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--dataset", "eovc", "--root", shard, "--arch", "resnet18",
            "--jpeg-scale-denom", str(denom), "--store", store,
        ])
        per = str(tmp_path / f"per_d{denom}.json")
        _run(capsys, [
            "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--store", store, "--per-episode-out", per,
        ])
        outs[denom] = per

    from eov_tpu.tools import compare_eval

    rc = compare_eval.main([outs[2], outs[1]])
    out = capsys.readouterr().out
    assert rc == 0
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["mean_diff"] == 0.0, stats
    assert stats["ties"] == stats["n_episodes"], stats


def test_cli_extract_quant_int8(tmp_path, capsys):
    """--quant int8 plumbs through to ExtractConfig (r5): the extraction
    completes (calibration on synthetic fixtures, int8 conv walk) and the
    resulting store evals; --multichip + --quant runs the SAME quantized
    program through the sharded featurizer (pod-scale int8 extraction) and
    produces matching features with matching provenance. Feature parity
    bounds live in tests/test_quant_infer.py."""
    store = str(tmp_path / "q8")
    out = _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["extracted"] == 6 and stats["failed"] == 0

    mc_store = str(tmp_path / "q8mc")
    out = _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--arch", "resnet18",
        "--store", mc_store, "--quant", "int8", "--multichip",
    ])
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["extracted"] == 6 and stats["failed"] == 0

    from eov_tpu.data.store import FeatureStore

    single, multi = FeatureStore(store), FeatureStore(mc_store)
    assert multi.recorded_quant() == ("int8", True)
    assert multi.quant_calib() == single.quant_calib()
    sf, mf = single.load_all(), multi.load_all()
    assert set(sf) == set(mf)
    import numpy as np

    for vid in sf:
        np.testing.assert_allclose(
            mf[vid][0], sf[vid][0], rtol=2e-4, atol=2e-5
        )


def test_cli_quant_provenance_guard(tmp_path, capsys):
    """r5 precision provenance: extract records the store's quant in the
    manifest; classify refuses a recorded mismatch with the fix named and
    accepts the matching flag; appending the other precision into the same
    store refuses; store-info reports the field."""
    store = str(tmp_path / "q8")
    _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    out = _run(capsys, ["store-info", "--store", store])
    assert json.loads(out.strip())["quant"] == "int8"

    # Default (bf16) query featurization against the int8 store: refuse.
    with pytest.raises(SystemExit, match="--quant int8"):
        cli.main([
            "classify", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--dataset", "synthetic", "--synthetic-classes", "3",
            "--synthetic-clips", "1", "--arch", "resnet18",
            "--store", store,
        ])
    capsys.readouterr()

    # Matching precision runs to completion (same synthetic geometry).
    out = _run(capsys, [
        "classify", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "1", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    assert "pred_class" in out

    # Appending bf16 features into the int8 store refuses at store open.
    with pytest.raises(SystemExit, match="one extraction precision"):
        cli.main([
            "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--dataset", "synthetic", "--synthetic-classes", "3",
            "--synthetic-clips", "2", "--arch", "resnet18",
            "--store", store,
        ])
    capsys.readouterr()


def test_cli_quant_provenance_unknown_store_warns(tmp_path, capsys):
    """A store without recorded provenance (pre-r5 / imported) must stay
    usable: classify --quant int8 against it WARNS instead of refusing."""
    import os

    store = str(tmp_path / "legacy")
    _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--arch", "resnet18",
        "--store", store,
    ])
    # Strip the provenance field to simulate a pre-r5 manifest.
    mpath = os.path.join(store, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    del m["quant"]
    with open(mpath, "w") as f:
        json.dump(m, f)

    rc = cli.main([
        "classify", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "1", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    captured = capsys.readouterr()
    assert rc == 0
    assert "records no extraction precision" in captured.err


def test_cli_quant_store_without_scales_warns(tmp_path, capsys):
    """An int8-provenance store with NO recorded calibration scales (an
    imported cache, or a pre-scales r5 store) still classifies, but the
    local synthetic recalibration is unverifiable against the store's
    producer — classify must say so instead of silently vouching."""
    import os

    store = str(tmp_path / "imported_int8")
    _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    mpath = os.path.join(store, "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    assert m.pop("quant_calib", None)  # extract recorded scales; strip them
    with open(mpath, "w") as f:
        json.dump(m, f)

    info = _run(capsys, ["store-info", "--store", store])
    assert json.loads(info.strip())["quant_calib"] is False

    rc = cli.main([
        "classify", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "1", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    captured = capsys.readouterr()
    assert rc == 0
    assert "records no calibration scales" in captured.err


def test_cli_embodied_eval_quant_mismatch_refuses(tmp_path, capsys):
    """Embodied eval fuses real+virtual banks in one similarity space; a
    recorded precision mismatch between the two stores refuses."""
    kw = ["--platform", "cpu", "--preset", "synthetic_smoke",
          "--dataset", "synthetic", "--synthetic-classes", "3",
          "--synthetic-clips", "2", "--arch", "resnet18"]
    real, virt = str(tmp_path / "real"), str(tmp_path / "virt")
    _run(capsys, ["extract", *kw, "--store", real])
    _run(capsys, ["extract", *kw, "--store", virt, "--quant", "int8"])
    with pytest.raises(SystemExit, match="mixes precisions"):
        cli.main([
            "eval", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--store", real, "--embodied", "--virtual-store", virt,
            "--n-episodes", "8",
        ])
    capsys.readouterr()


def test_cli_quant_calib_dataset_records_scales(tmp_path, capsys):
    """--quant-calib dataset calibrates on the extraction clips, records
    the scales in the manifest, and classify --quant int8 reuses them
    (r5 review: the store's quantized program is reproducible provenance,
    not a per-run recalibration)."""
    import os

    store = str(tmp_path / "q8ds")
    _run(capsys, [
        "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "2", "--arch", "resnet18",
        "--store", store, "--quant", "int8", "--quant-calib", "dataset",
    ])
    with open(os.path.join(store, "manifest.json")) as f:
        m = json.load(f)
    assert m["quant"] == "int8"
    assert m["quant_calib"] and all(
        isinstance(v, float) for v in m["quant_calib"].values()
    )
    out = _run(capsys, [
        "classify", "--platform", "cpu", "--preset", "synthetic_smoke",
        "--dataset", "synthetic", "--synthetic-classes", "3",
        "--synthetic-clips", "1", "--arch", "resnet18",
        "--store", store, "--quant", "int8",
    ])
    assert "pred_class" in out

    with pytest.raises(SystemExit, match="only applies with --quant"):
        cli.main([
            "extract", "--platform", "cpu", "--preset", "synthetic_smoke",
            "--dataset", "synthetic", "--synthetic-classes", "3",
            "--synthetic-clips", "2", "--arch", "resnet18",
            "--store", str(tmp_path / "x"), "--quant-calib", "dataset",
        ])
    capsys.readouterr()
