"""Throughput harness as a test (SURVEY.md §4.6): bench must always emit its
one JSON line with a sane schema; the clips/sec floor is asserted on TPU
only (recorded-not-asserted on CPU)."""

import json
import sys

import jax


def _run_capturing(module_main, capsys):
    module_main()
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1, f"bench must print exactly one line, got {out}"
    return json.loads(out[0])


def test_bench_schema_and_floor(monkeypatch, capsys):
    monkeypatch.setenv("EOV_BENCH_BATCH", "1")
    monkeypatch.setenv("EOV_BENCH_ITERS", "1")
    monkeypatch.setenv("EOV_BENCH_WINDOW", "1")
    sys.path.insert(0, ".")
    import bench

    rec = _run_capturing(bench.main, capsys)
    assert rec["metric"] == "resnet50_clip_features_throughput"
    assert rec["unit"] == "clips/sec/chip"
    assert rec["value"] > 0
    assert rec["vs_baseline"] == round(rec["value"] / 1000.0, 4)
    assert rec["detail"]["median_step_s"] > 0
    if jax.default_backend() == "tpu":
        assert rec["value"] >= 1000, "TPU throughput floor (BASELINE.json:5)"


def test_bench_eval_schema(monkeypatch, capsys):
    monkeypatch.setenv("EOV_EVAL_EPISODES_PER_STEP", "8")
    monkeypatch.setenv("EOV_EVAL_ITERS", "1")
    monkeypatch.setenv("EOV_EVAL_WINDOW", "1")
    sys.path.insert(0, ".")
    import bench_eval

    rec = _run_capturing(bench_eval.main, capsys)
    assert rec["metric"] == "oneshot_eval_throughput"
    assert rec["value"] > 0


def test_bench_decode_schema(monkeypatch, capsys):
    monkeypatch.setenv("EOV_DECODE_CLIPS", "4")
    monkeypatch.setenv("EOV_DECODE_K", "3")
    sys.path.insert(0, ".")
    import bench_decode

    rec = _run_capturing(bench_decode.main, capsys)
    assert rec["metric"] == "host_clip_decode_throughput"
    paths = rec["detail"]["paths"]
    assert "python_jpeg" in paths and all(v > 0 for v in paths.values())
