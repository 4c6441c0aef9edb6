"""Config presets (§5 config subsystem) and metrics jsonl sink."""

import json

import pytest

from eov_tpu.config import PRESETS, get_preset, resolved_dict
from eov_tpu.utils.metrics import MetricsWriter, Timer


def test_presets_cover_every_baseline_config():
    # BASELINE.json configs 1-5 (SURVEY.md §6) each have a checked-in preset.
    for name in ("episode_cpu", "ucf101_600", "kinetics_embodied",
                 "tpu_batched", "pod_extract"):
        p = get_preset(name)
        assert p.name == name and p.description


def test_get_preset_unknown_raises():
    with pytest.raises(KeyError, match="unknown preset"):
        get_preset("nope")


def test_resolved_dict_is_jsonable_for_all_presets():
    for p in PRESETS.values():
        blob = json.dumps(
            {"eval": resolved_dict(p.eval), "extract": resolved_dict(p.extract)}
        )
        assert "n_way" in blob and "num_segments" in blob


def test_metrics_writer_roundtrip(tmp_path):
    path = str(tmp_path / "m.jsonl")
    w = MetricsWriter(path)
    w.write("config", a=1)
    w.write("result", acc=0.5)
    w.close()
    lines = [json.loads(l) for l in open(path)]
    assert [l["event"] for l in lines] == ["config", "result"]
    assert lines[1]["acc"] == 0.5
    assert all("time" in l for l in lines)


def test_metrics_writer_none_is_noop():
    w = MetricsWriter(None)
    w.write("x", y=1)  # must not raise
    w.close()


def test_timer_laps_monotonic():
    t = Timer()
    assert t.lap() >= 0.0
    assert t.lap() >= 0.0


def test_every_module_docstring_cites_its_capability():
    """CLAUDE.md convention: every eov_tpu module states which reference
    capability (SURVEY.md row / BASELINE target) it covers."""
    import glob
    import os

    import eov_tpu

    pkg = os.path.dirname(eov_tpu.__file__)
    missing = []
    for f in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        if os.path.basename(f) == "__init__.py":
            continue
        with open(f) as fh:
            head = fh.read(2500)
        if not any(tag in head for tag in
                   ("SURVEY", "Capability parity", "BASELINE", "DESIGN")):
            missing.append(os.path.relpath(f, pkg))
    assert not missing, f"modules missing a capability citation: {missing}"
