"""Regression-lock the central parity claim (VERDICT r1 weak #7).

The turnkey two-pipeline harness (tools/parity_harness.py, SURVEY.md §4.1 /
OPEN-6) self-checks with shared random weights: PIL+torch-CPU reference
semantics vs the fused eov_tpu program must agree per-feature and produce a
zero episode-accuracy delta. This locks that in the suite so pipeline or
porting regressions can't silently break the ±0.5% packaging
(BASELINE.json:5 — the real-weights run stays environment-blocked, TODO #1).
"""

import argparse

from eov_tpu.tools import parity_harness as ph


def test_parity_harness_self_check_small():
    args = argparse.Namespace(
        params=None, root=None, split=None,
        classes=4, clips_per_class=2, num_segments=2,
        scale=128, crop=112, dtype="float32", n_episodes=50, seed=0,
    )
    report = ph.run(args)
    assert report["mode"] == "self_check_random_weights"
    assert report["clips"] == 8
    # Per-clip feature agreement between the two pipelines.
    assert report["feature_cosine_min"] > 0.999
    # Identical seeded episodes over both tables: zero accuracy delta.
    assert report["within_budget"]
    assert report["acc_delta_abs"] <= 0.005


def test_parity_harness_quant_mode():
    """--quant int8 routes pipeline B through the deployment int8 path and
    reports against the SAME torch reference (the turnkey packaging of the
    int8 accuracy claim — r5). Quantization is lossy, so the rails are the
    quant ones (tests/test_quant_infer.py), not the float zero-delta."""
    args = argparse.Namespace(
        params=None, root=None, split=None,
        classes=4, clips_per_class=2, num_segments=2,
        scale=128, crop=112, dtype="float32", n_episodes=50, seed=0,
        quant="int8",
    )
    report = ph.run(args)
    assert report["quant"] == "int8"
    assert report["feature_cosine_min"] > 0.99
    assert report["acc_delta_abs"] <= 0.02
