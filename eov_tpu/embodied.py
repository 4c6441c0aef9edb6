"""Embodied support augmentation — UnrealAction virtual feature banks.

Capability parity: reference component C9 (SURVEY.md §2a), the paper's
contribution: clips of a virtual embodied agent performing the same action
classes (UnrealAction, rendered in UnrealCV) are added to each episode's
support set, so a 1-shot class is represented by its one real clip plus a
handful of virtual clips. Exact fusion is OPEN-1; both candidate rules
('max' union-support and 'mean' prototype) live in ops/similarity.py and
are selected via EvalConfig.fusion.

This module is the data plumbing: align a virtual feature store's classes
with a real split's classes (by class *name*, since ids differ between
datasets) and produce the padded [C, V, D] bank consumed by eval.eval_step.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from eov_tpu.eval import FeatureTable

__all__ = ["align_virtual_bank", "normalize_class_name"]


def normalize_class_name(name: str) -> str:
    """Canonical class-name form for cross-dataset alignment.

    UnrealAction / Kinetics / UCF101 name styles differ ('HighJump',
    'high jump', 'high_jump'); comparison is case-insensitive with
    separators stripped.
    """
    return "".join(ch for ch in name.lower() if ch.isalnum())


def align_virtual_bank(
    real_class_names: Sequence[str],
    virtual_class_names: Sequence[str],
    virtual_table: FeatureTable,
    *,
    strict: bool = False,
) -> FeatureTable:
    """Reindex a virtual feature table onto the real split's class axis.

    Returns a FeatureTable with features [C_real, V, D] and counts [C_real];
    real classes without a virtual counterpart get count 0 (the eval mask
    then excludes them, degrading gracefully to plain one-shot for those
    ways — the reference behaves the same when a class has no virtual clips
    [PAPER]).
    """
    vmap_by_name: Mapping[str, int] = {
        normalize_class_name(n): i for i, n in enumerate(virtual_class_names)
    }
    vf = np.asarray(virtual_table.features)
    vc = np.asarray(virtual_table.counts)
    c_real = len(real_class_names)
    v, d = vf.shape[1], vf.shape[2]

    out_f = np.zeros((c_real, v, d), vf.dtype)
    out_c = np.zeros((c_real,), np.int32)
    missing = []
    for i, name in enumerate(real_class_names):
        j = vmap_by_name.get(normalize_class_name(name))
        if j is None:
            missing.append(name)
            continue
        out_f[i] = vf[j]
        out_c[i] = vc[j]
    if missing and strict:
        raise KeyError(f"no virtual clips for classes: {missing}")
    return FeatureTable(jnp.asarray(out_f), jnp.asarray(out_c))
