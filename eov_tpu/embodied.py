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

__all__ = ["align_virtual_bank", "normalize_class_name", "union_support"]


def union_support(
    table: FeatureTable,
    class_names: Sequence[str],
    virtual_class_names: Sequence[str] | None = None,
    virtual_table: FeatureTable | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side class-major support set (features, mask) for a whole split.

    The single place that owns the table-level embodied augmentation RULE —
    align the virtual bank to the real class axis, concat along the member
    axis, mask by per-class counts — consumed by `eov classify`
    (eval.eval_step applies the same rule in-jit on its gathered episode
    layout; tests/test_eval_store.py ties the two semantics together).
    Returns features [C, M(+V), D] float32 and mask [C, M(+V)] float32.
    Raises on a backbone/feature-dimension mismatch between the two banks.
    """
    feats = np.asarray(table.features, np.float32)
    counts = np.asarray(table.counts)
    mask = (np.arange(feats.shape[1])[None, :] < counts[:, None]).astype(
        np.float32
    )
    if virtual_table is not None:
        bank = align_virtual_bank(
            class_names, list(virtual_class_names or []), virtual_table
        )
        vf = np.asarray(bank.features, np.float32)
        vc = np.asarray(bank.counts)
        if vf.shape[-1] != feats.shape[-1]:
            raise ValueError(
                f"real ({feats.shape[-1]}-d) and virtual ({vf.shape[-1]}-d) "
                "features come from different backbones; re-extract one side"
            )
        vmask = (np.arange(vf.shape[1])[None, :] < vc[:, None]).astype(
            np.float32
        )
        feats = np.concatenate([feats, vf], axis=1)
        mask = np.concatenate([mask, vmask], axis=1)
    return feats, mask


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
    if not real_class_names:
        # Gathering from a [0, V, D] bank inside jit would clamp-index
        # garbage rather than fail; refuse where the cause is visible.
        raise ValueError(
            "real store has no class names — cannot align a virtual bank "
            "(re-extract with a dataset that carries class names, or pass "
            "a split json)"
        )
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
    if len(missing) == c_real:
        # Per-class degradation (count 0 -> plain one-shot for that way) is
        # the documented rule, but a TOTAL mismatch means an embodied run
        # would silently report plain numbers under the embodied label —
        # that is a configuration error (wrong store, numeric fallback
        # names), not graceful degradation. Raise regardless of strict.
        raise ValueError(
            "no virtual class aligns with ANY real class (real e.g. "
            f"{list(real_class_names)[:3]}, virtual e.g. "
            f"{list(virtual_class_names)[:3]}) — embodied eval would "
            "silently equal plain eval; check both stores carry real "
            "class names"
        )
    if not np.any(out_c):
        # The other route to the same silent outcome: names align but every
        # aligned class contributes 0 virtual clips (an empty/filtered-out
        # virtual extraction). The eval mask would zero every virtual
        # member and the run would report plain numbers under the embodied
        # label.
        raise ValueError(
            "virtual bank aligns by name but contributes 0 clips for every "
            "real class — embodied eval would silently equal plain eval; "
            "the virtual store appears empty for these classes"
        )
    return FeatureTable(jnp.asarray(out_f), jnp.asarray(out_c))
