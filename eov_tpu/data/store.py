"""Feature store: sharded on-disk clip-feature cache with a JSON manifest.

Capability parity: reference component C6's cache half (SURVEY.md §2a) —
the reference saves per-video ``.npy`` features and reloads them for eval.

This store doubles as the *resumable work manifest* from SURVEY.md §5
(failure detection / recovery): every flushed shard updates ``manifest.json``
atomically, so a crashed or preempted pod extraction job restarts and skips
completed clips (``done_ids``). Features land in ``.npz`` shards (one array
per clip) rather than one file per video — millions of tiny files is the
failure mode the reference's layout hits at Kinetics scale.

`to_table` materializes the padded class-major [C, M, D] FeatureTable the
batched eval path consumes (eval.py); padding keeps shapes static for jit.
"""

from __future__ import annotations

import json
import os
import tempfile
from typing import Iterable, Mapping, Sequence

import jax.numpy as jnp
import numpy as np

from eov_tpu.eval import FeatureTable

__all__ = ["FeatureStore"]

_MANIFEST = "manifest.json"


class FeatureStore:
    """Append-oriented feature cache rooted at a directory.

    Layout:
        root/manifest.json            {"class_names": [...], "videos":
                                       {vid: {"label": int, "shard": str}}}
        root/shard_00000.npz          {vid: feature[D] float32, ...}
    """

    def __init__(self, root: str, class_names: Sequence[str] | None = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._manifest_path = os.path.join(root, _MANIFEST)
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)
            if class_names is not None and list(class_names) != self._manifest.get(
                "class_names"
            ):
                raise ValueError("class_names mismatch with existing store")
        else:
            self._manifest = {
                "class_names": list(class_names) if class_names else [],
                "videos": {},
            }
        self._pending: dict[str, tuple[np.ndarray, int]] = {}

    # ---- write path -------------------------------------------------------

    def put(self, video_id: str, feature: np.ndarray, label: int) -> None:
        """Stage one clip feature; durable after flush()."""
        self._pending[video_id] = (np.asarray(feature, np.float32), int(label))

    def flush(self) -> str | None:
        """Write pending features as a new shard + atomically update manifest."""
        if not self._pending:
            return None
        shard_idx = len(
            [k for k in os.listdir(self.root) if k.startswith("shard_")]
        )
        shard_name = f"shard_{shard_idx:05d}.npz"
        shard_path = os.path.join(self.root, shard_name)
        np.savez(shard_path, **{k: v[0] for k, v in self._pending.items()})
        for vid, (_, label) in self._pending.items():
            self._manifest["videos"][vid] = {"label": label, "shard": shard_name}
        self._write_manifest()
        self._pending.clear()
        return shard_name

    def _write_manifest(self) -> None:
        # Atomic replace: a crash mid-write never corrupts the manifest.
        fd, tmp = tempfile.mkstemp(dir=self.root, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(self._manifest, f)
        os.replace(tmp, self._manifest_path)

    # ---- read path --------------------------------------------------------

    @property
    def class_names(self) -> list[str]:
        return self._manifest["class_names"]

    def done_ids(self) -> set[str]:
        """Clip ids already durably extracted (resume support, SURVEY.md §5)."""
        return set(self._manifest["videos"].keys())

    def load_all(self) -> dict[str, tuple[np.ndarray, int]]:
        """vid -> (feature, label) for every durable clip."""
        by_shard: dict[str, list[str]] = {}
        for vid, meta in self._manifest["videos"].items():
            by_shard.setdefault(meta["shard"], []).append(vid)
        out: dict[str, tuple[np.ndarray, int]] = {}
        for shard, vids in by_shard.items():
            with np.load(os.path.join(self.root, shard)) as z:
                for vid in vids:
                    out[vid] = (
                        z[vid],
                        int(self._manifest["videos"][vid]["label"]),
                    )
        return out

    def to_table(self, n_classes: int | None = None) -> FeatureTable:
        """Padded class-major [C, M, D] FeatureTable + [C] counts for eval."""
        data = self.load_all()
        if not data:
            raise ValueError(f"empty feature store: {self.root}")
        labels = [label for _, label in data.values()]
        c = n_classes or (max(labels) + 1)
        per_class: list[list[np.ndarray]] = [[] for _ in range(c)]
        # Sort ids for a deterministic slot order regardless of shard order.
        for vid in sorted(data.keys()):
            feat, label = data[vid]
            per_class[label].append(feat)
        d = next(iter(data.values()))[0].shape[-1]
        m = max(1, max(len(p) for p in per_class))
        feats = np.zeros((c, m, d), np.float32)
        counts = np.zeros((c,), np.int32)
        for ci, plist in enumerate(per_class):
            for mi, f in enumerate(plist):
                feats[ci, mi] = f
            counts[ci] = len(plist)
        return FeatureTable(jnp.asarray(feats), jnp.asarray(counts))
