"""Feature store: sharded on-disk clip-feature cache with a JSON manifest.

Capability parity: reference component C6's cache half (SURVEY.md §2a) —
the reference saves per-video ``.npy`` features and reloads them for eval.

This store doubles as the *resumable work manifest* from SURVEY.md §5
(failure detection / recovery): every flushed shard updates the writer's
manifest atomically, so a crashed or preempted pod extraction job restarts
and skips completed clips (``done_ids``). Features land in ``.npz`` shards
(one array per clip) rather than one file per video — millions of tiny
files is the failure mode the reference's layout hits at Kinetics scale.

Multi-writer semantics (SURVEY.md §2c comm row / VERDICT r1): one store
root is shared by every host of a pod job. Each writer (jax process) owns a
private namespace — shards named ``shard_pNNN_*.npz`` and a private
manifest (``manifest.json`` for process 0, ``manifest.pN.json`` for the
rest) — so concurrent hosts never write the same file. Reads merge every
manifest in the root, so any host (or a later single-process eval job) sees
the union of all writers' clips.

`to_table` materializes the padded class-major [C, M, D] FeatureTable the
batched eval path consumes (eval.py); padding keeps shapes static for jit.
"""

from __future__ import annotations

import glob
import json
import os
import tempfile
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from eov_tpu.eval import FeatureTable

__all__ = ["FeatureStore", "MemoryFeatureStore"]

_MANIFEST = "manifest.json"


class FeatureStore:
    """Append-oriented feature cache rooted at a directory.

    Layout:
        root/manifest.json            process-0 manifest {"class_names":
                                      [...], "videos": {vid: {"label": int,
                                      "shard": str}}}
        root/manifest.pN.json         manifest of writer process N > 0
        root/shard_p000_00000.npz     {vid: feature[D] float32, ...}

    ``process_index`` names this writer; it defaults to
    ``jax.process_index()`` under an initialized multi-controller runtime
    and 0 otherwise, so single-process layouts are unchanged (r1 stores,
    which used ``shard_00000.npz`` names recorded in the manifest, still
    read back fine).

    ``dtype`` is the on-disk feature dtype: ``float32`` (default — the
    reference's cache precision) or ``float16`` (halves shard bytes and
    pod store IO; readers always upcast to f32, and at the matcher's
    scale — L2-normalized 2048-d features, similarity margins ≫ 1e-3 —
    the ≤2^-11 relative rounding is far inside the 0.5% accuracy budget,
    asserted by ``tests/test_eval_store.py``). ``None`` inherits the
    store's existing dtype (or float32 for a fresh store); an explicit
    dtype that contradicts an existing store raises.

    ``quant`` is extraction-precision PROVENANCE (r5): a writer that knows
    how its features were computed declares it (``None`` = the bf16/f32
    production forward, ``"int8"`` = `extract --quant int8`), the manifest
    records it, and a later declaration that contradicts the store raises —
    mixing precisions in one store is exactly the silent accuracy skew the
    classify surface refuses (cli.cmd_classify). Omit the argument
    (read-only opens, importers of foreign caches) and the store stays
    agnostic: ``recorded_quant()`` then reports unknown for pre-r5 and
    imported stores, which downstream surfaces treat as warn-not-refuse.
    """

    _DTYPES = ("float32", "float16")
    _QUANT_UNSET = object()  # "caller made no provenance claim" sentinel

    def __init__(self, root: str, class_names: Sequence[str] | None = None,
                 process_index: int | None = None,
                 dtype: str | None = None,
                 quant: str | None | object = _QUANT_UNSET):
        self.root = root
        os.makedirs(root, exist_ok=True)
        if process_index is None:
            import jax

            process_index = jax.process_index()
        self.process_index = int(process_index)
        if dtype is not None and str(dtype) not in self._DTYPES:
            raise ValueError(
                f"store dtype must be one of {self._DTYPES}, got {dtype!r}"
            )
        self._manifest_path = os.path.join(root, self._manifest_name())
        if os.path.exists(self._manifest_path):
            with open(self._manifest_path) as f:
                self._manifest = json.load(f)
        else:
            self._manifest = {
                "class_names": list(class_names) if class_names else [],
                "videos": {},
            }
        if class_names is not None:
            existing = self._merged_class_names()
            if existing and list(class_names) != existing:
                raise ValueError("class_names mismatch with existing store")
            self._manifest["class_names"] = list(class_names)
        prior = self._merged_dtype()
        if dtype is not None and prior is not None and str(dtype) != prior:
            raise ValueError(
                f"store at {root} holds {prior} features; refusing to "
                f"append {dtype} (one dtype per store)"
            )
        self.dtype = np.dtype(str(dtype) if dtype else (prior or "float32"))
        self._manifest["dtype"] = self.dtype.name
        prior_q, prior_known = self._merged_quant()
        if quant is not self._QUANT_UNSET:
            qv = None if quant in (None, "off") else str(quant)
            if prior_known and prior_q != qv:
                raise ValueError(
                    f"store at {root} holds features extracted with "
                    f"quant={prior_q or 'off'}; refusing to append "
                    f"quant={qv or 'off'} features (one extraction "
                    "precision per store — re-extract into a fresh --store)"
                )
            if not prior_known and self._merged_videos():
                # Stamping a precision onto clips of UNKNOWN provenance
                # would silently relabel them: recorded_quant() would then
                # vouch for features this writer never produced, and the
                # classify guard would start refusing the correct precision
                # for the pre-existing clips. The store stays UNKNOWN
                # (classify keeps warning instead of vouching) — resume of
                # pre-provenance stores still works, provenance only ever
                # describes stores born with it.
                import logging

                logging.getLogger("eov.store").warning(
                    "store %s already holds %d clips of unknown extraction "
                    "precision; the quant=%s declaration is NOT recorded "
                    "(provenance cannot vouch retroactively) — extract "
                    "into a fresh --store to get a provenance-checked one",
                    root, len(self._merged_videos()), qv or "off",
                )
            else:
                self._manifest["quant"] = qv
        elif prior_known:
            # Inherit the store's declared provenance into this writer's
            # manifest so multi-writer reads agree without every writer
            # re-declaring.
            self._manifest["quant"] = prior_q
        self._pending: dict[str, tuple[np.ndarray, int]] = {}
        self._shard_count = len(
            glob.glob(os.path.join(root, f"shard_p{self.process_index:03d}_*"))
        )

    def _manifest_name(self, pi: int | None = None) -> str:
        pi = self.process_index if pi is None else pi
        return _MANIFEST if pi == 0 else f"manifest.p{pi}.json"

    # ---- write path -------------------------------------------------------

    def put(self, video_id: str, feature: np.ndarray, label: int) -> None:
        """Stage one clip feature; durable after flush()."""
        self._pending[video_id] = (np.asarray(feature, self.dtype), int(label))

    def flush(self) -> str | None:
        """Write pending features as a new shard + atomically update the
        writer's own manifest (other writers' manifests are never touched)."""
        if not self._pending:
            return None
        shard_name = (
            f"shard_p{self.process_index:03d}_{self._shard_count:05d}.npz"
        )
        self._shard_count += 1
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

    # ---- read path (merged across all writers) ----------------------------

    def _all_manifests(self) -> list[dict]:
        """Every writer's manifest in the root, own (in-memory) view first."""
        out = [self._manifest]
        paths = [os.path.join(self.root, _MANIFEST)] + sorted(
            glob.glob(os.path.join(self.root, "manifest.p*.json"))
        )
        for p in paths:
            if os.path.basename(p) == self._manifest_name():
                continue  # own manifest: the in-memory copy is newer
            if os.path.exists(p):
                with open(p) as f:
                    out.append(json.load(f))
        return out

    def _merged_class_names(self) -> list[str]:
        names: list[str] = []
        for m in self._all_manifests():
            cn = m.get("class_names") or []
            if cn:
                if names and cn != names:
                    raise ValueError(
                        f"writers disagree on class_names in {self.root}"
                    )
                names = cn
        return names

    def _merged_dtype(self) -> str | None:
        """The store's on-disk feature dtype, agreed across writers."""
        dt: str | None = None
        for m in self._all_manifests():
            d = m.get("dtype")
            if d:
                if dt is not None and d != dt:
                    raise ValueError(
                        f"writers disagree on feature dtype in {self.root}"
                    )
                dt = d
        return dt

    def _merged_quant(self) -> tuple[str | None, bool]:
        """(declared extraction precision, any writer declared one).

        ``(None, True)`` = declared bf16/f32 production forward;
        ``("int8", True)`` = declared int8; ``(None, False)`` = no writer
        ever declared (pre-r5 store or imported foreign cache) — callers
        treat unknown as warn-not-refuse.
        """
        q: str | None = None
        known = False
        for m in self._all_manifests():
            if "quant" not in m:
                continue
            v = m["quant"]
            if known and v != q:
                raise ValueError(
                    f"writers disagree on extraction quant in {self.root}"
                )
            q, known = v, True
        return q, known

    def recorded_quant(self) -> tuple[str | None, bool]:
        """Public read of the store's extraction-precision provenance."""
        return self._merged_quant()

    def set_quant_calib(self, act_max: dict) -> None:
        """Record the int8 calibration scales this store's features were
        extracted with ({conv_site: float} — extract.quant_calibration).
        Written to the manifest immediately so a query run can reproduce
        the exact quantized program (classify reads it back)."""
        self._manifest["quant_calib"] = {
            str(k): float(v) for k, v in act_max.items()
        }
        self._write_manifest()

    def quant_calib(self) -> dict | None:
        """The recorded int8 calibration scales, or None (pre-scales int8
        stores fall back to the synthetic calibration they were built
        with). Writers must agree."""
        calib: dict | None = None
        for m in self._all_manifests():
            c = m.get("quant_calib")
            if c is None:
                continue
            if calib is not None and c != calib:
                raise ValueError(
                    f"writers disagree on quant_calib in {self.root}"
                )
            calib = c
        return calib

    def _merged_videos(self) -> dict[str, dict]:
        videos: dict[str, dict] = {}
        for m in self._all_manifests():
            videos.update(m.get("videos", {}))
        return videos

    @property
    def class_names(self) -> list[str]:
        return self._merged_class_names()

    def done_ids(self) -> set[str]:
        """Clip ids already durably extracted by ANY writer (resume support,
        SURVEY.md §5)."""
        return set(self._merged_videos().keys())

    def load_all(self) -> dict[str, tuple[np.ndarray, int]]:
        """vid -> (feature, label) for every durable clip of every writer."""
        videos = self._merged_videos()
        by_shard: dict[str, list[str]] = {}
        for vid, meta in videos.items():
            by_shard.setdefault(meta["shard"], []).append(vid)
        out: dict[str, tuple[np.ndarray, int]] = {}
        for shard, vids in by_shard.items():
            with np.load(os.path.join(self.root, shard)) as z:
                for vid in vids:
                    # Upcast on read: eval always computes in f32 whatever
                    # the on-disk dtype (float16 stores halve shard bytes).
                    out[vid] = (
                        z[vid].astype(np.float32, copy=False),
                        int(videos[vid]["label"]),
                    )
        return out

    def summary(self) -> dict:
        """Merged multi-writer store summary (ops tooling, `eov store-info`).

        Lives here so the shard/manifest naming scheme and the merged-view
        semantics stay in ONE module; clips/shards/writers/bytes counts
        come from the same discovery logic the read path uses.
        """
        videos = self._merged_videos()
        shards = sorted(glob.glob(os.path.join(self.root, "shard_*.npz")))
        manifests = glob.glob(os.path.join(self.root, "manifest*.json"))
        labels = [v["label"] for v in videos.values()]
        # A store written without class_names metadata can hold labels past
        # len(class_names); report the axis per_class actually spans so the
        # per-class stats and the 'classes' field always agree.
        n_classes = max(
            len(self.class_names),
            (max(labels) + 1) if labels else 0,
        )
        per_class = (
            np.bincount(labels, minlength=n_classes)
            if labels else np.zeros(n_classes, np.int64)
        )
        dim = None
        if videos:
            vid = next(iter(videos))
            with np.load(os.path.join(self.root, videos[vid]["shard"])) as z:
                dim = int(z[vid].shape[-1])
        q, q_known = self._merged_quant()
        return {
            "store": self.root,
            "clips": len(videos),
            "classes": n_classes,
            "feature_dim": dim,
            "dtype": self.dtype.name,
            "quant": (q or "off") if q_known else "unknown",
            # int8 stores: whether the producing program's calibration
            # scales are recorded (classify reproduces the store's exact
            # quantized program only when they are).
            "quant_calib": self.quant_calib() is not None,
            "shards": len(shards),
            "writers": len(manifests) or 1,
            "bytes": int(sum(os.path.getsize(p) for p in shards)),
            "clips_per_class_min":
                int(per_class.min()) if len(per_class) else 0,
            "clips_per_class_max":
                int(per_class.max()) if len(per_class) else 0,
            "empty_classes": int((per_class == 0).sum()),
        }

    def to_table(self, n_classes: int | None = None) -> FeatureTable:
        """Padded class-major [C, M, D] FeatureTable + [C] counts for eval."""
        data = self.load_all()
        if not data:
            raise ValueError(f"empty feature store: {self.root}")
        return _table_from_dict(data, n_classes)


def _table_from_dict(
    data: dict[str, tuple[np.ndarray, int]], n_classes: int | None = None,
) -> FeatureTable:
    """Shared to_table body: {vid: (feature, label)} -> padded FeatureTable."""
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


class MemoryFeatureStore:
    """In-process stand-in for :class:`FeatureStore` (same API subset the
    extraction pipeline writes through: put/flush/done_ids, plus the
    load_all/to_table/class_names read side).

    For features consumed immediately in the same process — `eov classify`
    featurizes query clips and matches them in one run — a tempdir
    FeatureStore costs two full disk copies of the feature set plus
    shard/manifest IO, and buys nothing: nothing ever resumes from it.
    flush() is a no-op (everything put() is immediately visible), so the
    resume/durability semantics documented on FeatureStore do NOT apply.
    """

    def __init__(self, class_names: Sequence[str] | None = None):
        self._class_names = list(class_names) if class_names else []
        self._data: dict[str, tuple[np.ndarray, int]] = {}

    @property
    def class_names(self) -> list[str]:
        return list(self._class_names)

    def put(self, video_id: str, feature: np.ndarray, label: int) -> None:
        self._data[str(video_id)] = (
            np.asarray(feature, np.float32), int(label)
        )

    def flush(self) -> None:
        return None

    def done_ids(self) -> set[str]:
        return set(self._data)

    def load_all(self) -> dict[str, tuple[np.ndarray, int]]:
        return dict(self._data)

    def to_table(self, n_classes: int | None = None) -> FeatureTable:
        if not self._data:
            raise ValueError("empty in-memory feature store")
        return _table_from_dict(self._data, n_classes)
