"""Import a reference-era feature cache into an eov_tpu FeatureStore.

Capability parity: SURVEY.md §2a C6's cache half, migration side. The
reference pipeline saves extracted clip features as per-video ``.npy``
files or one pickled/``.npz`` dict ``[CANON]``; a user switching to this
framework already owns such a cache and should not have to re-run
extraction to use `eov eval/classify` on it. This tool converts any of the
canonical layouts into the sharded manifest store every eov subcommand
consumes (``--store``):

  1. class-directory tree:   src/ClassName/video_id.npy
     → label = index of ClassName (sorted dir order, or --classes order)
  2. flat .npy directory:    src/video_id.npy  + --split list.txt
     → label from the TSN split line whose path basename matches video_id
  3. one dict file (.npz; torch-saved .pt/.pth — safe weights_only load
     first, full unpickle gated behind --allow-pickle; .pkl/.pickle via
     --allow-pickle): {video_id: feature[D]} + --split, or
     {class_name: [feat…]/[N,D]} (keys are class names when every value
     is 2-D / a list)

Every route validates feature dims agree and refuses ambiguity (mixed
layouts, unmatched split ids, non-1-D per-video features) with a message
naming the fix — the store must never silently hold wrong labels, because
episode accuracy would still *run* on them.

Run: python -m eov_tpu.tools.import_features --src CACHE --store OUT
         [--split list.txt] [--classes classes.txt] [--store-dtype float16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Mapping, Sequence

import numpy as np

__all__ = ["import_cache", "main"]

_FLUSH_EVERY = 1024  # clips per shard — matches pack_eovc's scale choices


# Extensions stripped when normalizing a split-line path or feature
# filename to a video id. Real TSN split lists reference source videos
# ('Class/v_x.avi'), while the cache holds '.npy' per clip — both must
# normalize to the same id or no flat-dir cache would ever match its split.
_ID_EXTS = frozenset(
    {".npy", ".pt", ".pth", ".avi", ".mp4", ".mkv", ".mov", ".webm", ".mpg"}
)


def _basename_id(path: str) -> str:
    """Video id of a split-line path or a feature filename (no ext/dirs)."""
    b = os.path.basename(path.rstrip("/"))
    stem, ext = os.path.splitext(b)
    return stem if ext.lower() in _ID_EXTS else b


def _split_label_map(split_path: str) -> dict[str, int]:
    from eov_tpu.data.datasets import load_split_txt

    out: dict[str, int] = {}
    for p, _n, label in load_split_txt(split_path):
        vid = _basename_id(p)
        if vid in out and out[vid] != label:
            raise ValueError(
                f"split file maps video id {vid!r} to two labels "
                f"({out[vid]} and {label}); ids must be unique after "
                "basename normalization"
            )
        out[vid] = label
    return out


def _check_feature(vid: str, feat: np.ndarray, dim: int | None) -> int:
    feat = np.asarray(feat)
    if feat.ndim != 1:
        raise ValueError(
            f"feature for {vid!r} has shape {feat.shape}; per-video clip "
            "features must be 1-D (TSN consensus already applied). A "
            "[K, D] per-segment array should be mean-pooled first."
        )
    if dim is not None and feat.shape[0] != dim:
        raise ValueError(
            f"feature dim mismatch: {vid!r} is {feat.shape[0]}-d but "
            f"earlier features are {dim}-d — mixed caches cannot share "
            "a store"
        )
    if not np.all(np.isfinite(feat)):
        raise ValueError(f"feature for {vid!r} contains NaN/Inf")
    return int(feat.shape[0])


def _iter_class_tree(src: str):
    """Route 1: (class_name, video_id, npy_path) over src/Class/vid.npy."""
    classes = sorted(
        d for d in os.listdir(src) if os.path.isdir(os.path.join(src, d))
    )
    for cname in classes:
        for fn in sorted(os.listdir(os.path.join(src, cname))):
            if fn.endswith(".npy"):
                yield cname, _basename_id(fn), os.path.join(src, cname, fn)


def _to_numpy(v):
    """Normalize a cache value (torch tensor / array / list of either)."""
    if isinstance(v, (list, tuple)):
        return type(v)(_to_numpy(x) for x in v)
    if hasattr(v, "detach") and hasattr(v, "numpy"):  # torch.Tensor
        return v.detach().cpu().numpy()
    return v


def _load_torch_dict(src: str, allow_pickle: bool) -> Mapping:
    """Load a ``torch.save``'d feature dict — the reference lineage's most
    common cache artifact (a PyTorch repo saving {video_id: tensor}).

    ``weights_only=True`` (torch's restricted unpickler: tensors and
    containers only, no arbitrary code) is tried first and needs no trust
    flag; caches whose payload the restricted unpickler rejects fall back
    to a full unpickle, which is gated behind --allow-pickle exactly like
    ``.pkl`` files.
    """
    try:
        import torch
    except ImportError as e:  # pragma: no cover - torch is baked in here
        raise ValueError(
            f"loading {src!r} requires torch, which is not importable: {e}"
        )
    try:
        d = torch.load(src, map_location="cpu", weights_only=True)
    except Exception:
        if not allow_pickle:
            raise ValueError(
                f"{src!r} is not loadable with torch's safe restricted "
                "unpickler (weights_only=True); a full torch.load executes "
                "arbitrary code — pass --allow-pickle only for files you "
                "trust"
            )
        d = torch.load(src, map_location="cpu", weights_only=False)
    if not isinstance(d, Mapping):
        raise ValueError(
            f"torch cache must hold a dict keyed by video id or class "
            f"name, got {type(d).__name__}"
        )
    return {str(k): _to_numpy(v) for k, v in d.items()}


def _load_dict(src: str, allow_pickle: bool) -> Mapping[str, np.ndarray]:
    if src.endswith(".npz"):
        with np.load(src, allow_pickle=False) as z:
            return {k: np.asarray(z[k]) for k in z.files}
    if src.endswith((".pt", ".pth")):
        return _load_torch_dict(src, allow_pickle)
    if src.endswith((".pkl", ".pickle")):
        if not allow_pickle:
            raise ValueError(
                "pickle caches execute arbitrary code on load; pass "
                "--allow-pickle only for files you trust"
            )
        import pickle

        with open(src, "rb") as f:
            d = pickle.load(f)
        if not isinstance(d, Mapping):
            raise ValueError(
                f"pickle cache must hold a dict, got {type(d).__name__}"
            )
        return {k: _to_numpy(v) for k, v in d.items()}
    raise ValueError(
        f"unrecognized cache file {src!r}: expected .npz, .pt/.pth, .pkl, "
        "or a directory"
    )


def import_cache(
    src: str,
    store_root: str,
    *,
    split: str | None = None,
    class_names: Sequence[str] | None = None,
    store_dtype: str | None = None,
    allow_pickle: bool = False,
    quant: str | None = None,
) -> dict:
    """Convert a reference-era cache at ``src`` into a FeatureStore.

    Returns the written store's summary() dict. Refuses (ValueError) on
    any ambiguity rather than guessing — see module docstring.

    ``quant`` declares the cache's known extraction precision so the
    imported store carries provenance (data/store.py): ``"off"``/``None``
    = float forward, ``"int8"`` = a quantized deployment cache. The
    DEFAULT makes no claim — the store stays provenance-unknown and
    downstream surfaces warn instead of vouching; only pass a value the
    cache's producer actually documents.
    """
    from eov_tpu.data.store import FeatureStore

    if os.path.exists(os.path.join(store_root, "manifest.json")):
        raise ValueError(
            f"store {store_root!r} already exists; import into a fresh "
            "directory (appending imported features to an extracted store "
            "would mix feature provenances silently)"
        )

    # Collect (vid, feature, class_name_or_label) by layout.
    items: list[tuple[str, np.ndarray, object]] = []
    if os.path.isdir(src):
        tree = list(_iter_class_tree(src))
        flat = sorted(
            fn for fn in os.listdir(src)
            if fn.endswith(".npy") and os.path.isfile(os.path.join(src, fn))
        )
        if tree and flat:
            raise ValueError(
                f"{src!r} mixes class subdirectories and top-level .npy "
                "files; import each layout from its own root"
            )
        if tree:
            for cname, vid, path in tree:
                items.append((vid, np.load(path), cname))
        elif flat:
            if not split:
                raise ValueError(
                    "flat .npy directory carries no labels; pass --split "
                    "list.txt (TSN `<path> <frames> <label>` lines) to map "
                    "video ids to labels"
                )
            for fn in flat:
                vid = _basename_id(fn)
                items.append((vid, np.load(os.path.join(src, fn)), None))
        else:
            raise ValueError(f"no .npy features found under {src!r}")
    else:
        d = _load_dict(src, allow_pickle)
        if not d:
            raise ValueError(f"cache {src!r} is empty")
        vals = list(d.values())
        # --split signals a video-id-keyed dict; without it, uniformly 2-D
        # (or list-of-rows) values mean class-keyed. A vid-keyed dict of
        # [K, D] per-segment arrays WITHOUT --split would otherwise be
        # misread as class-keyed, turning video ids into class names.
        class_keyed = split is None and all(
            (isinstance(v, (list, tuple)) and v) or
            (isinstance(v, np.ndarray) and v.ndim == 2)
            for v in vals
        )
        if class_keyed:
            # {class_name: [feat…] | [N, D]} — keys are class names.
            for cname in d:
                rows = d[cname]
                rows = rows if isinstance(rows, np.ndarray) else list(rows)
                for i, feat in enumerate(rows):
                    items.append((f"{cname}/{i:05d}", np.asarray(feat), cname))
        else:
            if not split:
                raise ValueError(
                    "dict cache keyed by video id carries no labels; pass "
                    "--split list.txt, or key the dict by class name with "
                    "[N, D] arrays per class"
                )
            for vid in d:
                # Normalize keys the same way split-line ids are normalized
                # (_basename_id): reference caches are frequently keyed by
                # the source filename ('Class/v_x.avi'), while the split
                # side has already been stripped to 'v_x' — without this,
                # every such key fails to match its own split line. The
                # duplicate-id refusal below catches any collision this
                # stripping could introduce.
                items.append((_basename_id(str(vid)), np.asarray(d[vid]),
                              None))

    # Resolve labels.
    tree_classes = sorted({c for _, _, c in items if c is not None})
    if tree_classes:
        names = list(class_names) if class_names else tree_classes
        missing = [c for c in tree_classes if c not in names]
        if missing:
            raise ValueError(
                f"--classes list is missing cache classes {missing[:4]} "
                f"(+{max(0, len(missing) - 4)} more)"
            )
        label_of = {c: names.index(c) for c in tree_classes}
        resolved = [(vid, feat, label_of[c]) for vid, feat, c in items]
    else:
        labels = _split_label_map(split)  # split presence checked above
        unmatched = [vid for vid, _, _ in items if vid not in labels]
        if unmatched:
            raise ValueError(
                f"{len(unmatched)} cache video ids not in the split file, "
                f"e.g. {unmatched[:4]} — ids are matched by basename "
                "without extension"
            )
        names = list(class_names) if class_names else []
        resolved = [(vid, feat, labels[vid]) for vid, feat, _ in items]
        max_label = max(l for _, _, l in resolved)
        if names and len(names) <= max_label:
            raise ValueError(
                f"--classes lists {len(names)} names but the split uses "
                f"label {max_label}"
            )
        if not names:
            names = [f"class_{i:03d}" for i in range(max_label + 1)]

    # A duplicate video id (same basename under two class dirs, or a split
    # id colliding after extension stripping) would last-wins overwrite in
    # the store — one clip silently imported with the other's label.
    seen: dict[str, int] = {}
    dupes: list[str] = []
    for vid, _, _ in resolved:
        if vid in seen:
            dupes.append(vid)
        seen[vid] = seen.get(vid, 0) + 1
    if dupes:
        uniq = sorted(set(dupes))
        raise ValueError(
            f"{len(uniq)} video ids appear more than once in the cache, "
            f"e.g. {uniq[:4]} — ids must be unique across classes after "
            "basename/extension normalization (rename the colliding files)"
        )

    # Validate everything BEFORE creating the store: a failure mid-write
    # would otherwise leave a partial but valid-looking store on disk that
    # eval silently runs on, and a retry hits the 'already exists' refusal.
    dim: int | None = None
    for vid, feat, _ in resolved:
        dim = _check_feature(vid, feat, dim)

    store_kw = {}
    if quant is not None:
        store_kw["quant"] = None if quant == "off" else quant
    store = FeatureStore(store_root, class_names=names, process_index=0,
                         dtype=store_dtype, **store_kw)
    for n_done, (vid, feat, label) in enumerate(resolved, 1):
        store.put(vid, np.asarray(feat, np.float32), label)
        if n_done % _FLUSH_EVERY == 0:
            store.flush()
    store.flush()
    return store.summary()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("import_features", description=__doc__)
    ap.add_argument("--src", required=True,
                    help="cache: class-tree dir, flat .npy dir, .npz, "
                         ".pt/.pth (torch.save'd dict), .pkl")
    ap.add_argument("--store", required=True, help="output store (fresh dir)")
    ap.add_argument("--split", default=None,
                    help="TSN split txt mapping video ids to labels "
                         "(required for flat/video-id-keyed caches)")
    ap.add_argument("--classes", default=None,
                    help="class-names txt (one per line) fixing label order")
    ap.add_argument("--store-dtype", default=None,
                    choices=("float32", "float16"))
    ap.add_argument("--allow-pickle", action="store_true",
                    help="permit .pkl caches (arbitrary code execution on "
                         "load — trusted files only)")
    ap.add_argument("--quant", default=None, choices=("off", "int8"),
                    help="declare the cache's KNOWN extraction precision so "
                         "the imported store carries provenance (classify/"
                         "eval then verify instead of warning); omit when "
                         "unsure — the store stays provenance-unknown")
    args = ap.parse_args(argv)
    names = None
    if args.classes:
        from eov_tpu.data.class_splits import load_class_list

        names = load_class_list(args.classes)
    try:
        summary = import_cache(
            args.src, args.store, split=args.split, class_names=names,
            store_dtype=args.store_dtype, allow_pickle=args.allow_pickle,
            quant=args.quant,
        )
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
