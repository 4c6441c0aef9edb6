"""Export a FeatureStore back to reference-era cache layouts.

Inverse of tools/import_features (SURVEY.md §2a C6 migration, both
directions): the reference lineage's analysis scripts consume per-video
``.npy`` features `[CANON]`, so a user must be able to hand an eov store's
features back to those — or to any external notebook — without writing a
store reader. Two layouts:

  tree (default):  out/ClassName/video_id.npy   (one 1-D f32 array each)
  npz:             out.npz  {video_id: feature[D]}  + out.labels.json
                   ({video_id: {label, class_name}} — the flat dict layout
                   loses labels otherwise, exactly the ambiguity the
                   importer refuses on)

Features are exported as float32 regardless of the store's on-disk dtype
(readers of the store upcast the same way). Class names fall back to
``class_NNN`` when the store carries none — the tree layout then encodes
labels in those directory names, so import_features round-trips either way.

Run: python -m eov_tpu.tools.export_features --store S --out DIR
         [--format tree|npz]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

__all__ = ["export_store", "main"]


def export_store(store_root: str, out: str, *, fmt: str = "tree") -> dict:
    """Write every clip of the store at ``store_root`` to ``out``.

    Returns {"clips": N, "classes": C, "format": fmt, "out": path}.
    """
    from eov_tpu.data.store import FeatureStore

    if fmt not in ("tree", "npz"):
        raise ValueError(f"format must be 'tree' or 'npz', got {fmt!r}")
    store = FeatureStore(store_root, process_index=0)
    data = store.load_all()
    if not data:
        raise ValueError(f"empty feature store: {store_root}")
    names = store.class_names
    max_label = max(label for _, label in data.values())
    if len(names) <= max_label:
        names = names + [
            f"class_{i:03d}" for i in range(len(names), max_label + 1)
        ]

    if fmt == "tree":
        if os.path.exists(out) and os.listdir(out):
            raise ValueError(
                f"output dir {out!r} is not empty; export into a fresh "
                "directory (mixing exports corrupts the class tree the "
                "importer reads back)"
            )
        # '/' in a video id would escape its class directory, so it is
        # mangled to '_' — but that can collide distinct ids ('a/b' vs
        # 'a_b') onto one .npy path, silently dropping a clip from the
        # advertised bit-exact round trip. Refuse instead (mirrors the
        # importer's refuse-ambiguity policy).
        written: dict[str, str] = {}
        for vid in sorted(data):
            fname = os.path.join(names[data[vid][1]], vid.replace("/", "_"))
            if fname in written:
                raise ValueError(
                    f"video ids {written[fname]!r} and {vid!r} both map to "
                    f"{fname + '.npy'!r} after '/'→'_' mangling; rename one "
                    "so the exported tree keeps every clip"
                )
            written[fname] = vid
        # The pre-check above raises before ANY write, so writing from its
        # map keeps the mangling rule in exactly one place.
        for fname, vid in written.items():
            path = os.path.join(out, fname + ".npy")
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.save(path, data[vid][0].astype(np.float32, copy=False))
    else:
        base = out[:-4] if out.endswith(".npz") else out
        np.savez(
            base + ".npz",
            **{vid: f.astype(np.float32, copy=False)
               for vid, (f, _) in data.items()},
        )
        with open(base + ".labels.json", "w") as f:
            json.dump(
                {vid: {"label": label, "class_name": names[label]}
                 for vid, (_, label) in data.items()}, f,
            )
    return {
        "clips": len(data),
        "classes": len({label for _, label in data.values()}),
        "format": fmt,
        "out": out,
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("export_features", description=__doc__)
    ap.add_argument("--store", required=True, help="source feature store")
    ap.add_argument("--out", required=True,
                    help="output dir (tree) or .npz path (npz)")
    ap.add_argument("--format", default="tree", choices=("tree", "npz"))
    args = ap.parse_args(argv)
    try:
        summary = export_store(args.store, args.out, fmt=args.format)
    except ValueError as e:
        print(f"error: {e}", file=sys.stderr)
        return 2
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
