"""Pack any VideoDataset into an EOVC shard (offline, C14 equivalent).

The reference's offline step is ffmpeg video->JPEG-folder extraction
(SURVEY.md §2a C14); the TPU-native equivalent packs decoded frames into
EOVC shards — optionally pre-resized to the pipeline storage resolution
(short side = scale_size) so the host hot path is pure IO (codec='raw') or
single-size JPEG decode (codec='jpeg').

Usage:
    python -m eov_tpu.tools.pack_eovc --out shard.eovc --dataset synthetic
"""

from __future__ import annotations

import argparse

import numpy as np


def resize_short_side_np(frames: np.ndarray, size: int) -> np.ndarray:
    """Host-side PIL-exact short-side resize (matmul weights, numpy)."""
    from eov_tpu.ops.resize import resize_weights_cached, scale_short_side_size

    f, h, w, c = frames.shape
    oh, ow = scale_short_side_size(h, w, size)
    if (oh, ow) == (h, w):
        return frames
    wh = resize_weights_cached(h, oh)
    ww = resize_weights_cached(w, ow)
    x = frames.astype(np.float32)
    x = np.einsum("oh,fhwc->fowc", wh, x)
    x = np.einsum("pw,fowc->fopc", ww, x)
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def pack(dataset, out_path: str, *, storage_short_side: int | None = 256,
         codec: str = "raw", jpeg_quality: int = 90,
         clips_per_shard: int | None = None) -> int:
    """Write `dataset` into EOVC storage. Returns clip count.

    clips_per_shard=None writes one shard at out_path; otherwise out_path is
    a directory of `shard_NNNNN.eovc` files (the production layout —
    EovcVideoDataset reads the directory transparently).
    """
    import os

    from eov_tpu.runtime.eovc import EovcWriter

    # Probe the post-resize frame size from the first record.
    first = dataset.records[0]
    probe = dataset.get_frames(first, np.array([0]))
    if storage_short_side:
        probe = resize_short_side_np(probe, storage_short_side)
    h, w = probe.shape[1:3]

    def encode(frames):
        if codec != "jpeg":
            return frames
        import io

        from PIL import Image

        payloads = []
        for t in range(frames.shape[0]):
            buf = io.BytesIO()
            Image.fromarray(frames[t]).save(
                buf, format="JPEG", quality=jpeg_quality
            )
            payloads.append(buf.getvalue())
        return payloads

    if clips_per_shard:
        os.makedirs(out_path, exist_ok=True)

    # Class-name sidecar (the EOVC container itself stores only integer
    # labels): EovcVideoDataset auto-loads this, so names survive the
    # videodir/framedir -> EOVC -> extract -> embodied chain (embodied
    # fusion aligns virtual banks by class NAME — numeric fallback names
    # would refuse with 'no virtual clips for classes').
    names = list(getattr(dataset, "class_names", []) or [])
    sidecar = (
        os.path.join(out_path, "classes.json") if clips_per_shard
        else out_path + ".classes.json"
    )
    if names:
        import json

        with open(sidecar, "w") as f:
            json.dump({"class_names": names}, f)
    elif os.path.exists(sidecar):
        # Re-packing a path whose previous pack left a sidecar: a stale
        # name list would be auto-loaded against the NEW labels (silently,
        # whenever it is at least as long as the new class count).
        os.remove(sidecar)

    wr, shard_i, in_shard = None, 0, 0
    for rec in dataset.records:
        if wr is None:
            path = (
                os.path.join(out_path, f"shard_{shard_i:05d}.eovc")
                if clips_per_shard else out_path
            )
            wr = EovcWriter(path, h, w, codec=codec)
        frames = dataset.get_frames(rec, np.arange(rec.num_frames))
        if storage_short_side:
            frames = resize_short_side_np(frames, storage_short_side)
        if frames.shape[1:3] != (h, w):
            raise ValueError(
                f"{rec.video_id}: frame size {frames.shape[1:3]} != ({h},{w});"
                " EOVC shards are size-normalized — pick a storage_short_side"
            )
        wr.add_clip(rec.video_id, rec.label, encode(frames))
        in_shard += 1
        if clips_per_shard and in_shard >= clips_per_shard:
            wr.close()
            wr, in_shard = None, 0
            shard_i += 1
    if wr is not None:
        wr.close()
    return len(dataset.records)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--dataset", default="synthetic")
    ap.add_argument("--root"), ap.add_argument("--split")
    ap.add_argument("--synthetic-classes", type=int, default=10)
    ap.add_argument("--synthetic-clips", type=int, default=8)
    ap.add_argument("--codec", choices=["raw", "jpeg"], default="raw")
    ap.add_argument("--short-side", type=int, default=256)
    ap.add_argument("--clips-per-shard", type=int, default=None,
                    help="shard the output directory (default: one file)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from eov_tpu.data import datasets

    if args.dataset == "synthetic":
        ds = datasets.SyntheticVideoDataset(
            n_classes=args.synthetic_classes,
            clips_per_class=args.synthetic_clips, seed=args.seed,
        )
    elif args.dataset == "framedir":
        if not (args.root and args.split):
            raise SystemExit("--root and --split required for framedir")
        if args.split.endswith(".json"):
            meta = datasets.load_split_json(args.split)
            split, names = meta["splits"]["all"], meta["class_names"]
        else:
            split = datasets.load_split_txt(args.split)
            names = [str(i) for i in range(max(s[2] for s in split) + 1)]
        ds = datasets.FrameFolderDataset(args.root, split, names)
    elif args.dataset == "videodir":
        # Source videos -> EOVC in one step (no frame-folder staging):
        # the C14 offline ffmpeg pass and the pack collapse into one scan.
        if not args.root:
            raise SystemExit("--root required for videodir")
        split = None
        if args.split:
            split = (
                datasets.load_split_json(args.split)["splits"]["all"]
                if args.split.endswith(".json")
                else datasets.load_split_txt(args.split)
            )
        ds = datasets.VideoFileDataset(args.root, split)
    else:
        raise SystemExit(f"unknown dataset {args.dataset}")
    n = pack(ds, args.out, storage_short_side=args.short_side,
             codec=args.codec, clips_per_shard=args.clips_per_shard)
    print(f"packed {n} clips -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
