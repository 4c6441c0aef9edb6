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
         codec: str = "raw", jpeg_quality: int = 90) -> int:
    """Write all records of `dataset` into one EOVC shard. Returns clip count."""
    from eov_tpu.runtime.eovc import EovcWriter

    # Probe the post-resize frame size from the first record.
    first = dataset.records[0]
    probe = dataset.get_frames(first, np.array([0]))
    if storage_short_side:
        probe = resize_short_side_np(probe, storage_short_side)
    h, w = probe.shape[1:3]

    with EovcWriter(out_path, h, w, codec=codec) as wr:
        for rec in dataset.records:
            frames = dataset.get_frames(rec, np.arange(rec.num_frames))
            if storage_short_side:
                frames = resize_short_side_np(frames, storage_short_side)
            if frames.shape[1:3] != (h, w):
                raise ValueError(
                    f"{rec.video_id}: frame size {frames.shape[1:3]} != ({h},{w});"
                    " EOVC shards are size-normalized — pick a storage_short_side"
                )
            if codec == "jpeg":
                import io

                from PIL import Image

                payloads = []
                for t in range(frames.shape[0]):
                    buf = io.BytesIO()
                    Image.fromarray(frames[t]).save(
                        buf, format="JPEG", quality=jpeg_quality
                    )
                    payloads.append(buf.getvalue())
                wr.add_clip(rec.video_id, rec.label, payloads)
            else:
                wr.add_clip(rec.video_id, rec.label, frames)
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
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from eov_tpu.data import datasets

    if args.dataset == "synthetic":
        ds = datasets.SyntheticVideoDataset(
            n_classes=args.synthetic_classes,
            clips_per_class=args.synthetic_clips, seed=args.seed,
        )
    else:
        raise SystemExit("framedir packing: load split + FrameFolderDataset")
    n = pack(ds, args.out, storage_short_side=args.short_side,
             codec=args.codec)
    print(f"packed {n} clips -> {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
