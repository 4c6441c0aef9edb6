"""Turnkey accuracy-parity harness: eov_tpu vs the PyTorch reference pipeline.

SURVEY.md §4.1 / OPEN-6: accuracy parity vs the real reference (±0.5%,
BASELINE.json:5) needs ImageNet weights and real video data, neither of
which exists in the build environment. This harness is the ready-to-run
packaging: point it at a torchvision ``resnet50`` state_dict (.pth/.npz)
and a dataset, and it runs BOTH pipelines end to end on the same clips —

  A (reference semantics): PIL resize(256)/center-crop(224)/normalize ->
    hand-written torch-CPU ResNet-50 (tools/torch_ref.py) -> TSN mean
  B (eov_tpu): fused on-device preprocess -> flax ResNet-50 (ported
    weights, bf16 or f32) -> TSN mean

then scores the SAME seeded episodes over both feature tables and reports
per-clip feature agreement plus the episode-accuracy delta against the 0.5%
budget. Without --params/--root it self-checks on synthetic fixtures with
shared random weights (the always-runnable mode in this environment).

``--quant int8`` runs pipeline B through the post-training int8 deployment
path (models/quant_infer.py, `extract --quant int8`) instead of the float
forward, so the int8 accuracy claim is turnkey against the torch reference
the moment real weights/data arrive — same one command, same report.

Run: python -m eov_tpu.tools.parity_harness [--params resnet50.pth]
         [--root FRAMES --split list.txt] [--n-episodes 600] [--quant int8]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _pil_preprocess(frames_u8: np.ndarray, scale: int, crop: int) -> np.ndarray:
    """Reference transform chain via PIL (the reference's actual library)."""
    from PIL import Image

    out = []
    for fr in frames_u8:
        im = Image.fromarray(fr)
        w, h = im.size
        if w <= h:
            ow, oh = (w, h) if w == scale else (scale, int(scale * h / w))
        else:
            ow, oh = (w, h) if h == scale else (int(scale * w / h), scale)
        im = im.resize((ow, oh), Image.BILINEAR)
        left, top = (ow - crop) // 2, (oh - crop) // 2
        im = im.crop((left, top, left + crop, top + crop))
        out.append(np.asarray(im, np.float32) / 255.0)
    x = np.stack(out)  # [K, crop, crop, 3]
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    return (x - mean) / std


def _torch_features(sd, clips_u8, scale, crop) -> np.ndarray:
    """Pipeline A: [B, K, H, W, 3] u8 -> [B, 2048] f32 via torch-CPU."""
    import torch

    from eov_tpu.tools.torch_ref import TorchResNet50

    model = TorchResNet50()
    model.load_state_dict(
        {k: torch.as_tensor(np.asarray(v)) for k, v in sd.items()},
        strict=False,
    )
    model.eval()
    feats = []
    with torch.no_grad():
        for clip in clips_u8:
            x = _pil_preprocess(clip, scale, crop)  # [K, c, c, 3]
            t = torch.from_numpy(x.transpose(0, 3, 1, 2))  # NCHW
            feats.append(model(t).mean(dim=0).numpy())
    return np.stack(feats)


def _eov_features(variables, clips_u8, scale, crop, dtype,
                  quant=None) -> np.ndarray:
    """Pipeline B: the fused eov_tpu program (preprocess+backbone+consensus),
    or its int8 deployment variant when ``quant='int8'``."""
    import jax.numpy as jnp

    from eov_tpu.extract import ExtractConfig, make_feature_fn

    cfg = ExtractConfig(
        num_segments=clips_u8.shape[1], scale_size=scale, crop_size=crop,
        compute_dtype=dtype, quant=quant,
    )
    fn = make_feature_fn(variables, cfg)
    return np.asarray(fn(jnp.asarray(clips_u8)))


def run(args) -> dict:
    import jax.numpy as jnp

    from eov_tpu.data.datasets import SyntheticVideoDataset
    from eov_tpu.eval import EvalConfig, FeatureTable, evaluate
    from eov_tpu.data.segments import center_indices_np as _center_indices_np

    # --- weights: real state_dict, or shared random fixture weights ---
    if args.params:
        if args.params.endswith(".npz"):
            sd = dict(np.load(args.params))
        else:
            import torch

            sd = torch.load(args.params, map_location="cpu", weights_only=True)
            sd = {k: v.numpy() for k, v in sd.items()
                  if "num_batches_tracked" not in k}
    else:
        import torch

        from eov_tpu.tools.torch_ref import (
            TorchResNet50, torchvision_style_state_dict,
        )

        torch.manual_seed(args.seed)
        sd = torchvision_style_state_dict(TorchResNet50())
        print("note: no --params; shared RANDOM weights (self-check mode)",
              file=sys.stderr)

    from eov_tpu.tools.port_torch import port_resnet_state_dict

    variables = port_resnet_state_dict(sd)

    # --- dataset: real frame folders, or synthetic fixtures ---
    if args.root and args.split:
        from eov_tpu.data.datasets import FrameFolderDataset, load_split_txt

        split = load_split_txt(args.split)
        names = sorted({str(l) for _, _, l in split})
        ds = FrameFolderDataset(args.root, split, names)
    else:
        ds = SyntheticVideoDataset(
            n_classes=args.classes, clips_per_class=args.clips_per_class,
            seed=args.seed, height=120, width=160,
        )

    # --- same decoded clips through both pipelines ---
    k = args.num_segments
    clips, labels = [], []
    for rec in ds.records:
        idx = _center_indices_np(rec.num_frames, k)
        clips.append(ds.get_frames(rec, idx))
        labels.append(rec.label)
    clips = np.stack(clips)

    quant = getattr(args, "quant", None)
    if quant == "off":
        quant = None
    fa = _torch_features(sd, clips, args.scale, args.crop)
    fb = _eov_features(variables, clips, args.scale, args.crop, args.dtype,
                       quant=quant)

    na = fa / np.linalg.norm(fa, axis=1, keepdims=True)
    nb = fb / np.linalg.norm(fb, axis=1, keepdims=True)
    cos = np.sum(na * nb, axis=1)

    # --- identical seeded episodes over both tables ---
    n_classes = len(ds.class_names)
    per_class = max(np.bincount(labels, minlength=n_classes))

    def to_table(f):
        feats = np.zeros((n_classes, per_class, f.shape[1]), np.float32)
        counts = np.zeros((n_classes,), np.int32)
        for feat, lab in zip(f, labels):
            feats[lab, counts[lab]] = feat
            counts[lab] += 1
        return FeatureTable(jnp.asarray(feats), jnp.asarray(counts))

    cfg = EvalConfig(
        n_way=min(5, n_classes), n_episodes=args.n_episodes, seed=args.seed
    )
    ra = evaluate(to_table(fa), cfg)
    rb = evaluate(to_table(fb), cfg)

    report = {
        "clips": int(len(clips)),
        "feature_cosine_min": float(cos.min()),
        "feature_cosine_mean": float(cos.mean()),
        "torch_acc": ra.mean_acc,
        "torch_ci95": ra.ci95,
        "eov_acc": rb.mean_acc,
        "eov_ci95": rb.ci95,
        "acc_delta_abs": abs(ra.mean_acc - rb.mean_acc),
        "budget": 0.005,
        "within_budget": abs(ra.mean_acc - rb.mean_acc) <= 0.005,
        "mode": "real" if args.params else "self_check_random_weights",
        "quant": quant,
    }
    return report


def main(argv=None) -> int:
    ap = argparse.ArgumentParser("parity_harness", description=__doc__)
    ap.add_argument("--params", default=None,
                    help="torchvision resnet50 state_dict (.pth or .npz)")
    ap.add_argument("--root", default=None, help="frame-folder dataset root")
    ap.add_argument("--split", default=None, help="TSN split txt")
    ap.add_argument("--classes", type=int, default=6)
    ap.add_argument("--clips-per-class", type=int, default=4)
    ap.add_argument("--num-segments", type=int, default=8)
    ap.add_argument("--scale", type=int, default=256)
    ap.add_argument("--crop", type=int, default=224)
    ap.add_argument("--dtype", default="float32",
                    help="eov_tpu compute dtype (float32 for parity runs, "
                         "bfloat16 to measure the production-path delta)")
    ap.add_argument("--quant", default=None, choices=("off", "int8"),
                    help="run pipeline B through the post-training int8 "
                         "deployment path (extract --quant int8) so its "
                         "accuracy delta vs the torch reference is measured "
                         "by the same harness")
    ap.add_argument("--n-episodes", type=int, default=600)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    print(json.dumps(run(args)))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
