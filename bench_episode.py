"""Secondary benchmark: single-episode latency (BASELINE.json config 1).

BASELINE.json:2 names THREE metric axes: extraction clips/sec/chip
(bench.py), accuracy parity (tools/parity_harness.py), and "5-way 1-shot
episode latency" — this bench closes the third. Config 1 is "single 5-way
1-shot episode: ResNet-50 frame features + cosine matching on a few
UCF101 clips (CPU, batch 1)": one cold user asking one question of a
never-extracted episode, so the honest latency includes EVERYTHING after
jit warmup — disk JPEG reads, decode, TSN center-segment sampling,
resize/crop/normalize, 10 clip forwards (5 support + 5 query) at batch 1,
and the cosine match.

Fixture: synthetic UCF-shaped clips (256x340 JPEG frame folders, the
frame geometry the reference's UCF101 recipe decodes) written to a temp
dir; weights are random-init (latency is weight-value-independent).

Prints ONE JSON line. Env knobs: EOV_EPISODE_REPEATS (default 5),
EOV_EPISODE_PLATFORM (default cpu — config 1 is a CPU config; set tpu to
measure the tunneled chip, where per-dispatch round-trips dominate).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

# Config 1 is CPU batch-1; the shell pins JAX_PLATFORMS=axon and the axon
# site initializes the platform at interpreter start (sitecustomize), so an
# env override here is too late — use the config knob like cli._setup_platform.
_PLATFORM = os.environ.get("EOV_EPISODE_PLATFORM", "cpu")


def _write_fixture(root: str, ds) -> list:
    from PIL import Image

    from eov_tpu.data import datasets
    from eov_tpu.data.fixtures import synthetic_clip

    split = []
    for rec in ds.records:
        c, j = ds._meta[rec.video_id]
        clip = synthetic_clip(c, j, rec.num_frames, ds.height, ds.width)
        vdir = os.path.join(root, rec.video_id)
        os.makedirs(vdir, exist_ok=True)
        for t in range(rec.num_frames):
            Image.fromarray(clip[t]).save(
                os.path.join(vdir, f"img_{t + 1:05d}.jpg"), quality=90
            )
        split.append([rec.video_id, rec.num_frames, rec.label])
    datasets.save_split_json(
        os.path.join(root, "split.json"), ds.class_names, {"all": split}
    )
    return split


def main() -> None:
    import jax

    jax.config.update("jax_platforms", _PLATFORM)
    from eov_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from eov_tpu.config import get_preset
    from eov_tpu.data import datasets
    from eov_tpu.extract import _center_indices_np, make_feature_fn
    from eov_tpu.models import get_arch
    from eov_tpu.ops import similarity

    platform = jax.devices()[0].platform
    repeats = int(os.environ.get("EOV_EPISODE_REPEATS", "5"))
    preset = get_preset("episode_cpu")
    ecfg = preset.extract
    # Test-suite shrink knobs; the artifact of record keeps the defaults
    # (config-1 geometry: resnet50, 32-frame 256x340 clips).
    arch = os.environ.get("EOV_EPISODE_ARCH", ecfg.arch)
    if arch != ecfg.arch:
        import dataclasses as _dc

        ecfg = _dc.replace(ecfg, arch=arch)
    n_frames = int(os.environ.get("EOV_EPISODE_FRAMES", "32"))
    fh, _, fw = os.environ.get("EOV_EPISODE_HW", "256x340").partition("x")
    fh, fw = int(fh), int(fw)
    n_way = preset.eval.n_way

    ctor, _, _ = get_arch(ecfg.arch)
    model = ctor(dtype=jnp.dtype(ecfg.compute_dtype))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)))
    fn = make_feature_fn(params, ecfg)

    with tempfile.TemporaryDirectory(prefix="eov_episode_") as root:
        syn = datasets.SyntheticVideoDataset(
            n_classes=n_way, clips_per_class=2, min_frames=n_frames,
            max_frames=n_frames, height=fh, width=fw, seed=0,
        )
        split = _write_fixture(root, syn)
        ds = datasets.FrameFolderDataset(root, split, syn.class_names)

        by_class: dict[int, list] = {}
        for r in ds.records:
            by_class.setdefault(r.label, []).append(r)

        def feat(rec):
            idx = _center_indices_np(rec.num_frames, ecfg.num_segments)
            frames = ds.get_frames(rec, idx)[None]  # batch 1 (config 1)
            return np.asarray(fn(jnp.asarray(frames)))[0]

        def episode(seed: int) -> float:
            rng = np.random.default_rng(seed)
            sup, qry, truth = [], [], []
            for i, c in enumerate(sorted(by_class)):
                picks = rng.choice(len(by_class[c]), size=2, replace=False)
                sup.append(feat(by_class[c][picks[0]]))
                qry.append(feat(by_class[c][picks[1]]))
                truth.append(i)
            preds = np.asarray(similarity.predict(
                jnp.asarray(np.stack(qry)),
                jnp.asarray(np.stack(sup))[:, None, :],
            ))
            return float((preds == np.asarray(truth)).mean())

        t0 = time.perf_counter()
        episode(0)  # jit compile + first-touch warmup
        warm_s = time.perf_counter() - t0

        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            episode(i + 1)  # fresh support/query picks each repeat
            times.append(time.perf_counter() - t0)

    med = statistics.median(times)
    frames = 2 * n_way * ecfg.num_segments
    print(json.dumps({
        "metric": "oneshot_episode_latency",
        "value": round(med * 1e3, 1),
        "unit": "ms/episode",
        "vs_baseline": None,
        "detail": {
            "platform": platform,
            "arch": ecfg.arch,
            "preset": "episode_cpu",
            "repeats": repeats,
            "ms_min": round(min(times) * 1e3, 1),
            "ms_max": round(max(times) * 1e3, 1),
            "warmup_s": round(warm_s, 2),
            "clips_per_episode": 2 * n_way,
            "frames_decoded": frames,
            "frame_hw": [fh, fw],
            "params": "random-init (latency is weight-value-independent)",
        },
    }))


if __name__ == "__main__":
    sys.exit(main())
