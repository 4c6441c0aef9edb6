"""Tertiary benchmark: TSN finetune step throughput (clips/sec/chip).

Reference component C12's hot loop (SURVEY.md §3.5): K-segment random-crop
preprocess -> ResNet-50 forward+backward -> consensus CE loss -> SGD update.
Steady-state windows like bench.py. EOV_TRAIN_BATCH / EOV_TRAIN_K override.
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import statistics
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from eov_tpu import train as tr

    platform = jax.devices()[0].platform
    batch = int(os.environ.get("EOV_TRAIN_BATCH", "32" if platform == "tpu" else "2"))
    k = int(os.environ.get("EOV_TRAIN_K", "3"))
    iters = int(os.environ.get("EOV_TRAIN_ITERS", "6" if platform == "tpu" else "2"))
    window = int(os.environ.get("EOV_TRAIN_WINDOW", "4" if platform == "tpu" else "1"))
    hw = (40, 48) if platform != "tpu" else (256, 320)
    scale, crop = (36, 32) if platform != "tpu" else (256, 224)

    cfg = tr.TrainConfig(
        num_classes=64, num_segments=k, batch_clips=batch,
        scale_size=scale, crop_size=crop,
        compute_dtype="bfloat16" if platform == "tpu" else "float32",
    )
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0), sample_hw=(crop, crop))
    step = tr.make_train_step(cfg)

    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, k, *hw, 3), dtype=np.uint8)))
    labels = jax.device_put(jnp.asarray(
        rng.integers(0, cfg.num_classes, size=batch).astype(np.int32)))

    state, m = step(state, frames, labels, jax.random.PRNGKey(1))  # compile
    jax.block_until_ready(m["loss"])

    win_times = []
    key = jax.random.PRNGKey(2)
    for _ in range(iters):
        t0 = time.perf_counter()
        for j in range(window):
            key, sub = jax.random.split(key)
            state, m = step(state, frames, labels, sub)
        jax.block_until_ready((state, m))
        win_times.append((time.perf_counter() - t0) / window)

    # Cross-check: fully-fenced steps (fence the WHOLE state, not just the
    # metrics — fencing one output can under-report on async backends).
    fenced = []
    for _ in range(max(2, iters // 2)):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, frames, labels, sub)
        jax.block_until_ready((state, m))
        fenced.append(time.perf_counter() - t0)

    med = statistics.median(win_times)
    print(json.dumps({
        "metric": "tsn_finetune_step_throughput",
        "value": round(batch / med, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": None,
        "detail": {"platform": platform, "batch_clips": batch,
                   "num_segments": k, "frame_hw": list(hw),
                   "median_step_s": round(med, 5),
                   "median_fenced_step_s": round(statistics.median(fenced), 5),
                   "window": window},
    }))


if __name__ == "__main__":
    main()
