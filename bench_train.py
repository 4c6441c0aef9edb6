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

    from eov_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from eov_tpu import train as tr

    platform = jax.devices()[0].platform
    batch = int(os.environ.get("EOV_TRAIN_BATCH", "32" if platform == "tpu" else "2"))
    k = int(os.environ.get("EOV_TRAIN_K", "3"))
    iters = int(os.environ.get("EOV_TRAIN_ITERS", "6" if platform == "tpu" else "2"))
    # Per-window host-read overhead (~20 ms on the tunneled chip) shrinks
    # as 1/window; readings converge to the true device rate from below
    # (BASELINE.md r3 window study). 16 steps ≈ 0.7 s device per window.
    window = int(os.environ.get("EOV_TRAIN_WINDOW", "16" if platform == "tpu" else "1"))
    hw = (40, 48) if platform != "tpu" else (256, 320)
    scale, crop = (36, 32) if platform != "tpu" else (256, 224)

    cfg = tr.TrainConfig(
        num_classes=64, num_segments=k, batch_clips=batch,
        scale_size=scale, crop_size=crop,
        compute_dtype="bfloat16" if platform == "tpu" else "float32",
        stem_s2d=os.environ.get("EOV_TRAIN_S2D", "auto"),
        pool_vjp=os.environ.get("EOV_TRAIN_POOL_VJP", "auto"),
    )
    state = tr.create_train_state(cfg, jax.random.PRNGKey(0), sample_hw=(crop, crop))
    step = tr.make_train_step(cfg, donate=False)  # scan carries state instead

    rng = np.random.default_rng(0)
    frames = jax.device_put(jnp.asarray(
        rng.integers(0, 256, (batch, k, *hw, 3), dtype=np.uint8)))
    labels = jax.device_put(jnp.asarray(
        rng.integers(0, cfg.num_classes, size=batch).astype(np.int32)))

    # Device-side scan of `window` train steps in ONE program; sync by
    # reading the final loss back to host (the axon tunnel's
    # block_until_ready is not a reliable fence — see bench.py docstring).
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def run_window(state, key, frames, labels):
        def body(carry, _):
            st, k2 = carry
            k2, sub = jax.random.split(k2)
            st, m = step(st, frames, labels, sub)
            return (st, k2), m["loss"]
        (state, _), losses = jax.lax.scan(
            body, (state, key), None, length=window
        )
        return state, losses[-1]

    state, loss = run_window(state, jax.random.PRNGKey(1), frames, labels)
    float(loss)  # compile + warm

    # xprof trace of the measured windows (VERDICT r2 #2: the train step's
    # DESIGN §9-style attribution) — read with tools/profile_summary.
    trace_dir = os.environ.get("EOV_TRAIN_TRACE")
    if trace_dir:
        jax.profiler.start_trace(trace_dir)

    win_times = []
    for i in range(iters):
        t0 = time.perf_counter()
        state, loss = run_window(
            state, jax.random.PRNGKey(2 + i), frames, labels
        )
        float(loss)  # host read = true device sync
        win_times.append((time.perf_counter() - t0) / window)

    if trace_dir:
        jax.profiler.stop_trace()

    # FLOPs rail. NB lowered-HLO cost analysis counts a scan body ONCE
    # regardless of trip count (measured — see bench.py), so analyze the
    # single train step, not the window program (the r1 report/window
    # variant understated by window x). The HLO number still OVERcounts
    # real work: it sums every branch of the 10-way multiscale-crop
    # lax.switch (only one executes) and the remat recompute, so the
    # model-FLOPs convention (3x forward) is reported alongside as the
    # MFU-comparable figure.
    step_flops, flops_source = None, None
    try:
        ca = step.lower(
            state, frames, labels, jax.random.PRNGKey(0)
        ).cost_analysis()
        if ca and ca.get("flops"):
            step_flops = ca["flops"]
            flops_source = "hlo_single_step_all_branches"
    except Exception:  # noqa: BLE001
        pass
    from eov_tpu.utils.flops import resnet_forward_flops

    model_flops = 3 * batch * k * resnet_forward_flops(
        "resnet50", (crop, crop)
    )

    med = statistics.median(win_times)
    print(json.dumps({
        "metric": "tsn_finetune_step_throughput",
        "value": round(batch / med, 2),
        "unit": "clips/sec/chip",
        "vs_baseline": None,
        "detail": {"platform": platform, "batch_clips": batch,
                   "num_segments": k, "frame_hw": list(hw),
                   "median_step_s": round(med, 5),
                   "step_tflops_hlo": (round(step_flops / 1e12, 3)
                                       if step_flops else None),
                   "step_tflops_model": round(model_flops / 1e12, 3),
                   "model_tflops_per_s": round(model_flops / med / 1e12, 1),
                   "mfu_vs_197tflops": (
                       round(model_flops / med / 197e12, 4)
                       if platform == "tpu" else None
                   ),
                   "flops_source": flops_source,
                   "window": window,
                   "clips_per_sec_min": round(batch / max(win_times), 2),
                   "clips_per_sec_max": round(batch / min(win_times), 2)},
    }))


if __name__ == "__main__":
    main()
