"""Secondary benchmark: episodic eval throughput (episodes/sec/chip).

BASELINE.json:10 — 64 episodes per fused device step (sample + gather +
normalize + similarity matmuls + fusion + argmax + accuracy). The headline
extraction metric lives in bench.py; this measures the eval harness on a
realistic cached-feature table (Kinetics-100 meta-test scale: 24 classes x
100 clips x 2048-d).

Prints one JSON line. EOV_EVAL_MATCHER=xla|pallas|auto selects the matcher.
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

    from eov_tpu import eval as ev

    platform = jax.devices()[0].platform
    matcher = os.environ.get("EOV_EVAL_MATCHER", "auto")
    e_step = int(os.environ.get("EOV_EVAL_EPISODES_PER_STEP", "64"))
    iters = int(os.environ.get("EOV_EVAL_ITERS", "10" if platform == "tpu" else "3"))
    # Long window: the ~ms per-window host-read overhead of the tunneled
    # chip shrinks as 1/window (BASELINE.md r3 window study); at ~0.6 ms
    # eval steps 512 steps ≈ 0.3 s device per window.
    window = int(os.environ.get("EOV_EVAL_WINDOW", "512" if platform == "tpu" else "2"))

    rng = np.random.default_rng(0)
    c, m, d = 24, 100, 2048
    feats = (
        rng.normal(size=(c, 1, d)) + 0.8 * rng.normal(size=(c, m, d))
    ).astype(np.float32)
    features = jax.device_put(jnp.asarray(feats))
    counts = jax.device_put(jnp.full((c,), m, jnp.int32))

    # Device-side scan over `window` steps inside ONE executable: per-step
    # time is window_time / window with zero host-dispatch artifacts (the
    # steps are data-independent but sequenced by the scan carry).
    import functools

    @functools.partial(jax.jit, static_argnames=())
    def run_window(key0):
        def body(key, step_i):
            # Canonical ordinal protocol: per-step base ordinal varies the
            # computation across scan steps (anti-hoisting) and matches how
            # evaluate() drives the step.
            acc = ev.eval_step(
                key, step_i * e_step, features, counts, None, None,
                n_way=5, k_shot=1, n_query=1, n_step=e_step,
                metric="cosine", fusion="max", matcher=matcher,
            )
            return key, jnp.mean(acc)
        _, accs = jax.lax.scan(
            body, key0, jnp.arange(window, dtype=jnp.int32)
        )
        return accs

    np.asarray(run_window(jax.random.PRNGKey(0)))  # compile + warm

    win_times = []
    for i in range(iters):
        t0 = time.perf_counter()
        # Host read of all window outputs = true device sync (the axon
        # tunnel's block_until_ready is not a reliable fence; see bench.py).
        np.asarray(run_window(jax.random.PRNGKey(i)))
        win_times.append((time.perf_counter() - t0) / window)

    med = statistics.median(win_times)
    print(
        json.dumps(
            {
                "metric": "oneshot_eval_throughput",
                "value": round(e_step / med, 2),
                "unit": "episodes/sec/chip",
                "vs_baseline": None,
                "detail": {
                    "platform": platform,
                    "matcher": matcher,
                    "episodes_per_step": e_step,
                    "table_cmd": [c, m, d],
                    "median_step_s": round(med, 6),
                    "full_600_episode_eval_s": round(600 / (e_step / med), 4),
                    "eps_per_sec_min": round(e_step / max(win_times), 2),
                    "eps_per_sec_max": round(e_step / min(win_times), 2),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
