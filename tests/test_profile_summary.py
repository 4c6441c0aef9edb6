"""profile_summary tool: trace capture -> device/host op attribution."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_summarize_cpu_trace(tmp_path):
    pytest.importorskip("xprof")
    from eov_tpu.tools.profile_summary import summarize

    f = jax.jit(lambda x: jnp.tanh(x @ x).sum())
    x = jnp.asarray(np.random.default_rng(0).normal(size=(256, 256)),
                    jnp.float32)
    float(f(x))  # compile
    jax.profiler.start_trace(str(tmp_path))
    for _ in range(3):
        float(f(x))
    jax.profiler.stop_trace()

    rows = summarize(str(tmp_path), top=10)
    head = rows[0]
    assert head["device_busy_us"] > 0
    assert all(r["self_us"] >= 0 for r in rows[1:])
    # shares sum to <= 1 over the reported top-k
    assert sum(r["share_of_busy"] for r in rows[1:]) <= 1.0 + 1e-6
