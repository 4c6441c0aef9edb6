"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (shard_map / pjit over a Mesh) are exercised on a
virtual 8-device CPU mesh per SURVEY.md §4.5 — no TPU pod needed. Must run
before jax initializes its backend, hence env mutation at import time.
"""

import os

# Force CPU even if the shell exports JAX_PLATFORMS=axon (the tunneled TPU is
# far too slow for the test suite's many tiny dispatches; TPU runs happen via
# bench.py). Opt out with EOV_TEST_TPU=1.
if not os.environ.get("EOV_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
