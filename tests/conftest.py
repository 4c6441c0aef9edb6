"""Test configuration: force CPU backend with 8 virtual devices.

Multi-chip sharding paths (shard_map / pjit over a Mesh) are exercised on a
virtual 8-device CPU mesh per SURVEY.md §4.5 — no TPU pod needed.

Environment note: this box's sitecustomize registers the experimental axon
TPU PJRT plugin in every process and pins JAX_PLATFORMS=axon, so env vars
alone don't stick — the jax.config updates below (which run before backend
initialization) are the effective override. The tunneled TPU is also ~100x
slower per dispatch than local CPU, which would make the suite unusable.
Opt out with EOV_TEST_TPU=1 to run the suite on the real chip.
"""

import os

if not os.environ.get("EOV_TEST_TPU"):
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
