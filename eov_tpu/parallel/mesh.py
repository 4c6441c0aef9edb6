"""Device mesh construction for eov_tpu jobs.

Axes:
    'data'  — clips / episodes (the embarrassingly-parallel axis,
              BASELINE.json:11 pod extraction)
    'frame' — segment frames within a clip (sequence-parallel analog,
              SURVEY.md §2c; usually 1)

Meshes are built from ``jax.devices()`` (real pod via jax.distributed, or
``xla_force_host_platform_device_count`` virtual CPU devices in tests).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

DATA_AXIS = "data"
FRAME_AXIS = "frame"

__all__ = ["make_mesh", "DATA_AXIS", "FRAME_AXIS"]


def make_mesh(
    n_data: int | None = None,
    n_frame: int = 1,
    devices=None,
) -> Mesh:
    """('data', 'frame') mesh over the available devices.

    n_data defaults to len(devices) // n_frame. ICI-friendly layout: 'frame'
    is the fastest-varying (innermost) axis so frame-psum neighbors are
    physically adjacent chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_frame:
            raise ValueError(f"{len(devices)} devices not divisible by n_frame={n_frame}")
        n_data = len(devices) // n_frame
    need = n_data * n_frame
    if need > len(devices):
        raise ValueError(f"need {need} devices, have {len(devices)}")
    grid = np.array(devices[:need]).reshape(n_data, n_frame)
    return Mesh(grid, (DATA_AXIS, FRAME_AXIS))
